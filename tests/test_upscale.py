"""TAAU temporal upsampling (ops/upscale.py) — the render-low/display-high
half of the reference's DLSS-RR role (dlss.hpp:22-63)."""

import numpy as np
import pytest

from vk_gltf_renderer_tpu.ops.upscale import halton23, temporal_upscale


def _analytic(xs, ys):
    """Smooth band-limited-ish test image over continuous coords."""
    return np.stack([
        0.5 + 0.5 * np.sin(xs * 0.9) * np.cos(ys * 0.7),
        0.5 + 0.5 * np.cos(xs * 0.5 + ys * 0.3),
        0.5 + 0.5 * np.sin((xs + ys) * 0.4),
    ], axis=-1).astype(np.float32)


def test_halton_sequence_properties():
    pts = np.array([halton23(i) for i in range(64)])
    assert pts.shape == (64, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # low-discrepancy: every quadrant of [0,1)^2 visited within 16 samples
    q = (pts[:16] >= 0.5).astype(int)
    assert len({(a, b) for a, b in q}) == 4


def test_taau_converges_past_bilinear():
    """Static scene: after a Halton cycle, the reconstructed display image
    must beat single-frame bilinear upsampling against the analytic truth —
    the resolution-recovery property that justifies the render-low path."""
    h, w, scale = 24, 32, 2
    hh, ww = h * scale, w * scale
    # display-res truth at display pixel centers (low-res continuous coords)
    dy, dx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    truth = _analytic((dx + 0.5) / scale, (dy + 0.5) / scale)

    ly, lx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    motion = np.zeros((h, w, 2), np.float32)
    hist = None
    for f in range(24):
        j = halton23(f)
        cur = _analytic(lx + j[0], ly + j[1])  # point samples at the jitter
        hist = np.asarray(temporal_upscale(cur, motion, j, hist, scale))
    rmse_taau = float(np.sqrt(np.mean((hist[..., :3] - truth) ** 2)))

    # single-frame center-sampled bilinear upscale baseline
    cur_c = _analytic(lx + 0.5, ly + 0.5)
    base = np.asarray(temporal_upscale(cur_c, motion, np.float32([0.5, 0.5]), None, scale))
    rmse_bilinear = float(np.sqrt(np.mean((base[..., :3] - truth) ** 2)))

    assert rmse_taau < 0.6 * rmse_bilinear, (rmse_taau, rmse_bilinear)
    assert rmse_taau < 0.02


def test_taau_disocclusion_falls_back_to_current():
    """History that moved out of bounds must not bleed: lanes whose
    reprojection leaves the frame take the current upsample."""
    h, w, scale = 8, 8, 2
    cur = np.full((h, w, 3), 0.25, np.float32)
    hist = np.concatenate([np.full((h * scale, w * scale, 3), 10.0, np.float32),
                           np.ones((h * scale, w * scale, 1), np.float32)], axis=-1)  # stale & wrong
    motion = np.full((h, w, 2), 1e5, np.float32)  # everything out of bounds
    out = np.asarray(temporal_upscale(cur, motion, np.float32([0.5, 0.5]), hist, scale))
    np.testing.assert_allclose(out[..., :3], 0.25, atol=1e-5)


def test_taau_neighborhood_clamp_rejects_stale_history():
    """In-bounds but stale history is clamped to the current neighborhood."""
    h, w, scale = 8, 8, 2
    cur = np.full((h, w, 3), 0.5, np.float32)
    hist = np.concatenate([np.full((h * scale, w * scale, 3), 50.0, np.float32),
                           np.ones((h * scale, w * scale, 1), np.float32)], axis=-1)
    motion = np.zeros((h, w, 2), np.float32)
    out = np.asarray(temporal_upscale(cur, motion, np.float32([0.5, 0.5]), hist, scale))
    assert float(out[..., :3].max()) < 0.51  # flat neighborhood -> extent ~ 0


def test_renderer_upscale_end_to_end(box_glb):
    """GltfRenderer with upscale=2: low-res jittered frames reconstruct a
    display-res image close to a native-res render of the same scene."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.upscale = 2
    r.create_scene(str(box_glb))
    for _ in range(8):
        r.on_render()
    up = r.image_upscaled()
    assert up.shape == (48, 48, 3)
    assert np.isfinite(up).all()

    rn = GltfRenderer(width=48, height=48, spp=1, max_depth=2)
    rn.create_scene(str(box_glb))
    for _ in range(8):
        rn.on_render()
    native = rn.image_linear()
    # reconstruction, not equality: same scene content at matching scale
    rmse = float(np.sqrt(np.mean((up - native) ** 2)))
    assert rmse < 0.12, rmse

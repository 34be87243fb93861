"""Temporal reprojection + accumulation for animated scenes.

The reference's denoisers consume camera motion vectors computed by
reprojecting the first-hit world position with the previous frame's
view-projection (docs/denoising.md:17-44; prevMVP in SceneFrameInfo,
shaderio.h:155; sky handled as a point at infinity,
gltf_pathtrace.slang:632-650). This module provides the same contract:

  motion_vectors(first_pos, solid, prev_vp, cur_vp, size) -> [H,W,2] px
  temporal_accumulate(cur, prev, motion, ...) -> blended history

Instance motion: when the integrator's guide buffers supply
first_pos_prev (previous per-node transform snapshot), motion is full
per-instance motion; otherwise camera-only. Like the reference, skin/morph
vertex motion is not tracked (known ghosting limitation,
docs/denoising.md:56-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _project(vp, p, w_comp):
    """Project world points [H,W,3] with 4x4 vp (column-vector convention).
    w_comp=0 projects directions (points at infinity: sky)."""
    x = vp[0, 0] * p[..., 0] + vp[0, 1] * p[..., 1] + vp[0, 2] * p[..., 2] + vp[0, 3] * w_comp
    y = vp[1, 0] * p[..., 0] + vp[1, 1] * p[..., 1] + vp[1, 2] * p[..., 2] + vp[1, 3] * w_comp
    w = vp[3, 0] * p[..., 0] + vp[3, 1] * p[..., 1] + vp[3, 2] * p[..., 2] + vp[3, 3] * w_comp
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return x / w, y / w


def motion_vectors(first_pos, solid, prev_vp, cur_vp, width, height, first_pos_prev=None):
    """Per-pixel screen motion (pixels): where this surface point was last
    frame minus where it is now. Sky uses w=0 (camera rotation only).

    first_pos_prev (optional): the surface point's PREVIOUS-frame world
    position from the per-node transform snapshot — full instance motion
    (snapshot_prev_transforms.comp.slang:22-31). Without it, motion is
    camera-only (prevMVP reprojection), the reference's no-guide fallback.
    Like the reference, skin/morph vertex motion is not tracked
    (docs/denoising.md:56-64)."""
    w_comp = solid.astype(jnp.float32)
    px_c, py_c = _project(cur_vp, first_pos, w_comp)
    prev_world = first_pos if first_pos_prev is None else jnp.where(
        solid[..., None], first_pos_prev, first_pos
    )
    px_p, py_p = _project(prev_vp, prev_world, w_comp)

    def to_px(x, y):
        return (x * 0.5 + 0.5) * width, (y * 0.5 + 0.5) * height

    cx, cy = to_px(px_c, py_c)
    px, py = to_px(px_p, py_p)
    return jnp.stack([px - cx, py - cy], axis=-1)


@jax.jit
def temporal_accumulate(cur, history, motion, valid, alpha=0.15, clamp_k=1.5):
    """Blend current frame into reprojected history (the temporal half of
    SVGF / the DLSS-RR temporal pass).

    cur, history: [H,W,3]; motion: [H,W,2] px; valid: [H,W] bool.
    History is bilinearly sampled at (pixel + motion) and neighborhood-
    clamped (AABB of the 3x3 current neighborhood) to reject stale history.
    """
    h, w = cur.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = xs + motion[..., 0]
    sy = ys + motion[..., 1]
    in_bounds = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    sx = jnp.clip(sx, 0, w - 1)
    sy = jnp.clip(sy, 0, h - 1)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    hist = (
        history[y0, x0] * (1 - fx) * (1 - fy)
        + history[y0, x1] * fx * (1 - fy)
        + history[y1, x0] * (1 - fx) * fy
        + history[y1, x1] * fx * fy
    )

    # neighborhood clamp (3x3 AABB of the current frame)
    lo = cur
    hi = cur
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = jnp.roll(cur, (dy, dx), axis=(0, 1))
            lo = jnp.minimum(lo, nb)
            hi = jnp.maximum(hi, nb)
    center = (lo + hi) * 0.5
    extent = (hi - lo) * 0.5 * clamp_k + 1e-4
    hist = jnp.clip(hist, center - extent, center + extent)

    keep = (valid & in_bounds)[..., None]
    out = jnp.where(keep, hist * (1 - alpha) + cur * alpha, cur)
    return out

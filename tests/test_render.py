"""End-to-end render smoke + correctness tests (CPU, tiny images).

Mirrors the role of the reference's headless smoke runner (test.py) and the
(stubbed-there) VisualValidator: render real assets, assert structural
correctness of the output (hit/miss layout, energy conservation bounds,
accumulation math).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vk_gltf_renderer_tpu.renderer import GltfRenderer


@pytest.fixture(scope="module")
def box_render():
    r = GltfRenderer(width=40, height=40, spp=1, max_depth=3)
    r.create_scene("/root/reference/resources/Box.glb")
    for _ in range(4):
        aux = r.on_render()
    return r, aux


def test_render_finite(box_render):
    r, aux = box_render
    img = r.image_linear()
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert img.mean() > 0.01  # not black


def test_center_hits_box_corner_is_sky(box_render):
    r, aux = box_render
    img = r.image_linear()
    # Box.glb's material is red: center pixel should be red-dominant
    c = img[20, 20]
    assert c[0] > c[1] * 2 and c[0] > c[2] * 2, f"center {c} not red"
    # corner = sky: blue-ish, brighter blue than red
    k = img[1, 1]
    assert k[2] > k[0], f"corner {k} not sky"


def test_first_hit_aux(box_render):
    r, aux = box_render
    solid = np.asarray(aux["solid"]).reshape(40, 40)
    assert solid[20, 20]  # center hits geometry
    assert not solid[1, 1]  # corner misses
    rnode = np.asarray(aux["first_rnode"]).reshape(40, 40)
    assert rnode[20, 20] == 0
    assert rnode[1, 1] == -1


def test_accumulation_reduces_variance():
    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")
    r.on_render()
    img1 = r.image_linear().copy()
    for _ in range(7):
        r.on_render()
    img8 = r.image_linear().copy()
    r2 = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r2.create_scene("/root/reference/resources/Box.glb")
    r2.on_render()
    # same frame-0 seed -> identical first frame (determinism)
    np.testing.assert_allclose(img1, r2.image_linear(), atol=1e-6)
    assert r.total_samples == 8


def test_headless_cli(tmp_path, capsys):
    from vk_gltf_renderer_tpu.headless import main

    out = tmp_path / "o.png"
    rc = main(
        [
            "--scenefile", "/root/reference/resources/Box.glb",
            "--headless", "--size", "32", "32",
            "--frames", "3", "--ptSamples", "1", "--ptDepth", "2",
            "--output", str(out),
        ]
    )
    assert rc == 0
    assert out.exists()
    captured = capsys.readouterr().out
    assert "BENCHMARK_JSON" in captured
    import json

    line = [l for l in captured.splitlines() if l.startswith("BENCHMARK_JSON")][0]
    rec = json.loads(line.split(" ", 1)[1])
    assert rec["schema"] == 1 and rec["type"] == "headless_summary"
    assert rec["frames"] == 2  # warmup excluded


def test_shader_ball_renders():
    r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/shader_ball.gltf")
    aux = r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all()
    assert np.asarray(aux["solid"]).any()


def test_adaptive_sampler_bucketed_no_recompile_storm():
    """Adaptive spp retarget quantizes to power-of-two buckets with
    hysteresis: 100 frames of noisy timings must settle on <= 4 distinct
    spp values (each distinct value is one XLA variant compile — the
    reference retargets via push constant with zero recompiles,
    renderer_pathtracer.cpp:1326-1374; buckets are the TPU equivalent)."""
    import numpy as np

    from vk_gltf_renderer_tpu.renderer import AdaptiveSampler

    s = AdaptiveSampler(target_fps=30)  # 33.3 ms budget
    rng = np.random.RandomState(3)
    seen = set()
    for i in range(100):
        per_sample_ms = 2.0 * (1.0 + 0.3 * rng.randn())  # ~2ms/sample, noisy
        s.update(per_sample_ms * max(s.spp, 1))
        seen.add(s.spp)
        assert s.spp in AdaptiveSampler.BUCKETS
    assert len(seen) <= 4, f"bucketed retarget compiled {len(seen)} variants: {sorted(seen)}"
    # steady state should sit near budget/per_sample = ~16
    assert s.spp in (8, 16)


def test_adaptive_update_global_converges_to_budget():
    """update_global must converge to the budget-implied bucket from REAL
    wall times, not ratchet to the max bucket (VERDICT r4 weak #4: the
    multihost path fed a hard-coded 1.0 ms, so `ideal` scaled with spp and
    the controller always climbed to 64). It also must stay in lock-step
    with the single-chip controller given identical inputs."""
    from vk_gltf_renderer_tpu.renderer import AdaptiveSampler

    s = AdaptiveSampler(target_fps=30)  # 33.33 ms budget
    g = AdaptiveSampler(target_fps=30)
    per_sample_ms = 5.0  # real cost -> budget fits ~6 samples -> bucket 4
    for _ in range(50):
        wall = per_sample_ms * max(s.spp, 1)
        rays = 1e6 * max(s.spp, 1)
        s.update(wall)
        g.update_global(rays, wall)
        assert g.spp == s.spp  # one controller, two entry points
    assert s.spp == 4, s.spp


def test_denoiser_guide_buffers():
    """denoise_guides=True produces the full guide set of the reference's
    denoiser contract (shaderio.h:54-65): specular albedo via
    EnvBRDFApprox2 at the first hit and specular hit distance for
    glossy-reflection chains (65504 sentinel on env escape)."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=40, height=40, spp=1, max_depth=3)
    r.denoise_guides = True
    r.create_scene("/root/reference/resources/Box.glb")
    aux = r.on_render()
    assert "spec_albedo" in aux and "spec_hitdist" in aux
    sa = np.asarray(aux["spec_albedo"]).reshape(40, 40, 3)
    hd = np.asarray(aux["spec_hitdist"]).reshape(40, 40)
    solid = np.asarray(aux["solid"]).reshape(40, 40)
    assert np.isfinite(sa).all() and np.isfinite(hd).all()
    # first-hit lanes get a nonzero integrated specular reflectance
    assert sa[solid].max() > 1e-3
    # miss lanes keep zeros
    assert np.allclose(sa[~solid], 0.0)
    # any captured specular chains are either a real distance or the
    # fp16-max env sentinel
    cap = hd > 0
    if cap.any():
        assert ((hd[cap] == 65504.0) | (hd[cap] < 1e4)).all()


def test_compact_frame_matches_wavefront(monkeypatch):
    """The compact-frame pipeline (peeled bounce 0, per-bounce liveness
    co-sort + prefix buckets, fixed-width dead-padded traces, final pixel
    restore) must produce the same image as the plain wavefront path —
    exercised on CPU via interpret-mode Pallas."""
    from vk_gltf_renderer_tpu.ops import pathtrace as pt
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    def render(traversal):
        # 40x40 depth-3 == the box_render fixture's config: the wavefront
        # baseline graph is a variant-cache hit (make_render_fn memo)
        r = GltfRenderer(width=40, height=40, spp=1, max_depth=3)
        r.create_scene("/root/reference/resources/Box.glb")
        monkeypatch.setenv("VKGR_TRAVERSAL", traversal)
        aux = r.on_render()
        return np.asarray(r.accum).reshape(40, 40, 3), aux

    ref_img, ref_aux = render("wavefront")

    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 1024)
    # shrink the bucket alignment so the tiny frame exercises MULTIPLE
    # prefix buckets (regression: live lanes scattered at the bounce-0->1
    # transition were truncated by the first prefix slice)
    orig_ladder = pt._bucket_ladder
    # two ladder levels still exercise multi-bucket prefix slicing;
    # each level is a full trace-graph compile branch (1-core budget)
    monkeypatch.setattr(pt, "_bucket_ladder", lambda n, levels=(1, 4), align=8192: orig_ladder(n, levels, 128))
    monkeypatch.setenv("VKGR_PALLAS_INTERPRET", "1")
    img, aux = render("packet")

    # same RNG streams, same math -> images agree to float tolerance
    assert np.abs(img - ref_img).max() < 1e-4
    for k in ("solid", "first_rnode"):
        assert (np.asarray(aux[k]) == np.asarray(ref_aux[k])).all()
    assert np.abs(np.asarray(aux["first_pos"]) - np.asarray(ref_aux["first_pos"])).max() < 1e-4

    # all round-4 levers on (cfg.peel_sort_shadow/loop_sort_shadow route
    # shadow rays through the sorted/bucketed path; cfg.trace_native traces
    # each occupancy bucket at its own width): pure scheduling changes, so
    # the image must still be bit-comparable to the wavefront baseline
    monkeypatch.setenv("VKGR_PEEL_SORT_SHADOW", "1")
    monkeypatch.setenv("VKGR_TRACE_NATIVE", "1")
    monkeypatch.setenv("VKGR_LOOP_SORT_SHADOW", "1")
    img2, aux2 = render("packet")
    assert np.abs(img2 - ref_img).max() < 1e-4
    assert (np.asarray(aux2["first_rnode"]) == np.asarray(ref_aux["first_rnode"])).all()


def test_instance_motion_vectors():
    """Moving a node between frames produces first_pos_prev = the surface
    point's previous world position (per-node transform snapshot,
    snapshot_prev_transforms.comp.slang:22-31) — with a static camera,
    camera-only reprojection would report zero motion."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
    r.denoise_guides = True
    r.create_scene("/root/reference/resources/Box.glb")
    r.on_render()

    # translate the box +0.3 in x through the editor (marks dirty)
    from vk_gltf_renderer_tpu.models.editor import SceneEditor

    ed = SceneEditor(r.scene)
    node = r.scene.model.nodes[r.scene.render_nodes[0].ref_node_id]
    t = list(node.get("translation", [0.0, 0.0, 0.0]))
    ed.set_translation(r.scene.render_nodes[0].ref_node_id, [t[0] + 0.3, t[1], t[2]])
    aux = r.on_render()

    solid = np.asarray(aux["solid"])
    pos = np.asarray(aux["first_pos"])
    prev = np.asarray(aux["first_pos_prev"])
    hit = solid
    assert hit.any()
    d = pos[hit] - prev[hit]
    # every hit surface point moved by exactly the node translation
    np.testing.assert_allclose(d[:, 0], 0.3, atol=1e-3)
    np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-3)


def test_compact_tile_order_matches_wavefront(monkeypatch):
    """Tile-order primary-ray layout (static 8x128 tiles, packets covering
    128x128 blocks) must be invisible in the output: image and aux match
    the wavefront render at a tile-divisible resolution, including the
    denoiser guide set."""
    from vk_gltf_renderer_tpu.ops import pathtrace as pt
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    W, H = 128, 16

    def render(traversal):
        r = GltfRenderer(width=W, height=H, spp=1, max_depth=3)
        r.denoise_guides = True
        r.create_scene("/root/reference/resources/Box.glb")
        monkeypatch.setenv("VKGR_TRAVERSAL", traversal)
        aux = r.on_render()
        return np.asarray(r.accum).reshape(H, W, 3), aux

    ref_img, ref_aux = render("wavefront")
    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 1024)
    monkeypatch.setenv("VKGR_PALLAS_INTERPRET", "1")
    img, aux = render("packet")

    assert np.abs(img - ref_img).max() < 1e-4
    for k in ("solid", "first_rnode"):
        assert (np.asarray(aux[k]) == np.asarray(ref_aux[k])).all(), k
    for k in ("first_pos", "albedo", "normal", "spec_albedo", "spec_hitdist"):
        assert np.abs(np.asarray(aux[k]) - np.asarray(ref_aux[k])).max() < 1e-4, k


def test_compact_tile_order_hdr_background(monkeypatch):
    """HDR env + compact + tile_order at a width where the tile permutation
    is NOT the identity (256 = two tile columns; at 128 it degenerates to
    row-major, which is how the lane-vs-pixel-order background fix-up bug
    escaped). The full-resolution background fix-up must land on the same
    pixels as the wavefront render."""
    from vk_gltf_renderer_tpu.ops import pathtrace as pt
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    W, H = 256, 16

    def render(traversal):
        r = GltfRenderer(width=W, height=H, spp=1, max_depth=2)
        r.create_scene("/root/reference/resources/Box.glb")
        r.create_hdr("/root/reference/resources/std_env.hdr")
        monkeypatch.setenv("VKGR_TRAVERSAL", traversal)
        aux = r.on_render()
        return np.asarray(r.accum).reshape(H, W, 3), aux

    ref_img, ref_aux = render("wavefront")
    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 1024)
    monkeypatch.setenv("VKGR_PALLAS_INTERPRET", "1")
    img, aux = render("packet")

    assert np.abs(img - ref_img).max() < 1e-4
    assert (np.asarray(aux["solid"]) == np.asarray(ref_aux["solid"])).all()
    # the background region itself (primary misses) must match exactly
    miss = ~np.asarray(ref_aux["solid"]).reshape(H, W)
    assert miss.any()
    assert np.abs(img[miss] - ref_img[miss]).max() < 1e-4


def test_fused_hitstate_matches_legacy(monkeypatch):
    """get_hit_state_fused (one wide per-world-tri gather, world-space math)
    must reproduce the legacy 5-gather object-space reconstruction on real
    hits — same shading frame, uvs, colors, texel density, shadow offset.
    VKGR_WIDE_ATTR=1 forces the full 64-col rows: the wide row is the
    parity claim; the narrow row's reduced contract is tested separately
    (test_narrow_hitstate_contract)."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.hitstate import get_hit_state, get_hit_state_fused
    from vk_gltf_renderer_tpu.ops.traverse_wavefront import intersect_rays_wavefront

    monkeypatch.setenv("VKGR_WIDE_ATTR", "1")
    sc = Scene()
    sc.load("/root/reference/resources/shader_ball.gltf")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    assert wb.hit_attr.shape[-1] == 64  # the env override must have applied

    rng = np.random.default_rng(7)
    n = 512
    lo = wb.nodes_self[0, 0:3]
    hi = wb.nodes_self[0, 3:6]
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(center + d * radius)
    rd = jnp.asarray(-d)

    hits = intersect_rays_wavefront(wb, ro, rd)
    mask = np.asarray(hits["tri"]) >= 0
    assert mask.sum() > 100

    legacy = get_hit_state(flat, hits, rd)
    fused = get_hit_state_fused(jnp.asarray(wb.hit_attr), jnp.asarray(wb.rn_attr_base), hits, rd)

    for k in ("pos", "nrm", "geonrm", "shadow_pos", "tangent", "bitangent",
              "uv0", "uv1", "color"):
        a = np.asarray(legacy[k])[mask]
        b = np.asarray(fused[k])[mask]
        assert np.abs(a - b).max() < 2e-3, (k, np.abs(a - b).max())
    assert (np.asarray(legacy["front_face"])[mask] == np.asarray(fused["front_face"])[mask]).all()
    td_a = np.asarray(legacy["texel_density"])[mask]
    td_b = np.asarray(fused["texel_density"])[mask]
    assert np.abs(td_a - td_b).max() < 1e-3 * max(1.0, td_a.max())


def test_narrow_hitstate_contract():
    """NARROW (32-col) hit-attr rows: the geometric outputs must still match
    the legacy reconstruction exactly, the uv/color channels are dropped
    (uv=0, color=1) — legal ONLY because narrow_attr_ok proved them
    unconsumed/constant — and eligibility itself must flip off the moment
    the scene stops qualifying (textures present or non-constant colors)."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.hitstate import (
        HIT_ATTR_COLS_NARROW, get_hit_state, get_hit_state_fused, narrow_attr_ok)
    from vk_gltf_renderer_tpu.ops.traverse_wavefront import intersect_rays_wavefront

    sc = Scene()
    sc.load("/root/reference/resources/shader_ball.gltf")
    flat = build_scene_flat(sc)
    # shader_ball is untextured with constant vertex colors -> narrow-eligible
    assert narrow_attr_ok(flat)
    wb = build_world_bvh(flat)
    assert wb.hit_attr.shape[-1] == HIT_ATTR_COLS_NARROW

    rng = np.random.default_rng(7)
    n = 512
    lo = wb.nodes_self[0, 0:3]
    hi = wb.nodes_self[0, 3:6]
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(center + d * radius)
    rd = jnp.asarray(-d)

    hits = intersect_rays_wavefront(wb, ro, rd)
    mask = np.asarray(hits["tri"]) >= 0
    assert mask.sum() > 100

    legacy = get_hit_state(flat, hits, rd)
    fused = get_hit_state_fused(jnp.asarray(wb.hit_attr), jnp.asarray(wb.rn_attr_base), hits, rd)
    for k in ("pos", "nrm", "geonrm", "shadow_pos", "tangent", "bitangent"):
        a = np.asarray(legacy[k])[mask]
        b = np.asarray(fused[k])[mask]
        assert np.abs(a - b).max() < 2e-3, (k, np.abs(a - b).max())
    assert (np.asarray(legacy["front_face"])[mask] == np.asarray(fused["front_face"])[mask]).all()
    # the reduced contract: uv channels zero, colors one
    assert (np.asarray(fused["uv0"]) == 0).all()
    assert (np.asarray(fused["uv1"]) == 0).all()
    assert (np.asarray(fused["color"]) == 1).all()
    assert (np.asarray(fused["texel_density"]) == 0).all()

    # eligibility must flip off when vertex colors stop being constant
    vtx = np.asarray(flat.vtx_packed).copy()
    vtx[0, 14] = 0.5
    assert not narrow_attr_ok(dataclasses.replace(flat, vtx_packed=vtx))


def test_fused_hitstate_refit_rebake():
    """Device rebake of the hit-attr rows after a transform change matches
    a fresh host build (the AnimationVk-parity contract for the fused
    shading tables)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.hitstate import bake_hit_attrs

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    nid = sc.render_nodes[0].ref_node_id
    ed.set_translation(nid, [0.25, -0.5, 1.0])
    ed.set_scale(nid, [2.0, 1.0, 0.5])
    flat = build_scene_flat(sc)
    wb_fresh = build_world_bvh(flat)

    from vk_gltf_renderer_tpu.ops.hitstate import HIT_ATTR_COLS_NARROW

    narrow = wb_fresh.hit_attr.shape[-1] == HIT_ATTR_COLS_NARROW
    rebaked = jax.jit(bake_hit_attrs, static_argnames=("narrow",))(
        jnp.asarray(flat.vtx_packed), jnp.asarray(flat.tri_idx),
        jnp.asarray(flat.rn_packed), jnp.asarray(wb_fresh.attr_rnode),
        jnp.asarray(wb_fresh.attr_tri), jnp.asarray(wb_fresh.attr_has_uv),
        narrow=narrow,
    )
    assert rebaked.shape == wb_fresh.hit_attr.shape
    assert np.abs(np.asarray(rebaked) - wb_fresh.hit_attr).max() < 1e-4


def test_variance_guided_svgf():
    """Variance-guided SVGF (Schied 2017): per-pixel luminance variance
    sharpens the luminance sigma (capped at the fixed sigma, with a
    sample-count ramp), variance rides the a-trous ladder with squared
    weights, and deterministic miss pixels pass through unfiltered.

    Part 1 (mechanism, exact known variance): on a synthetic image whose
    left half is CLEAN fine detail (variance 0) and right half is heavy
    noise on a flat signal, the guided filter must preserve the clean
    detail while denoising the noisy half — strictly lower RMSE than the
    fixed-sigma filter, which blurs both halves."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.denoise import denoise

    H = W = 64
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W]
    truth = np.where((xx < W // 2) & (((xx // 2) + (yy // 2)) % 2 == 0), 1.5, 0.5)
    truth = np.repeat(truth[..., None], 3, axis=2).astype(np.float32)
    sigma = np.where(xx >= W // 2, 0.6, 0.0).astype(np.float32)
    noisy = truth + rng.normal(size=truth.shape).astype(np.float32) * sigma[..., None]
    lum_w = np.array([0.2126, 0.7152, 0.0722], np.float32)
    variance = jnp.asarray(sigma * sigma * float((lum_w**2).sum()))

    albedo = jnp.ones((H, W, 3))
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    depth = jnp.ones((H, W))
    valid = jnp.ones((H, W), bool)

    fixed = np.asarray(denoise(jnp.asarray(noisy), albedo, normal, depth, valid, iterations=3))
    guided = np.asarray(denoise(jnp.asarray(noisy), albedo, normal, depth, valid,
                                iterations=3, variance=variance))
    rm = lambda img: float(np.sqrt(np.mean((img - truth) ** 2)))
    assert rm(guided) < rm(fixed), f"guided {rm(guided):.5f} vs fixed {rm(fixed):.5f}"
    assert rm(guided) < rm(noisy), "guidance must still denoise the noisy half"
    # the clean half's interior must survive essentially untouched (the
    # filter taps wrap via jnp.roll, so border columns see the noisy half)
    clean = (slice(None), slice(12, W // 2 - 12))
    assert np.abs(guided[clean] - truth[clean]).max() < 0.05


def test_denoise_renderer_ramp_and_background():
    """Integration: the renderer's moment-fed denoise path must (a) never
    do worse than the fixed-sigma filter at low sample counts (the
    reliability ramp keeps them equal there, measured crossover ~n=48+),
    and (b) pass deterministic miss/background pixels through unfiltered —
    filtering the backdrop blurred the sun disk and tripled RMSE."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.denoise import denoise, denoise_renderer
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    W = H = 64
    r = GltfRenderer(width=W, height=H, spp=1, max_depth=3)
    r.denoise_guides = True
    r.create_scene("/root/reference/resources/Box.glb")
    for _ in range(4):
        aux = r.on_render()
    assert "lum_moments" in aux and r._moments is not None

    rad = jnp.asarray(r.accum).reshape(H, W, 3)
    albedo = jnp.asarray(aux["albedo"]).reshape(H, W, 3)
    normal = jnp.asarray(aux["normal"]).reshape(H, W, 3)
    solid = np.asarray(aux["solid"]).reshape(H, W)
    pos = jnp.asarray(aux["first_pos"]).reshape(H, W, 3)
    eye = jnp.asarray(np.asarray(r.camera.eye, np.float32))
    depth = jnp.where(jnp.asarray(solid), jnp.linalg.norm(pos - eye, axis=-1), 1e9)

    fixed = np.asarray(denoise(rad, albedo, normal, depth, jnp.asarray(solid), iterations=4))
    guided = np.asarray(denoise_renderer(r, iterations=4))
    assert np.isfinite(guided).all()
    # (a) ramp: at n=4 the guided filter must match the fixed filter
    assert np.abs(guided[solid] - fixed[solid]).max() < 1e-2
    # (b) miss pixels pass through exactly
    assert solid.sum() > 0 and (~solid).sum() > 0
    assert np.allclose(guided[~solid], np.asarray(rad)[~solid], atol=1e-6)


@pytest.mark.slow  # two fresh render-graph compiles (~2 min CPU); verified passing
def test_primary_seed_exact(monkeypatch):
    """Previous-frame hit seeding (RenderConfig.primary_seed) must be
    radiometrically EXACT: the seed is a re-verified true intersection, so
    tmax-bounded traversal + seed fallback returns the same closest hits.
    Compare a seeded vs unseeded progressive render (only t/u/v may differ
    in final-ulp where the seed's Moller-Trumbore stands in for the
    traversal's). Paper basis: hash-based ray path prediction (PAPERS.md),
    made lossless."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    def run(enabled):
        monkeypatch.setenv("VKGR_PRIMARY_SEED", "1" if enabled else "0")
        r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
        r.create_scene("/root/reference/resources/Box.glb")
        for _ in range(2):
            aux = r.on_render()
        assert r._cfg.primary_seed is enabled
        return np.asarray(r.image_linear()), aux

    img_off, aux_off = run(False)
    img_on, aux_on = run(True)
    # frame >= 2 used real seeds: assert they were actually produced
    assert (np.asarray(aux_on["first_tri"]) >= 0).any()
    assert (np.asarray(aux_on["first_rnode"]) == np.asarray(aux_off["first_rnode"])).all()
    assert (np.asarray(aux_on["first_tri"]) == np.asarray(aux_off["first_tri"])).all()
    np.testing.assert_allclose(img_on, img_off, atol=2e-5)


@pytest.mark.slow  # compact-graph compile (~2 min CPU); verified passing
def test_primary_seed_compact_packet(monkeypatch):
    """The seeded peel must also hold on the PRODUCTION path: compact
    frame + packet kernel (interpret). This is the exact graph the TPU
    bench runs under VKGR_PRIMARY_SEED=1."""
    from vk_gltf_renderer_tpu.ops import pathtrace as pt
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 1024)
    monkeypatch.setenv("VKGR_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VKGR_TRAVERSAL", "packet")

    def run(enabled):
        monkeypatch.setenv("VKGR_PRIMARY_SEED", "1" if enabled else "0")
        r = GltfRenderer(width=40, height=40, spp=1, max_depth=2)
        r.create_scene("/root/reference/resources/Box.glb")
        for _ in range(2):
            aux = r.on_render()
        assert r._cfg.primary_seed is enabled
        return np.asarray(r.image_linear()), aux

    img_on, aux_on = run(True)
    img_off, aux_off = run(False)
    assert (np.asarray(aux_on["first_tri"]) >= 0).any()
    assert (np.asarray(aux_on["first_rnode"]) == np.asarray(aux_off["first_rnode"])).all()
    np.testing.assert_allclose(img_on, img_off, atol=2e-5)


def test_invalid_argument_recovery_two_rungs(monkeypatch):
    """on_render's failure ladder: first INVALID_ARGUMENT rotates the
    compile cache and retries; a second fault on the retry downgrades the
    session to the kernel-free wavefront path instead of dying (the
    reference's compile-fallback role, renderer_pathtracer.cpp:1129-1178)."""
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")

    real_ensure = GltfRenderer._ensure_render_fn
    calls = {"n": 0}

    def flaky_ensure(self):
        fn = real_ensure(self)
        if calls["n"] >= 2:
            return fn

        def bomb(*a, **k):
            calls["n"] += 1
            raise RuntimeError("INVALID_ARGUMENT: TPU backend error (test)")

        return bomb

    monkeypatch.setattr(GltfRenderer, "_ensure_render_fn", flaky_ensure)
    aux = r.on_render()
    assert calls["n"] == 2
    assert r._traversal_fallback == "wavefront"
    assert r._config().traversal == "wavefront"
    img = r.image_linear()
    assert np.isfinite(img).all() and img.mean() > 0.0


def test_deferred_fault_caught_by_recovery():
    """Async dispatch defers runtime faults to the next READBACK — the
    BENCH_r04 escape: the helmet's INVALID_ARGUMENT raised at the caller's
    sync, bypassing on_render's rungs entirely. on_render now validates the
    FIRST frame of every freshly-built executable with a scalar readback
    inside the recovery try, so a fault that only materializes at sync time
    still triggers the cache-rotate rung and the frame completes."""
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")
    r.on_render()  # real fn built + validated

    class DeferredFault:
        """aux['rays'] stand-in whose readback (float()) faults — the
        tunnel-deferred INVALID_ARGUMENT shape."""

        def __float__(self):
            raise RuntimeError("INVALID_ARGUMENT: TPU backend error (deferred)")

    def poisoned(flat, bvh, env, frame):
        return r.accum, {"rays": DeferredFault()}

    # install a poisoned executable exactly as a stale cache entry would be:
    # same cfg (so _ensure_render_fn keeps it), unvalidated
    r._render_fn = poisoned
    r._cfg = r._config()
    r._fn_validated = False
    aux = r.on_render()  # must recover (rung 1 rebuilds the real fn), not raise
    assert float(aux["rays"]) > 0
    # rung 1 sufficed — no session-wide wavefront downgrade
    assert getattr(r, "_traversal_fallback", None) is None
    img = r.image_linear()
    assert np.isfinite(img).all() and img.mean() > 0.0

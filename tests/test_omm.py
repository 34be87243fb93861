"""Opacity classification (ops/omm.py) — the SceneOmm role
(gltf_scene_omm.cpp, EXT_mesh_opacity_micromap): conservative per-triangle
alpha classes accelerate alpha-tested traversal with an identical image.
Tests: classification against a constructed MASK texture, transparent-tri
culling in the world BVH, and render equivalence vs the unclassified path."""

import io

import numpy as np
import pytest

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.gltf import load_model_from_json
from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
from vk_gltf_renderer_tpu.ops.omm import (
    ALPHA_MIXED, ALPHA_OPAQUE, ALPHA_TRANSPARENT, classify_attr_alpha,
)


def make_masked_quads(alpha_mode="MASK", cutoff=0.5):
    """Three separate triangles over a 16x16 texture whose LEFT half has
    alpha=1 and RIGHT half alpha=0: tri 0 entirely in the left (opaque),
    tri 1 entirely in the right (transparent), tri 2 straddling (mixed)."""
    from PIL import Image

    tex = np.zeros((16, 16, 4), np.uint8)
    tex[:, :, 0] = 255
    tex[:, :8, 3] = 255  # left half opaque
    buf_png = io.BytesIO()
    Image.fromarray(tex, "RGBA").save(buf_png, format="PNG")
    png = buf_png.getvalue()

    positions = np.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0],      # tri 0
            [2, 0, 0], [3, 0, 0], [2, 1, 0],      # tri 1
            [4, 0, 0], [5, 0, 0], [4, 1, 0],      # tri 2
        ],
        np.float32,
    )
    # UVs: left-safe region, right-safe region, straddling the seam
    uvs = np.array(
        [
            [0.05, 0.1], [0.30, 0.1], [0.05, 0.9],
            [0.70, 0.1], [0.95, 0.1], [0.70, 0.9],
            [0.30, 0.1], [0.70, 0.1], [0.30, 0.9],
        ],
        np.float32,
    )
    indices = np.arange(9, dtype=np.uint16)
    buf = positions.tobytes() + uvs.tobytes() + indices.tobytes() + png
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2, "material": 0}
        ]}],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}},
            "alphaMode": alpha_mode,
            "alphaCutoff": cutoff,
        }],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 9, "type": "VEC3",
             "min": [0, 0, 0], "max": [5, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 9, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 9, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": positions.nbytes},
            {"buffer": 0, "byteOffset": positions.nbytes, "byteLength": uvs.nbytes},
            {"buffer": 0, "byteOffset": positions.nbytes + uvs.nbytes, "byteLength": indices.nbytes},
            {"buffer": 0, "byteOffset": positions.nbytes + uvs.nbytes + indices.nbytes,
             "byteLength": len(png)},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, [buf]))
    return sc


def test_classify_mask_texture():
    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    assert list(cls) == [ALPHA_OPAQUE, ALPHA_TRANSPARENT, ALPHA_MIXED]


def test_classify_blend_constant_and_opaque_mode():
    sc = make_masked_quads()
    # OPAQUE mode: everything opaque regardless of texture
    sc.model.materials[0]["alphaMode"] = "OPAQUE"
    sc.parse_scene()
    cls = classify_attr_alpha(build_scene_flat(sc))
    assert (cls == ALPHA_OPAQUE).all()
    # BLEND with constant factor alpha 0: everything transparent
    sc.model.materials[0]["alphaMode"] = "BLEND"
    pbr = sc.model.materials[0]["pbrMetallicRoughness"]
    pbr["baseColorFactor"] = [1, 1, 1, 0.0]
    sc.parse_scene()
    cls = classify_attr_alpha(build_scene_flat(sc))
    assert (cls == ALPHA_TRANSPARENT).all()
    # BLEND with partial alpha: mixed (texture alpha 0/1 x factor 0.5)
    pbr["baseColorFactor"] = [1, 1, 1, 0.5]
    sc.parse_scene()
    cls = classify_attr_alpha(build_scene_flat(sc))
    assert cls[0] == ALPHA_MIXED  # 0.5 everywhere: neither >=1 nor <=0
    assert cls[1] == ALPHA_TRANSPARENT  # 0.5 * 0 = 0


def test_transparent_tris_culled_from_bvh():
    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    wb_full = build_world_bvh(flat)
    wb_cull = build_world_bvh(flat, tri_class=cls)
    assert wb_full.num_world_tris == 3
    assert wb_cull.num_world_tris == 2  # the always-transparent tri is gone
    # attr tables keep the FULL emit (rn_attr_base addressing unchanged)
    assert wb_cull.attr_rnode.shape == wb_full.attr_rnode.shape
    assert (np.asarray(wb_cull.rn_attr_base) == np.asarray(wb_full.rn_attr_base)).all()


def test_render_identical_with_and_without_classification():
    """The classified path (opaque fast path + transparent culling) must
    produce the same image as the exact stochastic-alpha path (SceneOmm
    contract: acceleration only, RENDERING_ARCHITECTURE.md:65-95)."""
    from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera

    from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera

    def render(mode):  # "subtri" | "whole" | "none"
        sc = make_masked_quads()
        r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
        r.scene = sc
        r.camera = fit_camera(sc)
        if mode == "none":
            r._alpha_classes = lambda: (None, None)
        elif mode == "whole":
            orig = r._alpha_classes
            r._alpha_classes = lambda: (orig()[0], None)
        r.rebuild_device_scene()
        if mode != "none":
            assert (np.asarray(r.bvh.attr_alpha_class) != 1).any()
        if mode == "subtri":
            # the straddling MIXED tri was split: virtual rows exist
            assert r.bvh.attr_rnode.shape[0] > 3
            assert (np.abs(np.asarray(r.bvh.attr_bary)
                           - np.array([0, 0, 1, 0, 0, 1], np.float32)) > 1e-6).any()
        for _ in range(3):
            r.on_render()
        return r.image_linear()

    a = render("subtri")
    w = render("whole")
    b = render("none")
    assert np.isfinite(a).all()
    # identical up to the re-trace epsilon (1e-4 step offsets in t); MASK
    # thresholds opacity to {0,1}, so the stochastic decisions are
    # realization-identical across the three acceleration levels
    np.testing.assert_allclose(w, b, atol=2e-3)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_material_edit_triggers_reclassification():
    """Flipping a MASK material to OPAQUE changes the classification ->
    the sync ladder must rebuild the BVH (un-culling the transparent tri),
    mirroring the reference's micromap rebuild on material edits."""
    from vk_gltf_renderer_tpu.models import DirtyFlags
    from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera

    sc = make_masked_quads()
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.scene = sc
    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    # tri 1 culled; tri 2 split into its non-transparent cells
    assert r.bvh.attr_rnode.shape[0] > 3
    n_before = r.bvh.num_world_tris
    assert n_before != 3
    sc.model.materials[0]["alphaMode"] = "OPAQUE"
    sc.mark_dirty(DirtyFlags.MATERIALS)
    assert r.sync_scene_changes()
    assert r.bvh.num_world_tris == 3  # transparent tri restored, split undone


# ------------------------------------------------------- subtriangle OMM

def test_classify_subtri_cells():
    """Level-2 cell classes on the straddling MIXED triangle: the left-half
    cells prove OPAQUE, the right-half cells prove TRANSPARENT, and the
    whole-class rows are stamped uniformly."""
    from vk_gltf_renderer_tpu.ops.omm import classify_subtri, subtri_corners

    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    cells = classify_subtri(flat, cls)
    assert cells.shape == (3, 16)
    assert (cells[0] == ALPHA_OPAQUE).all()       # whole-opaque row
    assert (cells[1] == ALPHA_TRANSPARENT).all()  # whole-transparent row
    mixed = cells[2]
    assert (mixed == ALPHA_TRANSPARENT).sum() >= 1
    assert (mixed == ALPHA_OPAQUE).sum() >= 1
    # conservativeness against the actual texture: tri 2's UVs are
    # u in [0.30, 0.70] (alpha=1 left of 0.5, 0 right); a cell may only be
    # OPAQUE if its whole dilated footprint is left of the seam and
    # TRANSPARENT only if right of it
    corners = subtri_corners(2)  # [16,3,2]
    uv_u = np.array([0.30, 0.70, 0.30])  # corner u of tri 2
    for ci in range(16):
        w = np.stack([1 - corners[ci, :, 0] - corners[ci, :, 1],
                      corners[ci, :, 0], corners[ci, :, 1]], axis=-1)
        us = w @ uv_u
        if mixed[ci] == ALPHA_OPAQUE:
            assert us.max() < 0.5 + 1.0 / 16
        if mixed[ci] == ALPHA_TRANSPARENT:
            assert us.min() > 0.5 - 2.0 / 16


def test_subtri_split_emission():
    """Splitting replaces the MIXED tri with its non-transparent cells:
    fewer covered area in the BVH, virtual attr rows with correct ids."""
    from vk_gltf_renderer_tpu.ops.omm import classify_subtri

    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    cells = classify_subtri(flat, cls)
    wb_whole = build_world_bvh(flat, tri_class=cls)
    wb_sub = build_world_bvh(flat, tri_class=cls, subtri_cells=cells)
    assert wb_whole.num_world_tris == 2
    n_emit = int((cells[2] != ALPHA_TRANSPARENT).sum())
    assert wb_sub.num_world_tris == 1 + n_emit
    assert 1 < wb_sub.num_world_tris < 17
    # total world-tri area shrinks (transparent cells culled)
    def area(wb):
        t = np.asarray(wb.tris)[: wb.num_world_tris]
        e1 = t[:, 3:6] - t[:, 0:3]
        e2 = t[:, 6:9] - t[:, 0:3]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    assert area(wb_sub) < area(wb_whole) - 1e-6
    # virtual rows: contiguous gids after the parent span, parent source id
    Ta = wb_sub.attr_rnode.shape[0]
    assert Ta == 3 + n_emit
    assert list(wb_sub.attr_tri[3:]) == [2] * n_emit  # bake source = parent
    # addressing: every BVH tri's (rnode, tri) resolves to its attr row
    for j in range(wb_sub.num_world_tris):
        rn = int(wb_sub.wtri_rnode[j])
        gid = int(wb_sub.wtri_tri[j])
        row = int(wb_sub.rn_attr_base[rn]) + gid
        assert 0 <= row < Ta
    # alpha classes per virtual row: no TRANSPARENT rows were emitted
    assert (np.asarray(wb_sub.attr_alpha_class[3:]) != ALPHA_TRANSPARENT).all()


def test_subtri_hitstate_exact():
    """A hit on a virtual subtri row must reconstruct EXACTLY the parent's
    hit state at the composed barycentrics (normals, uv, position) — the
    linear-recombination bake is exact, not approximate."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.hitstate import get_hit_state_fused
    from vk_gltf_renderer_tpu.ops.omm import classify_subtri

    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    cells = classify_subtri(flat, cls)
    wb = build_world_bvh(flat, tri_class=cls, subtri_cells=cells)
    Ta = wb.attr_rnode.shape[0]
    rd = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (Ta - 3, 1)), jnp.float32)
    rng = np.random.RandomState(0)
    u = rng.rand(Ta - 3).astype(np.float32) * 0.5
    v = rng.rand(Ta - 3).astype(np.float32) * 0.5
    gids = np.arange(3, Ta, dtype=np.int32)  # virtual gids (f=0, c=3)
    hit_sub = {"tri": jnp.asarray(gids), "rnode": jnp.zeros(Ta - 3, jnp.int32),
               "t": jnp.ones(Ta - 3), "u": jnp.asarray(u), "v": jnp.asarray(v)}
    hs_sub = get_hit_state_fused(jnp.asarray(wb.hit_attr),
                                 jnp.asarray(wb.rn_attr_base), hit_sub, rd)
    # composed parent barycentrics
    b = np.asarray(wb.attr_bary[3:])  # [S,6]
    up = b[:, 0] + u * (b[:, 2] - b[:, 0]) + v * (b[:, 4] - b[:, 0])
    vp = b[:, 1] + u * (b[:, 3] - b[:, 1]) + v * (b[:, 5] - b[:, 1])
    hit_par = {"tri": jnp.full(Ta - 3, 2, jnp.int32),
               "rnode": jnp.zeros(Ta - 3, jnp.int32),
               "t": jnp.ones(Ta - 3), "u": jnp.asarray(up), "v": jnp.asarray(vp)}
    hs_par = get_hit_state_fused(jnp.asarray(wb.hit_attr),
                                 jnp.asarray(wb.rn_attr_base), hit_par, rd)
    for k in ("pos", "nrm", "geonrm", "uv0", "color"):
        np.testing.assert_allclose(np.asarray(hs_sub[k]), np.asarray(hs_par[k]),
                                   atol=1e-5, err_msg=k)


def test_subtri_visit_count_reduction():
    """The measurable SceneOmm win (the reference's micromaps skip any-hit
    work in-traversal): rays through provably-transparent cells stop
    HITTING — the stochastic-alpha path then needs NO re-trace round, so
    total traversal work (packet-union visits summed over rounds) drops.
    Measured with the CPU packet-union cost simulator + the renderer's own
    alpha-class gate (a round only runs when some lane rejected)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from visit_count import packet_union_cost

    from vk_gltf_renderer_tpu.ops.omm import classify_subtri

    sc = make_masked_quads()
    flat = build_scene_flat(sc)
    cls = classify_attr_alpha(flat)
    cells = classify_subtri(flat, cls)
    wb_whole = build_world_bvh(flat, tri_class=cls)
    wb_sub = build_world_bvh(flat, tri_class=cls, subtri_cells=cells)

    # rays through the provably-TRANSPARENT region of the straddling tri
    # (corner u interp: u > 0.5 + dilation <=> x past ~4.7 at low y)
    n = 4096
    rng = np.random.RandomState(1)
    x = 4.75 + rng.rand(n) * 0.15
    y = rng.rand(n) * 0.05
    ro = np.stack([x, y, np.full(n, 3.0)], axis=-1).astype(np.float32)
    rd = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))

    def rounds_and_cost(wb):
        pops, leaf_rows, tri_tests = packet_union_cost(
            np.asarray(wb.nodes_i), np.asarray(wb.nodes_self),
            np.asarray(wb.tris), ro, rd, 1024)
        cost1 = pops + leaf_rows
        # does any lane hit non-opaque geometry (=> a re-trace round runs)?
        t = np.asarray(wb.tris)[: wb.num_world_tris]
        v0, e1, e2 = t[:, 0:3], t[:, 3:6] - t[:, 0:3], t[:, 6:9] - t[:, 0:3]
        any_hit = False
        for k in range(t.shape[0]):  # tiny scene: plain Moller-Trumbore
            p = np.cross(rd, e2[k])
            det = (e1[k] * p).sum(-1)
            ok = np.abs(det) > 1e-12
            inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            tv = ro - v0[k]
            u = (tv * p).sum(-1) * inv
            q = np.cross(tv, e1[k])
            v = (rd * q).sum(-1) * inv
            tt = (e2[k] * q).sum(-1) * inv
            if (ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 0)).any():
                any_hit = True
                break
        rounds = 2 if any_hit else 1  # hit on MIXED/TRANSPARENT -> re-trace
        return rounds, cost1 * rounds

    r_whole, c_whole = rounds_and_cost(wb_whole)
    r_sub, c_sub = rounds_and_cost(wb_sub)
    assert r_whole == 2  # transparent-region hits force a re-trace round
    assert r_sub == 1    # culled cells: rays MISS, no alpha round at all
    assert c_sub < c_whole


def test_subtri_refit_parity():
    """Transform-edit refit with virtual rows: the device rebake must equal
    a fresh host rebuild (geometry AND hit-attr rows)."""
    from vk_gltf_renderer_tpu.models import DirtyFlags
    from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera

    sc = make_masked_quads()
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.scene = sc
    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    assert r.bvh.attr_rnode.shape[0] > 3  # virtual rows present

    sc.model.nodes[0]["translation"] = [0.25, -0.5, 0.125]
    sc.mark_dirty(DirtyFlags.NODE_TRANSFORMS)
    assert r.sync_scene_changes()
    refit_bvh = r.bvh

    r2 = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r2.scene = sc
    r2.camera = r.camera
    r2.rebuild_device_scene()
    nt = r2.bvh.num_world_tris
    assert nt == refit_bvh.num_world_tris
    np.testing.assert_allclose(np.asarray(refit_bvh.tris)[:nt, :9],
                               np.asarray(r2.bvh.tris)[:nt, :9], atol=1e-5)
    np.testing.assert_allclose(np.asarray(refit_bvh.hit_attr),
                               np.asarray(r2.bvh.hit_attr), atol=1e-4)

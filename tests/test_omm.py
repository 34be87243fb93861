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

    def render(classified):
        sc = make_masked_quads()
        r = GltfRenderer(width=32, height=32, spp=1, max_depth=2)
        r.scene = sc
        r.camera = fit_camera(sc)
        if not classified:
            r._alpha_classes = lambda: None
        r.rebuild_device_scene()
        if classified:
            assert (np.asarray(r.bvh.attr_alpha_class) !=
                    np.ones(3, np.int8)).any()
        for _ in range(3):
            r.on_render()
        return r.image_linear()

    a = render(True)
    b = render(False)
    assert np.isfinite(a).all()
    # identical up to the re-trace epsilon (1e-4 step offsets in t)
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
    assert r.bvh.num_world_tris == 2
    sc.model.materials[0]["alphaMode"] = "OPAQUE"
    sc.mark_dirty(DirtyFlags.MATERIALS)
    assert r.sync_scene_changes()
    assert r.bvh.num_world_tris == 3  # transparent tri restored

"""Contract tests: dirty-flag -> device-sync behavior (the reference's
test_dirty_flags_and_render_nodes.cpp analog), accessor edge cases."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from conftest import make_triangle_gltf
from vk_gltf_renderer_tpu.models import DirtyFlags, Scene
from vk_gltf_renderer_tpu.models.editor import SceneEditor
from vk_gltf_renderer_tpu.models.gltf import load_model_from_json
from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera


def _renderer():
    gltf, bufs = make_triangle_gltf()
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, bufs))
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.scene = sc
    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    return r


def test_transform_edit_uses_refit_not_rebuild():
    r = _renderer()
    tris_before = r.bvh.tris
    ed = SceneEditor(r.scene)
    ed.set_translation(0, [2, 0, 0])
    assert r.sync_scene_changes()
    # device refit path: same topology object count, moved AABBs
    assert r.bvh.nodes_i.shape == (1, 8) or r.bvh.nodes_i[:, 3].sum() == r.bvh.num_world_tris
    np.testing.assert_allclose(np.asarray(r.bvh.nodes_self[0, 0:3]), [2, 0, 0], atol=1e-5)
    # instance matrices updated in the flat pytree
    np.testing.assert_allclose(np.asarray(r.flat.rn_o2w[0][:3, 3]), [2, 0, 0], atol=1e-6)
    assert r.total_samples == 0  # accumulation reset


def test_geometry_edit_forces_rebuild():
    r = _renderer()
    ed = SceneEditor(r.scene)
    ed.add_primitive("cube")
    n_tris_before = r.bvh.num_world_tris
    assert r.sync_scene_changes()
    assert r.bvh.num_world_tris == n_tris_before + 12


def test_material_edit_updates_flat_only():
    r = _renderer()
    bvh_before = r.bvh
    r.scene.model.materials[0]["pbrMetallicRoughness"]["baseColorFactor"] = [0, 1, 0, 1]
    r.scene.mark_dirty(DirtyFlags.MATERIALS, materials=[0])
    assert r.sync_scene_changes()
    assert r.bvh is bvh_before  # BVH untouched
    np.testing.assert_allclose(
        np.asarray(r.flat.materials["base_color_factor"][0]), [0, 1, 0, 1]
    )


def test_clean_scene_no_sync():
    r = _renderer()
    assert not r.sync_scene_changes()


def test_visibility_change_falls_back_to_rebuild():
    r = _renderer()
    ed = SceneEditor(r.scene)
    ed.duplicate_node(0)
    r.sync_scene_changes()
    tris_2 = r.bvh.num_world_tris
    ed.set_visibility(0, False)
    r.sync_scene_changes()
    assert r.bvh.num_world_tris == tris_2 - 1  # hidden instance excluded


# ------------------------------------------------------- accessor edge cases
def test_sparse_accessor(triangle_model):
    from vk_gltf_renderer_tpu.models.accessors import read_accessor

    g = triangle_model.gltf
    b = triangle_model.buffers[0]
    idx = np.array([1], np.uint16)
    vals = np.array([[9, 9, 9]], np.float32)
    off_i = len(b); b.extend(idx.tobytes())
    off_v = len(b); b.extend(vals.tobytes())
    g["buffers"][0]["byteLength"] = len(b)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": off_i, "byteLength": idx.nbytes},
        {"buffer": 0, "byteOffset": off_v, "byteLength": vals.nbytes},
    ]
    g["accessors"][0] = dict(g["accessors"][0])
    g["accessors"][0]["sparse"] = {
        "count": 1,
        "indices": {"bufferView": len(g["bufferViews"]) - 2, "componentType": 5123},
        "values": {"bufferView": len(g["bufferViews"]) - 1},
    }
    out = read_accessor(triangle_model, 0)
    np.testing.assert_allclose(out[1], [9, 9, 9])
    np.testing.assert_allclose(out[0], [0, 0, 0])


def test_interleaved_accessor(triangle_model):
    from vk_gltf_renderer_tpu.models.accessors import read_accessor

    g = triangle_model.gltf
    b = triangle_model.buffers[0]
    # interleave pos3 + uv2 per vertex: stride 20
    data = np.zeros((3, 5), np.float32)
    data[:, :3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    data[:, 3:] = [[0, 0], [1, 0], [0, 1]]
    off = len(b); b.extend(data.tobytes())
    g["buffers"][0]["byteLength"] = len(b)
    g["bufferViews"].append({"buffer": 0, "byteOffset": off, "byteLength": data.nbytes, "byteStride": 20})
    bv = len(g["bufferViews"]) - 1
    g["accessors"] += [
        {"bufferView": bv, "byteOffset": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
        {"bufferView": bv, "byteOffset": 12, "componentType": 5126, "count": 3, "type": "VEC2"},
    ]
    pos = read_accessor(triangle_model, len(g["accessors"]) - 2)
    uv = read_accessor(triangle_model, len(g["accessors"]) - 1)
    np.testing.assert_allclose(pos[1], [1, 0, 0])
    np.testing.assert_allclose(uv[2], [0, 1])


def test_normalized_accessor(triangle_model):
    from vk_gltf_renderer_tpu.models.accessors import read_accessor

    g = triangle_model.gltf
    b = triangle_model.buffers[0]
    q = np.array([[0, 127, 255]], np.uint8)
    off = len(b); b.extend(q.tobytes())
    g["buffers"][0]["byteLength"] = len(b)
    g["bufferViews"].append({"buffer": 0, "byteOffset": off, "byteLength": 3})
    g["accessors"].append({"bufferView": len(g["bufferViews"]) - 1, "componentType": 5121, "count": 1, "type": "VEC3", "normalized": True})
    out = read_accessor(triangle_model, len(g["accessors"]) - 1)
    np.testing.assert_allclose(out[0], [0, 127 / 255, 1.0], atol=1e-6)


def test_orthographic_camera_render():
    gltf, bufs = make_triangle_gltf()
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, bufs))
    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.scene = sc
    cam = fit_camera(sc)
    cam.orthographic = True
    cam.xmag = cam.ymag = 1.0
    r.camera = cam
    r.rebuild_device_scene()
    r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all()
    solid = np.asarray(r._last_aux["solid"]).reshape(24, 24)
    assert solid.any()


def test_material_edit_surgical_sync_matches_full_rebuild():
    """MATERIALS-dirty sync must produce the same image as a from-scratch
    rebuild (the surgical refresh_materials path vs build_scene_flat)."""
    import numpy as np

    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    def render_after_edit(surgical: bool):
        r = GltfRenderer(width=48, height=48, spp=1, max_depth=2)
        r.create_scene("/root/reference/resources/shader_ball.gltf")
        r.on_render()
        m = r.scene.model.materials[0]
        m.setdefault("pbrMetallicRoughness", {})["baseColorFactor"] = [0.1, 0.9, 0.2, 1.0]
        m["pbrMetallicRoughness"]["metallicFactor"] = 0.0
        from vk_gltf_renderer_tpu.models import DirtyFlags

        r.scene.mark_dirty(DirtyFlags.MATERIALS)
        if surgical:
            r.sync_scene_changes()
        else:
            r.rebuild_device_scene()
            r.reset_frame()
        r.on_render()
        return np.asarray(r.image_linear())

    a = render_after_edit(True)
    b = render_after_edit(False)
    assert np.isfinite(a).all()
    assert np.allclose(a, b, atol=1e-5), f"max diff {np.abs(a - b).max()}"

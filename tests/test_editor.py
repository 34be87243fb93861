"""Editor / undo / validator / merger tests — mirrors the reference's
test_basic_editing.cpp, test_index_remapping_basic.cpp,
test_node_hierarchy_operations.cpp, undo_redo coverage, and
test_animation_and_validation.cpp (validator part)."""

import numpy as np
import pytest

from vk_gltf_renderer_tpu.models import DirtyFlags, Scene
from vk_gltf_renderer_tpu.models.editor import SceneEditor
from vk_gltf_renderer_tpu.models.gltf import load_model_from_json
from vk_gltf_renderer_tpu.models.merger import instance_subtree, merge_model
from vk_gltf_renderer_tpu.models.undo import SnapshotCommand, TransformCommand, UndoStack
from vk_gltf_renderer_tpu.models.validator import validate_model

from conftest import make_triangle_gltf


def _scene():
    gltf, bufs = make_triangle_gltf()
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, bufs))
    sc.clear_dirty_flags()
    return sc


# ------------------------------------------------------------------ editor
def test_set_translation_marks_dirty():
    sc = _scene()
    ed = SceneEditor(sc)
    ed.set_translation(0, [1, 2, 3])
    assert DirtyFlags.NODE_TRANSFORMS in sc.get_dirty_flags()
    sc.parse_scene()
    np.testing.assert_allclose(sc.render_nodes[0].world_matrix[:3, 3], [1, 2, 3])


def test_add_and_delete_primitive_node():
    sc = _scene()
    ed = SceneEditor(sc)
    nid = ed.add_primitive("cube", name="MyCube")
    sc.parse_scene()
    assert len(sc.render_nodes) == 2
    ed.delete_node(nid)
    sc.parse_scene()
    assert len(sc.render_nodes) == 1
    v = validate_model(sc.model)
    assert v.valid, v.errors


def test_delete_remaps_all_indices():
    sc = _scene()
    ed = SceneEditor(sc)
    a = ed.add_primitive("plane")
    b = ed.add_primitive("sphere", segments=4)
    sc.parse_scene()
    n_before = len(sc.model.nodes)
    ed.delete_node(0)  # delete the FIRST node; everything shifts down
    assert len(sc.model.nodes) == n_before - 1
    sc.parse_scene()
    v = validate_model(sc.model)
    assert v.valid, v.errors
    # remaining meshes render fine
    assert len(sc.render_nodes) == 2


def test_duplicate_node_shares_mesh():
    sc = _scene()
    ed = SceneEditor(sc)
    new_id = ed.duplicate_node(0)
    assert sc.model.nodes[new_id]["mesh"] == sc.model.nodes[0]["mesh"]
    sc.parse_scene()
    assert len(sc.render_nodes) == 2
    assert len(sc.render_primitives) == 1  # dedup: same accessors


def test_reparent_preserves_world_transform():
    sc = _scene()
    ed = SceneEditor(sc)
    parent = ed.add_node(name="holder", translation=[5, 0, 0])
    sc.parse_scene()
    ed.set_translation(0, [1, 1, 1])
    sc.parse_scene()
    world_before = sc.world_matrices[0].copy()
    ed.reparent_node(0, parent)
    sc.parse_scene()
    np.testing.assert_allclose(sc.world_matrices[0], world_before, atol=1e-5)
    assert 0 in sc.model.nodes[parent]["children"]


def test_add_light():
    sc = _scene()
    ed = SceneEditor(sc)
    ed.add_light("point", intensity=55.0, translation=[0, 3, 0])
    sc.parse_scene()
    assert len(sc.render_lights) == 1
    lights = sc.model.gltf["extensions"]["KHR_lights_punctual"]["lights"]
    assert lights[0]["intensity"] == 55.0


def test_visibility_toggle():
    sc = _scene()
    ed = SceneEditor(sc)
    ed.set_visibility(0, False)
    sc.parse_scene()
    assert not sc.render_nodes[0].visible


# ------------------------------------------------------------------ undo
def test_undo_redo_transform():
    sc = _scene()
    stack = UndoStack(sc)
    stack.execute(TransformCommand(0, "translation", [2, 0, 0]))
    assert sc.model.nodes[0]["translation"] == [2, 0, 0]
    stack.undo()
    assert sc.model.nodes[0].get("translation", [0, 0, 0]) == [0, 0, 0]
    stack.redo()
    assert sc.model.nodes[0]["translation"] == [2, 0, 0]


def test_undo_merge_continuous():
    sc = _scene()
    stack = UndoStack(sc)
    c1 = TransformCommand(0, "translation", [1, 0, 0])
    c1.execute(sc)
    stack.push_executed(c1)
    c2 = TransformCommand(0, "translation", [2, 0, 0])
    c2.execute(sc)
    stack.push_executed(c2)  # merges into c1
    assert len(stack._undo) == 1
    stack.undo()
    assert sc.model.nodes[0].get("translation", [0, 0, 0]) == [0, 0, 0]


def test_undo_structural_snapshot():
    sc = _scene()
    stack = UndoStack(sc)

    def do_delete(scene):
        SceneEditor(scene).delete_node(0)

    stack.execute(SnapshotCommand(action=do_delete, label="delete node 0"))
    assert len(sc.model.nodes) == 0
    stack.undo()
    assert len(sc.model.nodes) == 1
    sc.parse_scene()
    assert len(sc.render_nodes) == 1


# ------------------------------------------------------------------ validator
def test_validator_catches_bad_indices():
    sc = _scene()
    sc.model.nodes[0]["mesh"] = 99
    v = validate_model(sc.model)
    assert not v.valid
    assert any("mesh 99" in e for e in v.errors)


def test_validator_catches_accessor_overrun():
    sc = _scene()
    sc.model.accessors[0]["count"] = 10_000
    v = validate_model(sc.model)
    assert not v.valid


def test_validator_ok_on_reference_assets(box_glb):
    from vk_gltf_renderer_tpu.models.gltf import load_model

    v = validate_model(load_model(box_glb))
    assert v.valid, v.errors


# ------------------------------------------------------------------ merger
def test_merge_two_scenes():
    sc1 = _scene()
    gltf2, bufs2 = make_triangle_gltf()
    gltf2["nodes"][0]["translation"] = [10, 0, 0]
    m2 = load_model_from_json(gltf2, bufs2)
    info = merge_model(sc1.model, m2)
    assert len(info["root_nodes"]) == 1
    sc1.parse_scene()
    assert len(sc1.render_nodes) == 2
    v = validate_model(sc1.model)
    assert v.valid, v.errors
    np.testing.assert_allclose(sc1.render_nodes[1].world_matrix[:3, 3], [10, 0, 0])


def test_instance_subtree_shares_geometry():
    sc = _scene()
    n_acc = len(sc.model.accessors)
    roots = instance_subtree(sc.model, [0], transform=np.eye(4).T.reshape(-1))
    sc.parse_scene()
    assert len(sc.render_nodes) == 2
    assert len(sc.model.accessors) == n_acc  # geometry shared
    assert len(sc.render_primitives) == 1


# ------------------------------------------------------------- compaction
def test_compact_model_removes_orphans():
    from vk_gltf_renderer_tpu.models.compact import compact_buffers, compact_model
    from vk_gltf_renderer_tpu.models.validator import validate_model

    sc = _scene()
    ed = SceneEditor(sc)
    nid = ed.add_primitive("sphere", segments=6)
    ed.delete_node(nid)  # orphan mesh/material/accessors remain
    counts = compact_model(sc.model)
    assert counts["meshes"] >= 1 and counts["materials"] >= 1
    saved = compact_buffers(sc.model)
    assert saved > 0
    v = validate_model(sc.model)
    assert v.valid, v.errors
    sc.parse_scene()
    assert len(sc.render_nodes) == 1


def test_obj_converter(tmp_path):
    from vk_gltf_renderer_tpu.models.obj_converter import load_obj
    from vk_gltf_renderer_tpu.models.validator import validate_model

    (tmp_path / "m.mtl").write_text("newmtl red\nKd 1 0 0\nNs 10\n")
    (tmp_path / "t.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl red\nf 1/1/1 2/2/1 3/3/1 4/4/1\n"
    )
    model = load_obj(tmp_path / "t.obj")
    v = validate_model(model)
    assert v.valid, v.errors
    sc = Scene()
    sc.load_from_model(model)
    assert len(sc.render_nodes) == 1
    assert sc.render_primitives[0].index_count == 6  # quad fanned to 2 tris
    assert sc.model.materials[0]["pbrMetallicRoughness"]["baseColorFactor"][:3] == [1, 0, 0]


def test_external_assets(tmp_path):
    from vk_gltf_renderer_tpu.models.external_assets import is_read_only_node
    from vk_gltf_renderer_tpu.models.gltf import save_model

    # child asset on disk
    gltf2, bufs2 = make_triangle_gltf()
    child = load_model_from_json(gltf2, bufs2)
    save_model(child, tmp_path / "child.gltf")

    # parent with two references to the same asset
    parent = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "ref1", "extras": {"externalAsset": "child.gltf"}},
            {"name": "ref2", "translation": [5, 0, 0], "extras": {"externalAsset": "child.gltf"}},
        ],
    }
    import json

    (tmp_path / "parent.gltf").write_text(json.dumps(parent))
    sc = Scene()
    sc.load(tmp_path / "parent.gltf")
    assert len(sc.referenced_assets) == 2
    assert len(sc.render_nodes) == 2  # one per instance
    # second instance shares geometry (one render primitive)
    assert len(sc.render_primitives) == 1
    np.testing.assert_allclose(sc.render_nodes[1].world_matrix[:3, 3], [5, 0, 0])
    # merged subtree nodes are read-only; instance nodes editable
    sub = sc.referenced_assets[0].subtree_nodes[0]
    assert is_read_only_node(sc, sub)
    assert not is_read_only_node(sc, 0)


def test_render_node_registry():
    sc = _scene()
    ed = SceneEditor(sc)
    ed.add_primitive("cube")
    sc.parse_scene()
    reg = sc.registry
    rid = reg.get_render_node_id(0, 0)
    assert rid >= 0
    assert reg.get_node_and_prim(rid) == (0, 0)
    assert rid in reg.render_nodes_for_node(0)


def test_pick_honors_node_selectability():
    """KHR_node_selectability: unselectable nodes are pick-transparent."""
    import numpy as np

    from conftest import make_triangle_gltf
    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.gltf import load_model_from_json
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    gltf, bufs = make_triangle_gltf()
    r = GltfRenderer(width=32, height=32, spp=1, max_depth=1)
    sc = Scene()
    sc.load_from_model(load_model_from_json(gltf, bufs))
    r.scene = sc
    from vk_gltf_renderer_tpu.renderer import fit_camera

    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    r.on_render()
    hit = next(
        ((x, y) for y in range(0, 32, 2) for x in range(0, 32, 2) if r.pick(x, y) >= 0),
        None,
    )
    assert hit is not None  # the triangle is on screen somewhere
    rid = r.pick(*hit)

    node_id = sc.render_nodes[rid].ref_node_id
    sc.model.nodes[node_id].setdefault("extensions", {})["KHR_node_selectability"] = {
        "selectable": False
    }
    assert r.pick(*hit) == -1

"""spp-batched launches (RenderConfig.spp_batch): all spp samples traced as
one n*spp-lane batch. Tests pin the ORDERING contract (pixel-grouped
reduction on the compact path, sample-major on the wavefront path) using a
deterministic emissive scene where every sample returns the same radiance —
any lane-order mistake scrambles the two-color pattern."""

import numpy as np
import pytest

import vk_gltf_renderer_tpu.ops.pathtrace as pt
from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.editor import SceneEditor
from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera


def two_color_scene():
    """Two emissive UNLIT quads side by side filling the view: left green,
    right magenta — radiance is jitter/RNG independent inside each quad."""
    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    # hide the Box mesh: its lit shading is RNG-dependent, the unlit quads
    # are not — determinism is the point of this scene
    for nid, node in enumerate(sc.model.nodes):
        if node.get("mesh") is not None:
            ed.set_visibility(nid, False)
    half = float(np.sin(np.pi / 4))
    quads = []
    for x, rgb in ((-10.0, [0, 1, 0]), (10.0, [1, 0, 1])):
        nid = ed.add_primitive("plane")
        ed.set_rotation(nid, [half, 0.0, 0.0, float(np.cos(np.pi / 4))])
        ed.set_scale(nid, [10.0, 10.0, 10.0])
        ed.set_translation(nid, [x, 0.0, 0.0])
        mid = len(sc.model.materials)
        sc.model.materials.append({
            "pbrMetallicRoughness": {"baseColorFactor": rgb + [1.0]},
            "emissiveFactor": [0, 0, 0],
            "extensions": {"KHR_materials_unlit": {}},
        })
        ed.set_material(nid, 0, mid)
        quads.append(nid)
    sc.model.gltf.setdefault("extensionsUsed", []).append("KHR_materials_unlit")
    sc.parse_scene()
    return sc


def render(spp_batch: bool, monkeypatch=None, force_compact=False, spp=4):
    import os

    sc = two_color_scene()
    if spp_batch:
        os.environ["VKGR_SPP_BATCH"] = "1"
    else:
        os.environ.pop("VKGR_SPP_BATCH", None)
    if force_compact:
        os.environ["VKGR_TRAVERSAL"] = "packet"
        os.environ["VKGR_PALLAS_INTERPRET"] = "1"
    try:
        r = GltfRenderer(width=32, height=32, spp=spp, max_depth=2)
        r.scene = sc
        cam = fit_camera(sc)
        cam.eye = np.array([0.0, 0.0, 3.0])
        cam.center = np.array([0.0, 0.0, 0.0])
        r.camera = cam
        r.rebuild_device_scene()
        r.on_render()
        return np.asarray(r.image_linear()).reshape(32, 32, 3)
    finally:
        os.environ.pop("VKGR_SPP_BATCH", None)
        if force_compact:
            os.environ.pop("VKGR_TRAVERSAL", None)
            os.environ.pop("VKGR_PALLAS_INTERPRET", None)


def test_spp_batch_matches_scan_on_deterministic_scene():
    """Unlit emissive quads: every sample of an interior pixel returns the
    same radiance, so batched == scan exactly there (plumbing test: a
    reshape in the wrong order scrambles left/right colors)."""
    a = render(False)
    b = render(True)
    # interior pixels (away from quad borders hit by AA jitter)
    assert np.isfinite(b).all()
    diff = np.abs(a[4:28, 4:12] - b[4:28, 4:12]).max()
    assert diff < 1e-5
    diff = np.abs(a[4:28, 20:28] - b[4:28, 20:28]).max()
    assert diff < 1e-5
    # pattern sanity: left green-ish, right magenta-ish in BOTH
    for img in (a, b):
        left = img[10:22, 4:12].mean(axis=(0, 1))
        right = img[10:22, 20:28].mean(axis=(0, 1))
        assert left[1] > left[0] and left[1] > left[2]
        assert right[0] > right[1] and right[2] > right[1]


def test_spp_batch_compact_restore_grouping(monkeypatch):
    """Compact path (pixel-keyed restore with spp duplicates): lower the
    compact threshold so a 32x32x4 batch takes the compact-frame path with
    the packet kernel in interpret mode; the pixel-grouped reduction must
    reproduce the same two-color image."""
    monkeypatch.setattr(pt, "COMPACT_MIN_LANES", 1024)
    a = render(False)
    b = render(True, force_compact=True)
    assert np.isfinite(b).all()
    diff = np.abs(a[4:28, 4:12] - b[4:28, 4:12]).max()
    assert diff < 1e-5
    right_a = a[10:22, 20:28].mean(axis=(0, 1))
    right_b = b[10:22, 20:28].mean(axis=(0, 1))
    assert right_b[0] > right_b[1] and right_b[2] > right_b[1]
    np.testing.assert_allclose(right_a, right_b, atol=1e-5)

"""Preview-renderer parity features (ops/preview.py): transmission
continuation (the screen-space-refraction role, renderer_rasterizer.cpp:949),
alpha-BLEND over-compositing (the sorted-blend role, :1020), and the
barycentric wireframe overlay (the WIREFRAME shader-variant role)."""

import numpy as np
import pytest

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.editor import SceneEditor
from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera


def two_plane_scene(front_material: dict):
    """A small front square in front of a big red back wall, camera looking
    straight through the front square's center."""
    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    # delete the Box content: keep it simple, just add two planes
    front = ed.add_primitive("plane")
    back = ed.add_primitive("plane")
    # plane is XZ by default; rotate to face the camera (normal +Z)
    half = float(np.sin(np.pi / 4))
    for nid in (front, back):
        ed.set_rotation(nid, [half, 0.0, 0.0, float(np.cos(np.pi / 4))])
    ed.set_translation(front, [0.0, 0.0, 1.0])
    ed.set_scale(front, [0.6, 0.6, 0.6])
    ed.set_translation(back, [0.0, 0.0, -1.0])
    ed.set_scale(back, [4.0, 4.0, 4.0])
    m_front = len(sc.model.materials)
    sc.model.materials.append(front_material)
    m_back = len(sc.model.materials)
    sc.model.materials.append({
        "pbrMetallicRoughness": {"baseColorFactor": [1.0, 0.0, 0.0, 1.0],
                                 "roughnessFactor": 1.0, "metallicFactor": 0.0},
    })
    ed.set_material(front, 0, m_front)
    ed.set_material(back, 0, m_back)
    # hide the original Box node (node 0 tree)
    sc.parse_scene()
    return sc, front, back


def render_preview_scene(sc, wireframe=False):
    r = GltfRenderer(width=48, height=48, spp=1, max_depth=2, render_system=1)
    r.scene = sc
    cam = fit_camera(sc)
    cam.eye = np.array([0.0, 0.0, 6.0])
    cam.center = np.array([0.0, 0.0, 0.0])
    r.camera = cam
    r.wireframe = wireframe
    r.rebuild_device_scene()
    r.on_render()
    return np.asarray(r.image_linear()).reshape(48, 48, 3)


def test_preview_transmission_shows_surface_behind():
    """A transmissive front plane must show the red back wall through it
    (the raster path's screen-space refraction capture role)."""
    glass = {
        "pbrMetallicRoughness": {"baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                                 "roughnessFactor": 0.05, "metallicFactor": 0.0},
        "extensions": {"KHR_materials_transmission": {"transmissionFactor": 1.0}},
    }
    opaque = {
        "pbrMetallicRoughness": {"baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                                 "roughnessFactor": 0.05, "metallicFactor": 0.0},
    }
    sc_g, *_ = two_plane_scene(glass)
    sc_g.model.gltf.setdefault("extensionsUsed", []).append("KHR_materials_transmission")
    sc_g.parse_scene()
    img_glass = render_preview_scene(sc_g)
    sc_o, *_ = two_plane_scene(opaque)
    img_opaque = render_preview_scene(sc_o)
    c_g = img_glass[20:28, 20:28].mean(axis=(0, 1))
    c_o = img_opaque[20:28, 20:28].mean(axis=(0, 1))
    assert np.isfinite(img_glass).all()
    # through the glass: red dominates (the back wall); opaque: whiteish
    assert c_g[0] > c_g[1] * 1.5 and c_g[0] > c_g[2] * 1.5
    assert abs(c_o[1] - c_o[2]) < 0.25 * max(c_o[1], c_o[2], 1e-3)


def test_preview_blend_composites_over_background():
    """An alpha-0.3 BLEND front plane: the center color must be ~70% of the
    back wall's shade mixed with 30% surface (sorted-blend role)."""
    blend = {
        "pbrMetallicRoughness": {"baseColorFactor": [0.0, 0.0, 1.0, 0.3],
                                 "roughnessFactor": 1.0, "metallicFactor": 0.0},
        "alphaMode": "BLEND",
    }
    sc, *_ = two_plane_scene(blend)
    img = render_preview_scene(sc)
    c = img[20:28, 20:28].mean(axis=(0, 1))
    assert np.isfinite(img).all()
    assert c[0] > 0.05  # the red wall shows through
    solid = dict(blend)
    solid = {
        "pbrMetallicRoughness": {"baseColorFactor": [0.0, 0.0, 1.0, 1.0],
                                 "roughnessFactor": 1.0, "metallicFactor": 0.0},
    }
    sc2, *_ = two_plane_scene(solid)
    img2 = render_preview_scene(sc2)
    c2 = img2[20:28, 20:28].mean(axis=(0, 1))
    assert c[0] > c2[0] + 0.02  # opaque blue blocks the red entirely


def test_preview_wireframe_darkens_edges():
    opaque = {
        "pbrMetallicRoughness": {"baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                                 "roughnessFactor": 1.0, "metallicFactor": 0.0},
    }
    sc, *_ = two_plane_scene(opaque)
    plain = render_preview_scene(sc)
    sc2, *_ = two_plane_scene(opaque)
    wire = render_preview_scene(sc2, wireframe=True)
    assert np.isfinite(wire).all()
    # wireframe only darkens; some pixels change, most stay identical
    assert (wire <= plain + 1e-5).all()
    changed = (np.abs(wire - plain).max(axis=-1) > 1e-3).mean()
    assert 0.001 < changed < 0.6

"""Transform-gizmo interaction math (vk_gltf_renderer_tpu/gizmo.py) —
the headless equivalent of the reference's gizmo_transform_vk.cpp: axis /
plane / ring handle picking, drag deltas, snapping, local/world spaces,
editor application. Driven with synthetic camera rays; exact expected
deltas are asserted (the math is closed-form)."""

import numpy as np
import pytest

from vk_gltf_renderer_tpu import gizmo
from vk_gltf_renderer_tpu.gizmo import (
    AXIS_X, AXIS_Y, PLANE_XY, RING_Z, UNIFORM, DragState, Mode, Snap, Space,
)


def look_ray(eye, target):
    eye = np.asarray(eye, float)
    d = np.asarray(target, float) - eye
    return eye, d / np.linalg.norm(d)


def test_pick_axis_and_plane_handles():
    pivot = np.zeros(3)
    axes = np.eye(3)
    # ray aimed at a point on the +X axis from the front
    ro, rd = look_ray([0.6, 0.05, 5.0], [0.6, 0.0, 0.0])
    assert gizmo.pick_handle(ro, rd, pivot, axes, Mode.TRANSLATE) == AXIS_X
    # ray through the XY plane quad (u, v in [0.25, 0.6])
    ro, rd = look_ray([0.4, 0.4, 5.0], [0.4, 0.4, 0.0])
    assert gizmo.pick_handle(ro, rd, pivot, axes, Mode.TRANSLATE) == PLANE_XY
    # far miss
    ro, rd = look_ray([4.0, 4.0, 5.0], [4.0, 4.0, 0.0])
    assert gizmo.pick_handle(ro, rd, pivot, axes, Mode.TRANSLATE) is None


def test_pick_ring():
    pivot = np.zeros(3)
    axes = np.eye(3)
    # Z ring has radius == size; aim at a point on the unit circle in XY
    p = np.array([np.cos(0.7), np.sin(0.7), 0.0])
    ro, rd = look_ray(p + [0, 0, 5.0], p)
    assert gizmo.pick_handle(ro, rd, pivot, axes, Mode.ROTATE) == RING_Z


def test_axis_drag_translate_exact_and_snapped():
    pivot = np.zeros(3)
    axes = np.eye(3)
    ro0, rd0 = look_ray([0.5, 0.0, 5.0], [0.5, 0.0, 0.0])
    st = gizmo.begin_drag(ro0, rd0, pivot, axes, AXIS_X)
    # move the mouse so the closest axis point lands at x = 1.73
    ro1, rd1 = look_ray([1.73, 0.0, 5.0], [1.73, 0.0, 0.0])
    d = gizmo.drag_delta(st, ro1, rd1)
    np.testing.assert_allclose(d["translate"], [1.23, 0.0, 0.0], atol=1e-9)
    d = gizmo.drag_delta(st, ro1, rd1, Snap(translate=0.5))
    np.testing.assert_allclose(d["translate"], [1.0, 0.0, 0.0], atol=1e-9)


def test_plane_drag_constrained_to_plane():
    pivot = np.zeros(3)
    axes = np.eye(3)
    ro0, rd0 = look_ray([0.3, 0.3, 5.0], [0.3, 0.3, 0.0])
    st = gizmo.begin_drag(ro0, rd0, pivot, axes, PLANE_XY)
    ro1, rd1 = look_ray([0.9, -0.2, 5.0], [0.9, -0.2, 0.0])
    d = np.asarray(gizmo.drag_delta(st, ro1, rd1)["translate"])
    np.testing.assert_allclose(d, [0.6, -0.5, 0.0], atol=1e-9)
    assert abs(d[2]) < 1e-12  # never leaves the plane


def test_ring_drag_angle_and_snap():
    pivot = np.zeros(3)
    axes = np.eye(3)
    a0, a1 = 0.3, 1.1
    p0 = np.array([np.cos(a0), np.sin(a0), 0.0])
    p1 = np.array([np.cos(a1), np.sin(a1), 0.0])
    ro0, rd0 = look_ray(p0 + [0, 0, 5.0], p0)
    st = gizmo.begin_drag(ro0, rd0, pivot, axes, RING_Z)
    ro1, rd1 = look_ray(p1 + [0, 0, 5.0], p1)
    d = gizmo.drag_delta(st, ro1, rd1)
    assert d["rotate_axis"] == [0.0, 0.0, 1.0]
    np.testing.assert_allclose(d["rotate_angle"], a1 - a0, atol=1e-9)
    d = gizmo.drag_delta(st, ro1, rd1, Snap(rotate_deg=45.0))
    np.testing.assert_allclose(d["rotate_angle"], np.radians(45.0), atol=1e-9)


def test_uniform_scale_drag():
    pivot = np.zeros(3)
    axes = np.eye(3)
    ro0, rd0 = look_ray([1.0, 0.0, 5.0], [1.0, 0.0, 0.0])
    st = gizmo.begin_drag(ro0, rd0, pivot, axes, UNIFORM)
    ro1, rd1 = look_ray([2.5, 0.0, 5.0], [2.5, 0.0, 0.0])
    d = gizmo.drag_delta(st, ro1, rd1)
    np.testing.assert_allclose(d["scale"], [2.5, 2.5, 2.5], atol=1e-9)


def test_local_space_follows_node_rotation():
    """A node rotated 90deg about Z: its LOCAL x axis is world +Y, so a
    local-space X-axis drag must translate along world Y."""
    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    nid = ed.add_primitive("cube")
    half = np.sin(np.pi / 4)
    ed.set_rotation(nid, [0.0, 0.0, half, np.cos(np.pi / 4)])
    sc.parse_scene()
    pivot, axes = gizmo.handle_frame(sc, nid, Space.LOCAL)
    np.testing.assert_allclose(axes[0], [0.0, 1.0, 0.0], atol=1e-6)
    pivot_w, axes_w = gizmo.handle_frame(sc, nid, Space.WORLD)
    np.testing.assert_allclose(axes_w, np.eye(3), atol=1e-12)


def test_apply_delta_roundtrip_through_editor():
    """drag -> apply_delta -> node TRS; translation respects parent frame,
    rotation composes, scale multiplies."""
    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    nid = ed.add_primitive("cube")
    ed.set_translation(nid, [1.0, 0.0, 0.0])
    sc.parse_scene()

    t, r, s = gizmo.apply_delta(ed, nid, {"translate": [0.0, 2.0, 0.0]})
    np.testing.assert_allclose(t, [1.0, 2.0, 0.0], atol=1e-9)

    t, r, s = gizmo.apply_delta(
        ed, nid, {"rotate_axis": [0, 0, 1], "rotate_angle": np.pi / 2}
    )
    np.testing.assert_allclose(np.abs(r), [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-9)

    t, r, s = gizmo.apply_delta(ed, nid, {"scale": [2.0, 2.0, 2.0]})
    np.testing.assert_allclose(s, [2.0, 2.0, 2.0], atol=1e-9)
    t, r, s = gizmo.apply_delta(ed, nid, {"scale": [3.0, 3.0, 3.0]}, scale_axis=1)
    np.testing.assert_allclose(s, [2.0, 6.0, 2.0], atol=1e-9)

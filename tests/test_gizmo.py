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


# ---------------------------------------------------------------- rendering
# Gizmo handle RENDERING (ops/gizmo_draw.py) — the visual half the
# reference draws in gizmo_visuals.slang:1-118. Drawn over a flat gray
# frame with a known camera; assertions are on where each colored handle
# lands on screen and on the hover highlight.


def _overlay(mode, active=None, eye=(2.0, 1.5, 4.0), size=1.0, hw=96):
    from vk_gltf_renderer_tpu.ops.gizmo_draw import gizmo_overlay

    img = np.full((hw, hw, 3), 0.2, np.float32)
    return gizmo_overlay(img, eye, (0, 0, 0), (0, 1, 0), np.radians(45.0),
                         np.zeros(3), np.eye(3), mode, size=size,
                         active=active)


def _dominant(img, chan, thresh=0.25):
    """Mask of pixels where channel `chan` exceeds both others by thresh."""
    others = [c for c in range(3) if c != chan]
    return (img[..., chan] > img[..., others[0]] + thresh) & (
        img[..., chan] > img[..., others[1]] + thresh)


def test_gizmo_overlay_translate_axes_colors_and_placement():
    out = _overlay(Mode.TRANSLATE)
    h, w = out.shape[:2]
    red, green, blue = (_dominant(out, c) for c in range(3))
    # all three axis handles drawn
    assert red.sum() > 10 and green.sum() > 10 and blue.sum() > 10
    # +Y is up -> green pixels live in the UPPER half of the frame
    ys, _ = np.nonzero(green)
    assert ys.mean() < h / 2
    # pixels away from the gizmo are untouched
    assert np.allclose(out[0, 0], 0.2) and np.allclose(out[-1, -1], 0.2)
    # plane quads: translucent fills exist (blended, not pure axis color)
    filled = ((out > 0.21).any(-1) & ~(red | green | blue)).sum()
    assert filled > 20


def test_gizmo_overlay_projection_matches_pick_math():
    """The drawn +X tip must land where _Camera.project puts pivot+X*size;
    a camera ray through that pixel must PICK the X axis — drawn geometry
    and grab geometry agree (the whole point of sharing constants)."""
    from vk_gltf_renderer_tpu.ops.gizmo_draw import _Camera

    eye = (2.0, 1.5, 4.0)
    cam = _Camera(eye, (0, 0, 0), (0, 1, 0), np.radians(45.0), 96, 96)
    (tip,), (front,) = cam.project(np.array([[0.9, 0.0, 0.0]]))
    assert front
    out = _overlay(Mode.TRANSLATE)
    x, y = int(round(tip[0])), int(round(tip[1]))
    patch = out[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3]
    assert _dominant(patch, 0).any()  # red shaft/arrow at the projected tip
    # and the pick math agrees: a ray through that pixel grabs AXIS_X
    d = np.array([0.9, 0.0, 0.0]) - np.asarray(eye, float)
    ro, rd = np.asarray(eye, float), d / np.linalg.norm(d)
    assert gizmo.pick_handle(ro, rd, np.zeros(3), np.eye(3), Mode.TRANSLATE) == AXIS_X


def test_gizmo_overlay_highlight_and_modes():
    # active X handle -> yellow (R and G high, B low), plain red gone
    out = _overlay(Mode.TRANSLATE, active=AXIS_X)
    yellow = ((out[..., 0] > 0.8) & (out[..., 1] > 0.7) & (out[..., 2] < 0.5))
    assert yellow.sum() > 10
    # rotate: rings only — no filled plane quads, three ring colors present
    rings = _overlay(Mode.ROTATE)
    for c in range(3):
        assert _dominant(rings, c).sum() > 10
    # the Z ring (blue) encircles the pivot: blue pixels on both sides
    from vk_gltf_renderer_tpu.ops.gizmo_draw import _Camera

    cam = _Camera((2.0, 1.5, 4.0), (0, 0, 0), (0, 1, 0), np.radians(45.0), 96, 96)
    (c0,), _ = cam.project(np.zeros((1, 3)))
    blue = _dominant(rings, 2)
    xs = np.nonzero(blue)[1]
    assert (xs < c0[0]).any() and (xs > c0[0]).any()
    # scale: center uniform-cube drawn near the projected pivot
    sc = _overlay(Mode.SCALE)
    y0, x0 = int(round(c0[1])), int(round(c0[0]))
    patch = sc[max(y0 - 3, 0):y0 + 4, max(x0 - 3, 0):x0 + 4]
    assert (patch > 0.6).all(-1).any()  # whitish center cube


def test_viewer_gizmo_keys_and_verbs():
    """Viewer wiring: 'g' cycles gizmo modes (drawn on the frame), the
    ':gizmo' verb controls space and hover-pick, and the overlay actually
    changes displayed pixels (gizmo_transform_vk display role)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from vk_gltf_renderer_tpu.viewer import TerminalViewer

    v = TerminalViewer("/root/reference/resources/Box.glb", size=32,
                       render_system=1)
    base = v.frame_u8().astype(float)

    assert v.handle_key("t")  # tree pane selects node 0
    assert v.handle_key("g")
    assert v.gizmo_mode is not None and "+gizmo:translate" in v.status()
    with_gizmo = v.frame_u8().astype(float)
    assert np.abs(with_gizmo - base).max() > 10  # handles visibly drawn

    def type_cmd(line):
        assert v.handle_key(":")
        for ch in line:
            assert v.handle_key(ch)
        assert v.handle_key(";")

    # pick through the pixel under the +X tip -> highlight AXIS_X
    from vk_gltf_renderer_tpu.ops.gizmo_draw import _Camera, auto_size

    frame = v._gizmo_frame()
    assert frame is not None
    _, pivot, axes, size = frame
    cam = v.r.camera
    c = _Camera(cam.eye, cam.center, cam.up, cam.yfov, 32, 32)
    (tip,), (front,) = c.project(pivot[None] + axes[0][None] * size * 0.6)
    assert front
    type_cmd(f"gizmo pick {tip[0]:.2f} {tip[1]:.2f}")
    assert v.gizmo_active == AXIS_X
    assert any("pick -> 0" in ln for ln in v._last_out)

    type_cmd("gizmo space local")
    assert v.gizmo_space == "local"
    type_cmd("gizmo off")
    assert v.gizmo_mode is None and v.gizmo_active is None
    # 'g' cycles translate -> rotate -> scale -> off
    for expect in ("translate", "rotate", "scale"):
        v.handle_key("g")
        assert v.gizmo_mode.value == expect
    v.handle_key("g")
    assert v.gizmo_mode is None

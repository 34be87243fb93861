"""Reference-grid overlay — headless port of the gizmo grid's math.

The reference draws an infinite, antialiased, distance-faded world grid as
a raster pass (gizmo_grid_vk + gizmo_grid.slang:1-226: ray/plane hit,
minor/major line sets from screen-space derivatives, depth-tested against
the scene). A TPU host has no raster pass, so this module computes the
same quantities in numpy over the *displayed* frame: per-pixel camera
rays, the y = plane_y intersection, line coverage from the analytic pixel
footprint (the fwidth analog), and a depth test against the path tracer's
first-hit distance — then composites onto the tonemapped image.

Display-side by design: the grid is a viewer affordance, not scene
content, exactly like the reference (it never appears in headless
renders or goldens unless asked for).
"""

from __future__ import annotations

import numpy as np


def _line_coverage(coord: np.ndarray, footprint: np.ndarray, spacing: float) -> np.ndarray:
    """Antialiased coverage of grid lines at `spacing` world units.

    coord:     world coordinate along one axis            [H, W]
    footprint: world-units-per-pixel at that point        [H, W]
    Returns coverage in [0, 1]: 1 on a line center, 0 between lines,
    smoothly ramped over ~1 pixel (the slang fwidth/smoothstep recipe).
    """
    # distance to the nearest line, in world units
    d = np.abs(((coord / spacing + 0.5) % 1.0) - 0.5) * spacing
    # in pixels; lines are ~1.2 px wide like the reference grid
    px = d / np.maximum(footprint, 1e-12)
    return np.clip(1.2 - px, 0.0, 1.0)


def grid_overlay(
    img: np.ndarray,
    eye: np.ndarray,
    center: np.ndarray,
    up: np.ndarray,
    yfov: float,
    scene_depth: np.ndarray | None = None,
    plane_y: float = 0.0,
    spacing: float = 1.0,
    color=(0.62, 0.62, 0.62),
    major_color=(0.85, 0.85, 0.85),
    axis_x_color=(0.9, 0.35, 0.35),
    axis_z_color=(0.35, 0.5, 0.95),
    max_alpha: float = 0.55,
) -> np.ndarray:
    """Composite the world grid (y = plane_y) onto a [H, W, 3] float image.

    scene_depth: per-pixel distance eye->first hit (INF/NaN where the ray
    escaped); the grid only draws where it is CLOSER than the scene —
    the slang pass's depth test.
    """
    h, w = img.shape[:2]
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)

    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    cup = np.cross(right, fwd)

    t = np.tan(yfov * 0.5)
    ys = (0.5 - (np.arange(h) + 0.5) / h) * 2.0 * t            # +up at top
    xs = ((np.arange(w) + 0.5) / w - 0.5) * 2.0 * t * (w / h)  # aspect
    d = (
        fwd[None, None, :]
        + xs[None, :, None] * right[None, None, :]
        + ys[:, None, None] * cup[None, None, :]
    )
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)

    dy = dn[..., 1]
    hit = np.abs(dy) > 1e-9
    t_plane = np.where(hit, (plane_y - eye[1]) / np.where(hit, dy, 1.0), np.inf)
    front = hit & (t_plane > 0)

    px_world = t_plane * 2.0 * t / h  # pixel footprint at the hit (isotropic approx)
    gx = eye[0] + t_plane * dn[..., 0]
    gz = eye[2] + t_plane * dn[..., 2]

    minor = np.maximum(
        _line_coverage(gx, px_world, spacing), _line_coverage(gz, px_world, spacing)
    )
    major = np.maximum(
        _line_coverage(gx, px_world, spacing * 10.0),
        _line_coverage(gz, px_world, spacing * 10.0),
    )
    # world axes: a single line through the origin (distance to 0, not a
    # repeating set) — the x axis is the z = 0 line and vice versa
    ax_x = np.clip(1.2 - np.abs(gz) / np.maximum(px_world, 1e-12), 0.0, 1.0)
    ax_z = np.clip(1.2 - np.abs(gx) / np.maximum(px_world, 1e-12), 0.0, 1.0)

    # distance fade like the slang grid: gone by ~60 spacings
    fade = np.clip(1.0 - t_plane / (60.0 * spacing), 0.0, 1.0)

    if scene_depth is not None:
        depth = np.asarray(scene_depth, np.float64).reshape(h, w)
        visible = front & (~np.isfinite(depth) | (t_plane < depth))
    else:
        visible = front

    out = np.asarray(img, np.float32).copy()
    base = np.where(major > minor, major, minor * 0.6)
    col = np.empty((h, w, 3), np.float32)
    col[:] = np.asarray(color, np.float32)
    mj = (major >= minor)[..., None]
    col = np.where(mj, np.asarray(major_color, np.float32), col)
    col = np.where((ax_x > base)[..., None], np.asarray(axis_x_color, np.float32), col)
    col = np.where((ax_z > np.maximum(base, ax_x))[..., None], np.asarray(axis_z_color, np.float32), col)
    a = np.maximum(np.maximum(base, ax_x), ax_z) * fade * max_alpha
    a = np.where(visible, a, 0.0)[..., None].astype(np.float32)
    return out * (1.0 - a) + col * a

"""Camera ray generation (reference getRay, pathtrace_functions.h.slang:791-811)
plus thin-lens depth of field (gltf_pathtrace.slang:516-529).

Matrices follow column-vector convention (out = M @ v), f32-safe math only.
"""

from __future__ import annotations

import jax.numpy as jnp

from .traverse import dot3


def _mat4_vec4(m, v):
    return (
        m[:, 0] * v[..., 0, None]
        + m[:, 1] * v[..., 1, None]
        + m[:, 2] * v[..., 2, None]
        + m[:, 3] * v[..., 3, None]
    )


def generate_rays(sample_pos, jitter, image_size, proj_inv, view_inv, *, orthographic=False):
    """sample_pos: [N,2] pixel coords; jitter: [N,2] subpixel offset in [0,1).

    Returns (origins [N,3], dirs [N,3] normalized).
    """
    clip = (sample_pos + jitter) / image_size * 2.0 - 1.0  # [N,2]
    n = clip.shape[0]
    clip4 = jnp.concatenate([clip, jnp.full((n, 1), -1.0), jnp.ones((n, 1))], axis=-1)
    view = _mat4_vec4(proj_inv, clip4)
    view = view / view[..., 3:4]
    if orthographic:
        origins = _mat4_vec4(view_inv, view)[..., :3]
        fwd = _mat4_vec4(view_inv, jnp.array([0.0, 0.0, -1.0, 0.0]))[..., :3]
        dirs = jnp.broadcast_to(fwd / jnp.linalg.norm(fwd), origins.shape)
    else:
        origin = view_inv[:3, 3]
        world = _mat4_vec4(view_inv, view)[..., :3]
        d = world - origin
        dirs = d / jnp.sqrt(dot3(d, d))[..., None]
        origins = jnp.broadcast_to(origin, dirs.shape)
    return origins.astype(jnp.float32), dirs.astype(jnp.float32)


def apply_depth_of_field(origins, dirs, view_inv, focal_dist, aperture, u1, u2):
    """Thin-lens DoF: offset origin on the aperture disk, re-aim at the focal
    point (gltf_pathtrace.slang:516-529)."""
    theta = u1 * 2.0 * jnp.pi
    r = jnp.sqrt(u2 * aperture)
    cam_right = view_inv[:3, 0]
    cam_up = view_inv[:3, 1]
    offset = (jnp.cos(theta)[..., None] * cam_right + jnp.sin(theta)[..., None] * cam_up) * r[..., None]
    focal_point = focal_dist * dirs
    new_dir = focal_point - offset
    new_dir = new_dir / jnp.sqrt(dot3(new_dir, new_dir))[..., None]
    return origins + offset, new_dir


def pixel_angle(fovy: float, image_height: int) -> float:
    """Angular size of one pixel (push-constant pixelAngle,
    renderer_pathtracer.cpp:1567-1571) — drives ray-cone texture LOD."""
    import numpy as np

    return float(2.0 * np.tan(fovy * 0.5) / image_height)

"""Punctual light sampling (KHR_lights_punctual).

In-repo replacement for nvpro's light_contrib.h.slang singleLightContribution
(consumed at pathtrace_functions.h.slang:406): directional lights with
angular size (cone-sampled soft sun), point/spot with radius (sphere-sampled
soft shadows), spot cone falloff, inverse-square with range window.

Returns radiance-over-nothing ("intensity"), incident vector, distance and
pdf; pdf==DIRAC for hard (zero-extent) lights, matching the reference's MIS
special-casing (pathtrace_functions.h.slang:412, 452-460).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bsdf import DIRAC
from .sky import _onb
from .traverse import dot3

LIGHT_DIRECTIONAL, LIGHT_SPOT, LIGHT_POINT = 1, 2, 3


def sample_one_light(flat, light_idx, pos, normal, u2):
    """Sample light `light_idx` from `pos`. Returns dict(direction [..,3]
    to-light, distance, intensity [..,3] radiance contribution pre-pdf-division,
    pdf)."""
    lt = flat.light_type[light_idx]
    lpos = flat.light_pos[light_idx]
    ldir = flat.light_dir[light_idx]
    color = flat.light_color[light_idx] * flat.light_intensity[light_idx][..., None]
    radius = flat.light_radius[light_idx]
    ang_or_inv = flat.light_angular_or_invrange[light_idx]

    is_dir = lt == LIGHT_DIRECTIONAL

    # --- directional: cone around -ldir with angular size
    half_ang = ang_or_inv * 0.5
    cos_half = jnp.cos(half_ang)
    t, b = _onb(-ldir)
    cos_t = 1.0 - u2[..., 0] * (1.0 - cos_half)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2[..., 1]
    dir_cone = (
        t * (jnp.cos(phi) * sin_t)[..., None]
        + b * (jnp.sin(phi) * sin_t)[..., None]
        + (-ldir) * cos_t[..., None]
    )
    dir_solid_angle = 2.0 * jnp.pi * (1.0 - cos_half)
    dir_is_soft = dir_solid_angle > 1e-9
    # directional intensity is illuminance (lux): radiance contribution is
    # color directly; soft sun spreads it over the cone (pdf handles MIS).
    dir_pdf = jnp.where(dir_is_soft, 1.0 / jnp.maximum(dir_solid_angle, 1e-9), DIRAC)

    # --- point/spot: sample sphere of `radius` around lpos
    to_light = lpos - pos
    dist2 = jnp.maximum(dot3(to_light, to_light), 1e-12)
    dist = jnp.sqrt(dist2)
    w_center = to_light / dist[..., None]
    # visible-sphere cone sampling
    sin_max2 = jnp.clip(radius * radius / dist2, 0.0, 0.9999)
    cos_max = jnp.sqrt(1.0 - sin_max2)
    ts, bs = _onb(w_center)
    cos_ts = 1.0 - u2[..., 0] * (1.0 - cos_max)
    sin_ts = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_ts * cos_ts))
    w_samp = (
        ts * (jnp.cos(phi) * sin_ts)[..., None]
        + bs * (jnp.sin(phi) * sin_ts)[..., None]
        + w_center * cos_ts[..., None]
    )
    sphere_solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
    soft = (radius > 0.0) & (sphere_solid_angle > 1e-9)
    pt_dir = jnp.where(soft[..., None], w_samp, w_center)
    pt_pdf = jnp.where(soft, 1.0 / jnp.maximum(sphere_solid_angle, 1e-9), DIRAC)

    # inverse-square falloff with optional range window (glTF punctual spec)
    atten = 1.0 / dist2
    inv_range = ang_or_inv
    rng_t = jnp.clip(1.0 - (dist * inv_range) ** 4, 0.0, 1.0)
    atten = atten * jnp.where(inv_range > 0, rng_t, 1.0)

    # spot cone falloff
    cd = dot3(ldir, -pt_dir)
    cone = flat.light_cone[light_idx]
    spot_t = jnp.clip((cd - cone[..., 0]) * cone[..., 1], 0.0, 1.0)
    spot_fall = spot_t * spot_t
    atten = atten * jnp.where(lt == LIGHT_SPOT, spot_fall, 1.0)

    intensity = jnp.where(
        is_dir[..., None],
        color,
        color * atten[..., None],
    )
    direction = jnp.where(is_dir[..., None], dir_cone, pt_dir)
    distance = jnp.where(is_dir, jnp.float32(1e32), dist)
    pdf = jnp.where(is_dir, dir_pdf, pt_pdf)
    return {"direction": direction, "distance": distance, "intensity": intensity, "pdf": pdf}

"""Physical sun + sky environment: eval / sample / pdf.

In-repo replacement for nvpro_core2's nvshaders/sky_functions.h.slang
(samplePhysicalSky / evalPhysicalSky / samplePhysicalSkyPDF — consumed by
the reference at pathtrace_functions.h.slang:420-430, 466-481). The nvpro
model is closed-source-adjacent (external repo), so this is an independent
analytic sun+sky with the same interface contract:

  eval(dir)     -> radiance for any world direction (sun disk + sky gradient
                   + ground)
  sample(u)     -> (direction, radiance, pdf) importance-biased to the sun
  pdf(dir)      -> matches sample()'s density exactly (MIS requirement)

The sampling density is a mixture: P(sun cone) = sun_weight, else uniform
sphere — every direction has nonzero pdf, so env-hit MIS weights
(computeEnvHitMisWeight) stay consistent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .traverse import dot3


@dataclass
class SkyParams:
    """SkyPhysicalParameters analog (nvshaders/sky_io.h.slang)."""

    sun_direction: np.ndarray = field(default_factory=lambda: np.array([0.33, 0.45, 0.83], np.float32))
    sun_color: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.96, 0.9], np.float32))
    sun_intensity: float = 50.0  # radiance scale of the solar disk
    sun_angular_size: float = np.radians(0.53)
    sky_zenith: np.ndarray = field(default_factory=lambda: np.array([0.17, 0.32, 0.58], np.float32))
    sky_horizon: np.ndarray = field(default_factory=lambda: np.array([0.60, 0.70, 0.85], np.float32))
    ground_color: np.ndarray = field(default_factory=lambda: np.array([0.30, 0.27, 0.25], np.float32))
    sky_brightness: float = 1.0
    sun_sample_weight: float = 0.5  # mixture probability of sampling the sun cone

    def normalized(self) -> "SkyParams":
        d = np.asarray(self.sun_direction, np.float32)
        self.sun_direction = d / max(np.linalg.norm(d), 1e-9)
        return self

    def as_arrays(self) -> dict:
        self.normalized()
        cos_half = np.cos(self.sun_angular_size * 0.5)
        return dict(
            sun_dir=jnp.asarray(self.sun_direction),
            sun_radiance=jnp.asarray(self.sun_color * self.sun_intensity),
            cos_sun=jnp.float32(cos_half),
            zenith=jnp.asarray(self.sky_zenith * self.sky_brightness),
            horizon=jnp.asarray(self.sky_horizon * self.sky_brightness),
            ground=jnp.asarray(self.ground_color * self.sky_brightness),
            sun_w=jnp.float32(self.sun_sample_weight),
        )


def eval_sky(sp: dict, d):
    """Radiance along direction(s) d [...,3]."""
    y = d[..., 1]
    # sky gradient: horizon -> zenith by elevation; below horizon -> ground
    t = jnp.clip(y, 0.0, 1.0) ** 0.5
    sky = sp["horizon"] * (1.0 - t[..., None]) + sp["zenith"] * t[..., None]
    gfade = jnp.clip(-y * 8.0, 0.0, 1.0)[..., None]
    base = jnp.where(y[..., None] >= 0.0, sky, sky * (1.0 - gfade) + sp["ground"] * gfade)
    # sun disk (above-horizon only)
    cos_to_sun = dot3(d, sp["sun_dir"])
    in_disk = (cos_to_sun >= sp["cos_sun"]) & (sp["sun_dir"][1] > -0.2)
    return jnp.where(in_disk[..., None], base + sp["sun_radiance"], base)


def pdf_sky(sp: dict, d):
    """Density of sample_sky for direction(s) d — solid-angle measure."""
    cone_solid_angle = 2.0 * jnp.pi * (1.0 - sp["cos_sun"])
    p_cone = 1.0 / jnp.maximum(cone_solid_angle, 1e-9)
    p_uni = 1.0 / (4.0 * jnp.pi)
    cos_to_sun = dot3(d, sp["sun_dir"])
    in_cone = cos_to_sun >= sp["cos_sun"]
    return jnp.where(in_cone, sp["sun_w"] * p_cone + (1 - sp["sun_w"]) * p_uni, (1 - sp["sun_w"]) * p_uni)


def _onb(n):
    """Branchless orthonormal basis (Frisvad/Duff)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1)
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def sample_sky(sp: dict, u):
    """u: [...,3] uniforms. Returns (direction, radiance, pdf)."""
    pick_sun = u[..., 0] < sp["sun_w"]
    # cone sample around sun
    cos_t = 1.0 - u[..., 1] * (1.0 - sp["cos_sun"])
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u[..., 2]
    t, bt = _onb(jnp.broadcast_to(sp["sun_dir"], u.shape[:-1] + (3,)))
    cone_dir = (
        t * (jnp.cos(phi) * sin_t)[..., None]
        + bt * (jnp.sin(phi) * sin_t)[..., None]
        + sp["sun_dir"] * cos_t[..., None]
    )
    # uniform sphere sample
    z = 1.0 - 2.0 * u[..., 1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    sph_dir = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)

    d = jnp.where(pick_sun[..., None], cone_dir, sph_dir)
    d = d / jnp.sqrt(dot3(d, d))[..., None]
    return d, eval_sky(sp, d), pdf_sky(sp, d)

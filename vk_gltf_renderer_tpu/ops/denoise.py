"""Learned-free denoiser: edge-aware à-trous wavelet filtering (SVGF-style
spatial pass).

The reference's denoisers (DLSS-RR, OptiX) are closed NVIDIA components
(dlss*.cpp, optix_denoiser.cpp); the rebuild ships an open in-repo
replacement consuming the SAME guide contract (docs/denoising.md:17-44):
noisy radiance + diffuse albedo + world normal/roughness + depth. Like the
reference's OptiX path, it denoises the accumulated HDR image on demand
(auto-denoise every N frames, optix_denoiser.hpp:77-90).

Algorithm: 5 à-trous iterations (Dammertz et al. 2010) with SVGF-style
edge-stopping weights on normal (cos^sigma_n), depth/position, and
luminance. Albedo is factored out before filtering and re-applied after
(demodulated irradiance filtering), preserving texture detail.

Variance guidance (Schied et al. 2017 SVGF): when a per-pixel luminance
variance estimate is available (the path tracer's lum_moments aux at
spp>=2, or the 3x3 spatial moment fallback at spp=1), the luminance
edge-stopping sigma scales with sqrt(gaussian-prefiltered variance) —
noisy regions filter wide, converged regions preserve detail — and the
variance itself rides the same à-trous ladder with squared weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_KERNEL = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)  # B3-spline taps


def _gauss3(x):
    """3x3 gaussian prefilter (SVGF prefilters variance before sigma use)."""
    k = jnp.asarray([0.25, 0.5, 0.25])
    x = k[0] * jnp.roll(x, 1, 0) + k[1] * x + k[2] * jnp.roll(x, -1, 0)
    x = k[0] * jnp.roll(x, 1, 1) + k[1] * x + k[2] * jnp.roll(x, -1, 1)
    return x


def spatial_variance(lum_img):
    """3x3 moment-based luminance variance (the SVGF fallback when too few
    samples exist for a per-pixel temporal/sample estimate)."""
    m1 = _gauss3(lum_img)
    m2 = _gauss3(lum_img * lum_img)
    return jnp.maximum(m2 - m1 * m1, 0.0)


@partial(jax.jit, static_argnames=("iterations", "has_variance"))
def _denoise_impl(
    radiance, albedo, normal, depth, valid, variance,
    iterations: int, sigma_normal: float, sigma_depth: float, sigma_lum: float,
    has_variance: bool, sigma_floor: float = 0.0,
):
    # demodulate: filter irradiance, keep texture frequency in albedo
    alb = jnp.maximum(albedo, 1e-3)
    irr = jnp.where(valid[..., None], radiance / alb, radiance)

    def lum(c):
        return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]

    depth_scale = 1.0 / jnp.maximum(jnp.std(jnp.where(valid, depth, 0.0)) + 1e-6, 1e-6)

    out = irr
    var = variance
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        vacc = jnp.zeros(out.shape[:2]) if has_variance else None
        wsum = jnp.zeros(out.shape[:2])
        l0 = lum(out)
        if has_variance:
            # sigma_l scales with the local noise level (SVGF eq. 1),
            # CAPPED at the fixed sigma: variance can only ever sharpen
            # the filter (converged pixels keep their value), never blur
            # beyond the non-guided baseline. sigma_floor is the caller's
            # low-sample-count ramp: at few accumulated samples the
            # per-pixel variance estimator is unreliable AND blur error is
            # below noise error, so the filter should stay at the fixed
            # sigma; as accumulation converges the floor decays and the
            # filter sharpens toward the identity (measured: fixed-sigma
            # wins until ~32 total samples on untextured scenes, variance
            # wins after)
            lsig = jnp.minimum(
                sigma_lum, 10.0 * jnp.sqrt(_gauss3(var)) + sigma_floor
            ) + 1e-4
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                w_k = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                sy, sx = dy * step, dx * step
                sh = jnp.roll(out, (-sy, -sx), axis=(0, 1))
                n_sh = jnp.roll(normal, (-sy, -sx), axis=(0, 1))
                d_sh = jnp.roll(depth, (-sy, -sx), axis=(0, 1))
                v_sh = jnp.roll(valid, (-sy, -sx), axis=(0, 1))
                w_n = jnp.maximum(jnp.sum(normal * n_sh, -1), 0.0) ** sigma_normal
                w_d = jnp.exp(-jnp.abs(depth - d_sh) * depth_scale / sigma_depth)
                if has_variance:
                    w_l = jnp.exp(-jnp.abs(l0 - lum(sh)) / lsig)
                else:
                    w_l = jnp.exp(-jnp.abs(l0 - lum(sh)) / sigma_lum)
                w = w_k * w_n * w_d * w_l * v_sh.astype(jnp.float32)
                w = jnp.where(valid, w, jnp.where(v_sh, 0.0, w_k))  # sky filters with sky
                acc = acc + sh * w[..., None]
                if has_variance:
                    vacc = vacc + jnp.roll(var, (-sy, -sx), axis=(0, 1)) * w * w
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)[..., None]
        if has_variance:
            # variance propagates with squared weights (SVGF eq. 2)
            var = vacc / jnp.maximum(wsum * wsum, 1e-12)

    # miss pixels are deterministic environment lookups (AA jitter only) —
    # filtering them just blurs the backdrop (e.g. the sun disk), so they
    # pass through untouched
    return jnp.where(valid[..., None], out * alb, radiance)


def denoise(
    radiance,  # [H,W,3] linear HDR
    albedo,  # [H,W,3]
    normal,  # [H,W,3]
    depth,  # [H,W] (any monotonic depth proxy; we use first-hit distance)
    valid,  # [H,W] bool (first hit exists)
    iterations: int = 5,
    sigma_normal: float = 64.0,
    sigma_depth: float = 1.0,
    sigma_lum: float = 4.0,
    variance=None,  # [H,W] luminance variance of the DEMODULATED signal
    sigma_floor: float = 0.0,  # additive sigma floor (low-sample ramp)
):
    """Returns denoised radiance [H,W,3]."""
    has_var = variance is not None
    if not has_var:
        variance = jnp.zeros(radiance.shape[:2])
    return _denoise_impl(
        radiance, albedo, normal, depth, valid, variance,
        iterations, sigma_normal, sigma_depth, sigma_lum, has_var, sigma_floor,
    )


def denoise_renderer(renderer, iterations: int = 5):
    """Denoise a GltfRenderer's accumulated image using its guide buffers
    (aux from the last frame). Returns [H,W,3] linear.

    Variance source ladder: accumulated per-pixel luminance sample moments
    (renderer._moments, >=2 total samples) -> 3x3 spatial moment fallback.
    Moments are measured on the modulated radiance; dividing by lum(alb)^2
    moves them to the demodulated (filtered) domain."""
    import numpy as np

    aux = renderer._last_aux
    if aux is None:
        return renderer.image_linear()
    h, w = renderer.height, renderer.width
    rad = jnp.asarray(renderer.accum).reshape(h, w, 3)
    albedo = jnp.asarray(aux["albedo"]).reshape(h, w, 3)
    normal = jnp.asarray(aux["normal"]).reshape(h, w, 3)
    solid = jnp.asarray(aux["solid"]).reshape(h, w)
    pos = jnp.asarray(aux["first_pos"]).reshape(h, w, 3)
    eye = jnp.asarray(np.asarray(renderer.camera.eye, np.float32))
    depth = jnp.where(solid, jnp.linalg.norm(pos - eye, axis=-1), 1e9)

    alb_lum = jnp.maximum(
        0.2126 * albedo[..., 0] + 0.7152 * albedo[..., 1] + 0.0722 * albedo[..., 2], 1e-3
    )
    moments = getattr(renderer, "_moments", None)
    n = renderer.total_samples
    floor = 4.0 * float(np.exp(-n / 12.0))  # fixed-sigma ramp, ~gone by n=48
    if moments is not None and n >= 2:
        m = jnp.asarray(moments).reshape(h, w, 2)
        mean = m[..., 0] / n
        # variance of the MEAN estimate (what the accumulated image carries)
        var = jnp.maximum(m[..., 1] / n - mean * mean, 0.0) / (n - 1)
        variance = var / (alb_lum * alb_lum)
    else:
        irr_lum = (
            0.2126 * rad[..., 0] + 0.7152 * rad[..., 1] + 0.0722 * rad[..., 2]
        ) / alb_lum
        variance = spatial_variance(jnp.where(solid, irr_lum, 0.0))
    return denoise(rad, albedo, normal, depth, solid, iterations=iterations,
                   variance=variance, sigma_floor=floor)

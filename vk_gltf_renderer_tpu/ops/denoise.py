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
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_KERNEL = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)  # B3-spline taps


@partial(jax.jit, static_argnames=("iterations",))
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
):
    """Returns denoised radiance [H,W,3]."""
    # demodulate: filter irradiance, keep texture frequency in albedo
    alb = jnp.maximum(albedo, 1e-3)
    irr = jnp.where(valid[..., None], radiance / alb, radiance)

    def lum(c):
        return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]

    depth_scale = 1.0 / jnp.maximum(jnp.std(jnp.where(valid, depth, 0.0)) + 1e-6, 1e-6)

    out = irr
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2])
        l0 = lum(out)
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
                w_l = jnp.exp(-jnp.abs(l0 - lum(sh)) / sigma_lum)
                w = w_k * w_n * w_d * w_l * v_sh.astype(jnp.float32)
                w = jnp.where(valid, w, jnp.where(v_sh, 0.0, w_k))  # sky filters with sky
                acc = acc + sh * w[..., None]
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)[..., None]

    return jnp.where(valid[..., None], out * alb, out)


def denoise_renderer(renderer, iterations: int = 5):
    """Denoise a GltfRenderer's accumulated image using its guide buffers
    (aux from the last frame). Returns [H,W,3] linear."""
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
    return denoise(rad, albedo, normal, depth, solid, iterations=iterations)

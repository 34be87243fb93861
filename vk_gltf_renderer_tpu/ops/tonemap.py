"""Tonemap operators (in-repo replacement for nvshaders/tonemap_functions —
the reference exposes 6 operators, docs/user-guide.md tonemapper table).

Operators: filmic (default), aces, agx, khronos_pbr, reinhard_ext, none.
All take linear radiance [.., 3] and return display-referred sRGB [0,1].
"""

from __future__ import annotations

import jax.numpy as jnp

OPERATORS = ("filmic", "aces", "agx", "khronos_pbr", "reinhard_ext", "none")


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _filmic(c):
    """Uncharted2/Hable filmic."""
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    W = 11.2

    def hable(x):
        return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F

    exposure_bias = 2.0
    return jnp.clip(hable(c * exposure_bias) / hable(jnp.float32(W)), 0.0, 1.0)


def _aces(c):
    """Narkowicz ACES approximation."""
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def _agx(c):
    """AgX approximation (Benjamin Wrensch / Troy Sobotka fit)."""
    m = jnp.array(
        [[0.842479, 0.0784336, 0.0792237], [0.0423282, 0.878468, 0.0791661], [0.0423756, 0.0784336, 0.879142]],
        jnp.float32,
    )
    mi = jnp.array(
        [[1.19688, -0.0980209, -0.0990297], [-0.0528968, 1.15190, -0.0989611], [-0.0529716, -0.0980434, 1.15107]],
        jnp.float32,
    )
    v = jnp.einsum("ij,...j->...i", m, c)
    v = jnp.clip((jnp.log2(jnp.maximum(v, 1e-10)) + 12.47393) / 16.5, 0.0, 1.0)
    # 6th-order sigmoid fit
    v2 = v * v
    v4 = v2 * v2
    v = 15.5 * v4 * v2 - 40.14 * v4 * v + 31.96 * v4 - 6.868 * v2 * v + 0.4298 * v2 + 0.1191 * v - 0.00232
    out = jnp.einsum("ij,...j->...i", mi, v)
    return jnp.clip(out, 0.0, 1.0)


def _khronos_pbr(c):
    """Khronos PBR neutral tone mapper (glTF sample-renderer default)."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.min(c, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    c = c - offset
    peak = jnp.max(c, axis=-1, keepdims=True)
    new_peak = 1.0 - (1.0 - start_compression) ** 2 / jnp.maximum(
        peak + 1.0 - 2.0 * start_compression, 1e-6
    )
    scale = jnp.where(peak > start_compression, new_peak / jnp.maximum(peak, 1e-6), 1.0)
    c = c * scale
    g = 1.0 / (desaturation * jnp.maximum(peak - new_peak, 0.0) / jnp.maximum(new_peak, 1e-6) + 1.0)
    g = jnp.where(peak > start_compression, g, 1.0)
    return jnp.clip(c * g + new_peak * (1.0 - g), 0.0, 1.0)


def _reinhard_ext(c, white=4.0):
    return jnp.clip(c * (1.0 + c / (white * white)) / (1.0 + c), 0.0, 1.0)


def tonemap(c, operator: str = "filmic", exposure: float = 1.0):
    """Linear HDR -> sRGB display (the compute tonemap pass,
    renderer.cpp:992-1054)."""
    c = jnp.maximum(c, 0.0) * exposure
    if operator == "aces":
        out = _aces(c)
    elif operator == "agx":
        out = _agx(c)
    elif operator == "khronos_pbr":
        out = _khronos_pbr(c)
    elif operator == "reinhard_ext":
        out = _reinhard_ext(c)
    elif operator == "none":
        out = jnp.clip(c, 0.0, 1.0)
        return out  # linear passthrough, no sRGB curve
    else:
        out = _filmic(c)
    return linear_to_srgb(out)

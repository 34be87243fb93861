"""Deterministic per-pixel RNG: xxhash32 seeding + LCG sequence.

Matches the reference's scheme (gltf_pathtrace.slang:560 seeds with
``xxhash32(uint3(pixel.xy, frameCount))``; rand() is the LCG from
nvshaders/random.h.slang — see SURVEY.md §2.6). Device-placement
independent by construction: the sequence depends only on (pixel, frame),
so sharding the image across chips cannot change the picture.

All state is explicit (functional): ``rand(seed) -> (u, seed')`` where seed
is a uint32 jnp array of any shape (one independent stream per lane).
"""

from __future__ import annotations

import jax.numpy as jnp

_PRIME1 = jnp.uint32(2246822519)
_PRIME2 = jnp.uint32(3266489917)
_PRIME3 = jnp.uint32(668265263)
_PRIME4 = jnp.uint32(374761393)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def xxhash32(x, y, z):
    """xxhash32 of a uint3 (the 12-byte specialization used for seeding)."""
    x = jnp.asarray(x).astype(jnp.uint32)
    y = jnp.asarray(y).astype(jnp.uint32)
    z = jnp.asarray(z).astype(jnp.uint32)
    h = z + _PRIME4 + x * _PRIME2
    h = _PRIME3 * _rotl(h, 17)
    h = h + y * _PRIME2
    h = _PRIME3 * _rotl(h, 17)
    h = _PRIME1 * (h ^ (h >> jnp.uint32(15)))
    h = _PRIME2 * (h ^ (h >> jnp.uint32(13)))
    return h ^ (h >> jnp.uint32(16))


_LCG_A = jnp.uint32(1664525)
_LCG_C = jnp.uint32(1013904223)
_INV_2_24 = jnp.float32(1.0 / 16777216.0)


def lcg(seed):
    return _LCG_A * seed + _LCG_C


def rand(seed):
    """One uniform float in [0,1) per lane; returns (u, new_seed)."""
    seed = lcg(seed)
    u = (seed >> jnp.uint32(8)).astype(jnp.float32) * _INV_2_24
    return u, seed


def rand2(seed):
    u1, seed = rand(seed)
    u2, seed = rand(seed)
    return jnp.stack([u1, u2], axis=-1), seed


def rand3(seed):
    u1, seed = rand(seed)
    u2, seed = rand(seed)
    u3, seed = rand(seed)
    return jnp.stack([u1, u2, u3], axis=-1), seed


def sample_gaussian(u):
    """Box-Muller pair from two uniforms — the subpixel AA jitter
    (pathtrace_functions.h.slang:784-789)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1e-38, u[..., 0])))
    theta = 2.0 * jnp.pi * u[..., 1]
    return r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)

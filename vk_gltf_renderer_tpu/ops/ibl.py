"""Image-based-lighting prefilter for the preview renderer.

The reference's raster path shades with nvvk::HdrIbl products: a
cosine-convolved diffuse cubemap, a GGX-prefiltered glossy cubemap chain
and a split-sum BRDF LUT (binding indices shaderio.h:34-44; consumed in
gltf_raster.slang:527). This module builds the TPU-native equivalents as
small equirect (lat-long) maps, convolved in one jitted pass per product:

  build_ibl(env, env_kind) -> {
      "irr":   [IH, IW, 3]      cosine-convolved irradiance / pi
      "spec":  [L, SH, SW, 3]   GGX-prefiltered radiance per roughness level
      "brdf":  [B, B, 2]        split-sum (scale, bias) over (NdotV, rough)
  }

Sampling uses a fixed Hammersley set (deterministic; no RNG state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IRR_H, IRR_W = 16, 32
SPEC_H, SPEC_W = 32, 64
SPEC_LEVELS = 5
BRDF_N = 32
SAMPLES = 128


def _hammersley(n):
    i = jnp.arange(n, dtype=jnp.uint32)
    bits = i
    bits = ((bits << 16) | (bits >> 16)) & jnp.uint32(0xFFFFFFFF)
    bits = ((bits & jnp.uint32(0x55555555)) << 1) | ((bits & jnp.uint32(0xAAAAAAAA)) >> 1)
    bits = ((bits & jnp.uint32(0x33333333)) << 2) | ((bits & jnp.uint32(0xCCCCCCCC)) >> 2)
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << 4) | ((bits & jnp.uint32(0xF0F0F0F0)) >> 4)
    bits = ((bits & jnp.uint32(0x00FF00FF)) << 8) | ((bits & jnp.uint32(0xFF00FF00)) >> 8)
    return jnp.stack([i.astype(jnp.float32) / n, bits.astype(jnp.float32) * 2.3283064365386963e-10], -1)


def _latlong_dirs(h, w):
    """Texel-center directions of an equirect map (+Y up, phi from -Z)."""
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    theta = v * jnp.pi  # 0 = up
    phi = u * 2.0 * jnp.pi - jnp.pi
    st = jnp.sin(theta)[:, None]
    y = jnp.broadcast_to(jnp.cos(theta)[:, None], (h, w))
    x = st * jnp.sin(phi)[None, :]
    z = -st * jnp.cos(phi)[None, :]
    return jnp.stack([x, y, z], -1)


def _onb(n):
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], -1)
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t, bt


def _ggx_sample(u2, rough):
    """GGX half-vector sample in tangent space (alpha = rough^2)."""
    a = jnp.maximum(rough * rough, 1e-4)
    phi = 2.0 * jnp.pi * u2[..., 0]
    ct = jnp.sqrt((1.0 - u2[..., 1]) / (1.0 + (a * a - 1.0) * u2[..., 1]))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)


def build_ibl(env, env_kind: str, samples: int = SAMPLES):
    """Prefilter the environment into irradiance / glossy chain / BRDF LUT.
    One-time per environment change; all maps are tiny (few KB)."""
    from .pathtrace import RenderConfig, sample_environment

    cfg = RenderConfig(env_kind=env_kind)

    def radiance(d):
        c, _ = sample_environment(env, d.reshape(-1, 3), cfg)
        return c.reshape(d.shape)

    xi = _hammersley(samples)

    # ---- diffuse irradiance (cosine-weighted MC; result already / pi)
    nrm = _latlong_dirs(IRR_H, IRR_W)
    t, b = _onb(nrm)
    phi = 2.0 * jnp.pi * xi[:, 0]
    ct = jnp.sqrt(1.0 - xi[:, 1])
    st = jnp.sqrt(xi[:, 1])
    ld = (
        t[None] * (st * jnp.cos(phi))[:, None, None, None]
        + b[None] * (st * jnp.sin(phi))[:, None, None, None]
        + nrm[None] * ct[:, None, None, None]
    )
    irr = jnp.mean(radiance(ld), axis=0)

    # ---- glossy chain: GGX-prefiltered radiance, one level per roughness
    rdirs = _latlong_dirs(SPEC_H, SPEC_W)
    rt, rb = _onb(rdirs)
    levels = []
    for li in range(SPEC_LEVELS):
        rough = li / (SPEC_LEVELS - 1)
        if li == 0:
            levels.append(radiance(rdirs))
            continue
        hloc = _ggx_sample(xi, jnp.float32(rough))  # [S,3]
        hvec = (
            rt[None] * hloc[:, 0][:, None, None, None]
            + rb[None] * hloc[:, 1][:, None, None, None]
            + rdirs[None] * hloc[:, 2][:, None, None, None]
        )
        # reflect view (= R) about h: l = 2(v.h)h - v with v = rdirs
        vh = jnp.sum(rdirs[None] * hvec, -1, keepdims=True)
        ld = 2.0 * vh * hvec - rdirs[None]
        w = jnp.maximum(jnp.sum(rdirs[None] * ld, -1), 0.0)[..., None]
        num = jnp.sum(radiance(ld) * w, axis=0)
        den = jnp.maximum(jnp.sum(w, axis=0), 1e-4)
        levels.append(num / den)
    spec = jnp.stack(levels)

    # ---- split-sum BRDF LUT (scale, bias) — [Karis 2013] integration
    nv = (jnp.arange(BRDF_N, dtype=jnp.float32) + 0.5) / BRDF_N
    rr = (jnp.arange(BRDF_N, dtype=jnp.float32) + 0.5) / BRDF_N
    nvg, rg = jnp.meshgrid(nv, rr, indexing="xy")  # [B(rough), B(nv)]
    v = jnp.stack([jnp.sqrt(1.0 - nvg * nvg), jnp.zeros_like(nvg), nvg], -1)
    a_lut = jnp.maximum(rg * rg, 1e-4)

    def one_sample(carry, u2):
        acc_a, acc_b = carry
        h = _ggx_sample(jnp.broadcast_to(u2, nvg.shape + (2,)), rg)
        vh = jnp.sum(v * h, -1)
        l = 2.0 * vh[..., None] * h - v
        nl = jnp.maximum(l[..., 2], 0.0)
        nh = jnp.maximum(h[..., 2], 0.0)
        nvc = jnp.maximum(nvg, 1e-4)
        vis = jnp.where(nl > 0, 1.0, 0.0)
        # height-correlated Smith G for GGX, over the pdf terms
        k = a_lut * a_lut / 2.0
        g1v = nvc / (nvc * (1.0 - k) + k)
        g1l = nl / (nl * (1.0 - k) + k + 1e-6)
        g = g1v * g1l
        g_vis = jnp.where(nh > 0, g * vh / jnp.maximum(nh * nvc, 1e-6), 0.0) * vis
        fc = (1.0 - jnp.maximum(vh, 0.0)) ** 5
        return (acc_a + (1.0 - fc) * g_vis, acc_b + fc * g_vis), None

    (sa, sb), _ = jax.lax.scan(one_sample, (jnp.zeros_like(nvg), jnp.zeros_like(nvg)), xi)
    brdf = jnp.stack([sa, sb], -1) / samples

    return {"irr": irr, "spec": spec, "brdf": brdf}


def _sample_latlong(img, d):
    """Bilinear lookup of an equirect map by direction, batched [N,3]."""
    h, w = img.shape[0], img.shape[1]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 0], -d[..., 2])
    v = theta / jnp.pi * h - 0.5
    u = (phi + jnp.pi) / (2.0 * jnp.pi) * w - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (u - jnp.floor(u))[..., None]
    fy = (v - y0)[..., None]
    xa = jnp.mod(x0, w)
    xb = jnp.mod(x0 + 1, w)
    return (
        img[y0, xa] * (1 - fx) * (1 - fy)
        + img[y0, xb] * fx * (1 - fy)
        + img[y1, xa] * (1 - fx) * fy
        + img[y1, xb] * fx * fy
    )


def ibl_diffuse(ibl, n):
    """Cosine-convolved irradiance for normal n — multiply by albedo."""
    return _sample_latlong(ibl["irr"], n)


def ibl_specular(ibl, r, rough, f0, n_dot_v):
    """Split-sum specular: prefiltered radiance along r at the roughness
    level, weighted by the BRDF LUT (gltf_raster.slang IBL contract)."""
    lvl = jnp.clip(rough, 0.0, 1.0) * (SPEC_LEVELS - 1)
    l0 = jnp.clip(jnp.floor(lvl).astype(jnp.int32), 0, SPEC_LEVELS - 1)
    l1 = jnp.clip(l0 + 1, 0, SPEC_LEVELS - 1)
    f = (lvl - l0)[..., None]
    pre = _sample_latlong_level(ibl["spec"], l0, r) * (1 - f) + _sample_latlong_level(ibl["spec"], l1, r) * f
    bi = jnp.clip((n_dot_v * BRDF_N).astype(jnp.int32), 0, BRDF_N - 1)
    ri = jnp.clip((rough * BRDF_N).astype(jnp.int32), 0, BRDF_N - 1)
    ab = ibl["brdf"][ri, bi]
    return pre * (f0 * ab[..., 0:1] + ab[..., 1:2])


def _sample_latlong_level(spec, lvl, d):
    """Per-lane level-indexed equirect lookup (nearest level row gather)."""
    # gather the two candidate levels' bilinear results via vmap-free select
    outs = [_sample_latlong(spec[i], d) for i in range(spec.shape[0])]
    stacked = jnp.stack(outs)  # [L, N, 3]
    return jnp.take_along_axis(stacked, lvl[None, :, None], axis=0)[0]

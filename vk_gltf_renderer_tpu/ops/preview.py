"""Preview renderer — the TPU-native answer to the reference's raster path
(renderer_rasterizer.* + gltf_raster.slang).

The reference's second renderer exists to give a fast interactive preview
with simplified lighting (IBL + punctual, no global illumination). A TPU
has no rasterizer, and primary-visibility ray casting through the packet
kernel is already fast, so the preview re-uses the tracer for visibility
and replaces the integrator with single-bounce IBL-approx shading:

  color = emissive + baseColor/pi * irradiance(N) + F * env(reflect(V,N))
          + sun NdotL * shadow(optional)

This matches the raster path's role and look (ambient+specular approx IBL;
gltf_raster.slang fragment) with one trace for visibility and one optional
shadow trace — ~2 rays/pixel, an order of magnitude cheaper than the path
tracer, and it shares SceneFlat/BVH/material code wholesale.

Parity with the raster path's extras:
  * TRANSMISSION: the reference captures the opaque pass at 1024^2 + mips
    and samples it behind transmissive surfaces (screen-space refraction,
    renderer_rasterizer.cpp:949, OPAQUE_COLOR_SIZE shaderio.h:80). Here the
    "capture" is one REAL refracted continuation ray to the next surface,
    shaded with the same IBL formula — strictly more correct than the
    screen-space hack, same cost class (one extra trace on transmissive
    lanes only).
  * BLEND: the reference depth-sorts blend-bucket draws back-to-front per
    frame (updateSortedBlendNodes renderer_rasterizer.cpp:1020). A ray
    caster gets the ordering for free: alpha < 1 hits composite OVER one
    continuation hit along the same ray (front-to-back, one layer — the
    preview contract, not the path tracer's exhaustive stochastic alpha).
  * WIREFRAME: barycentric edge overlay on the primary hit (the raster /
    path-trace WIREFRAME macro, renderer_pathtracer.cpp:1050 macro set),
    enabled by RenderConfig.wireframe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import rng
from .camera import generate_rays
from .hitstate import get_hit_state, get_hit_state_fused, safe_offset_ray
from .materials_eval import evaluate_material
from .pathtrace import RenderConfig, sample_environment, trace_closest
from .sky import _onb
from .traverse import dot3


def _shade_hit(flat, bvh, env, frame, cfg: RenderConfig, hits, rd, *, sun_shadow: bool):
    """IBL-approx shading of a hit batch (the gltf_raster.slang fragment
    role). Returns (color, hs, pbr, miss)."""
    n = rd.shape[0]
    miss = hits["tri"] < 0

    if cfg.fused_hitstate:
        hs = get_hit_state_fused(jnp.asarray(bvh.hit_attr), jnp.asarray(bvh.rn_attr_base), hits, rd)
    else:
        hs = get_hit_state(flat, hits, rd)
    mat_id = flat.rn_material[jnp.maximum(hits["rnode"], 0)]
    pbr = evaluate_material(flat, mat_id, hs, features=cfg.features)
    N = pbr["N"]

    rough = jnp.sqrt(pbr["roughness"][..., 0])
    f0 = 0.04 * (1.0 - pbr["metallic"][..., None]) + pbr["base_color"] * pbr["metallic"][..., None]
    ndotv = jnp.abs(dot3(N, -rd))
    refl = rd - 2.0 * dot3(rd, N)[..., None] * N

    ibl = frame.get("ibl")
    if ibl is not None:
        # prefiltered IBL: cosine-convolved irradiance + GGX glossy chain +
        # split-sum BRDF LUT (the nvvk::HdrIbl products the reference
        # raster consumes, shaderio.h:34-44 / gltf_raster.slang:527)
        from .ibl import ibl_diffuse, ibl_specular

        irr = ibl_diffuse(ibl, N) * jnp.pi  # store is /pi-convolved
        spec = ibl_specular(ibl, refl, rough, f0, ndotv)
    else:
        # fallback: 5-direction hemisphere average + single mirror fetch
        t, b = _onb(N)
        irr = jnp.zeros((n, 3))
        dirs = [(0.0, 0.0, 1.0), (0.8, 0.0, 0.6), (-0.8, 0.0, 0.6), (0.0, 0.8, 0.6), (0.0, -0.8, 0.6)]
        for dx, dy, dz in dirs:
            d = t * dx + b * dy + N * dz
            c, _ = sample_environment(env, d, cfg)
            irr = irr + c * max(dz, 0.0)
        irr = irr * (jnp.pi / len(dirs))
        spec_env, _ = sample_environment(env, refl, cfg)
        fres = f0 + (1.0 - f0) * ((1.0 - ndotv) ** 5)[..., None]
        spec = spec_env * fres * (1.0 - rough)[..., None]

    if "retroreflection" in cfg.features:
        # MRM (the reference's raster-only model, gltf_raster.slang:136-175):
        # the retro lobe evaluates the BRDF with the mirrored view, which for
        # this one-fetch IBL approx means looking BACK toward the viewer
        retro_env, _ = sample_environment(env, -rd, cfg)
        w_r = pbr["retroreflection"][..., None]
        spec = spec * (1.0 - w_r) + retro_env * w_r

    kd = (1.0 - pbr["metallic"])[..., None] * pbr["base_color"]
    color = pbr["emissive"] + kd * irr / jnp.pi + spec

    if "sheen" in cfg.features:
        # energy-correct sheen under IBL via the directional-albedo LUT
        # (Khronos albedo-scaling recipe; LUT integrates the SAME Charlie D
        # + Ashikhmin V lobe the path tracer evaluates, ops/sheen_lut.py)
        from .sheen_lut import sheen_albedo

        e_sheen = sheen_albedo(ndotv, pbr["sheen_roughness"])
        scale = 1.0 - jnp.max(pbr["sheen_color"], axis=-1) * e_sheen
        color = color * scale[..., None] + pbr["sheen_color"] * (e_sheen[..., None] * irr / jnp.pi)

    # single sun shadow when using the sky (matches raster sun shading)
    if sun_shadow and cfg.env_kind == "sky":
        sun_dir = env["sun_dir"]
        ndl = jnp.maximum(dot3(N, sun_dir), 0.0)
        sh_org = safe_offset_ray(hs["pos"], hs["geonrm"])
        sh = trace_closest(bvh, sh_org, jnp.broadcast_to(sun_dir, (n, 3)), cfg, coherent=True,
                           alive=(~miss) & (ndl > 0))
        lit = (sh["tri"] < 0).astype(jnp.float32)
        color = color + kd / jnp.pi * env["sun_radiance"] * (ndl * lit * 0.05)[..., None]
    return color, hs, pbr, miss


def _refract(rd, N, eta):
    """Snell refraction of unit rd through surface normal N (flips to the
    incident side); total internal reflection falls back to reflection."""
    cosi = dot3(rd, N)
    n_eff = jnp.where(cosi[..., None] > 0, -N, N)
    ci = jnp.abs(cosi)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = k < 0.0
    refr = eta[..., None] * rd + (eta * ci - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n_eff
    refl = rd - 2.0 * dot3(rd, n_eff)[..., None] * n_eff
    out = jnp.where(tir[..., None], refl, refr)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-20)


def render_preview(flat, bvh, env, frame, cfg: RenderConfig):
    """One preview frame, flattened pixels. Returns (rgb [N,3], aux)."""
    w, h = cfg.width, cfg.height
    n = w * h
    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    seed = rng.xxhash32(px, py, frame["frame_idx"])
    sample_pos = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    ro, rd = generate_rays(
        sample_pos, jnp.full((n, 2), 0.5), jnp.asarray([w, h], jnp.float32),
        frame["proj_inv"], frame["view_inv"], orthographic=cfg.orthographic,
    )
    hits = trace_closest(bvh, ro, rd, cfg, coherent=True)
    env_color, _ = sample_environment(env, rd, cfg)
    color, hs, pbr, miss = _shade_hit(flat, bvh, env, frame, cfg, hits, rd, sun_shadow=True)

    # ---- one continuation layer: refraction behind transmissive surfaces
    # (screen-space-refraction role) and OVER-compositing for alpha-BLEND
    # hits (sorted-blend role). Both reuse the same trace.
    has_trans = "transmission" in cfg.features
    has_blend = cfg.alpha_any
    if has_trans or has_blend:
        trans = pbr["transmission"] if has_trans else jnp.zeros(n)
        alpha = pbr["opacity"] if has_blend else jnp.ones(n)
        alpha = jnp.where(pbr["alpha_mode"] == 2, alpha, 1.0)  # BLEND only
        need = (~miss) & ((trans > 1e-3) | (alpha < 1.0 - 1e-3))
        # transmissive surfaces bend the ray; blend surfaces continue straight
        eta = 1.0 / jnp.maximum(pbr["ior1"][..., 0] if pbr["ior1"].ndim > 1 else pbr["ior1"], 1e-3)
        rd2 = jnp.where((trans > 1e-3)[..., None], _refract(rd, pbr["N"], eta), rd)
        # offset the continuation origin to the side the ray exits through
        side = jnp.sign(dot3(rd2, hs["geonrm"]))[..., None]
        org2 = safe_offset_ray(hs["pos"], hs["geonrm"] * side)
        hits2 = trace_closest(bvh, org2, rd2, cfg, coherent=False, alive=need)
        color2, _, _, miss2 = _shade_hit(flat, bvh, env, frame, cfg, hits2, rd2, sun_shadow=False)
        env2, _ = sample_environment(env, rd2, cfg)
        behind = jnp.where(miss2[..., None], env2, color2)
        if has_trans:
            tint = pbr["base_color"]
            color = jnp.where(
                need[..., None],
                color * (1.0 - trans[..., None]) + behind * tint * trans[..., None],
                color,
            )
        if has_blend:
            wa = jnp.where(need & (alpha < 1.0 - 1e-3), 1.0 - alpha, 0.0)
            color = color * (1.0 - wa[..., None]) + behind * wa[..., None]

    rgb = jnp.where(miss[..., None], env_color, color)

    if cfg.wireframe:
        # barycentric edge overlay (the WIREFRAME macro role,
        # renderer_pathtracer.cpp:1050): distance to the nearest edge in
        # barycentric space, ~1px feather via the hit's cone footprint
        bu, bv = hits["u"], hits["v"]
        edge = jnp.minimum(jnp.minimum(bu, bv), 1.0 - bu - bv)
        lw = 0.03
        mixw = jnp.where(~miss, jnp.clip(1.0 - edge / lw, 0.0, 1.0), 0.0)
        rgb = rgb * (1.0 - 0.85 * mixw[..., None])

    aux = {
        "first_rnode": jnp.where(miss, -1, hits["rnode"]),
        "solid": ~miss,
        "first_pos": hs["pos"],
        "albedo": pbr["base_color"],
        "normal": pbr["N"],
        "roughness": jnp.sqrt(pbr["roughness"][..., 0]),
        "rays": jnp.sum((~miss).astype(jnp.float32)) + n,
    }
    return rgb, aux


def make_preview_fn(cfg: RenderConfig):
    @jax.jit
    def fn(flat, bvh, env, frame):
        return render_preview(flat, bvh, env, frame, cfg)

    return fn

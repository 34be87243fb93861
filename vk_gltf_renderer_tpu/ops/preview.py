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
    miss = hits["tri"] < 0

    env_color, _ = sample_environment(env, rd, cfg)

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
    if cfg.env_kind == "sky":
        sun_dir = env["sun_dir"]
        ndl = jnp.maximum(dot3(N, sun_dir), 0.0)
        sh_org = safe_offset_ray(hs["pos"], hs["geonrm"])
        sh = trace_closest(bvh, sh_org, jnp.broadcast_to(sun_dir, (n, 3)), cfg, coherent=True,
                           alive=(~miss) & (ndl > 0))
        lit = (sh["tri"] < 0).astype(jnp.float32)
        color = color + kd / jnp.pi * env["sun_radiance"] * (ndl * lit * 0.05)[..., None]

    rgb = jnp.where(miss[..., None], env_color, color)
    aux = {
        "first_rnode": jnp.where(miss, -1, hits["rnode"]),
        "solid": ~miss,
        "first_pos": hs["pos"],
        "albedo": pbr["base_color"],
        "normal": N,
        "roughness": rough,
        "rays": jnp.sum((~miss).astype(jnp.float32)) + n,
    }
    return rgb, aux


def make_preview_fn(cfg: RenderConfig):
    @jax.jit
    def fn(flat, bvh, env, frame):
        return render_preview(flat, bvh, env, frame, cfg)

    return fn

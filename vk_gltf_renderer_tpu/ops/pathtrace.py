"""Wavefront path tracer: the TPU-native re-architecture of the reference's
megakernel (gltf_pathtrace.slang pathTrace / samplePixel / processPixel).

Design (SURVEY.md §7): instead of one divergent megakernel per pixel, rays
live in big SoA batches with an `alive` mask; each bounce is a fixed-shape
stage (intersect -> shade -> NEE -> next-dir -> RR). XLA fuses the
elementwise stages; traversal is the nested while-loop in ops/traverse.py
(Pallas kernel planned). The bounce loop is a static Python loop of
`max_depth` iterations — no dynamic shapes, one compile per (resolution,
spp, depth, feature-set) exactly like the reference's shader variant cache
(renderer_pathtracer.hpp:114-149).

`bvh` here is the flattened world-space BVH (ops/bvh_flatten.WorldBvh).
Traversal dispatches to the Pallas packet kernel on TPU (~550 Mrays/s
coherent primary on v5e; packet divergence degrades incoherent bounces —
treelet-binned reordering is the planned fix) or the portable stackless
XLA wavefront elsewhere.

Faithfully reproduced semantics (with reference anchors):
  * seed = xxhash32(px, py, frame)                 gltf_pathtrace.slang:560
  * Gaussian subpixel AA, sigma=0.4246609          :576, functions:37
  * env-miss MIS vs NEE                            :129-156, functions:483-492
  * emissive add, unlit early-out                  :293, :298-304
  * NEE: 50/50 punctual/env technique MIS          functions:357-464
  * deferred shadow ray after BSDF sample          :462-471
  * Russian roulette from depth 3, cap 0.95        :476-482
  * firefly clamp on mean luminance                :534-538
  * running-mean accumulation                      :626-630
  * max-roughness clamp ("roughness regularization") :267-268
  * Beer-Lambert volume absorption between bounces  functions:604-645
  * stochastic alpha (re-trace on rejection)        :744-773
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field, replace
from functools import partial

import jax
import jax.numpy as jnp

from . import rng
from .bsdf import (
    DIRAC,
    EVENT_ABSORB,
    EVENT_GLOSSY_REFLECTION,
    EVENT_IMPULSE_REFLECTION,
    EVENT_IMPULSE_TRANSMISSION,
    bsdf_evaluate,
    bsdf_sample,
)
from .camera import apply_depth_of_field, generate_rays
from .hitstate import get_hit_state, get_hit_state_fused, safe_offset_ray
from .lights import sample_one_light
from .materials_eval import evaluate_material, get_opacity
from .sky import eval_sky, pdf_sky, sample_sky
from .traverse import INFINITE, dot3
from .traverse_wavefront import intersect_rays_wavefront
from .textures import sample_texture

ANTIALIASING_STD = 0.4246609
# compact-frame mode activates at this lane count (tests lower it to
# exercise the compact machinery on tiny CPU frames)
COMPACT_MIN_LANES = 65536
RR_MIN_DEPTH = 3
MIN_TRANSMISSION = 0.01
VOLUME_MIN_SCATTER = 0.001
VOLUME_RAND_FLOOR = 1.0e-10


def _hg_sample(u2, g, wi):
    """Henyey-Greenstein direction sample around wi
    (sampleHenyeyGreenstein, consumed at functions:625)."""
    g = jnp.clip(g, -0.99, 0.99)
    sq = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * u2[..., 0], 1e-6)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u2[..., 0], (1.0 + g * g - sq * sq) / jnp.maximum(2.0 * g, 1e-6))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2[..., 1]
    from .sky import _onb

    t, b = _onb(wi)
    return (
        t * (jnp.cos(phi) * sin_t)[..., None]
        + b * (jnp.sin(phi) * sin_t)[..., None]
        + wi * cos_t[..., None]
    )


def _hg_pdf(cos_t, g):
    g = jnp.clip(g, -0.99, 0.99)
    denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-6)
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(denom))


@dataclass(frozen=True)
class RenderConfig:
    """Static (jit-specializing) render parameters — the analog of the
    reference's shader-variant key + push-constant statics."""

    width: int = 512
    height: int = 512
    spp: int = 1
    max_depth: int = 5
    features: frozenset = frozenset()
    env_kind: str = "sky"  # "sky" | "hdr" | "solid"
    has_lights: bool = False
    alpha_any: bool = False  # any MASK/BLEND material in scene
    alpha_rounds: int = 4  # max stochastic-alpha re-traces per bounce
    firefly_clamp: float = 10.0
    aperture: float = 0.0
    focal_distance: float = 0.0
    orthographic: bool = False
    transmission_rounds: int = 4  # shadow-ray transmission marches
    traversal: str = "packet"  # "packet" (Pallas, TPU) | "wavefront" (XLA)
    sort_rays: bool = True  # reorder rays (octant+Morton) before each trace
    packet_tiles: int = 8  # max 1024-lane tiles sharing one traversal stack (measured optimum in-frame)
    # stack width for the PEELED bounce 0 closest trace only (shadow + loop
    # traces keep packet_tiles). Measured on 1080p shader_ball: 16 wins on
    # the isolated kernel (60.7 Mrays/s on tile-ordered primaries) but
    # LOSES end-to-end (284 ms with 16 everywhere in bounce 0, 277 ms with
    # 16 closest-only, vs 271.5 ms uniform 8) — the extra packing/launch
    # variants cost more than the primaries save. Keep 8.
    primary_tiles: int = 8
    # produce the full denoiser guide set (adds specular albedo + specular
    # hit distance, shaderio.h:54-65; costs a few extra sorted columns)
    denoise_guides: bool = False
    # compact-frame mode: pad every trace to this fixed lane count so the
    # Pallas kernel compiles ONE grid shared by all prefix buckets (dead
    # padding clusters into packets that exit at the root test)
    trace_width: int = 0
    # solid background (eSceneUseSolidBackground): None or (r, g, b)
    background: tuple | None = None
    # infinite plane + shadow catcher (frameInfo.infinitePlane*,
    # checkInfinitePlaneIntersection + handleShadowCatcher)
    use_infinite_plane: bool = False
    plane_height: float = 0.0
    plane_shadow_catcher: bool = False
    plane_base_color: tuple = (0.5, 0.5, 0.5)
    plane_metallic: float = 0.0
    plane_roughness: float = 0.5
    shadow_catcher_darken: float = 0.0
    # fused hit-state: ONE wide per-world-tri row gather instead of 5 row
    # gathers + matrix transforms (ops/hitstate.get_hit_state_fused);
    # VKGR_FUSED_HITSTATE=0 selects the legacy path for A/B measurement
    fused_hitstate: bool = True
    # Pallas packet kernel flavor: "v2" (binary fused rows) | "v3" (BVH4
    # fused rows — half the scalar pops/fetches per tree progress).
    # Measured (kbench, shader_ball): v3 wins on incoherent/bounce rays
    # (~10-15%), v2 wins on tile-coherent primaries (~20%) — so the loop
    # defaults to v3 and the peeled primary bounce to v2.
    packet_kernel: str = "v3"
    primary_kernel: str = "v2"
    # per-packet entry points (v3/v5): seed each Morton-sorted packet's
    # stack at its deepest bounding node + off-path siblings (lossless cut,
    # oracle-tested). Default off until measured end-to-end on hardware —
    # flip via VKGR_ENTRY_POINTS=1.
    entry_points: bool = False
    # previous-frame hit seeding for the primary trace (the sound variant
    # of hash-based ray-path prediction, PAPERS.md): each pixel's last
    # first-hit (rnode, tri) is re-verified against the CURRENT triangle
    # by one Moller-Trumbore test, and its t seeds the kernel's tmax — the
    # traversal only explores nodes intersecting [0, t_seed], and the
    # verified seed stands whenever the kernel finds nothing strictly
    # closer. EXACT by construction (a stale or wrong prediction either
    # fails the re-verify or is itself a true intersection, i.e. a valid
    # upper bound), so no invalidation is ever needed. Gated to scenes
    # without stochastic alpha (a seeded alpha hit would freeze the alpha
    # RNG decision of the frame it was captured in). Default off until
    # measured end-to-end on hardware — flip via VKGR_PRIMARY_SEED=1.
    primary_seed: bool = False
    # barycentric wireframe overlay (the reference's WIREFRAME shader
    # variant, renderer_pathtracer.cpp:1050 macro set) — preview renderer
    wireframe: bool = False
    # TAAU upscaling (ops/upscale.py): sample 0 is placed EXACTLY at the
    # frame's Halton subpixel position (frame["cam_jitter"]) instead of the
    # Gaussian AA jitter, so the temporal upscaler can gather it
    # jitter-correctly (the DLSS-RR jittered-render contract, dlss.hpp)
    taa_jitter: bool = False
    # spp>1 BATCHED launch: trace all spp samples as one n*spp-lane batch
    # instead of a lax.scan of spp sequential frames — per-bounce sorts,
    # bucket machinery and launch glue amortize k-fold, and late-bounce
    # survivors from all samples co-compact into fuller packets. Sample
    # streams are decorrelated by seeding xxhash32(px, py, frame*spp + s)
    # (placement-independent, like the reference's per-frame seeds,
    # gltf_pathtrace.slang:560). Offline lever — NEXT.md #6.
    spp_batch: bool = False
    # peeled-bounce shadow rays through the sorted/bucketed trace path:
    # liveness+octant co-sort clusters the live lanes into few, direction-
    # coherent packets instead of a full-width launch with scattered live
    # lanes (the compact sort hasn't happened yet at bounce 0)
    peel_sort_shadow: bool = False
    # native-width bucket traces in the compact loop: trace each occupancy
    # bucket at its own width instead of dead-padding every launch back to
    # full frame width (pays per-bucket grid compiles once, skips the
    # full-width pack + dead-packet launches every bounce)
    trace_native: bool = False
    # loop-bounce shadow rays through the sorted/bucketed trace path: the
    # compact sort keys on the PATH ray (origin Morton + path direction
    # octant), so loop shadow packets have coherent origins but random
    # directions (env/light samples) — near union-of-nodes traversal. This
    # lever re-sorts each bounce's shadow rays by THEIR direction octant
    # (exp_glue: direction-mixed packets measured ~2x slower)
    loop_sort_shadow: bool = False


def _hit_state(flat, bvh, hits, rd, cfg):
    """Hit-state dispatch: fused single-gather path (default) vs the legacy
    5-gather object-space path (kept as the oracle / A-B reference)."""
    if cfg.fused_hitstate:
        return get_hit_state_fused(
            jnp.asarray(bvh.hit_attr), jnp.asarray(bvh.rn_attr_base), hits, rd
        )
    return get_hit_state(flat, hits, rd)


def _env_brdf_approx2(spec_color, alpha, nov):
    """Integrated specular reflectance approximation [Ray Tracing Gems,
    ch. 32] — the specular-albedo guide the reference feeds DLSS-RR
    (dlss_util.h:38-60, gltf_pathtrace.slang:249-259)."""
    nov = jnp.abs(nov)
    x = jnp.stack([jnp.ones_like(nov), nov, nov * nov, nov ** 3], axis=-1)
    y = jnp.stack([jnp.ones_like(alpha), alpha, alpha * alpha, alpha ** 3], axis=-1)

    def dot2(m, a, b):
        return (m[0][0] * a[..., 0] + m[0][1] * a[..., 1]) * b[..., 0] + (
            m[1][0] * a[..., 0] + m[1][1] * a[..., 1]) * b[..., 1]

    def dot3m(m, a, b):
        r = []
        for i in range(3):
            r.append(m[i][0] * a[..., 0] + m[i][1] * a[..., 1] + m[i][2] * a[..., 2])
        return r[0] * b[..., 0] + r[1] * b[..., 1] + r[2] * b[..., 2]

    m1 = ((0.99044, -1.28514), (1.29678, -0.755907))
    m2 = ((1.0, 2.92338, 59.4188), (20.3225, -27.0302, 222.592), (121.563, 626.13, 316.627))
    m3 = ((0.0365463, 3.32707), (9.0632, -9.04756))
    m4 = ((1.0, 3.59685, -1.36772), (9.04401, -16.3174, 9.22949), (5.56589, 19.7886, -20.2123))
    x2, y2 = x[..., 0:2], y[..., 0:2]
    xw = jnp.stack([x[..., 0], x[..., 1], x[..., 3]], axis=-1)
    yw = jnp.stack([y[..., 0], y[..., 1], y[..., 3]], axis=-1)
    xzw = jnp.stack([x[..., 0], x[..., 2], x[..., 3]], axis=-1)
    bias = dot2(m1, x2, y2) / jnp.maximum(dot3m(m2, xw, yw), 1e-6)
    scale = dot2(m3, x2, y2) / jnp.maximum(dot3m(m4, xzw, yw), 1e-6)
    bias = bias * jnp.clip(spec_color[..., 1] * 50.0, 0.0, 1.0)
    return spec_color * jnp.maximum(scale, 0.0)[..., None] + jnp.maximum(bias, 0.0)[..., None]


def _sort_keys(bvh, ro, rd, alive):
    """Ray-reorder key: dead-last | direction octant | Morton10 of origin —
    the TPU analog of SER ReorderThread (raytracer_interface.h.slang:199-222).
    Dead lanes cluster into packets that exit in one step."""
    # 32-bit key: dead(1) | origin morton 5 bits/axis (15) | direction
    # morton 4 bits/axis (12). x64 is disabled, so it must fit uint32.
    # Rays sharing an origin (primary) sort into direction blocks (square
    # pixel tiles); scattered-origin bounce rays sort spatially first.
    lo = bvh.nodes_self[0, 0:3]
    hi = bvh.nodes_self[0, 3:6]
    qo = jnp.clip((ro - lo) / jnp.maximum(hi - lo, 1e-9) * 31.0, 0, 31).astype(jnp.uint32)
    qd = jnp.clip((rd * 0.5 + 0.5) * 15.0, 0, 15).astype(jnp.uint32)

    def expand5(v):  # 5 bits -> every 3rd bit
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0100F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x010C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return v

    def expand4(v):
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x00F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x0C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x249249)
        return v

    m_o = (expand5(qo[:, 0]) << jnp.uint32(2)) | (expand5(qo[:, 1]) << jnp.uint32(1)) | expand5(qo[:, 2])
    m_d = (expand4(qd[:, 0]) << jnp.uint32(2)) | (expand4(qd[:, 1]) << jnp.uint32(1)) | expand4(qd[:, 2])
    dead = (~alive).astype(jnp.uint32)
    return (dead << jnp.uint32(27)) | (m_o << jnp.uint32(12)) | m_d


def _inverse_perm(order):
    """Inverse permutation via scatter (cheaper than a second argsort)."""
    n = order.shape[0]
    return jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))


def trace_closest(bvh, ro, rd, cfg: RenderConfig, tmin=0.0, tmax=None, alive=None, coherent=False, order=None, anyhit=False):
    """Traversal dispatch: Pallas packet kernel on TPU, stackless XLA
    wavefront elsewhere (portable, same results).

    With sort_rays on, rays are reordered by (liveness, octant, origin
    Morton) before tracing — wavefront compaction without dynamic shapes.
    The reorder is a multi-operand `lax.sort` CO-SORT (the permutation is
    never materialized): XLA:TPU lowers gather-by-permutation to ~34 ns per
    element, so the round-1 argsort + fancy-indexing pipeline cost more
    than traversal itself (profiled: 76%% of frame time); a 10-operand
    bitonic co-sort of 2M rays is ~13 ms. Results return to lane order via
    a second co-sort keyed on the carried lane ids. Dead lanes trace with
    tmax=-1 so their packets terminate at the root test.
    """
    n = ro.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INFINITE)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax)
    if alive is not None:
        tmax = jnp.where(alive, tmax, -1.0)
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    do_sort = cfg.sort_rays and cfg.traversal == "packet" and n >= 4096

    if cfg.traversal == "null":  # profiling stub: everything misses
        return {"t": jnp.full(n, INFINITE), "rnode": jnp.full(n, -1, jnp.int32),
                "tri": jnp.full(n, -1, jnp.int32), "u": jnp.zeros(n), "v": jnp.zeros(n)}

    if do_sort:
        from .pallas_traverse import PACKET, intersect_rays_packet_soa

        keys = _sort_keys(bvh, ro, rd, alive if alive is not None else jnp.ones(n, bool))
        lane = jnp.arange(n, dtype=jnp.int32)
        _, lane_s, rox, roy, roz, rdx, rdy, rdz, tmx, tmn = jax.lax.sort(
            (keys, lane, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tmax, tmin_b),
            num_keys=1,
        )

        interp = os.environ.get("VKGR_PALLAS_INTERPRET") == "1"

        def full_trace(ops):
            rox, roy, roz, rdx, rdy, rdz, tmn, tmx = ops
            h = intersect_rays_packet_soa(
                bvh, rox, roy, roz, rdx, rdy, rdz, tmn, tmx,
                anyhit=anyhit, tiles=cfg.packet_tiles, interpret=interp,
                kernel=cfg.packet_kernel, entry_points=cfg.entry_points,
            )
            return h["t"], h["rnode"], h["tri"], h["u"], h["v"]

        ops = (rox, roy, roz, rdx, rdy, rdz, tmn, tmx)
        if alive is None:
            t_s, rn_s, tri_s, u_s, v_s = full_trace(ops)
        else:
            # Occupancy-bucketed compact trace: the sort clusters dead lanes
            # last, so live lanes occupy a prefix. Pick the smallest static
            # bucket that covers the live count and trace only that prefix —
            # late bounces (few survivors) skip most of the per-trace fixed
            # cost (pack/launch/kernel on dead packets). The reference's GPU
            # simply masks dead threads for free (gltf_pathtrace.slang:441);
            # on TPU the static-shape analog is this bucket ladder.
            floor = max(PACKET * cfg.packet_tiles, 8192)
            buckets = [n]
            while buckets[-1] // 2 >= max(floor, n // 16):
                b = -(-(buckets[-1] // 2) // floor) * floor  # ceil to packet multiple
                if b >= buckets[-1]:
                    break
                buckets.append(b)
            live = jnp.sum(alive.astype(jnp.int32))
            idx = jnp.zeros((), jnp.int32)
            for b in buckets[1:]:
                idx = idx + (live <= b).astype(jnp.int32)

            def make_branch(p):
                def br(ops):
                    pre = [o[:p] for o in ops]
                    t, rn, tri, u, v = full_trace(tuple(pre))
                    pad = n - p
                    if pad:
                        t = jnp.concatenate([t, jnp.full((pad,), INFINITE)])
                        rn = jnp.concatenate([rn, jnp.full((pad,), -1, rn.dtype)])
                        tri = jnp.concatenate([tri, jnp.full((pad,), -1, tri.dtype)])
                        u = jnp.concatenate([u, jnp.zeros((pad,))])
                        v = jnp.concatenate([v, jnp.zeros((pad,))])
                    return t, rn, tri, u, v
                return br

            t_s, rn_s, tri_s, u_s, v_s = jax.lax.switch(
                idx, [make_branch(b) for b in buckets], ops
            )
        _, t, rn, tri, u, v = jax.lax.sort(
            (lane_s, t_s, rn_s, tri_s, u_s, v_s), num_keys=1
        )
        return {"t": t, "rnode": rn, "tri": tri, "u": u, "v": v}

    if cfg.traversal == "packet":
        # order-preserving SoA trace (no transpose): used by the compact
        # frame path, whose lanes are already liveness+Morton sorted
        from .pallas_traverse import intersect_rays_packet_soa

        interp = os.environ.get("VKGR_PALLAS_INTERPRET") == "1"
        tiles = cfg.packet_tiles if coherent else 1
        comps = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], tmin_b]
        w = cfg.trace_width
        if w and w > n:
            # fixed-width launch: dead-pad so every bucket reuses ONE
            # compiled kernel grid (padding packets exit at the root)
            zpad = jnp.zeros((w - n,))
            comps = [jnp.concatenate([c, zpad]) for c in comps]
            tmax = jnp.concatenate([tmax, jnp.full((w - n,), -1.0)])
        h = intersect_rays_packet_soa(
            bvh, comps[0], comps[1], comps[2], comps[3], comps[4], comps[5],
            comps[6], tmax, anyhit=anyhit, tiles=tiles, interpret=interp,
            kernel=cfg.packet_kernel, entry_points=cfg.entry_points,
        )
        if w and w > n:
            h = {k: v[:n] for k, v in h.items()}
        return h
    if cfg.traversal == "packet4":
        from .pallas_traverse import intersect_rays_packet

        return intersect_rays_packet(
            bvh, ro, rd, tmin=tmin_b, tmax=tmax, coherent=coherent,
            anyhit=anyhit, max_tiles=cfg.packet_tiles, wide=True,
        )
    return intersect_rays_wavefront(bvh, ro, rd, tmin=tmin_b, tmax=tmax)


def sample_environment(env, d, cfg: RenderConfig):
    """(radiance, pdf) of the environment in direction d
    (pathtrace_functions.h.slang:466-481)."""
    if cfg.env_kind == "hdr":
        from .hdr import eval_hdr

        return eval_hdr(env, d)
    color = eval_sky(env, d)
    pdf = pdf_sky(env, d)
    return color, pdf


def sample_environment_dir(env, u3, cfg: RenderConfig):
    """Importance-sample an env direction: (dir, radiance, pdf)."""
    if cfg.env_kind == "hdr":
        from .hdr import sample_hdr

        return sample_hdr(env, u3)
    return sample_sky(env, u3)


def _env_mis_weight(last_pdf, env_pdf, cfg):
    """computeEnvHitMisWeight (pathtrace_functions.h.slang:483-492)."""
    env_w = 0.5 if cfg.has_lights else 1.0
    w = last_pdf / jnp.maximum(last_pdf + env_w * env_pdf, 1e-20)
    return jnp.where(last_pdf == DIRAC, 1.0, w)


def _sample_lights(flat, env, pos, normal, seed, cfg: RenderConfig):
    """NEE technique mix: punctual lights vs environment, 50/50 when both
    exist (pathtrace_functions.h.slang:357-464). Returns DirectLight dict +
    new seed."""
    light_w = 0.5 if cfg.has_lights else 0.0
    env_w = 0.5 if cfg.has_lights else 1.0

    u_pick, seed = rng.rand(seed)
    pick_light = u_pick < light_w if cfg.has_lights else jnp.zeros(pos.shape[:-1], bool)

    direction = jnp.zeros_like(pos)
    radiance = jnp.zeros_like(pos)
    distance = jnp.full(pos.shape[:-1], INFINITE)
    pdf = jnp.zeros(pos.shape[:-1])
    env_pdf = jnp.zeros(pos.shape[:-1])

    if cfg.has_lights:
        u_sel, seed = rng.rand(seed)
        nl = max(flat.num_lights, 1)
        li = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        sel_pdf = 1.0 / nl
        u2, seed = rng.rand2(seed)
        lc = sample_one_light(flat, li, pos, normal, u2)
        direction = jnp.where(pick_light[..., None], lc["direction"], direction)
        distance = jnp.where(pick_light, lc["distance"], distance)
        radiance = jnp.where(
            pick_light[..., None], lc["intensity"] / (sel_pdf * light_w), radiance
        )
        pdf = jnp.where(pick_light, jnp.where(lc["pdf"] == DIRAC, DIRAC, sel_pdf * lc["pdf"]), pdf)

    # environment technique
    u3, seed = rng.rand3(seed)
    e_dir, e_rad, e_pdf = sample_environment_dir(env, u3, cfg)
    pick_env = ~pick_light
    direction = jnp.where(pick_env[..., None], e_dir, direction)
    radiance = jnp.where(
        pick_env[..., None], e_rad / jnp.maximum(e_pdf * env_w, 1e-20)[..., None], radiance
    )
    env_pdf = jnp.where(pick_env, e_pdf, env_pdf)
    # env pdf of the light-sampled direction (for technique MIS)
    _, env_pdf_of_light_dir = sample_environment(env, direction, cfg)
    env_pdf = jnp.where(pick_light, env_pdf_of_light_dir, env_pdf)

    # technique MIS combine (pathtrace_functions.h.slang:452-461)
    not_dirac = pdf != DIRAC
    pdf_sum = light_w * jnp.maximum(pdf, 0.0) + env_w * env_pdf
    mis = jnp.where(
        pick_light, light_w * jnp.maximum(pdf, 0.0), env_w * env_pdf
    ) / jnp.maximum(pdf_sum, 1e-20)
    mis = jnp.where(not_dirac, mis, 1.0)
    radiance = radiance * mis[..., None]
    pdf = jnp.where(not_dirac, pdf_sum, DIRAC)
    return {"direction": direction, "radiance_over_pdf": radiance, "distance": distance, "pdf": pdf}, seed


def _trace_shadow(flat, bvh, ro, rd, dist, seed, cfg: RenderConfig, alive=None):
    """Shadow transmission factor [N,3]. Opaque-only scenes: single
    occlusion test. With transmission enabled: march up to
    transmission_rounds surfaces accumulating colored transmission
    (gltf_pathtrace.slang:776-820 semantics)."""
    n = ro.shape[0]
    if "transmission" not in cfg.features and not cfg.alpha_any:
        hits = trace_closest(bvh, ro, rd, cfg, tmin=0.0, tmax=dist, alive=alive, coherent=True, anyhit=True)
        occluded = hits["tri"] >= 0
        return jnp.where(occluded[..., None], 0.0, 1.0), seed

    transmission = jnp.ones((n, 3))
    org = ro
    remaining = dist
    alive = jnp.ones(n, bool)
    for _ in range(cfg.transmission_rounds):
        hits = trace_closest(bvh, org, rd, cfg, tmin=1e-4, tmax=remaining)
        hit_mask = alive & (hits["tri"] >= 0)
        hs = _hit_state(flat, bvh, hits, rd, cfg)
        mat_id = flat.rn_material[jnp.maximum(hits["rnode"], 0)]

        # alpha: probability (1 - opacity) of passing through untouched
        if cfg.alpha_any:
            opacity = get_opacity(flat, mat_id, hs, textured="textured" in cfg.features)
        else:
            opacity = jnp.ones(n)
        u, seed = rng.rand(seed)
        pass_alpha = u >= opacity

        if "transmission" in cfg.features:
            tfac = flat.materials["transmission_factor"][mat_id]
            bc = flat.materials["base_color_factor"][mat_id][..., :3]
            ior = flat.materials["ior"][mat_id] if "ior" in cfg.features else jnp.full(n, 1.5)
            cos_theta = jnp.abs(dot3(rd, hs["nrm"]))
            f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
            fres = f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5
            surface_trans = tfac[..., None] * bc * (1.0 - fres)[..., None]
        else:
            surface_trans = jnp.zeros((n, 3))

        this_trans = jnp.where(pass_alpha[..., None], 1.0, surface_trans)
        transmission = jnp.where(hit_mask[..., None], transmission * this_trans, transmission)
        blocked = jnp.max(transmission, axis=-1) <= MIN_TRANSMISSION
        transmission = jnp.where(blocked[..., None], 0.0, transmission)
        # continue past the surface
        step = hits["t"] + 1e-4
        org = jnp.where(hit_mask[..., None], org + rd * step[..., None], org)
        remaining = jnp.where(hit_mask, remaining - step, remaining)
        alive = hit_mask & ~blocked & (remaining > 1e-4)
    # any remaining hit after the budget -> fully occluded
    hits = trace_closest(bvh, org, rd, cfg, tmin=1e-4, tmax=remaining)
    transmission = jnp.where((alive & (hits["tri"] >= 0))[..., None], 0.0, transmission)
    return transmission, seed


def _trace_with_alpha(flat, bvh, ro, rd, seed, cfg: RenderConfig, alive=None):
    """Closest hit with stochastic alpha: re-trace past rejected hits
    (the TPU analog of the RayQuery any-hit Proceed loop,
    raytracer_interface.h.slang:82-122)."""
    hits = trace_closest(bvh, ro, rd, cfg, alive=alive, coherent=True)
    if not cfg.alpha_any:
        return hits, seed
    org = ro
    t_accum = jnp.zeros(ro.shape[0])
    # SceneOmm role (ops/omm.py, gltf_scene_omm.cpp analog): hits on
    # conservatively-OPAQUE triangles never reject — skip the opacity eval
    # for them, and skip the whole re-trace round at runtime when no lane
    # rejected (the common case in mostly-opaque scenes).
    cls_tab = jnp.asarray(bvh.attr_alpha_class).astype(jnp.int32)
    for _ in range(cfg.alpha_rounds):
        attr_row = bvh.rn_attr_base[jnp.maximum(hits["rnode"], 0)] + jnp.maximum(hits["tri"], 0)
        cls = cls_tab[jnp.clip(attr_row, 0, cls_tab.shape[0] - 1)]
        maybe = (hits["tri"] >= 0) & (cls != 0)  # != ALPHA_OPAQUE
        hs = _hit_state(flat, bvh, hits, rd, cfg)
        mat_id = flat.rn_material[jnp.maximum(hits["rnode"], 0)]
        opacity = get_opacity(flat, mat_id, hs, textured="textured" in cfg.features)
        u, seed = rng.rand(seed)
        reject = maybe & (u > opacity)
        step = hits["t"] + 1e-4
        org2 = org + rd * step[..., None]
        t_accum2 = t_accum + step

        def retrace(ops):
            org2, rd_ = ops
            return trace_closest(bvh, org2, rd_, cfg, tmin=0.0)

        def skip(ops):
            return {k: v for k, v in hits.items()}

        re = jax.lax.cond(jnp.any(reject), retrace, skip, (org2, rd))
        hits = {
            "t": jnp.where(reject, re["t"], hits["t"]),
            "rnode": jnp.where(reject, re["rnode"], hits["rnode"]),
            "tri": jnp.where(reject, re["tri"], hits["tri"]),
            "u": jnp.where(reject, re["u"], hits["u"]),
            "v": jnp.where(reject, re["v"], hits["v"]),
        }
        org = jnp.where(reject[..., None], org2, org)
        t_accum = jnp.where(reject, t_accum2, t_accum)
    hits = dict(hits)
    hits["t"] = hits["t"] + t_accum  # restore world-distance from the camera
    return hits, seed


def _state_columns_spec(cfg: RenderConfig):
    """Loop-carried per-lane fields that must ride the compact-frame
    co-sort at bounces >= 1. First-hit captures (guides, first_pos, solid,
    first_rnode) are written during the PEELED bounce 0 in LANE order and
    never touched later, so they stay in pixel space and skip every sort.
    Feature-gated fields that are never written (feature off) stay at
    their init constant — permutation-invariant — and are skipped too."""
    spec = [
        ("ro", 3), ("rd", 3), ("radiance", 3), ("throughput", 3),
        ("alive", None), ("last_pdf", None), ("max_rough", 2),
        ("cone_width", None), ("seed", None), ("pixel", None),
    ]
    if "transmission" in cfg.features:
        spec.append(("is_inside", None))
    if "volume" in cfg.features:
        spec.append(("att_sigma", 3))
    if "volume_scatter" in cfg.features:
        spec += [("scatter_sigma", 3), ("scatter_g", None)]
    if "dispersion" in cfg.features:
        spec.append(("chroma", None))
    if cfg.denoise_guides:
        # specular hit distance is captured at depth 1 (the trace after the
        # armed bounce), so these two DO ride the loop sorts
        spec += [("guide_spec_hitdist", None), ("capture_spec", None)]
    return spec


def _state_to_columns(state, spec):
    cols = []
    for k, c in spec:
        if c is None:
            cols.append(state[k])
        else:
            cols.extend(state[k][:, i] for i in range(c))
    return cols


def _columns_to_state(cols, spec, template):
    out = dict(template)
    i = 0
    for k, c in spec:
        if c is None:
            out[k] = cols[i]
            i += 1
        else:
            out[k] = jnp.stack(cols[i : i + c], axis=-1)
            i += c
    return out


def _bucket_ladder(n, levels=(1, 4, 16, 64), align=8192):
    """Distinct static prefix sizes n, ~n/4, ~n/16, ~n/64 (packet-aligned)."""
    out = []
    for d in levels:
        b = n if d == 1 else min(n, -(-(n // d) // align) * align)
        if not out or b < out[-1]:
            out.append(b)
    return out


def _hdr_background_fixup(state, env, cfg):
    """Directly-visible background fix-up: indirect bounces used the
    reduced-resolution sampling map (consistent pdf+radiance, see
    ops/hdr.py), but the primary miss is the on-screen background — swap
    in the full-resolution radiance (one gather per sample instead of per
    bounce). first_pos holds the primary direction for miss lanes.
    PRECONDITION: radiance, solid and first_pos must share the same lane
    order (call before any pixel-restore sort)."""
    if not (cfg.env_kind == "hdr" and cfg.background is None):
        return state
    from .hdr import eval_hdr

    miss1 = ~state["solid"]
    l_full, _ = eval_hdr(env, state["first_pos"], full=True)
    l_red, _ = eval_hdr(env, state["first_pos"])
    state = dict(state)
    state["radiance"] = state["radiance"] + jnp.where(
        miss1[..., None], l_full - l_red, 0.0
    )
    return state


def _primary_seed_hits(bvh, ro, rd, prev_ref):
    """Re-verify last frame's per-lane first hit against the CURRENT
    triangle table (refit-safe): one Moller-Trumbore test per lane.
    Returns (t, rnode, tri, u, v, valid) — a sound tmax seed + fallback
    hit for the primary trace (see RenderConfig.primary_seed)."""
    ref = jnp.clip(prev_ref, 0, bvh.tris.shape[0] - 1)
    tv = bvh.tris[ref]  # [n,16] row gather; cols 0:9 = world verts
    v0 = tv[:, 0:3]
    e1 = tv[:, 3:6] - v0
    e2 = tv[:, 6:9] - v0
    p = jnp.cross(rd, e2)
    det = jnp.sum(e1 * p, axis=-1)
    ok = jnp.abs(det) >= 1e-12
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = ro - v0
    u = jnp.sum(tvec * p, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(rd * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    valid = ((prev_ref >= 0) & ok & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > 0.0))
    t = jnp.where(valid, t, INFINITE)
    return (t, bvh.wtri_rnode[ref], bvh.wtri_tri[ref], u, v, valid)


def path_trace_batch(flat, bvh, env, ro, rd, seed, cfg: RenderConfig, pixel_angle=0.0, prev_rn_o2w=None, pixel=None, prev_ref=None):
    """Trace one sample per lane. Returns (radiance [N,3], aux dict, seed).

    The bounce loop is a lax.scan with a depth-uniform body (first-hit
    captures and Russian roulette are masked by the carried depth index), so
    the traversal graph is compiled ONCE instead of max_depth times — the
    compile-time analog of the reference's single megakernel loop.
    """
    n = ro.shape[0]
    # Compact-frame mode (TPU): per-lane state is liveness+Morton co-sorted
    # once per bounce and the whole bounce body (traces AND shading glue)
    # runs on a static prefix bucket covering the live count. Profiled on
    # v5e: shading glue is ~40 ms per 2M lanes per bounce (get_hit_state's
    # row gathers alone are 31 ms) and was paid at FULL width every bounce
    # even when <15% of lanes survive. Lane order is restored once per
    # sample by a final co-sort on the carried pixel id.
    compact = cfg.sort_rays and cfg.traversal == "packet" and n >= COMPACT_MIN_LANES
    cfg_t = replace(cfg, sort_rays=False, trace_width=n) if compact else cfg
    state = dict(
        pixel=jnp.arange(n, dtype=jnp.int32) if pixel is None else pixel.astype(jnp.int32),
        ro=ro,
        rd=rd,
        radiance=jnp.zeros((n, 3)),
        throughput=jnp.ones((n, 3)),
        alive=jnp.ones(n, bool),
        last_pdf=jnp.full(n, DIRAC),
        max_rough=jnp.zeros((n, 2)),
        is_inside=jnp.zeros(n, bool),
        solid=jnp.ones(n, bool),
        first_pos=jnp.full((n, 3), 1e34),
        first_rnode=jnp.full(n, -1, jnp.int32),
        first_tri=jnp.full(n, -1, jnp.int32),
        guide_albedo=jnp.zeros((n, 3)),
        guide_normal=jnp.zeros((n, 3)),
        guide_rough=jnp.zeros(n),
        guide_spec_albedo=jnp.zeros((n, 3)),
        guide_spec_hitdist=jnp.zeros(n),
        capture_spec=jnp.zeros(n, bool),
        guide_pos_prev=jnp.zeros((n, 3)),
        att_sigma=jnp.zeros((n, 3)),
        scatter_sigma=jnp.zeros((n, 3)),
        scatter_g=jnp.zeros(n),
        chroma=jnp.full(n, -1, jnp.int32),  # dispersion: -1 achromatic, 0/1/2 = R/G/B
        cone_width=jnp.zeros(n),
        seed=seed,
        rays=jnp.zeros((), jnp.float32),
    )

    def bounce(state, depth, cfg_t=cfg_t, seed_hits=None, peel=False):
        ro, rd = state["ro"], state["rd"]
        alive = state["alive"]
        seed = state["seed"]
        radiance = state["radiance"]
        throughput = state["throughput"]
        first = depth == 0

        state["rays"] = state["rays"] + jnp.sum(alive.astype(jnp.float32))
        # each trace co-sorts its own rays: the shadow trace gets ITS
        # direction octants grouped (measured 2x on mixed-direction packets)
        # shadow traces in this bounce keep the loop stack width: their
        # directions (toward env/light samples) are divergent even when the
        # closest-trace origins are tile-coherent, so wider packets lose
        cfg_s = replace(cfg_t, packet_tiles=cfg.packet_tiles)
        if (peel and cfg.peel_sort_shadow) or (not peel and cfg.loop_sort_shadow):
            # peeled-bounce shadow rays run at FULL frame width with only
            # the hit fraction live, scattered through every packet (the
            # compact sort hasn't happened yet) — route them through the
            # sorted/bucketed trace path instead: liveness+octant co-sort
            # clusters the live lanes into few, direction-coherent packets.
            # Loop bounces (cfg.loop_sort_shadow) benefit for a different
            # reason: the compact sort keyed on the PATH ray, so shadow
            # directions are octant-mixed within every packet.
            cfg_s = replace(cfg, trace_width=0, packet_kernel=cfg.packet_kernel)
        if seed_hits is None:
            hits, seed = _trace_with_alpha(flat, bvh, ro, rd, seed, cfg_t, alive=alive)
        else:
            # primary-seed fast path (RenderConfig.primary_seed; no-alpha
            # scenes only, so this is plain trace_closest): the verified
            # previous-frame hit bounds tmax — the kernel returns anything
            # STRICTLY closer, else the seed hit stands
            s_t, s_rn, s_tri, s_u, s_v, s_valid = seed_hits
            hits = trace_closest(bvh, ro, rd, cfg_t, tmax=s_t, alive=alive, coherent=True)
            use = s_valid & (hits["tri"] < 0)
            hits = {
                "t": jnp.where(use, s_t, hits["t"]),
                "rnode": jnp.where(use, s_rn, hits["rnode"]),
                "tri": jnp.where(use, s_tri, hits["tri"]),
                "u": jnp.where(use, s_u, hits["u"]),
                "v": jnp.where(use, s_v, hits["v"]),
            }
        miss = hits["tri"] < 0

        if cfg.denoise_guides:
            # specular hit distance: the depth-1 trace result of a glossy/
            # impulse reflection chain; env miss = fp16 max
            # (gltf_pathtrace.slang:138-141, :218-221)
            cap = state["capture_spec"] & alive
            hd = jnp.where(miss, 65504.0, hits["t"])
            state["guide_spec_hitdist"] = jnp.where(cap, hd, state["guide_spec_hitdist"])
            state["capture_spec"] = jnp.zeros_like(state["capture_spec"])

        # ---------------- infinite plane (pathtrace_functions.h.slang:556-585)
        if cfg.use_infinite_plane:
            dn = rd[:, 1]
            t_plane = (cfg.plane_height - ro[:, 1]) / jnp.where(jnp.abs(dn) < 1e-6, 1.0, dn)
            plane_hit = (
                (ro[:, 1] > cfg.plane_height)
                & (jnp.abs(dn) > 1e-6)
                & (t_plane > 0)
                & (t_plane < jnp.where(miss, INFINITE, hits["t"]))
            )
            miss = miss & ~plane_hit
        else:
            plane_hit = jnp.zeros_like(miss)

        # ---------------- environment hit
        env_color, env_pdf = sample_environment(env, rd, cfg)
        mis_w = _env_mis_weight(state["last_pdf"], env_pdf, cfg)
        env_contrib = throughput * mis_w[..., None] * env_color
        if cfg.background is not None:
            # primary miss shows the solid backplate (tryPrimaryMissBackplate,
            # pathtrace_functions.h.slang:944-971); indirect rays still see env
            bg = jnp.broadcast_to(jnp.asarray(cfg.background, jnp.float32), env_contrib.shape)
            env_contrib = jnp.where(first, bg, env_contrib)
        radiance = radiance + jnp.where((alive & miss)[..., None], env_contrib, 0.0)
        first_miss = first & alive & miss
        state["solid"] = jnp.where(first_miss, False, state["solid"])
        state["first_pos"] = jnp.where(first_miss[..., None], rd, state["first_pos"])

        lane_hit = alive & ~miss
        alive = lane_hit

        lane_plane = alive & plane_hit if cfg.use_infinite_plane else jnp.zeros_like(alive)

        # ---------------- surface shading (+ ray-cone texture LOD,
        # rayConeWorldFootprint pathtrace_functions.h.slang:174-179)
        hs = _hit_state(flat, bvh, hits, rd, cfg)
        mat_id = flat.rn_material[jnp.maximum(hits["rnode"], 0)]
        world_foot = (state["cone_width"] + pixel_angle * hits["t"]) / jnp.maximum(
            jnp.abs(dot3(hs["nrm"], -rd)), 1e-3
        )
        tex_grad = world_foot * hs["texel_density"]
        state["cone_width"] = jnp.where(lane_hit, world_foot, state["cone_width"])
        pbr = evaluate_material(
            flat, mat_id, hs, features=cfg.features, is_inside=state["is_inside"], tex_lod=tex_grad
        )

        if cfg.use_infinite_plane:
            # replace hit state + material for plane lanes
            # (defaultPbrMaterial with the frameInfo plane params)
            ppos = ro + rd * t_plane[..., None]
            up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), ppos.shape)
            tx = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), ppos.shape)
            bz = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), ppos.shape)
            pl = lane_plane[..., None]
            for k_, v_ in (("pos", ppos), ("nrm", up), ("geonrm", up), ("shadow_pos", ppos), ("tangent", tx), ("bitangent", bz)):
                hs[k_] = jnp.where(pl, v_, hs[k_])
            pbr["base_color"] = jnp.where(pl, jnp.asarray(cfg.plane_base_color, jnp.float32), pbr["base_color"])
            pbr["metallic"] = jnp.where(lane_plane, cfg.plane_metallic, pbr["metallic"])
            alpha_p = max(cfg.plane_roughness, 0.0014) ** 2
            pbr["roughness"] = jnp.where(lane_plane[:, None], alpha_p, pbr["roughness"])
            pbr["N"] = jnp.where(pl, up, pbr["N"])
            pbr["Ng"] = jnp.where(pl, up, pbr["Ng"])
            pbr["T"] = jnp.where(pl, tx, pbr["T"])
            pbr["B"] = jnp.where(pl, bz, pbr["B"])
            pbr["emissive"] = jnp.where(pl, 0.0, pbr["emissive"])
            hits["t"] = jnp.where(lane_plane, t_plane, hits["t"])
            lane_hit = alive & (~miss | lane_plane)
            alive = lane_hit

        first_hit = first & lane_hit
        state["first_pos"] = jnp.where(first_hit[..., None], hs["pos"], state["first_pos"])
        state["first_rnode"] = jnp.where(first_hit, hits["rnode"], state["first_rnode"])
        state["first_tri"] = jnp.where(first_hit, hits["tri"], state["first_tri"])
        state["guide_albedo"] = jnp.where(first_hit[..., None], pbr["base_color"], state["guide_albedo"])
        state["guide_normal"] = jnp.where(first_hit[..., None], pbr["N"], state["guide_normal"])
        state["guide_rough"] = jnp.where(first_hit, jnp.sqrt(pbr["roughness"][..., 0]), state["guide_rough"])
        if cfg.denoise_guides and prev_rn_o2w is not None:
            # instance motion: previous-frame world position of this surface
            # point via the prev per-node object->world snapshot
            # (snapshot_prev_transforms.comp.slang:22-31,
            # gltf_pathtrace.slang:236-241)
            from .hitstate import _xform_point_b

            rn_safe = jnp.maximum(hits["rnode"], 0)
            rn_row = flat.rn_packed[rn_safe]
            w2o = rn_row[..., 16:32].reshape(rn_row.shape[:-1] + (4, 4))
            prev_row = prev_rn_o2w[rn_safe]
            prev_o2w = prev_row.reshape(prev_row.shape[:-1] + (4, 4))
            obj_pos = _xform_point_b(w2o, hs["pos"])
            pos_prev = _xform_point_b(prev_o2w, obj_pos)
            state["guide_pos_prev"] = jnp.where(
                first_hit[..., None], pos_prev, state["guide_pos_prev"]
            )
        if cfg.denoise_guides:
            # KHR_materials_specular energy-conservation clamp + EnvBRDFApprox2
            # (gltf_pathtrace.slang:249-259)
            f0i = ((pbr["ior2"] - pbr["ior1"]) / jnp.maximum(pbr["ior2"] + pbr["ior1"], 1e-6)) ** 2
            scc = jnp.minimum(f0i[..., None] * pbr["specular_color"], 1.0)
            spec_alb = _env_brdf_approx2(scc, pbr["roughness"][..., 0], dot3(pbr["N"], rd))
            state["guide_spec_albedo"] = jnp.where(first_hit[..., None], spec_alb, state["guide_spec_albedo"])

        # ---------------- in-volume segment (processVolumeSegment,
        # functions:904-939): Beer-Lambert absorption always; HG scatter
        # events when the medium scatters (KHR_materials_volume_scatter)
        scattered = jnp.zeros_like(alive)
        if "volume" in cfg.features:
            in_medium = lane_hit & state["is_inside"]
            if "volume_scatter" in cfg.features:
                sig_s = state["scatter_sigma"]
                sig_t = state["att_sigma"] + sig_s
                max_s = jnp.max(sig_s, axis=-1)
                max_t = jnp.maximum(jnp.max(sig_t, axis=-1), 1e-6)
                u_s, seed = rng.rand(seed)
                s_dist = -jnp.log(jnp.maximum(u_s, VOLUME_RAND_FLOOR)) / max_t
                scattered = in_medium & (max_s > VOLUME_MIN_SCATTER) & (s_dist < hits["t"])
                # scatter event: single-scatter albedo weighting + HG redirect
                throughput = jnp.where(
                    scattered[..., None],
                    throughput * (1.0 - (sig_t - sig_s) / max_t[..., None]),
                    throughput,
                )
                u2_hg, seed = rng.rand2(seed)
                wi = rd
                sc_dir = _hg_sample(u2_hg, state["scatter_g"], wi)
                sc_org = ro + rd * s_dist[..., None]
                # NEE at the scatter point (volumeScatterNEE, functions:650-673)
                dlv, seed = _sample_lights(flat, env, sc_org, wi, seed, cfg)
                phase_pdf = _hg_pdf(dot3(wi, dlv["direction"]), state["scatter_g"])
                v_mis = jnp.where(
                    dlv["pdf"] == DIRAC, 1.0, dlv["pdf"] / jnp.maximum(dlv["pdf"] + phase_pdf, 1e-20)
                )
                v_shadow, seed = _trace_shadow(
                    flat, bvh, sc_org, dlv["direction"], dlv["distance"], seed, cfg_s,
                    alive=scattered & (dlv["pdf"] != 0.0),
                )
                v_contrib = throughput * dlv["radiance_over_pdf"] * (v_mis * phase_pdf)[..., None] * v_shadow
                radiance = radiance + jnp.where(
                    (scattered & (dlv["pdf"] != 0.0))[..., None], v_contrib, 0.0
                )
                # no-scatter lanes: analytic ratio-tracking residual
                # (functions:632-644): P(free flight) sampled with max_t, so
                # weight = exp(hitT * (max_t - sigma_t)); for media with
                # negligible scatter this reduces to plain Beer-Lambert
                no_sc = in_medium & ~scattered
                resid = jnp.exp(
                    jnp.minimum(hits["t"], 1e8)[..., None]
                    * jnp.minimum(max_t[..., None] - sig_t, 0.0)
                )
                throughput = jnp.where(no_sc[..., None], throughput * resid, throughput)
                ro = jnp.where(scattered[..., None], sc_org, ro)
                rd = jnp.where(scattered[..., None], sc_dir, rd)
                state["last_pdf"] = jnp.where(scattered, _hg_pdf(dot3(wi, sc_dir), state["scatter_g"]), state["last_pdf"])
                lane_hit = lane_hit & ~scattered
                # scattered lanes stay alive and skip surface work this step
            else:
                seg_att = jnp.exp(-hits["t"][..., None] * state["att_sigma"])
                throughput = jnp.where(in_medium[..., None], throughput * seg_att, throughput)

        # roughness regularization (gltf_pathtrace.slang:267-268)
        state["max_rough"] = jnp.maximum(state["max_rough"], pbr["roughness"])
        pbr["roughness"] = jnp.where(lane_hit[..., None], state["max_rough"], pbr["roughness"])

        # emissive
        radiance = radiance + jnp.where(lane_hit[..., None], pbr["emissive"] * throughput, 0.0)

        # unlit early-out
        if "unlit" in cfg.features:
            unlit = lane_hit & (pbr["unlit"] > 0)
            radiance = radiance + jnp.where(unlit[..., None], pbr["base_color"], 0.0)
            alive = alive & ~unlit
            lane_hit = lane_hit & ~unlit

        # ---------------- NEE
        dl, seed = _sample_lights(flat, env, hs["pos"], pbr["N"], seed, cfg)
        next_event = (
            lane_hit
            & ((dot3(dl["direction"], hs["nrm"]) > 0.0) | (pbr["diffuse_transmission"] > 0.0))
            & (dl["pdf"] != 0.0)
        )
        ev = bsdf_evaluate(pbr, -rd, dl["direction"], cfg.features)
        light_mis = jnp.where(
            dl["pdf"] == DIRAC, 1.0, dl["pdf"] / jnp.maximum(dl["pdf"] + ev["pdf"], 1e-20)
        )
        contrib = (
            throughput
            * dl["radiance_over_pdf"]
            * light_mis[..., None]
            * (ev["bsdf_diffuse"] + ev["bsdf_glossy"])
        )
        next_event = next_event & (ev["pdf"] > 0.0)

        # ---------------- BSDF sample for the next segment
        if "dispersion" in cfg.features:
            # KHR_materials_dispersion: pick a wavelength channel on the first
            # dispersive transmission; shift IOR per channel (Abbe V = 20/D)
            u_ch, seed = rng.rand(seed)
            needs_chroma = lane_hit & (pbr["dispersion"] > 0.0) & (pbr["transmission"] > 0.0) & (state["chroma"] < 0)
            new_ch = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
            state["chroma"] = jnp.where(needs_chroma, new_ch, state["chroma"])
            throughput = jnp.where(
                needs_chroma[..., None],
                throughput * 3.0 * jax.nn.one_hot(new_ch, 3),
                throughput,
            )
            half = (pbr["ior2"] - 1.0) * pbr["dispersion"] / 20.0 * 0.5
            shift = jnp.where(state["chroma"] == 0, -half, jnp.where(state["chroma"] == 2, half, 0.0))
            pbr["ior2"] = jnp.where(state["chroma"] >= 0, jnp.maximum(pbr["ior2"] + shift, 1.01), pbr["ior2"])
        u3b, seed = rng.rand3(seed)
        ue, seed = rng.rand2(seed)
        samp = bsdf_sample(pbr, -rd, u3b, ue, cfg.features)
        throughput = jnp.where(lane_hit[..., None], throughput * samp["bsdf_over_pdf"], throughput)
        state["last_pdf"] = jnp.where(lane_hit, samp["pdf"], state["last_pdf"])
        new_dir = samp["k2"]
        absorbed = lane_hit & (samp["event"] == EVENT_ABSORB)
        if cfg.denoise_guides:
            # arm specular-hit-distance capture for the next trace
            # (gltf_pathtrace.slang:370-377)
            spec_ev = (samp["event"] == EVENT_GLOSSY_REFLECTION) | (samp["event"] == EVENT_IMPULSE_REFLECTION)
            state["capture_spec"] = first & lane_hit & spec_ev & ~absorbed

        is_trans = (samp["event"] == EVENT_IMPULSE_TRANSMISSION) | (samp["event"] == 4)
        if "transmission" in cfg.features:
            toggled = lane_hit & is_trans
            new_inside = jnp.where(toggled, ~state["is_inside"], state["is_inside"])
            if "volume" in cfg.features:
                att = -jnp.log(jnp.maximum(pbr["attenuation_color"], 0.001)) / jnp.maximum(
                    pbr["attenuation_distance"], 0.001
                )[..., None]
                has_vol = (pbr["thickness"] > 0.0) & (pbr["attenuation_distance"] > 0.0)
                att = jnp.where(has_vol[..., None], att, 0.0)
                state["att_sigma"] = jnp.where((toggled & new_inside)[..., None], att, state["att_sigma"])
                if "volume_scatter" in cfg.features:
                    state["scatter_sigma"] = jnp.where(
                        (toggled & new_inside)[..., None], pbr["scatter_coefficient"], state["scatter_sigma"]
                    )
                    state["scatter_g"] = jnp.where(toggled & new_inside, pbr["scatter_anisotropy"], state["scatter_g"])
            state["is_inside"] = new_inside

        offset_dir = jnp.where(dot3(new_dir, hs["geonrm"])[..., None] > 0, hs["geonrm"], -hs["geonrm"])
        new_org = safe_offset_ray(hs["pos"], offset_dir)

        # ---------------- deferred shadow ray (gltf_pathtrace.slang:462-471)
        state["rays"] = state["rays"] + jnp.sum(next_event.astype(jnp.float32))
        sh_fwd = dot3(dl["direction"], hs["nrm"]) > 0.0
        sh_base = jnp.where(sh_fwd[..., None], hs["shadow_pos"], hs["pos"])
        sh_off = jnp.where(sh_fwd[..., None], hs["geonrm"], -hs["geonrm"])
        sh_org = safe_offset_ray(sh_base, sh_off)
        shadow, seed = _trace_shadow(flat, bvh, sh_org, dl["direction"], dl["distance"], seed, cfg_s, alive=next_event)
        if cfg.use_infinite_plane and cfg.plane_shadow_catcher:
            # shadow catcher (handleShadowCatcher, functions:499-554): the
            # plane is invisible — show env where lit, darken where occluded
            sc_lane = lane_plane
            env_c, env_p = sample_environment(env, rd, cfg)
            sc_mis = _env_mis_weight(state["last_pdf"], env_p, cfg)
            lit = jnp.min(shadow, axis=-1)
            sc_rad = throughput * sc_mis[..., None] * env_c * (
                lit + (1.0 - lit) * (1.0 - cfg.shadow_catcher_darken)
            )[..., None]
            radiance = radiance + jnp.where(sc_lane[..., None], sc_rad, 0.0)
            alive = alive & ~sc_lane
            lane_hit = lane_hit & ~sc_lane
            radiance = radiance + jnp.where((next_event & ~sc_lane)[..., None], contrib * shadow, 0.0)
        else:
            radiance = radiance + jnp.where(next_event[..., None], contrib * shadow, 0.0)

        alive = (alive & ~absorbed) | scattered
        surf = alive & ~scattered
        ro = jnp.where(surf[..., None], new_org, ro)
        rd = jnp.where(surf[..., None], new_dir, rd)

        # ---------------- Russian roulette (gltf_pathtrace.slang:476-482)
        rr_p = jnp.minimum(jnp.max(throughput, axis=-1) + 0.001, 0.95)
        u_rr, seed = rng.rand(seed)
        rr_on = depth >= RR_MIN_DEPTH
        die = alive & rr_on & (u_rr >= rr_p)
        alive = alive & ~die
        throughput = jnp.where((alive & rr_on)[..., None], throughput / rr_p[..., None], throughput)

        state.update(ro=ro, rd=rd, radiance=radiance, throughput=throughput, alive=alive, seed=seed)
        return state, None

    # Bounce loop: while_loop instead of a fixed-length scan so the frame
    # STOPS once every lane is dead — most scenes kill the vast majority of
    # paths by depth 2-3 (env escape + Russian roulette), and each residual
    # bounce costs two full trace launches. Live-lane RNG streams are
    # identical to the scan version; only all-dead trailing bounces are
    # elided (the reference's GPU gets this for free from thread masking,
    # gltf_pathtrace.slang:441-494).
    def _bounce_cond(carry):
        st, depth = carry
        return (depth < cfg.max_depth) & jnp.any(st["alive"])

    # alpha guard belt-and-suspenders (renderer already gates the cfg):
    # the seeded branch bypasses the stochastic-alpha re-trace, which is
    # only sound when no material can reject hits
    seed_hits = (
        _primary_seed_hits(bvh, ro, rd, prev_ref)
        if prev_ref is not None and not cfg.alpha_any else None
    )

    if not compact:
        def _bounce_body(carry):
            st, depth = carry
            st, _ = bounce(st, depth)
            return st, depth + 1

        depth0 = jnp.zeros((), jnp.int32)
        if seed_hits is not None:
            # peel depth 0 so the seeded trace exists only there
            state, _ = bounce(state, depth0, seed_hits=seed_hits)
            depth0 = depth0 + 1
        state, _ = jax.lax.while_loop(
            _bounce_cond, _bounce_body, (state, depth0)
        )
    else:
        # Bounce 0 PEELED: full width, NO input sort. Primary rays arrive
        # in pixel (scanline) order — already coherent — and every lane is
        # live, so there is nothing to compact; and peeling means the
        # first-hit captures happen in LANE order and never have to ride
        # (or be restored from) the loop's co-sorts. Primary packets are
        # tile-order coherent, so they take the wider primary_tiles stack.
        state, _ = bounce(
            state, jnp.zeros((), jnp.int32),
            cfg_t=replace(cfg_t, packet_tiles=cfg.primary_tiles,
                          packet_kernel=cfg.primary_kernel),
            seed_hits=seed_hits, peel=True,
        )

        # background fix-up MUST happen here, right after the peel: solid /
        # first_pos / radiance all still share LANE order, and primary-miss
        # lanes are dead — their radiance never changes again — so adding
        # the delta now is identical to adding it post-loop. After the
        # first _compact_sort, radiance rides the loop sorts while solid /
        # first_pos do not, and the orders never re-align (tile_order lane
        # order != the pixel order the restore sort produces).
        state = _hdr_background_fixup(state, env, cfg)

        spec = _state_columns_spec(cfg)
        buckets = _bucket_ladder(n)

        # `alive` rides the sort for free: the key's dead bit IS the alive
        # flag, so the column is recomputed from the sorted keys instead of
        # being dragged through every merge pass as a payload operand
        spec_nl = [kv for kv in spec if kv[0] != "alive"]

        def _compact_sort(st, p):
            """Co-sort the first p lanes dead-last + Morton-coherent.
            INVARIANT this maintains: after the sort, every live lane sits
            in [0, live) — which makes the NEXT bounce's prefix slice
            lossless for any bucket >= live."""
            pre = {k: (v if k == "rays" else v[:p]) for k, v in st.items()}
            keys = _sort_keys(bvh, pre["ro"], pre["rd"], pre["alive"])
            cols = _state_to_columns(pre, spec_nl)
            out = jax.lax.sort((keys, *cols), num_keys=1)
            pre = _columns_to_state(list(out[1:]), spec_nl, pre)
            pre["alive"] = (out[0] >> jnp.uint32(27)) == 0
            if p == n:
                return pre
            return {
                k: (v if k == "rays" else jnp.concatenate([v, st[k][p:]]))
                for k, v in pre.items()
            }

        # compact once at full width so the loop's first prefix slice is
        # valid (bounce 0 left live lanes scattered in pixel order)
        state = _compact_sort(state, n)

        # native-width bucket traces (cfg.trace_native): trace each
        # bucket at its own width instead of dead-padding every launch
        # back to n. Padding shares ONE compiled kernel grid across the
        # ladder (cheapest compile); native widths pay a per-bucket grid
        # compile once but skip the full-width pack + dead-packet
        # launches every bounce.
        trace_native = cfg.trace_native

        def _make_branch(p):
            def br(args):
                st, depth = args
                pre = {k: (v if k == "rays" else v[:p]) for k, v in st.items()}
                pre, _ = bounce(
                    pre, depth,
                    cfg_t=replace(cfg_t, trace_width=0) if trace_native else cfg_t,
                )
                if p < n:
                    pre = {
                        k: (v if k == "rays" else jnp.concatenate([v, st[k][p:]]))
                        for k, v in pre.items()
                    }
                # re-compact for the next bounce (new rays, new liveness)
                return _compact_sort(pre, p)
            return br

        def _bounce_body(carry):
            st, depth = carry
            live = jnp.sum(st["alive"].astype(jnp.int32))
            idx = jnp.zeros((), jnp.int32)
            for b in buckets[1:]:
                idx = idx + (live <= b).astype(jnp.int32)
            st = jax.lax.switch(idx, [_make_branch(p) for p in buckets], (st, depth))
            return st, depth + 1

        state, _ = jax.lax.while_loop(
            _bounce_cond, _bounce_body, (state, jnp.ones((), jnp.int32))
        )

        # restore pixel order for the loop-carried outputs (first-hit
        # captures never left pixel space — see the peel above)
        outs = [("radiance", 3), ("seed", None)]
        if cfg.denoise_guides:
            outs += [("guide_spec_hitdist", None)]
        cols = _state_to_columns(state, outs)
        unsorted = jax.lax.sort((state["pixel"], *cols), num_keys=1)[1:]
        state = _columns_to_state(list(unsorted), outs, state)

    if not compact:
        # non-compact path: lane order is pixel order throughout
        state = _hdr_background_fixup(state, env, cfg)

    aux = {
        "first_pos": state["first_pos"],
        "solid": state["solid"],
        "first_rnode": state["first_rnode"],
        "first_tri": state["first_tri"],
        "albedo": state["guide_albedo"],
        "normal": state["guide_normal"],
        "roughness": state["guide_rough"],
        "rays": state["rays"],
    }
    if cfg.denoise_guides:
        aux["spec_albedo"] = state["guide_spec_albedo"]
        aux["spec_hitdist"] = state["guide_spec_hitdist"]
        aux["first_pos_prev"] = state["guide_pos_prev"]
    return state["radiance"], aux, state["seed"]


def _render_frame_spp_batched(flat, bvh, env, frame, cfg: RenderConfig,
                              px, py, n, tile_order, image_size):
    """spp>1 as ONE n*spp-lane launch (cfg.spp_batch; see RenderConfig).

    Lane layout IN: sample-major blocks [s*n + lane] so bounce-0 primaries
    keep each block's (tile-order) coherence. Lane layout OUT: the compact
    path's final pixel-keyed restore groups each pixel's spp samples
    adjacently in ascending-pixel order (duplicates group; intra-group
    order is irrelevant under the mean) -> reshape [n, spp]; the
    non-compact path preserves lane order -> reshape [spp, n].
    First-hit captures (guides) are written in LANE order during the
    peeled bounce and never sorted, so sample block 0 IS the aux the scan
    path would keep (aux_keep at s == 0)."""
    w, h = cfg.width, cfg.height
    k = cfg.spp
    s_b = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), n)
    px_b = jnp.tile(px, k)
    py_b = jnp.tile(py, k)
    seed = rng.xxhash32(px_b, py_b,
                        frame["frame_idx"].astype(jnp.uint32) * jnp.uint32(k) + s_b)
    sample_pos = jnp.stack([px_b, py_b], axis=-1).astype(jnp.float32)
    ug, seed = rng.rand2(seed)
    gauss = 0.5 + ANTIALIASING_STD * rng.sample_gaussian(ug)
    uu, seed = rng.rand2(seed)
    jitter = jnp.where((s_b == 0)[..., None], gauss, uu)
    if cfg.taa_jitter:
        jitter = jnp.where((s_b == 0)[..., None], frame["cam_jitter"][None, :], jitter)
    ro, rd = generate_rays(
        sample_pos, jitter, image_size, frame["proj_inv"], frame["view_inv"],
        orthographic=cfg.orthographic,
    )
    if cfg.aperture > 0.0:
        u1, seed = rng.rand(seed)
        u2, seed = rng.rand(seed)
        ro, rd = apply_depth_of_field(ro, rd, frame["view_inv"], cfg.focal_distance,
                                      cfg.aperture, u1, u2)
    rad, aux, _ = path_trace_batch(
        flat, bvh, env, ro, rd, seed, cfg,
        pixel_angle=frame.get("pixel_angle", 0.0),
        prev_rn_o2w=frame.get("prev_rn_o2w"),
        pixel=(py_b * w + px_b).astype(jnp.int32),
    )
    rad = jnp.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)
    lum = jnp.mean(rad, axis=-1)
    scale = jnp.where(lum > cfg.firefly_clamp, cfg.firefly_clamp / jnp.maximum(lum, 1e-20), 1.0)
    rad = rad * scale[..., None]

    compact = cfg.sort_rays and cfg.traversal == "packet" and n * k >= COMPACT_MIN_LANES
    if compact:  # pixel-keyed restore grouped the spp duplicates
        total = rad.reshape(n, k, 3).sum(axis=1)
    else:  # lane order preserved: sample-major blocks
        total = rad.reshape(k, n, 3).sum(axis=0)

    # first-hit captures: sample block 0, in (tile) lane order like the scan
    aux_out = {key: (v if key == "rays" else v[:n]) for key, v in aux.items()}
    if cfg.denoise_guides:
        if compact:
            aux_out["spec_hitdist"] = aux["spec_hitdist"].reshape(n, k).mean(axis=1)
        else:
            aux_out["spec_hitdist"] = aux["spec_hitdist"][:n]
        L = 0.2126 * rad[:, 0] + 0.7152 * rad[:, 1] + 0.0722 * rad[:, 2]
        if compact:
            aux_out["lum_moments"] = jnp.stack(
                [L.reshape(n, k).sum(1), (L * L).reshape(n, k).sum(1)], axis=-1
            )
        else:
            aux_out["lum_moments"] = jnp.stack(
                [L.reshape(k, n).sum(0), (L * L).reshape(k, n).sum(0)], axis=-1
            )
    if tile_order:
        tx_n, ty_n = w // 128, h // 8

        def unmap(a):
            rest = a.shape[1:]
            t = a.reshape((tx_n, ty_n, 8, 128) + rest)
            t = jnp.transpose(t, (1, 2, 0, 3) + tuple(range(4, 4 + len(rest))))
            return t.reshape((n,) + rest)

        aux_out = {
            key: (v if key in ("rays", "spec_hitdist", "lum_moments") else unmap(v))
            for key, v in aux_out.items()
        }
        if not compact:
            total = unmap(total)
    mean = total / k
    ts = frame["total_samples"].astype(jnp.float32)
    new_accum = (frame["accum"] * ts[..., None] + mean * k) / (ts + k)
    return new_accum, aux_out


def render_frame_flat(flat, bvh, env, frame, cfg: RenderConfig):
    """Render one frame's samples for all pixels (flattened [W*H] lanes).

    frame: dict(proj_inv [4,4], view_inv [4,4], frame_idx int32,
    accum [W*H,3], total_samples int32).
    Returns (new_accum, aux). Samples loop via lax.scan — one traversal
    graph regardless of spp.
    """
    w, h = cfg.width, cfg.height
    tile_order = False
    if "px" in frame:
        # sharded path: the caller supplies this shard's pixel coordinates
        px, py = frame["px"], frame["py"]
        n = px.shape[0]
    else:
        n = w * h
        tile_order = (
            cfg.sort_rays and cfg.traversal == "packet"
            and n >= COMPACT_MIN_LANES and w % 128 == 0 and h % 8 == 0
        )
        if tile_order:
            # Z-order-like TILE layout: lanes walk 8x128 pixel tiles in
            # tile-COLUMN-major order, so each 16-tile packet covers a
            # compact 128x128 screen block — primary-ray coherence without
            # any sort (the ReorderThread role for bounce 0, free because
            # the permutation is static). Lane ids are decoded back to
            # row-major pixels below; loop outputs are restored by the
            # carried pixel id.
            lane = jnp.arange(n, dtype=jnp.uint32)
            ty_n = h // 8
            j = lane // 1024
            r = (lane // 128) % 8
            c = lane % 128
            px = (j // ty_n) * 128 + c
            py = (j % ty_n) * 8 + r
        else:
            px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
            py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    seed0 = rng.xxhash32(px, py, frame["frame_idx"])
    sample_pos = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    image_size = jnp.array([w, h], jnp.float32)

    prev_ref = None
    if (cfg.primary_seed and "px" not in frame
            and frame.get("prev_first_rnode") is not None):
        # previous frame's per-PIXEL first hit -> this frame's per-LANE
        # reordered tri ref (emit2ref inversion); -1 lanes seed nothing
        pix = (py.astype(jnp.int32) * w + px.astype(jnp.int32))
        p_rn = frame["prev_first_rnode"][pix]
        p_tri = frame["prev_first_tri"][pix]
        row = bvh.rn_attr_base[jnp.maximum(p_rn, 0)] + jnp.maximum(p_tri, 0)
        ref = bvh.emit2ref[jnp.clip(row, 0, bvh.emit2ref.shape[0] - 1)]
        prev_ref = jnp.where((p_rn >= 0) & (p_tri >= 0), ref, -1)

    if cfg.spp > 1 and cfg.spp_batch and "px" not in frame:
        return _render_frame_spp_batched(
            flat, bvh, env, frame, cfg, px, py, n, tile_order, image_size
        )

    def one_sample(carry, s):
        seed, total, rays_total, aux_prev = carry
        ug, seed = rng.rand2(seed)
        gauss = 0.5 + ANTIALIASING_STD * rng.sample_gaussian(ug)
        uu, seed = rng.rand2(seed)
        jitter = jnp.where((s == 0), gauss, uu)
        if cfg.taa_jitter:
            jitter = jnp.where(s == 0, frame["cam_jitter"][None, :], jitter)
        ro, rd = generate_rays(
            sample_pos, jitter, image_size, frame["proj_inv"], frame["view_inv"], orthographic=cfg.orthographic
        )
        if cfg.aperture > 0.0:
            u1, seed = rng.rand(seed)
            u2, seed = rng.rand(seed)
            ro, rd = apply_depth_of_field(ro, rd, frame["view_inv"], cfg.focal_distance, cfg.aperture, u1, u2)
        rad, aux, seed = path_trace_batch(
            flat, bvh, env, ro, rd, seed, cfg,
            pixel_angle=frame.get("pixel_angle", 0.0),
            prev_rn_o2w=frame.get("prev_rn_o2w"),
            pixel=(py * w + px).astype(jnp.int32),
            prev_ref=prev_ref,
        )
        # sanitize: a rare degenerate sample (0*inf through a near-zero pdf)
        # must not poison the accumulation buffer
        rad = jnp.nan_to_num(rad, nan=0.0, posinf=0.0, neginf=0.0)
        # firefly clamp (gltf_pathtrace.slang:534-538)
        lum = jnp.mean(rad, axis=-1)
        scale = jnp.where(lum > cfg.firefly_clamp, cfg.firefly_clamp / jnp.maximum(lum, 1e-20), 1.0)
        rad = rad * scale[..., None]
        aux_prev = dict(aux_prev)
        mom_prev = aux_prev.pop("lum_moments", None)
        aux_keep = jax.tree.map(lambda new, old: jnp.where(s == 0, new, old), aux, aux_prev)
        if cfg.denoise_guides:
            # per-sample luminance moments (E[L], E[L^2] summed over spp) —
            # drives the variance-guided SVGF luminance sigma
            # (ops/denoise.py). rad is in the same order as `total` (pixel
            # order — the in-batch pixel-keyed sort restored it), so the
            # moments are excluded from the tile unmap below.
            L = 0.2126 * rad[:, 0] + 0.7152 * rad[:, 1] + 0.0722 * rad[:, 2]
            aux_keep = dict(aux_keep)
            aux_keep["lum_moments"] = mom_prev + jnp.stack([L, L * L], axis=-1)
        return (seed, total + rad, rays_total + aux["rays"], aux_keep), None

    aux0 = {
        "first_pos": jnp.zeros((n, 3)),
        "solid": jnp.zeros(n, bool),
        "first_rnode": jnp.full(n, -1, jnp.int32),
        "first_tri": jnp.full(n, -1, jnp.int32),
        "albedo": jnp.zeros((n, 3)),
        "normal": jnp.zeros((n, 3)),
        "roughness": jnp.zeros(n),
        "rays": jnp.zeros((), jnp.float32),
    }
    if cfg.denoise_guides:
        aux0["spec_albedo"] = jnp.zeros((n, 3))
        aux0["spec_hitdist"] = jnp.zeros(n)
        aux0["first_pos_prev"] = jnp.zeros((n, 3))
        aux0["lum_moments"] = jnp.zeros((n, 2))
    (seed, total, rays_total, aux_out), _ = jax.lax.scan(
        one_sample,
        (seed0, jnp.zeros((n, 3)), jnp.zeros((), jnp.float32), aux0),
        jnp.arange(cfg.spp, dtype=jnp.int32),
    )
    if tile_order:
        # static inverse of the tile layout (pure reshape/transpose — no
        # gather): [TX, TY, 8, 128, ...] -> row-major [h*w, ...]
        tx_n, ty_n = w // 128, h // 8

        def unmap(a):
            rest = a.shape[1:]
            t = a.reshape((tx_n, ty_n, 8, 128) + rest)
            t = jnp.transpose(t, (1, 2, 0, 3) + tuple(range(4, 4 + len(rest))))
            return t.reshape((n,) + rest)

        # spec_hitdist rides the loop sorts and is already restored to
        # pixel order by the in-batch pixel-keyed sort — do not remap it;
        # lum_moments derives from the restored radiance (pixel order)
        aux_out = {
            k: (v if k in ("rays", "spec_hitdist", "lum_moments") else unmap(v))
            for k, v in aux_out.items()
        }
        # radiance/seed were already restored to pixel order by the
        # in-batch pixel-keyed sort; `total` accumulates in pixel order
    mean = total / cfg.spp

    # progressive accumulation (gltf_pathtrace.slang:626-630)
    ts = frame["total_samples"].astype(jnp.float32)
    new_accum = (frame["accum"] * ts[..., None] + mean * cfg.spp) / (ts + cfg.spp)
    aux_out = dict(aux_out)
    aux_out["rays"] = rays_total
    return new_accum, aux_out


# In-process variant cache (the reference's LRU shader-variant cache,
# renderer_pathtracer.hpp:114-149): the SAME RenderConfig must return the
# SAME jitted closure, or every GltfRenderer / config toggle retraces and
# recompiles an identical graph (jax.jit keys on function identity).
# Keyed additionally on the two semantics knobs that live OUTSIDE the
# config (tests monkeypatch them): the compact-path gate values and the
# interpret-mode env flag.
_RENDER_FN_CACHE: "OrderedDict" = __import__("collections").OrderedDict()
_RENDER_FN_LRU = 16


def clear_render_fn_cache() -> None:
    """Drop all memoized render closures (each holds its own compiled
    executables): REQUIRED by the poisoned-persistent-cache recovery —
    rotating the on-disk cache is useless if the in-process closure still
    serves the poisoned executable."""
    _RENDER_FN_CACHE.clear()


def make_render_fn(cfg: RenderConfig):
    """jit-compiled frame renderer, specialized on the static config
    (the variant-cache analog)."""
    key = (cfg, COMPACT_MIN_LANES, globals()["_bucket_ladder"],
           os.environ.get("VKGR_PALLAS_INTERPRET"))
    fn = _RENDER_FN_CACHE.pop(key, None)
    if fn is None:
        @partial(jax.jit, static_argnames=())
        def fn(flat, bvh, env, frame):
            return render_frame_flat(flat, bvh, env, frame, cfg)

    _RENDER_FN_CACHE[key] = fn
    while len(_RENDER_FN_CACHE) > _RENDER_FN_LRU:
        _RENDER_FN_CACHE.popitem(last=False)
    return fn

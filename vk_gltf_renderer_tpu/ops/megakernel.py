"""Megakernel experiment: the full bounce loop inside ONE Pallas kernel.

The reference's renderer IS a megakernel — gltf_pathtrace.slang:441-494
(pathTrace) loops trace+shade per pixel on RT cores, with SER reordering
divergent lanes (raytracer_interface.h.slang:199-222). This framework
instead re-architected it as a wavefront (ops/pathtrace.py): one Pallas
trace per bounce, XLA-fused shading between, global re-sort/compact of the
surviving rays. VERDICT r4 asked for the megakernel hypothesis — "the
per-bounce XLA round-trip is the ceiling" — to be built and MEASURED.

This module holds the bounded experiment: a reduced but computationally
representative path in two EXACTLY equivalent forms:

  render_mega       one pallas_call; the bounce loop runs INSIDE the
                    kernel — ray state (origin/direction/throughput/seed)
                    lives in registers/VMEM for all bounces; node and tri
                    tables are fetched into VMEM once per kernel instance.
  render_wavefront  one pallas trace per bounce (traverse_packets3) + XLA
                    glue doing the identical shade/RNG/regeneration — the
                    production architecture stripped to the same reduced
                    semantics (no sort, no compact, so the ONLY difference
                    is the kernel boundary).

Reduced path semantics (identical in both arms, same LCG streams):
  * v3 packet BVH4 traversal (the production loop kernel)
  * lambertian-gray shade: throughput *= ALBEDO on hit
  * constant sky: radiance += SKY * throughput on miss, lane dies
  * regeneration: origin moves to the hit point; direction = normalized
    cube sample from 3 LCG uniforms (cheap, transcendental-free — Mosaic
    has no sin/cos path on all targets)

What the timing difference isolates: per-bounce launch overhead + the
HBM round-trips of ray state between bounces — i.e. EXACTLY what a
megakernel buys. What it cannot show directly (discussed in NEXT.md): the
wavefront's compensating advantages (cross-packet re-sort, occupancy
compaction, native-width bucket launches) which the production frame uses
and a megakernel architecturally forfeits (rays are pinned to their packet
for the whole path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_traverse import (LANE, STACK, SUB, _traverse3_core,
                              traverse_packets3)

ALBEDO = np.float32(0.7)
SKY = np.float32(1.0)
INF = np.float32(1e30)

_LCG_A = np.uint32(1664525)
_LCG_C = np.uint32(1013904223)
_INV_2_24 = np.float32(1.0 / 16777216.0)


def _lcg(seed):
    return _LCG_A * seed + _LCG_C


def _rand(seed):
    seed = _lcg(seed)
    # top 24 bits; via int32 (Mosaic has no uint32->f32 cast; value < 2^24)
    u24 = (seed >> jnp.uint32(8)).astype(jnp.int32)
    return u24.astype(jnp.float32) * _INV_2_24, seed


def _cube_dir(seed):
    """Direction from 3 uniforms: normalized cube sample (NOT uniform on the
    sphere — irrelevant here; both arms use the same map)."""
    u1, seed = _rand(seed)
    u2, seed = _rand(seed)
    u3, seed = _rand(seed)
    dx = 2.0 * u1 - 1.0
    dy = 2.0 * u2 - 1.0
    dz = 2.0 * u3 - 1.0
    # keep away from the degenerate zero vector
    dz = dz + jnp.where(dz >= 0.0, jnp.float32(0.05), jnp.float32(-0.05))
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv_len, dy * inv_len, dz * inv_len, seed


def _shade_and_regen(b, depth, alive, radiance, throughput,
                     rox, roy, roz, rdx, rdy, rdz, seed, t, tri):
    """One bounce of the reduced path, shared VERBATIM by both arms (jnp
    ops only — traced into the Mosaic kernel in the mega arm, into XLA in
    the wavefront arm)."""
    hit = tri >= 0.0
    radiance = radiance + jnp.where(alive & ~hit, SKY, 0.0) * throughput
    alive = alive & hit
    throughput = throughput * jnp.where(alive, ALBEDO, jnp.float32(1.0))
    if b < depth - 1:
        rox = jnp.where(alive, rox + t * rdx, rox)
        roy = jnp.where(alive, roy + t * rdy, roy)
        roz = jnp.where(alive, roz + t * rdz, roz)
        ndx, ndy, ndz, seed = _cube_dir(seed)
        rdx = jnp.where(alive, ndx, rdx)
        rdy = jnp.where(alive, ndy, rdy)
        rdz = jnp.where(alive, ndz, rdz)
    return alive, radiance, throughput, rox, roy, roz, rdx, rdy, rdz, seed


def _mega_kernel(nodes_ref, tris_ref, ro_ref, rd_ref, seed_ref, out_ref,
                 stack_ref, depth, root_code):
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    seed = seed_ref[0, 0]
    sub = rox.shape[0]

    alive = jnp.ones((sub, LANE), bool)
    radiance = jnp.zeros((sub, LANE), jnp.float32)
    throughput = jnp.ones((sub, LANE), jnp.float32)
    t = jnp.zeros((sub, LANE), jnp.float32)

    for b in range(depth):
        tmax = jnp.where(alive, INF, jnp.float32(-1.0))
        _, t, _, tri, _, _ = _traverse3_core(
            nodes_ref, tris_ref, stack_ref,
            rox, roy, roz, rdx, rdy, rdz, tmin, tmax, root_code=root_code)
        (alive, radiance, throughput,
         rox, roy, roz, rdx, rdy, rdz, seed) = _shade_and_regen(
            b, depth, alive, radiance, throughput,
            rox, roy, roz, rdx, rdy, rdz, seed, t, tri)

    out_ref[0, 0] = radiance
    out_ref[0, 1] = t


def render_mega(nodes4_fi, tris128, ro, rd, seeds, depth, root_code=0,
                tiles=1, interpret=False):
    """Megakernel arm. ro/rd: [g, 4, sub, LANE] packed rays (ch3 of rd is
    tmin; ch3 of ro ignored — per-lane tmax is liveness-derived in-kernel);
    seeds: [g, 1, sub, LANE] uint32. Returns [g, 2, sub, LANE]:
    (radiance, last hit t)."""
    g = ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_mega_kernel, depth=depth, root_code=root_code)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes4_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 2, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes4_fi, tris128, ro, rd, seeds)


def render_wavefront(nodes4_fi, tris128, ro, rd, seeds, depth, root_code=0,
                     tiles=1, interpret=False):
    """Wavefront arm: same reduced path, one pallas trace per bounce with
    the shade/regen glue in XLA — the production structure minus sorting
    and compaction. Same return contract as render_mega."""
    g = ro.shape[0]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    tmin = rd[:, 3]
    seed = seeds[:, 0]
    shp = rox.shape

    alive = jnp.ones(shp, bool)
    radiance = jnp.zeros(shp, jnp.float32)
    throughput = jnp.ones(shp, jnp.float32)
    t = jnp.zeros(shp, jnp.float32)

    for b in range(depth):
        tmax = jnp.where(alive, INF, jnp.float32(-1.0))
        ro_b = jnp.stack([rox, roy, roz, tmax], axis=1)
        rd_b = jnp.stack([rdx, rdy, rdz, tmin], axis=1)
        out = traverse_packets3(nodes4_fi, tris128, ro_b, rd_b, root_code,
                                tiles=tiles, interpret=interpret)
        t, tri = out[:, 0], out[:, 2]
        (alive, radiance, throughput,
         rox, roy, roz, rdx, rdy, rdz, seed) = _shade_and_regen(
            b, depth, alive, radiance, throughput,
            rox, roy, roz, rdx, rdy, rdz, seed, t, tri)

    return jnp.stack([radiance, t], axis=1)


def pack_rays(ro_flat, rd_flat, seeds_flat, tiles=1, tmin=1e-3):
    """[N,3] origins/directions + [N] uint32 seeds -> the packed packet
    layout both arms consume ([g,4,sub,LANE] / [g,1,sub,LANE])."""
    n = ro_flat.shape[0]
    sub = tiles * SUB
    per = sub * LANE
    g = (n + per - 1) // per
    pad = g * per - n

    def pad_to(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
        return x

    ro_flat = pad_to(jnp.asarray(ro_flat, jnp.float32), 0.0)
    rd_flat = pad_to(jnp.asarray(rd_flat, jnp.float32), 1.0)
    seeds_flat = pad_to(jnp.asarray(seeds_flat, jnp.uint32), 0)

    def chan(x3, extra):
        cols = [x3[:, 0], x3[:, 1], x3[:, 2], extra]
        return jnp.stack([c.reshape(g, sub, LANE) for c in cols], axis=1)

    ro = chan(ro_flat, jnp.full((g * per,), INF, jnp.float32))
    rd = chan(rd_flat, jnp.full((g * per,), jnp.float32(tmin), jnp.float32))
    seeds = seeds_flat.reshape(g, 1, sub, LANE)
    return ro, rd, seeds, n

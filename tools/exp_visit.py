"""Microbenchmark: per-visit strategies for the v3 packet kernel's
internal-node visit (the measured ~0.35us/visit scalar chain).

Each variant chases a random node chain VISITS times doing the REAL v3
work per visit (4 slab tests over an (SUB,128) packet + packed any()
reductions + 4 stack pushes); they differ in where the 31 per-visit
scalar reads come from:

  a  v3-baseline   [1,32] VMEM fetch; 24 box floats + 4 codes + 3 axes as
                   VMEM scalar extracts (exactly _traverse3_body)
  b  smem-codes    boxes from VMEM extracts; codes+axes from an SMEM
                   sidecar table (7 SMEM reads replace 7 VMEM extracts)
  c  bcast-boxes   codes+axes from SMEM; box floats as (1,1) VMEM slices
                   broadcast into the (SUB,128) ops (vector path, no SREG
                   round-trip)
  d  dual-stack    strategy b interleaved over TWO independent packets
                   (halved SUB each) in one loop body — tests whether
                   Mosaic overlaps the two scalar chains

Run on the v5e: python tools/exp_visit.py [--visits 4096] [--tiles 8]
"""
import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

SUB, LANE = 8, 128
N = 512  # BVH4 nodes (>512 rows -> 64KB SMEM sidecar block crashes the
# v5e Mosaic compile helper; 512 keeps the [N,8] i32 sidecar at 16KB)


def make_tables(seed=0):
    rng = np.random.RandomState(seed)
    fi = rng.rand(N, 32).astype(np.float32)
    # chain pointer: child 0 code = next node, others harmless
    nxt = rng.randint(0, N, N)
    fi[:, 24] = nxt
    fi[:, 25:28] = rng.randint(0, N, (N, 3))
    fi[:, 28:31] = rng.randint(0, 3, (N, 3))
    sc = np.zeros((N, 8), np.int32)
    sc[:, 0] = nxt
    sc[:, 1:4] = fi[:, 25:28].astype(np.int32)
    sc[:, 4:7] = fi[:, 28:31].astype(np.int32)
    return jnp.asarray(fi), jnp.asarray(sc)


def _slab_extract(f, o, rox, roy, roz, ix, iy, iz, t_best):
    t0x = (f[0, o + 0] - rox) * ix
    t1x = (f[0, o + 3] - rox) * ix
    t0y = (f[0, o + 1] - roy) * iy
    t1y = (f[0, o + 4] - roy) * iy
    t0z = (f[0, o + 2] - roz) * iz
    t1z = (f[0, o + 5] - roz) * iz
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.minimum(jnp.maximum(t0z, t1z), t_best))
    return tnear <= tfar


def _slab_bcast(f_ref, e, o, rox, roy, roz, ix, iy, iz, t_best):
    shp = rox.shape

    def b(k):
        v = f_ref[pl.ds(e, 1), pl.ds(o + k, 1)]  # (1,1) vector slice
        return jnp.broadcast_to(v, shp)

    t0x = (b(0) - rox) * ix
    t1x = (b(3) - rox) * ix
    t0y = (b(1) - roy) * iy
    t1y = (b(4) - roy) * iy
    t0z = (b(2) - roz) * iz
    t1z = (b(5) - roz) * iz
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.minimum(jnp.maximum(t0z, t1z), t_best))
    return tnear <= tfar


def _visit(variant, fi_ref, sc_ref, e, rox, roy, roz, ix, iy, iz, t_best, stack_ref, sp):
    """One internal visit; returns (next_e, sp). Pushes 4 codes; next node
    is the chain pointer (code 0)."""
    f = None
    if variant in ("a", "b"):
        f = fi_ref[pl.ds(e, 1), :]
        h = [_slab_extract(f, 6 * s, rox, roy, roz, ix, iy, iz, t_best) for s in range(4)]
    else:
        h = [_slab_bcast(fi_ref, e, 6 * s, rox, roy, roz, ix, iy, iz, t_best) for s in range(4)]
    p01 = jnp.sum(h[0].astype(jnp.int32) * 65536 + h[1].astype(jnp.int32))
    p23 = jnp.sum(h[2].astype(jnp.int32) * 65536 + h[3].astype(jnp.int32))
    a0 = p01 >= 65536
    a1 = (p01 & 65535) > 0
    a2 = p23 >= 65536
    a3 = (p23 & 65535) > 0
    if variant == "a":
        c = [f[0, 24 + k].astype(jnp.int32) for k in range(4)]
        ax = [f[0, 28 + k].astype(jnp.int32) for k in range(3)]
    else:
        c = [sc_ref[e, k] for k in range(4)]
        ax = [sc_ref[e, 4 + k] for k in range(3)]
    # near-order permutation driven by the axes (sign bits faked constant)
    s0 = ax[0] > 0
    s1 = ax[1] > 0
    s2 = ax[2] > 0
    ln = jnp.where(s1, c[0], c[1])
    lf = jnp.where(s1, c[1], c[0])
    rn = jnp.where(s2, c[2], c[3])
    rf = jnp.where(s2, c[3], c[2])
    order = [jnp.where(s0, rf, lf), jnp.where(s0, rn, ln),
             jnp.where(s0, lf, rf), jnp.where(s0, ln, rn)]
    act = [a1, a2, a3, a0]
    for pid, pa in zip(order, act):
        stack_ref[sp] = pid
        sp = sp + jnp.where(pa, 1, 0)
    sp = jnp.minimum(sp, 200)
    return c[0] % N, sp


def make_kernel(variant, visits, sub):
    def kernel(fi_ref, sc_ref, ro_ref, out_ref, stack_ref):
        rox = ro_ref[0, 0, :sub]
        roy = ro_ref[0, 1, :sub]
        roz = ro_ref[0, 2, :sub]
        ix, iy, iz = rox * 0.5 + 1.0, roy * 0.5 + 1.0, roz * 0.5 + 1.0
        t_best = jnp.full((sub, LANE), 1e30)

        if variant in ("d", "e", "q"):
            ways = {"d": 2, "e": 4, "q": 8}[variant]
            h = sub // ways
            parts = []
            for w in range(ways):
                sl = slice(w * h, (w + 1) * h)
                parts.append((rox[sl], roy[sl], roz[sl], ix[sl], iy[sl], iz[sl]))
            tb = jnp.full((h, LANE), 1e30)

            def body(i, st):
                out = []
                for w in range(ways):
                    e_w, sp_w = st[2 * w], st[2 * w + 1]
                    px, py, pz, jx, jy, jz = parts[w]
                    e_w, sp_w = _visit("b", fi_ref, sc_ref, e_w, px, py, pz,
                                       jx, jy, jz, tb, stack_ref, sp_w)
                    out += [e_w, sp_w]
                return tuple(out)

            init = tuple(x for w in range(ways)
                         for x in (jnp.int32(w), jnp.int32(w * (200 // ways))))
            st = jax.lax.fori_loop(0, visits // ways, body, init)
            tot = sum(st[0::2]) + sum(st[1::2])
            out_ref[0, 0] = jnp.zeros((sub, LANE)) + tot.astype(jnp.float32)
        else:
            def body(i, st):
                e, sp = st
                return _visit(variant, fi_ref, sc_ref, e, rox, roy, roz,
                              ix, iy, iz, t_best, stack_ref, sp)

            e, sp = jax.lax.fori_loop(0, visits, body, (jnp.int32(0), jnp.int32(0)))
            out_ref[0, 0] = jnp.zeros((sub, LANE)) + (e + sp).astype(jnp.float32)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--visits", type=int, default=4096)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--variants", default="a,b,c,d")
    args = ap.parse_args()
    sub = args.tiles * 1  # rows of 128 lanes; tiles=8 -> (8,128) packet

    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

    fi, sc = make_tables()
    rng = np.random.RandomState(1)
    ro = jnp.asarray(rng.rand(args.grid, 4, 8, LANE).astype(np.float32))
    print(f"[{jax.devices()[0].device_kind}] visits={args.visits} sub={sub} grid={args.grid}",
          flush=True)

    for variant in args.variants.split(","):
        kern = make_kernel(variant, args.visits, min(sub, 8))
        f = pl.pallas_call(
            kern,
            grid=(args.grid,),
            in_specs=[
                pl.BlockSpec(fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sc.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, 8, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, LANE), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((args.grid, 1, 8, LANE), jnp.float32),
            scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        g = jax.jit(lambda a, b, c: f(a, b, c))
        try:
            g(fi, sc, ro)
            dt = timeit_device(g, fi, sc, ro, iters=5, warmup=1)
            per_visit = dt / (args.visits * args.grid)
            print(f"{variant}: {dt*1e3:8.3f} ms  {per_visit*1e9:7.2f} ns/visit "
                  f"({per_visit*0.94e9:.0f} cyc @940MHz)", flush=True)
        except Exception as ex:
            print(f"{variant}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)


if __name__ == "__main__":
    main()

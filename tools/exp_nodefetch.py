"""Microbenchmark: node-row fetch strategies for the packet kernel.

Question (round-3 lever #4): nodes_fi is [N,16] f32 — Mosaic pads each row
to 128 VMEM lanes (8x waste) and a [1,16] dynamic-slice fetch measured ~78
cycles. Can an 8-nodes-per-128-lane-row layout fetch faster AND drop the
padding? Variants:

  A  baseline      [N,16] table, [1,16] row fetch, static extracts
  B  switch8       [N/8,128] table, [1,128] fetch, lax.switch(e&7) static extracts
  C  roll          [N/8,128] table, [1,128] fetch, pltpu.roll(dyn) + static extracts
  D  dyn-extract   [N/8,128] table, [1,128] fetch, f[0, off+k] dynamic extracts

Each kernel chases a random node chain VISITS times and does a fake slab
test per visit so the extracts feed real vector work.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192          # nodes
VISITS = 4096     # chain length per grid step
GRID = 64
SUB, LANE = 8, 128

rng = np.random.RandomState(0)
tab16 = rng.rand(N, 16).astype(np.float32)
# next-node pointer in slot 15 (as float)
nxt = rng.randint(0, N, N)
tab16[:, 15] = nxt
tab128 = tab16.reshape(N // 8, 128)


def mk(variant):
    def kernel(tab_ref, ro_ref, out_ref):
        rox = ro_ref[0, 0]

        def visit_a(e, acc):
            f = tab_ref[pl.ds(e, 1), :]
            s = f[0, 0] + f[0, 3] + f[0, 6] + f[0, 9] + f[0, 12] + f[0, 14]
            acc = acc + (f[0, 1] - rox) * s
            return f[0, 15].astype(jnp.int32), acc

        def visit_b(e, acc):
            row = e // 8
            f = tab_ref[pl.ds(row, 1), :]

            def mkbr(o):
                def br(_):
                    s = f[0, o + 0] + f[0, o + 3] + f[0, o + 6] + f[0, o + 9] + f[0, o + 12] + f[0, o + 14]
                    return f[0, o + 15], (f[0, o + 1] - rox) * s
                return br

            nx, d = jax.lax.switch(e % 8, [mkbr(o * 16) for o in range(8)], 0)
            return nx.astype(jnp.int32), acc + d

        def visit_c(e, acc):
            row = e // 8
            off = (e % 8) * 16
            f = tab_ref[pl.ds(row, 1), :]
            f = pltpu.roll(f, -off, axis=1)
            s = f[0, 0] + f[0, 3] + f[0, 6] + f[0, 9] + f[0, 12] + f[0, 14]
            acc = acc + (f[0, 1] - rox) * s
            return f[0, 15].astype(jnp.int32), acc

        def visit_d(e, acc):
            row = e // 8
            off = (e % 8) * 16
            f = tab_ref[pl.ds(row, 1), :]
            s = f[0, off + 0] + f[0, off + 3] + f[0, off + 6] + f[0, off + 9] + f[0, off + 12] + f[0, off + 14]
            acc = acc + (f[0, off + 1] - rox) * s
            return f[0, off + 15].astype(jnp.int32), acc

        visit = {"a": visit_a, "b": visit_b, "c": visit_c, "d": visit_d}[variant]

        def body(i, st):
            e, acc = st
            return visit(e, acc)

        e0 = jnp.int32(0)
        acc0 = jnp.zeros((SUB, LANE), jnp.float32)
        _, acc = jax.lax.fori_loop(0, VISITS, body, (e0, acc0))
        out_ref[0] = acc

    tab = tab16 if variant == "a" else tab128
    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, SUB, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024
        ),
    ), jnp.asarray(tab)


def bench(variant):
    try:
        call, tab = mk(variant)
        ro = jnp.zeros((GRID, 4, SUB, LANE), jnp.float32)
        fn = jax.jit(lambda t, r: call(t, r))
        out = fn(tab, ro)
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(tab, ro)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        per_visit_ns = dt / (GRID * VISITS) * 1e9
        print(f"{variant}: {dt*1e3:8.3f} ms  {per_visit_ns:7.2f} ns/visit  ({per_visit_ns*0.94:.0f} cyc @940MHz)")
    except Exception as ex:
        print(f"{variant}: FAILED {type(ex).__name__}: {str(ex)[:300]}")


if __name__ == "__main__":
    print(jax.devices())
    for v in ("a", "b", "c", "d"):
        bench(v)

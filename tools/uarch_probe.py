"""Microarchitectural probes for the v5e: cost of scalar loop iterations,
lane-gathers (take_along_axis axis=1), vector->scalar reductions, and
scalar-indexed dynamic slices. Informs the traversal kernel design."""

import sys, time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

N_Iter = 20000


def run(name, kernel, n_ops_per_iter=1, **kw):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(kw.get("n_in", 2))],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=kw.get("scratch", []),
    )
    args = kw["args"]
    g = jax.jit(lambda *a: f(*a))
    out = g(*args)
    dt = timeit_device(g, *args, iters=5, warmup=1)
    per_iter = dt / N_Iter
    print(f"{name:42s} {dt*1e3:9.3f} ms total  {per_iter*1e9:9.1f} ns/iter  ({per_iter*940e6:7.1f} cyc @940MHz)")


tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) % 101.0
def _mkidx():
    return (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 37 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)) % 128
big = jnp.arange(4096 * 16, dtype=jnp.float32).reshape(4096, 16) % 101.0
big128 = jnp.arange(4096 * 128, dtype=jnp.float32).reshape(4096, 128) % 101.0


# 1. empty scalar while loop
def k_empty(a_ref, b_ref, o_ref):
    def body(s):
        return (s[0] + 1, s[1])
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


# 2. loop with one vector op per iter
def k_vec1(a_ref, b_ref, o_ref):
    def body(s):
        i, acc = s
        return (i + 1, acc * 1.000001 + 0.5)
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


# 3. loop with one lane-gather per iter (data-dependent chain)
def k_gather(a_ref, b_ref, o_ref):
    def body(s):
        i, acc, ix = s
        g = jnp.take_along_axis(a_ref[:], ix, axis=1)
        ix = (ix + g.astype(jnp.int32)) % 128
        return (i + 1, acc + g, ix)
    _, acc, _ = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:], _mkidx()))
    o_ref[:] = acc


# 4. loop with 12 independent lane-gathers per iter
def k_gather12(a_ref, b_ref, o_ref):
    def body(s):
        i, acc, ix = s
        t = a_ref[:]
        gs = [jnp.take_along_axis(jnp.roll(t, k, axis=0) if False else t, (ix + k) % 128, axis=1) for k in range(12)]
        g = sum(gs)
        ix = (ix + g.astype(jnp.int32)) % 128
        return (i + 1, acc + g, ix)
    _, acc, _ = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:], _mkidx()))
    o_ref[:] = acc


# 5. loop with vector->scalar reduction driving the condition (current kernel style)
def k_reduce(a_ref, b_ref, o_ref):
    def body(s):
        i, acc = s
        r = jnp.sum(acc)  # full (8,128) -> scalar
        return (i + jnp.where(r > -1.0, 1, 2), acc * 1.000001)
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


# 6. loop with scalar-indexed dynamic slice of a [4096,16] table (current node fetch)
def k_dynslice(a_ref, b_ref, o_ref, sm):
    sm[0] = 0
    def body(s):
        i, acc = s
        node = sm[0]
        row = b_ref[pl.ds(node, 1), :]  # [1,16]
        sm[0] = (node + 1) % 4000
        return (i + 1, acc + row[0, 0])
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


# 7. dynamic slice where the INDEX depends on a vector reduction (the real dependency)
def k_depchain(a_ref, b_ref, o_ref, sm):
    sm[0] = 0
    def body(s):
        i, acc = s
        node = sm[0]
        row = b_ref[pl.ds(node, 1), :]
        acc = acc + row[0, 0]
        r = jnp.sum(acc).astype(jnp.int32)  # vector -> scalar
        sm[0] = (node + 1 + r % 2) % 4000   # scalar depends on reduction
        return (i + 1, acc)
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


# 8. dynamic slice of a [4096,128] table (tri-row fetch, full lane width)
def k_dynslice128(a_ref, b_ref, o_ref, sm):
    sm[0] = 0
    def body(s):
        i, acc = s
        node = sm[0]
        row = b_ref[pl.ds(node, 1), :]  # [1,128]
        sm[0] = (node + 1) % 4000
        return (i + 1, acc + row)
    _, acc = jax.lax.while_loop(lambda s: s[0] < N_Iter, body, (jnp.int32(0), a_ref[:]))
    o_ref[:] = acc


run("empty while loop", k_empty, args=(tab, big))
run("1 vector op / iter", k_vec1, args=(tab, big))
run("1 lane-gather (dep chain) / iter", k_gather, args=(tab, big))
run("12 lane-gathers / iter", k_gather12, args=(tab, big))
run("vector->scalar reduce / iter", k_reduce, args=(tab, big))
run("scalar dyn-slice [1,16] / iter", k_dynslice, args=(tab, big), scratch=[pltpu.SMEM((4,), jnp.int32)])
run("dyn-slice + reduce dep chain / iter", k_depchain, args=(tab, big), scratch=[pltpu.SMEM((4,), jnp.int32)])
run("scalar dyn-slice [1,128] / iter", k_dynslice128, args=(tab, big128), scratch=[pltpu.SMEM((4,), jnp.int32)])

"""Row-gather scaling probe: how does the XLA:TPU gather that dominates
get_hit_state_fused (39 ms per 2M lanes, exp_glue) scale with row WIDTH,
table SIZE, index LOCALITY, and dtype?

Decides the hit_attr diet: if cost scales with bytes, narrowing the 64-col
row (feature-gating uv1/color for scenes that lack them) is a direct win;
if cost is per-row latency-bound, width is free and only the row count
matters. Locality contrast (sorted vs random ids) tells whether the compact
loop's Morton coherence is already being exploited by the lowering.

Run: python tools/exp_gather.py [--n 2073600] [--iters 8]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1920 * 1080)
    ap.add_argument("--rows", type=int, default=307200)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

    n, t = args.n, args.rows
    rng = np.random.RandomState(0)
    ids_rand = jnp.asarray(rng.randint(0, t, size=n).astype(np.int32))
    ids_sorted = jnp.sort(ids_rand)
    # screen-coherent ids: neighbouring lanes hit neighbouring rows (the
    # actual bounce-0 pattern) — random walk with small steps
    walk = np.cumsum(rng.randint(-3, 4, size=n))
    ids_local = jnp.asarray(((walk - walk.min()) % t).astype(np.int32))

    def bench(name, fn, *xs):
        try:
            ms = timeit_device(jax.jit(fn), *xs, iters=args.iters)
            print(f"{name:24s} {ms:8.2f} ms", flush=True)
        except Exception as exc:
            print(f"{name:24s} ERROR {str(exc)[:120]}", flush=True)

    for width in (8, 16, 32, 64, 128):
        tab = jnp.asarray(rng.rand(t, width).astype(np.float32))
        bench(f"gather w={width} random", lambda tab, ids: tab[ids].sum(-1), tab, ids_rand)
    tab64 = jnp.asarray(rng.rand(t, 64).astype(np.float32))
    bench("gather w=64 sorted", lambda tab, ids: tab[ids].sum(-1), tab64, ids_sorted)
    bench("gather w=64 local", lambda tab, ids: tab[ids].sum(-1), tab64, ids_local)
    tab_bf = tab64.astype(jnp.bfloat16)
    bench("gather w=64 bf16", lambda tab, ids: tab[ids].astype(jnp.float32).sum(-1), tab_bf, ids_rand)
    # small-table contrast: does table size (cache footprint) matter?
    for rows in (4096, 32768, t):
        tab = jnp.asarray(rng.rand(rows, 64).astype(np.float32))
        ids = jnp.asarray(rng.randint(0, rows, size=n).astype(np.int32))
        bench(f"gather w=64 T={rows}", lambda tab, ids: tab[ids].sum(-1), tab, ids)
    # one-hot MXU gather from a SMALL table (the alternative the MXU offers:
    # gather == one_hot(ids, T) @ table; only plausible for tiny tables)
    for rows in (512, 4096):
        tab = jnp.asarray(rng.rand(rows, 64).astype(np.float32))
        ids = jnp.asarray(rng.randint(0, rows, size=n).astype(np.int32))
        def onehot_gather(tab, ids, rows=rows):
            oh = jax.nn.one_hot(ids, rows, dtype=jnp.bfloat16)
            return (oh @ tab.astype(jnp.bfloat16)).astype(jnp.float32).sum(-1)
        bench(f"onehot-mxu T={rows}", onehot_gather, tab, ids)


if __name__ == "__main__":
    main()

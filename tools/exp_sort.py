"""Microbenchmark: compact-frame reorder strategies at frame width.

The compact loop re-sorts the per-lane state every bounce (pathtrace.py
_compact_sort): a multi-operand lax.sort keyed on (dead|morton). At the
default feature set that is ~20 f32 operands at 1080p width (2.08M lanes).
This probe times the real alternatives in isolation on the live TPU:

  key-only       lax.sort(key)                      — the floor
  cosort-K       lax.sort((key, c1..cK))            — current production
  perm-gather    lax.sort((key, iota)) then K x jnp.take(col, idx)
  row-gather     lax.sort((key, iota)) then take(stacked (n,K), idx, axis=0)
  segment-pack   dead-last partition WITHOUT full sort: cumsum ranks +
                 scatter of (key,iota), then K gathers — O(n) vs O(n log n),
                 but loses Morton coherence within the live prefix (the
                 trace gets liveness compaction only)

Run: python tools/exp_sort.py [--n 2080768] [--cols 20] [--iters 8]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2080768)
    ap.add_argument("--cols", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    n, k = args.n, args.cols

    rng = np.random.RandomState(0)
    # realistic bounce-1 key population: ~35% live (dead bit dominates)
    alive = rng.rand(n) < 0.35
    key = rng.randint(0, 1 << 27, n).astype(np.uint32) | (
        (~alive).astype(np.uint32) << np.uint32(27))
    key = jnp.asarray(key)
    cols = [jnp.asarray(rng.rand(n).astype(np.float32)) for _ in range(k)]
    iota = jnp.arange(n, dtype=jnp.int32)

    def run(name, fn, *a):
        ms = timeit_device(jax.jit(fn), *a, iters=args.iters) * 1e3
        print(f"{name:14s} {ms:8.2f} ms")
        return ms

    run("key-only", lambda kk: jax.lax.sort(kk), key)

    def cosort(kk, *cs):
        return jax.lax.sort((kk, *cs), num_keys=1)[1:]
    run(f"cosort-{k}", cosort, key, *cols)

    def perm_gather(kk, ii, *cs):
        _, idx = jax.lax.sort((kk, ii), num_keys=1)
        return [jnp.take(c, idx) for c in cs]
    run("perm-gather", perm_gather, key, iota, *cols)

    def row_gather(kk, ii, *cs):
        _, idx = jax.lax.sort((kk, ii), num_keys=1)
        mat = jnp.stack(cs, axis=-1)
        out = jnp.take(mat, idx, axis=0)
        return [out[:, j] for j in range(len(cs))]
    run("row-gather", row_gather, key, iota, *cols)

    def segment_pack(kk, ii, *cs):
        # stable dead-last partition: rank = cumsum within class
        dead = (kk >> jnp.uint32(27)) > 0
        livec = jnp.cumsum((~dead).astype(jnp.int32))
        total_live = livec[-1]
        deadc = jnp.cumsum(dead.astype(jnp.int32))
        pos = jnp.where(dead, total_live + deadc - 1, livec - 1)
        idx = jnp.zeros_like(ii).at[pos].set(ii)
        return [jnp.take(c, idx) for c in cs]
    run("segment-pack", segment_pack, key, iota, *cols)

    # the restore sort (5 operands on pixel id) for reference
    run("cosort-5", cosort, key, *cols[:5])


if __name__ == "__main__":
    main()

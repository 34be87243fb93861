"""Probe: which Pallas HBM->VMEM streaming construct survives the v5e.

Round 3 found that the lane-traversal streaming kernel (dynamic-offset
make_async_copy inside a lax.while_loop) hangs the v5e worker through the
axon tunnel. This probe isolates the construct, one subprocess per
variant so a hang cannot sink the whole run:

  A  while_loop + data-dependent page offset DMA   (the round-3 repro)
  B  fori_loop (static trip count) + data-dependent page offset DMA
  C  while_loop + monotone counter page offset DMA (dynamic but regular)
  D  fori_loop + double-buffered DMA (start i+1 before wait i)

Round-4 finding: ALL of A-D kill the v5e worker ("TPU worker process
crashed") with FIELDS=12 — the dynamic slice start page*12 is not a
multiple of the f32 sublane tile (8), so every DMA begins mid-tile.
Aligned variants re-test the same constructs with FIELDS=16 (tile-aligned
dynamic offsets):

  E  = C with FIELDS=16   (monotone while_loop, aligned)
  F  = A with FIELDS=16   (data-dependent offset, aligned)
  G  = D with FIELDS=16   (double-buffered, aligned)

Each kernel streams [12,128] pages from an HBM-resident table, folds the
page into a running vector sum, and writes the sum. Correctness is
asserted vs numpy so a silently-wrong variant can't be declared a winner.

Usage: python tools/exp_stream_dma.py            # run all, subprocessed
       python tools/exp_stream_dma.py --variant A --inproc
"""

from __future__ import annotations

import argparse
import functools
import subprocess
import sys
import time

LANE = 128
N_PAGES = 64
STEPS = 48  # pages actually visited per instance

# E/F/G re-run C/A/D with tile-aligned page heights (16 rows = 2 f32 tiles)
ALIGNED = {"E": "C", "F": "A", "G": "D"}


def fields_of(variant: str) -> int:
    return 16 if variant in ALIGNED else 12


def _build(variant: str):
    FIELDS = fields_of(variant)
    variant = ALIGNED.get(variant, variant)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body_common(pages_ref, out_ref, scratch, sem, *, dyn):
        """Visit STEPS pages; page index either data-dependent (dyn) or
        the loop counter. Fold each page into a running sum."""

        def dma(page, slot=None):
            dst = scratch if slot is None else scratch  # single slot here
            cp = pltpu.make_async_copy(
                pages_ref.at[pl.ds(page * FIELDS, FIELDS), :], dst, sem
            )
            cp.start()
            cp.wait()

        def nxt_page(i, acc):
            if dyn:
                # data-dependent: low bits of the accumulated sum
                h = jnp.sum(acc).astype(jnp.int32)
                return jax.lax.rem(jnp.abs(h) + i * 7, N_PAGES)
            return jax.lax.rem(i * 7, N_PAGES)

        if variant in ("A", "C"):

            def cond(s):
                return s[0] < STEPS

            def loop(s):
                i, acc = s
                page = nxt_page(i, acc)
                dma(page)
                acc = acc + scratch[:, :]
                return i + 1, acc

            _, acc = jax.lax.while_loop(
                cond, loop, (jnp.int32(0), jnp.zeros((FIELDS, LANE), jnp.float32))
            )
        else:  # B: fori static trip

            def loop(i, acc):
                page = nxt_page(i, acc)
                dma(page)
                return acc + scratch[:, :]

            acc = jax.lax.fori_loop(
                0, STEPS, loop, jnp.zeros((FIELDS, LANE), jnp.float32)
            )
        out_ref[:, :] = acc

    def body_double(pages_ref, out_ref, s0, s1, sem0, sem1):
        """D: double-buffered, regular schedule (page = f(i) known ahead)."""

        def page_of(i):
            return jax.lax.rem(i * 7, N_PAGES)

        def start(i, slot_ref, sem):
            cp = pltpu.make_async_copy(
                pages_ref.at[pl.ds(page_of(i) * FIELDS, FIELDS), :], slot_ref, sem
            )
            cp.start()

        def wait(i, slot_ref, sem):
            cp = pltpu.make_async_copy(
                pages_ref.at[pl.ds(page_of(i) * FIELDS, FIELDS), :], slot_ref, sem
            )
            cp.wait()

        start(0, s0, sem0)

        def loop(i, acc):
            slot = jax.lax.rem(i, 2)

            def even(_):
                wait(i, s0, sem0)
                jax.lax.cond(i + 1 < STEPS, lambda _: start(i + 1, s1, sem1), lambda _: None, 0)
                return s0[:, :]

            def odd(_):
                wait(i, s1, sem1)
                jax.lax.cond(i + 1 < STEPS, lambda _: start(i + 1, s0, sem0), lambda _: None, 0)
                return s1[:, :]

            v = jax.lax.cond(slot == 0, even, odd, 0)
            return acc + v

        acc = jax.lax.fori_loop(0, STEPS, loop, jnp.zeros((FIELDS, LANE), jnp.float32))
        out_ref[:, :] = acc

    if variant == "D":
        kernel = body_double
        scratch_shapes = [
            pltpu.VMEM((FIELDS, LANE), jnp.float32),
            pltpu.VMEM((FIELDS, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = functools.partial(body_common, dyn=variant in ("A", "B"))
        scratch_shapes = [
            pltpu.VMEM((FIELDS, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    interpret = jax.devices()[0].platform == "cpu"

    @jax.jit
    def run(pages):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((FIELDS, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FIELDS, LANE), jnp.float32),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(pages)

    return run


def _expected(variant, pages_np):
    import numpy as np

    FIELDS = fields_of(variant)
    variant = ALIGNED.get(variant, variant)

    acc = np.zeros((FIELDS, LANE), np.float32)
    i = 0
    for i in range(STEPS):
        if variant in ("A", "B"):
            h = int(acc.sum())
            page = (abs(h) + i * 7) % N_PAGES
        else:
            page = (i * 7) % N_PAGES
        acc = acc + pages_np[page * FIELDS : (page + 1) * FIELDS, :]
    return acc


def main_inproc(variant: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    # integer-valued floats so the data-dependent page hash is exact
    pages_np = rng.randint(0, 3, (N_PAGES * fields_of(variant), LANE)).astype(np.float32)
    pages = jnp.asarray(pages_np)
    run = _build(variant)
    t0 = time.perf_counter()
    out = np.asarray(run(pages))
    compile_s = time.perf_counter() - t0
    exp = _expected(variant, pages_np)
    ok = np.allclose(out, exp)
    t0 = time.perf_counter()
    for _ in range(20):
        out = run(pages)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    print(
        f"variant {variant}: ok={ok} compile={compile_s:.1f}s "
        f"{dt*1e6:.0f} us/call ({STEPS} pages => {dt*1e6/STEPS:.1f} us/page)"
    )
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--inproc", action="store_true")
    ap.add_argument("--timeout", type=int, default=240)
    args = ap.parse_args()

    if args.inproc:
        sys.exit(main_inproc(args.variant or "A"))

    variants = [args.variant] if args.variant else ["E", "G", "F", "C"]
    for v in variants:
        cmd = [sys.executable, __file__, "--variant", v, "--inproc"]
        t0 = time.perf_counter()
        try:
            r = subprocess.run(cmd, timeout=args.timeout, capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                print(f"variant {v}: FAILED rc={r.returncode}\n{r.stderr[-2000:]}")
        except subprocess.TimeoutExpired:
            print(f"variant {v}: HANG (>{args.timeout}s) — killed")
        sys.stdout.flush()


if __name__ == "__main__":
    main()

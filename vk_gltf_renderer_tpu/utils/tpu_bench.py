"""Honest device timing on high-latency remote TPUs.

The axon tunnel adds ~26 ms per host readback and block_until_ready does
not actually synchronize, so the ONLY valid protocol is: enqueue N
dependent iterations, then ONE scalar readback; subtract the measured
empty round-trip. Every performance number in this repo should come from
here.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_rtt_cache = None


def roundtrip_latency(refresh: bool = False) -> float:
    """Measured host<->device round-trip (seconds)."""
    global _rtt_cache
    if _rtt_cache is not None and not refresh:
        return _rtt_cache
    x = jnp.zeros((8,))
    f = jax.jit(lambda a: a[0])
    float(f(x))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        float(f(x))
    _rtt_cache = (time.perf_counter() - t0) / reps
    return _rtt_cache


def timeit_device(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Average seconds per call of fn(*args) on device.

    fn must return a pytree with at least one array; iterations are enqueued
    back-to-back (device stream serializes them) and synced once at the end.
    """
    for _ in range(warmup):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    rtt = roundtrip_latency()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    total = time.perf_counter() - t0 - rtt
    return max(total, 1e-9) / iters

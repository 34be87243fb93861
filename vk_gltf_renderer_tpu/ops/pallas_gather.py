"""Pallas small-table gather: out[c, i] = tab[c, idx[i]].

XLA:TPU lowers generic gathers to ~34 ns per output element (profiled on
v5e — a [518400] gather costs ~18 ms, more than the whole traversal
kernel). For tables that fit VMEM this kernel does the same lookup with
`take_along_axis` lane-gathers (~7 cycles per (8,128) tile) plus a
chunk-select sweep: cost ~= chunks * channels * 4 ops per 1024 outputs —
~0.5 ms for a 6-channel 8k-entry table over 500k indices, a ~100x win.

Used by the HDR filtered-importance-sampling path (ops/hdr.py) and any
other small-table lookup on the hot path. Tables larger than ~32k entries
should not use this (cost is linear in table size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE


def _gather_kernel(tab_ref, idx_ref, out_ref, *, chunks, channels):
    idx = idx_ref[0]  # [8,128] i32
    loc = idx & 127
    chunk = idx >> 7
    acc = [jnp.zeros((SUB, LANE), jnp.float32) for _ in range(channels)]
    for k in range(chunks):
        m = chunk == k
        for c in range(channels):
            row = tab_ref[c : c + 1, k * LANE : (k + 1) * LANE]  # [1,128] static
            g = jnp.take_along_axis(jnp.broadcast_to(row, (SUB, LANE)), loc, axis=1)
            acc[c] = jnp.where(m, g, acc[c])
    for c in range(channels):
        out_ref[0, c] = acc[c]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_channels(tab, idx, interpret=False):
    """tab: [C, T] f32 (T padded to 128 internally); idx: [N] i32 in [0, T).
    Returns [C, N] f32. Falls back to an XLA gather off-TPU (where XLA's
    lowering is fine)."""
    if jax.default_backend() != "tpu" and not interpret:
        return tab[:, idx]
    c, t = tab.shape
    n = idx.shape[0]
    tpad = (-t) % LANE
    if tpad:
        tab = jnp.concatenate([tab, jnp.zeros((c, tpad), tab.dtype)], axis=1)
    npad = (-n) % TILE
    if npad:
        idx = jnp.concatenate([idx, jnp.zeros((npad,), idx.dtype)])
    g = idx.shape[0] // TILE
    idx_b = idx.reshape(g, SUB, LANE)
    kernel = functools.partial(
        _gather_kernel, chunks=tab.shape[1] // LANE, channels=c
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, c, SUB, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tab.astype(jnp.float32), idx_b)
    return out.transpose(1, 0, 2, 3).reshape(c, -1)[:, :n]

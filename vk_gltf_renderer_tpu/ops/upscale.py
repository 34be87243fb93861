"""Temporal upsampling (TAAU): the render-low / display-high half of the
reference's DLSS-RR role (dlss.hpp:22-63 — Kind::RR renders at reduced
resolution and reconstructs the display image from jittered frames +
motion vectors; the Halton jitter sequence is the same one dlss.cpp feeds
NGX). DLSS itself is a closed NVIDIA network; this is the classical
reconstruction it superseded: jitter-aware sample placement + reprojected
history + neighborhood clamping, which recovers detail past the render
grid's Nyquist rate for static/slow content and falls back to upsampled
current frame on disocclusion.

Contract (mirrors docs/denoising.md:17-44 guide inputs):
  cur_lo     [h,w,3]  this frame's low-res radiance, point-sampled at
                      (pixel corner + jitter) — cfg.taa_jitter makes the
                      integrator place sample 0 exactly there
  motion_lo  [h,w,2]  screen motion in LOW-res pixels (ops/temporal.py)
  jitter     [2]      this frame's subpixel sample position in [0,1)
  history_hi [H,W,3]  display-res accumulation (None on frame 0)

All shapes static; jitted once per (h,w,scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def halton(index: int, base: int) -> float:
    """Radical-inverse low-discrepancy sequence (the DLSS jitter source,
    dlss.cpp Halton(2,3)); host-side, feeds frame inputs."""
    f, r = 1.0, 0.0
    i = int(index) + 1  # skip the degenerate 0 sample
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def halton23(index: int) -> np.ndarray:
    """Per-frame subpixel sample position in [0,1)^2."""
    return np.array([halton(index, 2), halton(index, 3)], np.float32)


def _bilinear(img, sx, sy):
    h, w = img.shape[:2]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


@functools.partial(jax.jit, static_argnames=("scale",))
def temporal_upscale(cur_lo, motion_lo, jitter, history_hi, scale: int,
                     decay=0.96, clamp_k=2.0):
    """One TAAU step: returns the new display-res history [h*scale, w*scale, 4]
    (rgb + accumulated sample weight; read rgb with [..., :3]).

    The current frame's samples sit at (i + jx, j + jy) on the low-res
    grid; each display pixel gathers them jitter-correctly (bilinear on the
    SHIFTED grid) and folds them into a motion-reprojected RUNNING WEIGHTED
    AVERAGE whose per-frame weight is a Gaussian of the distance from the
    nearest real sample to this display pixel's center. Over the Halton
    sequence every display pixel eventually receives near-center samples,
    which dominate the average — a σ≈0.22-px reconstruction filter, sharp
    past low-res Nyquist. `decay` exponentially ages old weight so moving
    content keeps a bounded memory; the 3x3 neighborhood clamp rejects
    history that motion reprojection could not.
    """
    h, w = cur_lo.shape[:2]
    hh, ww = h * scale, w * scale
    ys, xs = jnp.meshgrid(
        jnp.arange(hh, dtype=jnp.float32), jnp.arange(ww, dtype=jnp.float32),
        indexing="ij",
    )
    # display-pixel centers in low-res continuous coordinates (corner origin)
    lx = (xs + 0.5) / scale
    ly = (ys + 0.5) / scale
    jx, jy = jitter[0], jitter[1]

    # jitter-corrected gather: sample i sits at i + j, so the fractional
    # index on the sample grid is (l - j)
    cur_up = _bilinear(cur_lo, lx - jx, ly - jy)

    # per-frame sample weight: how close the nearest actual sample landed
    # to this display pixel's center, in display-pixel units
    dx = (lx - jx) - jnp.round(lx - jx)
    dy = (ly - jy) - jnp.round(ly - jy)
    d2 = (dx * dx + dy * dy) * (scale * scale)
    # σ/floor swept on the analytic-image test: 0.22/0.004 reaches ~2.5x
    # below single-frame bilinear RMSE while the floor keeps every pixel
    # converging even before a near-center sample arrives
    w_f = jnp.exp(-d2 / (2.0 * 0.22 * 0.22)) + 0.004

    if history_hi is None:
        return jnp.concatenate([cur_up, w_f[..., None]], axis=-1)

    # reproject history (rgb AND weight) through display-scaled motion
    mvx = _bilinear(motion_lo[..., 0:1], lx - 0.5, ly - 0.5)[..., 0] * scale
    mvy = _bilinear(motion_lo[..., 1:2], lx - 0.5, ly - 0.5)[..., 0] * scale
    sx = xs + mvx
    sy = ys + mvy
    in_bounds = (sx >= 0) & (sx <= ww - 1) & (sy >= 0) & (sy <= hh - 1)
    hist4 = _bilinear(history_hi, sx, sy)
    hist = hist4[..., :3]
    w_h = jnp.maximum(hist4[..., 3], 0.0) * decay * in_bounds

    # neighborhood clamp (3x3 AABB of the upsampled current frame) rejects
    # stale history on disocclusion; k is loose so converged sub-pixel
    # detail survives static frames
    lo = cur_up
    hi = cur_up
    for dyy in (-1, 0, 1):
        for dxx in (-1, 0, 1):
            nb = jnp.roll(cur_up, (dyy, dxx), axis=(0, 1))
            lo = jnp.minimum(lo, nb)
            hi = jnp.maximum(hi, nb)
    center = (lo + hi) * 0.5
    extent = (hi - lo) * 0.5 * clamp_k + 1e-4
    clamped = jnp.clip(hist, center - extent, center + extent)
    # clamping invalidates confidence: where history moved, restart its weight
    moved = jnp.max(jnp.abs(clamped - hist), axis=-1) > extent[..., 0] * 0.5
    w_h = jnp.where(moved, jnp.minimum(w_h, 1.0), w_h)

    w_new = w_h + w_f
    rgb = (clamped * w_h[..., None] + cur_up * w_f[..., None]) / w_new[..., None]
    # cap accumulated weight so the average stays responsive (≈ a few
    # Halton cycles of memory at the center-sample rate)
    w_new = jnp.minimum(w_new, 25.0)
    return jnp.concatenate([rgb, w_new[..., None]], axis=-1)

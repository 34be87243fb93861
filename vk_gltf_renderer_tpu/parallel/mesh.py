"""Pixel-tile data parallelism over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.7); this module is the
TPU-native scaling design it lacks: shard the pixel domain across chips
(each chip renders its rows with the scene/BVH/environment replicated —
scene data is O(100 MB), far below per-chip HBM), accumulate locally, and
psum only tiny global statistics (ray counters; later adaptive-sampling
stats). Collectives ride ICI; nothing crosses DCN per frame except the
final framebuffer gather, which jax handles lazily.

Determinism: the per-pixel xxhash32(px, py, frame) seeding makes the image
bit-identical regardless of the mesh shape — device placement cannot
change the picture (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8: keyword name changed check_rep -> check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.pathtrace import RenderConfig, render_frame_flat


def make_sharded_render_fn(cfg: RenderConfig, mesh: Mesh, axis: str = "tiles"):
    """Build a jitted frame renderer sharded over pixel rows.

    The returned fn takes (flat, bvh, env, frame) where frame contains
    px/py/accum sharded on their leading axis; scene pytrees are replicated.
    """

    def shard_body(flat, bvh, env, frame):
        accum, aux = render_frame_flat(flat, bvh, env, frame, cfg)
        # global ray counter: the one cross-chip collective per frame
        aux = dict(aux)
        aux["rays"] = jax.lax.psum(aux["rays"], axis)
        return accum, aux

    rep = P()
    shd = P(axis)
    frame_specs = {
        "proj_inv": rep,
        "view_inv": rep,
        "frame_idx": rep,
        "total_samples": rep,
        "pixel_angle": rep,
        "accum": shd,
        "px": shd,
        "py": shd,
    }
    aux_specs = {
        "first_pos": shd,
        "solid": shd,
        "first_rnode": shd,
        "first_tri": shd,
        "albedo": shd,
        "normal": shd,
        "roughness": shd,
        "rays": rep,
    }
    if cfg.denoise_guides:
        aux_specs.update({
            "spec_albedo": shd,
            "spec_hitdist": shd,
            "first_pos_prev": shd,
            "lum_moments": shd,
        })
    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(rep, rep, rep, frame_specs),
        out_specs=(shd, aux_specs),
        check_rep=False,
    )
    return jax.jit(fn)


_FN_CACHE: dict = {}


def render_mesh(renderer, mesh: Mesh, axis: str = "tiles"):
    """One sharded frame through a GltfRenderer's state. Returns aux."""
    cfg = renderer._config()
    key = (cfg, id(mesh), axis)
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = make_sharded_render_fn(cfg, mesh, axis)
    frame = renderer._frame_inputs()
    w, h = cfg.width, cfg.height
    n = w * h
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert n % ndev == 0, f"pixels {n} must divide evenly over {ndev} devices"
    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    frame = dict(frame)
    frame["px"] = px
    frame["py"] = py
    import time

    t0 = time.perf_counter()
    accum, aux = fn(renderer.flat, renderer.bvh, renderer._env_arrays(), frame)
    renderer.accum = accum  # device-resident
    renderer.total_samples += cfg.spp
    renderer.frame_idx += 1
    if renderer.adaptive is not None:
        # adaptive sampling from the GLOBAL (psum'd) ray counter — per-chip
        # local stats would let spp decisions diverge across the mesh and
        # break the accumulation cadence (SURVEY §2.7 maps adaptive stats
        # to psum). Reading aux["rays"] syncs the frame, so the wall time
        # below covers device work, not just dispatch.
        rays = float(aux["rays"])
        wall_ms = (time.perf_counter() - t0) * 1000.0
        renderer.adaptive.update_global(rays, wall_ms)
        renderer.spp = renderer.adaptive.spp
    return aux

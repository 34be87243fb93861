"""Multi-host (DCN) rendering: the cross-process half of SURVEY §2.7's
parallelism design. Within a process, pixel tiles shard over local chips
(ICI; parallel/mesh.py); across processes, the SAME mesh axis simply spans
all globally-visible devices and the per-frame psum of adaptive-sampling
stats rides DCN. The scene/BVH/env pytrees are replicated per process
(every host loads the same scene — the reference's single-GPU data model,
scaled out), so nothing crosses DCN per frame except the ray-counter psum
and whatever framebuffer slices the caller gathers at the end.

Process topology comes from jax.distributed (coordinator + process id);
on CPU test rigs the collectives ride Gloo, on TPU pods the same code
rides ICI/DCN — that is the point of writing it against the Mesh API.

Determinism: xxhash32(px, py, frame) seeding is placement-independent, so
the multi-host image is bit-identical to the single-host one
(test: tests/test_multihost.py spawns two real processes and asserts
shard-exact parity against the unsharded render).
"""

from __future__ import annotations

import numpy as np

_initialized = False


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   local_devices: int | None = None) -> None:
    """Initialize the JAX distributed runtime (idempotent). On CPU, set
    local_devices to force a virtual device count per process."""
    global _initialized
    if _initialized:
        return
    import os

    if local_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_devices}"
            )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def global_mesh(axis: str = "tiles"):
    """1-D mesh over every globally-visible device (all processes)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def _make_global(x, mesh, spec):
    """Build a global jax.Array from identical per-process host data.

    Every process holds the FULL host value (replicated scene model); each
    contributes exactly its addressable shards, sliced from the full value
    by the sharding's index map — the standard multi-process construction
    (jax.make_array_from_callback)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array from a previous multihost frame (e.g. the
        # accumulation buffer fed back as a frame input): numpy can't even
        # read it — reshard device-side instead of round-tripping via host
        return x if x.sharding == sharding else jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def render_multihost(renderer, mesh, axis: str = "tiles"):
    """One frame of renderer's scene over the global (multi-process) mesh.

    Pixel rows shard over ALL devices of ALL processes; scene pytrees are
    replicated. Returns (aux, local_slices) where local_slices maps this
    process's addressable shards to (row_start, accum_shard ndarray) for
    verification / assembly by the caller.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .mesh import make_sharded_render_fn

    cfg = renderer._config()
    fn = make_sharded_render_fn(cfg, mesh, axis)
    frame = dict(renderer._frame_inputs())
    w, h = cfg.width, cfg.height
    n = w * h
    ndev = len(mesh.devices.reshape(-1))
    assert n % ndev == 0, f"pixels {n} must divide evenly over {ndev} devices"
    px = np.tile(np.arange(w, dtype=np.uint32), h)
    py = np.repeat(np.arange(h, dtype=np.uint32), w)

    rep, shd = P(), P(axis)
    frame["px"] = px
    frame["py"] = py
    frame_specs = {k: (shd if k in ("accum", "px", "py") else rep) for k in frame}
    frame_g = {k: _make_global(v, mesh, frame_specs[k]) for k, v in frame.items()}
    rep_tree = lambda t: jax.tree.map(lambda x: _make_global(x, mesh, rep), t)
    flat_g = rep_tree(renderer.flat)
    bvh_g = rep_tree(renderer.bvh)
    env_g = rep_tree(renderer._env_arrays())

    import time

    t0 = time.perf_counter()
    accum, aux = fn(flat_g, bvh_g, env_g, frame_g)
    rays = float(aux["rays"])  # scalar readback = frame sync
    wall_ms = (time.perf_counter() - t0) * 1000.0
    renderer.accum = accum
    renderer.total_samples += cfg.spp
    renderer.frame_idx += 1
    if renderer.adaptive is not None:
        # psum'd global ray counter -> every process computes the same spp
        # bucket (SURVEY §2.7: adaptive stats ride psum; lock-step cadence).
        # wall_ms is MEASURED on process 0 and broadcast so every process
        # feeds the controller the same number (clocks differ across hosts;
        # a per-process measurement would let spp buckets diverge).
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            wall_ms = float(multihost_utils.broadcast_one_to_all(
                np.float32(wall_ms)))
        renderer.adaptive.update_global(rays, wall_ms)
        renderer.spp = renderer.adaptive.spp
    local = []
    shard_rows = n // ndev
    for s in accum.addressable_shards:
        start = s.index[0].start or 0
        local.append((start, np.asarray(s.data)))
    return aux, local

"""Profiler + device-memory tracker.

Replaces nvutils::ProfilerManager/ProfilerTimeline + GpuMemoryTracker
(SURVEY.md §5): named wall-clock sections with rolling averages (the
per-pass GPU timers the reference wraps around every stage), and HBM usage
snapshots via the JAX device API (the VRAM counter of BENCHMARK_ADV).

The adaptive sampler is a consumer of the frame section, exactly like the
reference's adaptive sampling reads the "Path Trace" GPU timer
(renderer_pathtracer.cpp:1347-1373).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class SectionStats:
    count: int = 0
    total_ms: float = 0.0
    min_ms: float = float("inf")
    max_ms: float = 0.0
    ema_ms: float = 0.0

    def add(self, ms: float) -> None:
        self.count += 1
        self.total_ms += ms
        self.min_ms = min(self.min_ms, ms)
        self.max_ms = max(self.max_ms, ms)
        self.ema_ms = ms if self.count == 1 else 0.9 * self.ema_ms + 0.1 * ms

    @property
    def avg_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


class Profiler:
    """Named timing sections; ~zero overhead when disabled."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.sections: dict[str, SectionStats] = defaultdict(SectionStats)

    @contextmanager
    def section(self, name: str, *, sync=None):
        """Time a block. Pass sync=array to block on a device value first
        (the remote-TPU tunnel makes un-synced timings meaningless)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync is not None:
            try:
                float(sync if hasattr(sync, "__float__") else sync.reshape(-1)[0])
            except Exception:
                pass
        self.sections[name].add((time.perf_counter() - t0) * 1000.0)

    def report(self) -> str:
        lines = [f"{'section':<28}{'count':>7}{'avg ms':>10}{'min':>9}{'max':>9}"]
        for name, st in sorted(self.sections.items()):
            lines.append(f"{name:<28}{st.count:>7}{st.avg_ms:>10.2f}{st.min_ms:>9.2f}{st.max_ms:>9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"count": v.count, "avg_ms": v.avg_ms, "min_ms": v.min_ms, "max_ms": v.max_ms} for k, v in self.sections.items()}


def device_memory_stats() -> dict:
    """HBM usage snapshot (GpuMemoryTracker / BENCHMARK_ADV analog)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def scene_memory_breakdown(renderer) -> dict:
    """Per-subsystem device memory accounting (the category-tagged tracker,
    gpu_memory_tracker.hpp): sizes of the scene pytree leaves by group."""
    import numpy as np
    import jax

    def nbytes(tree):
        return int(sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(tree) if hasattr(x, "shape")))

    out = {}
    if renderer.flat is not None:
        f = renderer.flat
        out["geometry"] = nbytes([f.vtx_pos, f.vtx_nrm, f.vtx_tan, f.vtx_uv0, f.vtx_uv1, f.vtx_color, f.tri_idx])
        out["materials"] = nbytes(f.materials)
        out["textures"] = nbytes([f.tex_quads, f.tex_desc])
        out["lights+nodes"] = nbytes([f.rn_o2w, f.rn_w2o, f.light_pos])
    if renderer.bvh is not None:
        out["bvh"] = nbytes(renderer.bvh)
    if renderer.accum is not None:
        out["framebuffers"] = nbytes([renderer.accum])
    out["total_tracked"] = sum(out.values())
    return out

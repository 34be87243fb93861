"""Benchmark entry point — run by the driver on real TPU hardware.

Renders the bundled shader_ball scene at 1920x1080, 1 spp, depth 5 (the
reference's headless recipe, docs/benchmarking.md:16-23) and reports ray
throughput against the BASELINE.json target of 150 Mrays/s/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SCENE = "/root/reference/resources/shader_ball.gltf"
HDR = "/root/reference/resources/std_env.hdr"
TARGET_MRAYS = 150.0


def main() -> int:
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    width, height, spp, depth = 1920, 1080, 1, 5
    warmup, timed_frames = 1, 3

    r = GltfRenderer(width=width, height=height, spp=spp, max_depth=depth)
    r.create_scene(SCENE)
    if Path(HDR).exists():
        try:
            r.create_hdr(HDR)
        except Exception:
            pass  # fall back to sky

    for attempt in range(3):
        try:
            for _ in range(warmup):
                r.on_render()
            t0 = time.perf_counter()
            auxes = [r.on_render() for _ in range(timed_frames)]
            # ONE host readback syncs the whole batch (the remote tunnel has
            # ~26 ms round-trip latency; per-frame syncs would distort timing)
            rays = float(sum(a["rays"] for a in auxes))
            wall = time.perf_counter() - t0
            break
        except Exception as e:
            if attempt == 2:
                raise
            time.sleep(30)  # axon TPU tunnel is flaky; retry
    mrays = rays / wall / 1e6
    msps = width * height * spp * timed_frames / wall / 1e6
    result = {
        "metric": "Mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 3),
        "detail": {
            "scene": SCENE,
            "resolution": f"{width}x{height}",
            "spp": spp,
            "max_depth": depth,
            "ms_per_frame": round(wall / timed_frames * 1000, 2),
            "throughput_MSps": round(msps, 2),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""In-process benchmark body (see bench.py for the resilient wrapper)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

SCENE = os.environ.get("VKGR_BENCH_SCENE", "/root/reference/resources/shader_ball.gltf")
HDR = "/root/reference/resources/std_env.hdr"
TARGET_MRAYS = 150.0


def main() -> int:
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    width = int(os.environ.get("VKGR_BENCH_W", 1920))
    height = int(os.environ.get("VKGR_BENCH_H", 1080))
    spp, depth = 1, 5
    warmup, timed_frames = 1, 3

    r = GltfRenderer(width=width, height=height, spp=spp, max_depth=depth)
    r.create_scene(SCENE)
    if Path(HDR).exists():
        try:
            r.create_hdr(HDR)
        except Exception:
            pass  # fall back to sky

    for _ in range(warmup):
        aux = r.on_render()
    float(aux["rays"])  # sync (the tunnel ignores block_until_ready)

    t0 = time.perf_counter()
    auxes = [r.on_render() for _ in range(timed_frames)]
    rays = float(sum(a["rays"] for a in auxes))  # ONE readback syncs the batch
    wall = time.perf_counter() - t0

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

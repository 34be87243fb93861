"""In-process benchmark body (see bench.py for the resilient wrapper).

Protocol (hardened round 4 per the reference recipe, docs/benchmarking.md:16-45):
per-frame readback-synced timings over >=20 frames after warmup, reporting
min/median/max spread so the headline number cannot be 3-frame noise, plus a
second capture on the DamagedHelmet-role stand-in so perf is not a
single-scene claim.  Env knobs (matrix runs use smaller values for speed):

  VKGR_BENCH_FRAMES   timed frames per scene      (default 20)
  VKGR_BENCH_SCENE    primary scene path          (default shader_ball)
  VKGR_BENCH_SCENE2   "0" disables the second scene; or a path (default
                      auto-generated helmet stand-in)
  VKGR_BENCH_W/H      resolution                  (default 1920x1080)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

SCENE = os.environ.get("VKGR_BENCH_SCENE", "/root/reference/resources/shader_ball.gltf")
HDR = "/root/reference/resources/std_env.hdr"
TARGET_MRAYS = 150.0


def _helmet_standin() -> str | None:
    """Build (once) the DamagedHelmet-role stand-in scene and return its path."""
    override = os.environ.get("VKGR_BENCH_SCENE2", "")
    if override == "0":
        return None
    if override:
        return override
    out = Path(tempfile.gettempdir()) / "vkgr_bench_standins"
    p = out / "helmet.gltf"
    if not p.exists():
        out.mkdir(parents=True, exist_ok=True)
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
        try:
            import baseline_standins

            baseline_standins.make_helmet(str(out))
        except Exception as exc:  # stand-in generation must never sink the bench
            sys.stderr.write(f"helmet stand-in generation failed: {exc}\n")
            return None
    return str(p)


def _measure(scene_path: str, width: int, height: int, spp: int, depth: int,
             warmup: int, timed_frames: int) -> dict:
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=width, height=height, spp=spp, max_depth=depth)
    r.create_scene(scene_path)
    if Path(HDR).exists():
        try:
            r.create_hdr(HDR)
        except Exception:
            pass  # fall back to sky

    for _ in range(warmup):
        aux = r.on_render()
    float(aux["rays"])  # sync (the tunnel ignores block_until_ready)

    frame_ms = []
    total_rays = 0.0
    for _ in range(timed_frames):
        t0 = time.perf_counter()
        aux = r.on_render()
        total_rays += float(aux["rays"])  # scalar readback = per-frame sync
        frame_ms.append((time.perf_counter() - t0) * 1000.0)

    wall = sum(frame_ms) / 1000.0
    mrays = total_rays / wall / 1e6
    return {
        "scene": scene_path,
        "mrays": round(mrays, 2),
        "ms_per_frame": round(wall / timed_frames * 1000, 2),
        "ms_min": round(min(frame_ms), 2),
        "ms_median": round(statistics.median(frame_ms), 2),
        "ms_max": round(max(frame_ms), 2),
        "frames": timed_frames,
        "throughput_MSps": round(width * height * spp * timed_frames / wall / 1e6, 2),
    }


def _measure_subprocess(scene_path: str, timeout_s: int) -> dict:
    """Measure one scene in a bounded child process.

    The round-4 capture showed a textured-scene compile can HANG the TPU
    worker (not fault), which would otherwise stall the whole bench past
    the driver's patience; a child + timeout converts that into an error
    entry while the primary numbers still publish."""
    import subprocess

    env = dict(os.environ)
    env["VKGR_BENCH_ONLY_SCENE"] = scene_path
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "vk_gltf_renderer_tpu.bench_impl"],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"scene measurement timed out after {timeout_s}s (hang)"}
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{") and '"mrays"' in line:
            return json.loads(line)
    return {"error": f"rc={proc.returncode}: {proc.stderr[-300:]}"}


def main() -> int:
    width = int(os.environ.get("VKGR_BENCH_W", 1920))
    height = int(os.environ.get("VKGR_BENCH_H", 1080))
    spp, depth = 1, 5
    warmup = 2
    timed_frames = int(os.environ.get("VKGR_BENCH_FRAMES", 20))

    only = os.environ.get("VKGR_BENCH_ONLY_SCENE")
    if only:
        print(json.dumps(_measure(only, width, height, spp, depth, warmup,
                                   timed_frames)))
        return 0

    primary = _measure(SCENE, width, height, spp, depth, warmup, timed_frames)

    detail = {
        "scene": primary["scene"],
        "resolution": f"{width}x{height}",
        "spp": spp,
        "max_depth": depth,
        "ms_per_frame": primary["ms_per_frame"],
        "ms_min": primary["ms_min"],
        "ms_median": primary["ms_median"],
        "ms_max": primary["ms_max"],
        "frames": primary["frames"],
        "throughput_MSps": primary["throughput_MSps"],
    }

    helmet = _helmet_standin()
    helmet_failed = False
    if helmet is not None:
        # a textured-scene failure is a BENCH failure (every BASELINE
        # config is textured): nonzero exit routes it into bench.py's
        # fresh-cache retry instead of burying it in the detail string
        res = _measure_subprocess(
            helmet, timeout_s=int(os.environ.get("VKGR_BENCH_SCENE2_TIMEOUT", 1200)))
        detail["helmet_standin"] = res
        helmet_failed = "error" in res

    result = {
        "metric": "Mrays_per_sec",
        "value": primary["mrays"],
        "unit": "Mrays/s",
        "vs_baseline": round(primary["mrays"] / TARGET_MRAYS, 3),
        "detail": detail,
    }
    print(json.dumps(result))
    return 2 if helmet_failed else 0


if __name__ == "__main__":
    sys.exit(main())

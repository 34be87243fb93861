"""Benchmark entry point — run by the driver on real TPU hardware.

Renders the bundled shader_ball scene at 1920x1080, 1 spp, depth 5 (the
reference's headless recipe, docs/benchmarking.md:16-23) and reports ray
throughput against the BASELINE.json target of 150 Mrays/s/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Resilience: the persistent XLA cache can be poisoned by crashed compiles
(entries load but fail with INVALID_ARGUMENT at run time), and the axon
TPU tunnel wedges transiently — so the measurement runs in a subprocess
and retries with a fresh cache directory on failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

HERE = Path(__file__).resolve().parent


def _tpu_reachable(env, timeout=180) -> bool:
    """Cheap probe: the axon tunnel wedges by HANGING (not erroring), so a
    bounded subprocess is the only safe way to ask."""
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            cwd=HERE, env=env, capture_output=True, timeout=timeout,
        )
        return probe.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    env = dict(os.environ)
    if not _tpu_reachable(env):
        # one retry after a cool-off: transient UNAVAILABLE recovers ~30 s
        import time

        time.sleep(60)
        if not _tpu_reachable(env):
            print(json.dumps({
                "metric": "Mrays_per_sec", "value": 0.0, "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "detail": {"error": "TPU tunnel unreachable (probe timed out twice)"},
            }))
            return 1
    last_line = None
    for attempt in range(3):
        if attempt > 0:
            env["VKGR_TPU_CACHE"] = tempfile.mkdtemp(prefix="vkgr_bench_cache_")
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "vk_gltf_renderer_tpu.bench_impl"],
                cwd=HERE, env=env, capture_output=True, text=True, timeout=2700,
            )
        except subprocess.TimeoutExpired as exc:
            # salvage a result line if one was already printed before the hang
            out = exc.stdout.decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
            for line in reversed(out.splitlines()):
                if line.startswith("{") and '"metric"' in line:
                    last_line = line
                    break
            sys.stderr.write(f"bench attempt {attempt + 1} timed out; retrying\n")
            continue
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{") and '"metric"' in line:
                last_line = line
                break
        if last_line is not None and proc.returncode == 0:
            print(last_line)
            return 0
        sys.stderr.write(proc.stderr[-2000:] + "\n")
        sys.stderr.write(
            f"bench attempt {attempt + 1} failed (rc={proc.returncode}); "
            "retrying with a fresh XLA cache\n")
    if last_line is not None:
        # every attempt had a scene failure (bench_impl rc=2): publish the
        # partial numbers but exit nonzero so the failure is not buried
        print(last_line)
    return 1


if __name__ == "__main__":
    sys.exit(main())

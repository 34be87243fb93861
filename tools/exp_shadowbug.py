"""Bisect the full-width shadow-trace INVALID_ARGUMENT (exp_glue crash).

exp_glue's shadow_trace stage kills the TPU worker with INVALID_ARGUMENT
at 1080p full width (2,073,600 lanes), unsorted, anyhit=True, per-lane
finite tmax — while the production (sorted/bucketed) shadow path works.
Same error class as the round-4 helmet crash, so worth isolating.

Each variant runs in a FRESH SUBPROCESS (a faulted Mosaic kernel poisons
the process's device client: every later transfer throws).

Run: python tools/exp_shadowbug.py
"""
import json
import subprocess
import sys

CASES = [
    # name, anyhit, tmax_kind (inf|dist), n, coherent
    ("anyhit_dist_full", True, "dist", 2073600, True),
    ("anyhit_inf_full", True, "inf", 2073600, True),
    ("closest_dist_full", False, "dist", 2073600, True),
    ("anyhit_dist_quarter", True, "dist", 518400, True),
    ("anyhit_dist_full_incoh", True, "dist", 2073600, False),
]

BODY = r"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
name, anyhit, tmax_kind, n, coherent = json.loads(sys.argv[1])

from vk_gltf_renderer_tpu.renderer import GltfRenderer
from vk_gltf_renderer_tpu.ops.pathtrace import trace_closest
from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device
from dataclasses import replace

r = GltfRenderer(width=64, height=64, spp=1, max_depth=2)
r.create_scene("/root/reference/resources/shader_ball.gltf")
cfg = replace(r._config(), sort_rays=False, trace_width=n)
bvh = jax.device_put(r.bvh)

rng = np.random.RandomState(3)
d = rng.randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro = jnp.asarray((-2.5 * d).astype(np.float32))
rd = jnp.asarray(d)
dist = jnp.asarray(rng.rand(n).astype(np.float32) * 10.0) if tmax_kind == "dist" else None

f = jax.jit(lambda ro, rd: trace_closest(
    bvh, ro, rd, cfg, tmin=0.0, tmax=dist, coherent=coherent, anyhit=anyhit))
ms = timeit_device(f, ro, rd, iters=3) * 1e3
print(f"RESULT {name} OK {ms:.2f} ms", flush=True)
"""

for case in CASES:
    p = subprocess.run(
        [sys.executable, "-c", BODY, json.dumps(case)],
        capture_output=True, text=True, timeout=1200)
    line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    if line:
        print(line[0], flush=True)
    else:
        err = (p.stderr.strip().splitlines() or ["?"])[-1]
        print(f"RESULT {case[0]} FAIL rc={p.returncode} {err[:160]}", flush=True)

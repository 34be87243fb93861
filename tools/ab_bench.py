"""Paired interleaved A/B frame bench — the noise-proof protocol for the
tunneled TPU.

The r4d/r4e matrices showed same-config day-to-day drift of ~10-20%
(defaults_v3 measured 303.3 ms in one run and 362.8 ms hours later), which
is larger than most lever effects. Sequential per-config benches therefore
cannot rank levers. This tool compiles ALL requested config variants up
front (they coexist in the render-fn variant cache), then times frames in
round-robin interleave (A, B, C, A, B, C, ...) so tunnel drift hits every
variant equally; the report is per-variant median + pairwise delta vs the
first (baseline) variant on PAIRED rounds.

Usage:
  python tools/ab_bench.py --rounds 12 \
      --variant base \
      --variant trace_native=1 \
      --variant peel_sort_shadow=1,trace_native=1

Variant syntax: comma-separated RenderConfig field overrides (bools accept
0/1), applied on top of the renderer's stock _config(). `base` = stock.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def parse_variant(spec: str, base):
    if spec in ("base", ""):
        return base
    kv = {}
    for part in spec.split(","):
        k, v = part.split("=")
        cur = getattr(base, k)
        if isinstance(cur, bool):
            kv[k] = v not in ("0", "false", "False")
        elif isinstance(cur, int):
            kv[k] = int(v)
        elif isinstance(cur, float):
            kv[k] = float(v)
        else:
            kv[k] = v
    return dataclasses.replace(base, **kv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    ap.add_argument("--hdr", default="/root/reference/resources/std_env.hdr")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--variant", action="append", default=[])
    args = ap.parse_args()
    specs = args.variant or ["base"]

    import jax
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.ops.pathtrace import make_render_fn

    r = GltfRenderer(width=args.width, height=args.height, spp=1,
                     max_depth=args.depth)
    r.create_scene(args.scene)
    try:
        r.create_hdr(args.hdr)
    except Exception:
        pass
    base = r._config()
    cfgs = [parse_variant(s, base) for s in specs]
    frame = r._frame_inputs()
    flat, bvh, env = jax.device_put((r.flat, r.bvh, r._env_arrays()))
    frame = jax.device_put(frame)

    fns = [make_render_fn(c) for c in cfgs]
    # warmup: compile + settle each variant; a variant whose kernel dies on
    # the live TPU (InvalidArgument etc.) is dropped instead of killing the
    # whole matrix
    alive = []
    for spec, fn in zip(specs, fns):
        try:
            for w in range(args.warmup):
                accum, aux = fn(flat, bvh, env, frame)
                float(aux["rays"])  # readback sync
            alive.append((spec, fn))
        except Exception as e:  # noqa: BLE001
            print(f"variant {spec!r} FAILED warmup: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if not alive:
        print("all variants failed warmup", flush=True)
        sys.exit(1)
    specs = [s for s, _ in alive]
    fns = [f for _, f in alive]

    times = [[] for _ in fns]
    rays = [0.0 for _ in fns]
    for rnd in range(args.rounds):
        for i, fn in enumerate(fns):
            t0 = time.perf_counter()
            accum, aux = fn(flat, bvh, env, frame)
            rays[i] += float(aux["rays"])  # sync
            times[i].append((time.perf_counter() - t0) * 1000.0)
        meds = [round(statistics.median(t), 1) for t in times]
        print(f"round {rnd + 1}/{args.rounds}: medians {meds}", flush=True)

    out = []
    base_times = times[0]
    for i, spec in enumerate(specs):
        med = statistics.median(times[i])
        # paired per-round delta vs baseline variant (drift-immune)
        deltas = [b - t for t, b in zip(times[i], base_times)]
        mrays = rays[i] / (sum(times[i]) / 1000.0) / 1e6
        out.append({
            "variant": spec,
            "ms_median": round(med, 2),
            "ms_min": round(min(times[i]), 2),
            "mrays": round(mrays, 2),
            "paired_delta_ms_median": round(statistics.median(deltas), 2),
            "paired_delta_ms_mean": round(sum(deltas) / len(deltas), 2),
        })
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

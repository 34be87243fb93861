"""Frame-glue decomposition on real data: time each shading-glue component
of the bounce body in isolation at frame width (1080p shader_ball).

The round-4 matrix put the null-traversal floor at ~107 ms/frame vs a
303 ms full frame — the glue is now a co-equal target with traversal. This
probe answers WHERE those 107 ms go, on the real scene and real hit
population, using timeit_device (the only honest protocol on the tunnel):

  trace_primary   the coherent v3 packet trace itself (for scale)
  hitstate        get_hit_state_fused: 1 wide row-gather + vector math
  mateval         evaluate_material at the scene's feature set
  lights          _sample_lights (env alias-table sampling + light glue)
  bsdf_eval       bsdf_evaluate (NEE direction)
  bsdf_sample     bsdf_sample (next segment)
  shadow_trace    the real anyhit trace on NEE rays (traversal, for scale)
  compact_sort    _sort_keys + the production ~20-operand co-sort
  rng_block       the per-bounce RNG draws (rand/rand2/rand3 chain)

Run: python tools/exp_glue.py [--width 1920 --height 1080] [--iters 8]
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    ap.add_argument("--hdr", default="/root/reference/resources/std_env.hdr")
    args = ap.parse_args()

    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.ops import rng
    from vk_gltf_renderer_tpu.ops.bsdf import bsdf_evaluate, bsdf_sample
    from vk_gltf_renderer_tpu.ops.camera import generate_rays
    from vk_gltf_renderer_tpu.ops.hitstate import get_hit_state_fused
    from vk_gltf_renderer_tpu.ops.materials_eval import evaluate_material
    from vk_gltf_renderer_tpu.ops.pathtrace import (
        _sample_lights, _sort_keys, _state_columns_spec, trace_closest)
    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

    r = GltfRenderer(width=args.width, height=args.height, spp=1, max_depth=5)
    r.create_scene(args.scene)
    try:
        r.create_hdr(args.hdr)
    except Exception:
        pass
    cfg = r._config()
    frame = r._frame_inputs()
    # closure constants must be device arrays (the production path passes
    # these as jit ARGUMENTS, which converts numpy leaves automatically)
    for attempt in range(3):  # transient tunnel INVALID_ARGUMENT — retry
        try:
            flat, bvh, env = jax.device_put((r.flat, r.bvh, r._env_arrays()))
            jax.block_until_ready((flat, bvh, env))
            break
        except Exception:
            if attempt == 2:
                raise
            import time

            time.sleep(5)
    w, h = args.width, args.height
    n = w * h

    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    seed = rng.xxhash32(px, py, frame["frame_idx"])
    sample_pos = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    ro, rd = generate_rays(
        sample_pos, jnp.full((n, 2), 0.5), jnp.array([w, h], jnp.float32),
        frame["proj_inv"], frame["view_inv"])

    res = {}

    def run(name, fn, *a):
        ms = None
        for attempt in range(3):  # the axon tunnel throws transient
            try:                   # INVALID_ARGUMENT on host->device xfers
                ms = timeit_device(jax.jit(fn), *a, iters=args.iters) * 1e3
                break
            except Exception as exc:
                if "INVALID_ARGUMENT" not in str(exc) or attempt == 2:
                    print(f"{name:14s}    ERROR {str(exc)[:120]}", flush=True)
                    return
                import time

                time.sleep(5)
        res[name] = ms
        print(f"{name:14s} {ms:8.2f} ms", flush=True)

    from dataclasses import replace
    cfg_t = replace(cfg, sort_rays=False, trace_width=n)

    run("trace_primary",
        lambda ro, rd: trace_closest(bvh, ro, rd, cfg_t, coherent=True), ro, rd)

    hits = jax.jit(lambda ro, rd: trace_closest(bvh, ro, rd, cfg_t, coherent=True))(ro, rd)
    hits = jax.tree.map(lambda x: x.block_until_ready(), hits)

    hit_attr = jnp.asarray(bvh.hit_attr)
    rn_attr_base = jnp.asarray(bvh.rn_attr_base)
    run("hitstate",
        lambda hits, rd: get_hit_state_fused(hit_attr, rn_attr_base, hits, rd),
        hits, rd)

    hs = jax.jit(lambda hits, rd: get_hit_state_fused(hit_attr, rn_attr_base, hits, rd))(hits, rd)
    mat_id = flat.rn_material[jnp.maximum(hits["rnode"], 0)]
    run("mateval",
        lambda mat_id, hs: evaluate_material(
            flat, mat_id, hs, features=cfg.features,
            is_inside=jnp.zeros(n, bool), tex_lod=jnp.zeros(n)),
        mat_id, hs)

    pbr = jax.jit(lambda mat_id, hs: evaluate_material(
        flat, mat_id, hs, features=cfg.features,
        is_inside=jnp.zeros(n, bool), tex_lod=jnp.zeros(n)))(mat_id, hs)

    run("lights",
        lambda pos, nrm, seed: _sample_lights(flat, env, pos, nrm, seed, cfg),
        hs["pos"], pbr["N"], seed)
    dl, _ = jax.jit(lambda pos, nrm, seed: _sample_lights(
        flat, env, pos, nrm, seed, cfg))(hs["pos"], pbr["N"], seed)

    run("bsdf_eval", lambda pbr, rd, d: bsdf_evaluate(pbr, -rd, d), pbr, rd, dl["direction"])

    def _samp(pbr, rd, seed):
        u3, seed = rng.rand3(seed)
        ue, seed = rng.rand2(seed)
        return bsdf_sample(pbr, -rd, u3, ue)
    run("bsdf_sample", _samp, pbr, rd, seed)

    spec = _state_columns_spec(cfg)
    ncols = sum(1 if c is None else c for _, c in spec) + 1  # +key
    cols = None
    for attempt in range(3):  # transient tunnel INVALID_ARGUMENT — retry
        try:
            cols = [jnp.asarray(np.random.RandomState(i).rand(n).astype(np.float32))
                    for i in range(ncols - 1)]
            jax.block_until_ready(cols)
            break
        except Exception:
            if attempt == 2:
                raise
            import time

            time.sleep(10)

    def _cosort(ro, rd, alive, *cs):
        keys = _sort_keys(bvh, ro, rd, alive)
        return jax.lax.sort((keys, *cs), num_keys=1)[1:]
    alive = hits["tri"] >= 0
    run(f"compact_sort{ncols}", _cosort, ro, rd, alive, *cols)

    def _rngblk(seed):
        outs = []
        for _ in range(3):  # ~the per-bounce draw count
            u, seed = rng.rand(seed)
            u2, seed = rng.rand2(seed)
            outs.append(u)
        return outs, seed
    run("rng_block", _rngblk, seed)

    # trace stages LAST: a Mosaic kernel fault poisons the process's device
    # client (every later transfer throws INVALID_ARGUMENT — observed
    # 2026-08-19: the full-width unsorted shadow trace passed standalone in
    # tools/exp_shadowbug.py but an earlier-fault cascade killed the rest
    # of this probe), so nothing may run after them.
    def _shadow(org, d, dist, seed, mask):
        from vk_gltf_renderer_tpu.ops.pathtrace import _trace_shadow
        return _trace_shadow(flat, bvh, org, d, dist, seed, cfg_t, alive=mask)
    run("shadow_trace", _shadow, hs["shadow_pos"], dl["direction"],
        dl["distance"], seed, hits["tri"] >= 0)

    # a bounce-1 closest trace on REAL continuation rays (the frame's slow
    # trace class: coherent origins, hemispherical directions)
    def _samp_dir(pbr, rd, seed):
        u3, seed = rng.rand3(seed)
        ue, seed = rng.rand2(seed)
        return bsdf_sample(pbr, -rd, u3, ue)["k2"]
    d1 = jax.jit(_samp_dir)(pbr, rd, seed)
    run("trace_bounce1",
        lambda org, d, mask: trace_closest(bvh, org, d, cfg_t, alive=mask, coherent=True),
        hs["pos"], d1, hits["tri"] >= 0)

    tot = sum(v for k, v in res.items() if k not in ("trace_primary", "shadow_trace", "trace_bounce1"))
    print(f"\nglue total (ex traces): {tot:.2f} ms per full-width bounce")
    print(f"live fraction after bounce 0: {float(jnp.mean(alive.astype(jnp.float32))):.3f}")


if __name__ == "__main__":
    main()

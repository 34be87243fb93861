"""Split get_hit_state_fused's 15.9 ms (1080p full width): gather vs math.

Stages timed independently at n lanes on the real shader_ball attr table:
  gather        row = hit_attr[row_id]  (the one wide row gather)
  gather_b16    same gather from a bfloat16 copy of the table (half bytes)
  math          the full hit-state vector math on a PRE-GATHERED row
  full          get_hit_state_fused as shipped
  gather_sorted the gather with row_id sorted (tests whether XLA's TPU
                gather is sensitive to index locality)

Run: python tools/exp_hitstate.py [--width 1920 --height 1080]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.camera import generate_rays
    from vk_gltf_renderer_tpu.ops.hitstate import get_hit_state_fused
    from vk_gltf_renderer_tpu.ops.pathtrace import trace_closest
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device
    from dataclasses import replace

    r = GltfRenderer(width=args.width, height=args.height, spp=1, max_depth=2)
    r.create_scene(args.scene)
    cfg = replace(r._config(), sort_rays=False, trace_width=args.width * args.height)
    frame = r._frame_inputs()
    bvh = jax.device_put(r.bvh)
    n = args.width * args.height

    w, h = args.width, args.height
    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    sample_pos = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    ro, rd = generate_rays(
        sample_pos, jnp.full((n, 2), 0.5), jnp.array([w, h], jnp.float32),
        frame["proj_inv"], frame["view_inv"])

    hits = jax.jit(lambda ro, rd: trace_closest(bvh, ro, rd, cfg, coherent=True))(ro, rd)
    hits = {k: v.block_until_ready() for k, v in hits.items()}

    hit_attr = jnp.asarray(bvh.hit_attr)
    rn_base = jnp.asarray(bvh.rn_attr_base)
    print(f"attr table {hit_attr.shape} ({hit_attr.nbytes/1e6:.1f} MB), n={n}",
          flush=True)

    row_id = jax.jit(lambda hits: jnp.clip(
        rn_base[jnp.maximum(hits["rnode"], 0)] + jnp.maximum(hits["tri"], 0),
        0, hit_attr.shape[0] - 1))(hits)
    row_id = row_id.block_until_ready()
    row_sorted = jnp.sort(row_id).block_until_ready()
    hit_attr_b16 = hit_attr.astype(jnp.bfloat16).block_until_ready()
    row = jax.jit(lambda i: hit_attr[i])(row_id).block_until_ready()

    def run(name, fn, *a):
        try:
            ms = timeit_device(jax.jit(fn), *a, iters=args.iters) * 1e3
            print(f"{name:14s} {ms:8.2f} ms", flush=True)
        except Exception as exc:
            print(f"{name:14s}    ERROR {str(exc)[:120]}", flush=True)

    run("gather", lambda i: hit_attr[i], row_id)
    run("gather_sorted", lambda i: hit_attr[i], row_sorted)
    run("gather_b16", lambda i: hit_attr_b16[i], row_id)
    run("full", lambda hits, rd: get_hit_state_fused(hit_attr, rn_base, hits, rd),
        hits, rd)

    # math-only: patch the gather out by feeding the row as an argument
    from vk_gltf_renderer_tpu.ops import hitstate as hs_mod

    def math_only(row, hits, rd):
        # replicate get_hit_state_fused's body post-gather (narrow layout)
        import vk_gltf_renderer_tpu.ops.hitstate as H
        u = hits["u"][..., None]
        v = hits["v"][..., None]
        ww = 1.0 - u - v
        n0, n1, n2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        t0, t1, t2 = row[..., 9:12], row[..., 12:15], row[..., 15:18]
        narrow = row.shape[-1] == H.HIT_ATTR_COLS_NARROW
        if narrow:
            p0, p1, p2 = row[..., 19:22], row[..., 22:25], row[..., 25:28]
        else:
            p0, p1, p2 = row[..., 44:47], row[..., 47:50], row[..., 50:53]
        pos = p0 * ww + p1 * u + p2 * v
        from vk_gltf_renderer_tpu.ops.traverse import dot3, cross3
        geon = cross3(p1 - p0, p2 - p0)
        nrm = n0 * ww + n1 * u + n2 * v
        tangent = t0 * ww + t1 * u + t2 * v
        return pos + geon + nrm + tangent

    run("math_approx", math_only, row, hits, rd)


if __name__ == "__main__":
    main()

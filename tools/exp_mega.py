"""Megakernel vs wavefront A/B on real hardware (VERDICT r4 item 2).

Runs the two arms of ops/megakernel.py — identical reduced path semantics,
identical LCG streams, no sorting/compaction in either — on shader_ball at
several depths and ray populations, and prints per-arm device times. The
difference isolates what moving the bounce loop INSIDE the Pallas kernel
buys (launch overhead + ray-state HBM round-trips per bounce).

Run: python tools/exp_mega.py [--n 262144] [--tiles 8] [--iters 6]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.megakernel import (pack_rays, render_mega,
                                                     render_wavefront)
    from vk_gltf_renderer_tpu.ops.traverse import as_device
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

    r = GltfRenderer(width=8, height=8, spp=1, max_depth=1)
    r.create_scene(args.scene)
    wb = as_device(r.bvh)
    print(f"scene: {args.scene.split('/')[-1]}  nodes4={wb.nodes4_fi.shape[0]}  "
          f"n={args.n} tiles={args.tiles}", flush=True)

    rng = np.random.RandomState(5)
    # primary-like coherent rays: shell origins aimed at the scene center
    d = rng.randn(args.n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = -3.0 * d
    seeds = rng.randint(0, 2**31, size=args.n).astype(np.uint32)
    ro_p, rd_p, seed_p, _ = pack_rays(jnp.asarray(ro), jnp.asarray(d),
                                      jnp.asarray(seeds), tiles=args.tiles)
    ro_p, rd_p, seed_p = jax.device_put((ro_p, rd_p, seed_p))
    tabs = jax.device_put((wb.nodes4_fi, wb.tris128))

    for depth in args.depths:
        fm = jax.jit(lambda nf, t1, a, b, c: render_mega(
            nf, t1, a, b, c, depth=depth, root_code=wb.root4_code,
            tiles=args.tiles, interpret=args.interpret))
        fw = jax.jit(lambda nf, t1, a, b, c: render_wavefront(
            nf, t1, a, b, c, depth=depth, root_code=wb.root4_code,
            tiles=args.tiles, interpret=args.interpret))
        out_m = fm(*tabs, ro_p, rd_p, seed_p)
        out_w = fw(*tabs, ro_p, rd_p, seed_p)
        rm = np.asarray(out_m)[:, 0].reshape(-1)
        rw = np.asarray(out_w)[:, 0].reshape(-1)
        ok = np.allclose(rm, rw, rtol=1e-5, atol=1e-6)
        tm = timeit_device(fm, *tabs, ro_p, rd_p, seed_p, iters=args.iters) * 1e3
        tw = timeit_device(fw, *tabs, ro_p, rd_p, seed_p, iters=args.iters) * 1e3
        mr_m = args.n * depth / tm / 1e3
        mr_w = args.n * depth / tw / 1e3
        print(f"depth={depth}  mega {tm:8.2f} ms ({mr_m:6.2f} Mrays/s)   "
              f"wavefront {tw:8.2f} ms ({mr_w:6.2f} Mrays/s)   "
              f"parity={'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()

"""Kernel-boundary cost split: bare trace launch vs wavefront bounce.

Times, at the same ray population:
  kernel    ONE traverse_packets3 launch on pre-packed rays (jit'd alone)
  wf/bounce the stripped wavefront arm per-bounce cost (exp_mega)
  mega/bounce the megakernel per-bounce cost

boundary = wf/bounce - kernel;  table-residency gain = kernel - mega/bounce.

Run: python tools/exp_boundary.py [--n 2097152] [--tiles 8]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.megakernel import (pack_rays, render_mega,
                                                     render_wavefront)
    from vk_gltf_renderer_tpu.ops.pallas_traverse import traverse_packets3
    from vk_gltf_renderer_tpu.ops.traverse import as_device
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device

    r = GltfRenderer(width=8, height=8, spp=1, max_depth=1)
    r.create_scene(args.scene)
    wb = as_device(r.bvh)

    rng = np.random.RandomState(5)
    d = rng.randn(args.n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = -3.0 * d
    seeds = rng.randint(0, 2**31, size=args.n).astype(np.uint32)
    ro_p, rd_p, seed_p, _ = pack_rays(jnp.asarray(ro), jnp.asarray(d),
                                      jnp.asarray(seeds), tiles=args.tiles)
    ro_p, rd_p, seed_p = jax.device_put((ro_p, rd_p, seed_p))
    nf, t128 = jax.device_put((wb.nodes4_fi, wb.tris128))

    fk = jax.jit(lambda nf, t1, a, b: traverse_packets3(
        nf, t1, a, b, wb.root4_code, tiles=args.tiles))
    tk = timeit_device(fk, nf, t128, ro_p, rd_p, iters=args.iters) * 1e3
    print(f"bare kernel launch          {tk:8.2f} ms", flush=True)

    for depth in (1, 2):
        fm = jax.jit(lambda nf, t1, a, b, c, dd=depth: render_mega(
            nf, t1, a, b, c, depth=dd, root_code=wb.root4_code, tiles=args.tiles))
        fw = jax.jit(lambda nf, t1, a, b, c, dd=depth: render_wavefront(
            nf, t1, a, b, c, depth=dd, root_code=wb.root4_code, tiles=args.tiles))
        tm = timeit_device(fm, nf, t128, ro_p, rd_p, seed_p, iters=args.iters) * 1e3
        tw = timeit_device(fw, nf, t128, ro_p, rd_p, seed_p, iters=args.iters) * 1e3
        print(f"depth={depth}  mega {tm:8.2f} ms   wavefront {tw:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

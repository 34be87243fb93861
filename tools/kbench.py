"""Traversal-kernel microbenchmark on the real TPU.

Loads shader_ball, builds the flattened world BVH, and times kernel
variants on (a) coherent primary rays, (b) semi-coherent bounce-like
rays, (c) incoherent random rays. Timing follows utils/tpu_bench.py
(enqueue N, one readback, subtract RTT).

Usage: python tools/kbench.py [--rays 262144] [--variant packet]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vk_gltf_renderer_tpu.models.scene import Scene
from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
from vk_gltf_renderer_tpu.utils.tpu_bench import timeit_device


def make_rays(wb, n, kind, seed=0):
    """Ray sets mimicking frame stages."""
    rng = np.random.default_rng(seed)
    lo = np.asarray(wb.nodes_self[0, 0:3])
    hi = np.asarray(wb.nodes_self[0, 3:6])
    c = (lo + hi) / 2
    ext = float(np.max(hi - lo))
    if kind == "primary":
        # pinhole camera looking at the scene center
        s = int(np.sqrt(n))
        eye = c + np.array([0.0, 0.3 * ext, 1.6 * ext])
        px, py = np.meshgrid(np.linspace(-0.5, 0.5, s), np.linspace(-0.4, 0.2, s))
        d = np.stack([px.ravel(), py.ravel(), -np.ones(s * s)], axis=-1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ro = np.broadcast_to(eye, (s * s, 3)).copy()
        rd = d
        n = s * s
    elif kind == "bounce":
        # origins on a sphere shell inside the scene, cosine-ish directions
        u = rng.normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        ro = c + u * ext * 0.25
        rd = rng.normal(size=(n, 3))
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    else:  # random
        ro = c + (rng.random((n, 3)) - 0.5) * ext * 1.2
        rd = rng.normal(size=(n, 3))
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


def sort_rays(wb, ro, rd, dir_first=False):
    """Morton sort like trace_closest does in-frame. dir_first flips the
    key composition: direction octant/morton OUTRANKS origin morton, so
    packets become direction-coherent with scattered origins (the
    hypothesis: union-of-nodes saturation on bounce rays is direction-
    driven, so grouping directions prunes better than grouping origins)."""
    from vk_gltf_renderer_tpu.ops.pathtrace import _sort_keys
    b = type("B", (), {"nodes_self": wb.nodes_self})()
    keys = np.asarray(_sort_keys(b, np.asarray(ro), np.asarray(rd),
                                 np.ones(ro.shape[0], bool))).astype(np.uint64)
    if dir_first:
        keys = ((keys >> 27) << 27) | ((keys & 0xFFF) << 15) | ((keys >> 12) & 0x7FFF)
    o = np.argsort(keys)
    return ro[o], rd[o]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--kinds", default="primary,bounce,random")
    ap.add_argument("--variants", default="packet")
    ap.add_argument("--anyhit", action="store_true")
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--dirsort", action="store_true",
                    help="sort direction-first (octant outranks origin)")
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--entry", action="store_true")
    args = ap.parse_args()

    scene = Scene()
    scene.load(args.scene)
    flat = build_scene_flat(scene)
    wb = build_world_bvh(flat)
    print(f"scene: {wb.num_world_tris} world tris, {wb.nodes_i.shape[0]} nodes", flush=True)

    for kind in args.kinds.split(","):
        ro, rd = make_rays(wb, args.rays, kind)
        if args.sort or args.dirsort:
            ro, rd = sort_rays(wb, ro, rd, dir_first=args.dirsort)
        n = ro.shape[0]
        for variant in args.variants.split(","):
            if variant == "packet":
                from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet

                def run(ro, rd):
                    return intersect_rays_packet(
                        wb, ro, rd, coherent=True, max_tiles=args.tiles, anyhit=args.anyhit
                    )
            elif variant == "lane":
                from vk_gltf_renderer_tpu.ops.lane_traverse import intersect_rays_lane

                def run(ro, rd):
                    return intersect_rays_lane(
                        wb, ro, rd, coherent=True, max_tiles=args.tiles, anyhit=args.anyhit,
                        inner_steps=args.inner,
                    )
            elif variant in ("p2", "p3", "p5", "p6", "p7", "p8", "p9", "p9x4", "p9x8"):
                from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

                kern = {"p2": "v2", "p3": "v3", "p5": "v5", "p6": "v6", "p7": "v7",
                        "p8": "v8", "p9": "v9", "p9x4": "v9x4", "p9x8": "v9x8"}[variant]

                def run(ro, rd, kern=kern):
                    return intersect_rays_packet_soa(
                        wb, ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
                        jnp.zeros(ro.shape[0]), jnp.full(ro.shape[0], 1e32),
                        tiles=args.tiles, anyhit=args.anyhit, kernel=kern,
                        entry_points=args.entry,
                    )
            elif variant == "wavefront":
                from vk_gltf_renderer_tpu.ops.traverse_wavefront import intersect_rays_wavefront

                def run(ro, rd):
                    return intersect_rays_wavefront(wb, ro, rd)
            else:
                raise SystemExit(f"unknown variant {variant}")

            out = run(ro, rd)  # compile + correctness probe
            hits = int(jnp.sum(out["tri"] >= 0))
            dt = timeit_device(run, ro, rd, iters=10, warmup=2)
            print(
                f"{kind:8s} {variant:10s} tiles={args.tiles:3d} n={n}  "
                f"{dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mrays/s  hit%={100*hits/n:.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()

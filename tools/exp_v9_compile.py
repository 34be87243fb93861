"""Pinpoint the v9 helmet-at-1080p hang: compile+run matrix over
(kernel x tiles x grid x scene), each cell bounded by a subprocess timeout.

Each cell spawns a fresh python that compiles (jit lower+compile) and then
runs ONE launch of intersect_rays_packet_soa at the given width. A cell
that exceeds --cell-timeout is reported HANG; a raising cell is FAULT.

Run: python tools/exp_v9_compile.py [--cell-timeout 240]
"""
import argparse
import subprocess
import sys

CELL = r"""
import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

scene, kern, tiles, g, anyhit = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
sc = Scene(); sc.load(scene); sc.parse_scene()
wb = jax.device_put(build_world_bvh(build_scene_flat(sc)))
n = tiles * 8 * 128 * g
rng = np.random.default_rng(1)
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro = jnp.asarray(np.float32([0, 1, 4]) + np.zeros((n, 3), np.float32))
rd = jnp.asarray(d)
args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        jnp.zeros(n), jnp.full(n, 1e32)]
t0 = time.time()
h = intersect_rays_packet_soa(wb, *args, tiles=tiles, kernel=kern, anyhit=bool(anyhit))
h["t"].block_until_ready()
t1 = time.time()
print(f"OK compile+run {t1-t0:.1f}s hits={int((np.asarray(h['tri'])>=0).sum())}", flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell-timeout", type=int, default=240)
    ap.add_argument("--scenes", default="helmet,ball")
    ap.add_argument("--kernels", default="v3,v9")
    ap.add_argument("--cells", default="1x1,1x32,8x1,8x32,8x254")
    ap.add_argument("--anyhit", action="store_true")
    args = ap.parse_args()

    paths = {
        "helmet": "/tmp/vkgr_bench_standins/helmet.gltf",
        "ball": "/root/reference/resources/shader_ball.gltf",
    }
    for sc in args.scenes.split(","):
        for kern in args.kernels.split(","):
            for cell in args.cells.split(","):
                tiles, g = (int(x) for x in cell.split("x"))
                tag = f"{sc:7s} {kern:5s} tiles={tiles:<2d} g={g:<4d}"
                try:
                    p = subprocess.run(
                        [sys.executable, "-u", "-c", CELL, paths[sc], kern,
                         str(tiles), str(g), "1" if args.anyhit else "0"],
                        capture_output=True, text=True, timeout=args.cell_timeout)
                    out = (p.stdout.strip().splitlines() or ["(no stdout)"])[-1]
                    if p.returncode != 0:
                        err = (p.stderr.strip().splitlines() or ["?"])[-1]
                        out = f"FAULT rc={p.returncode} {err[:120]}"
                    print(f"{tag}  {out}", flush=True)
                except subprocess.TimeoutExpired:
                    print(f"{tag}  HANG (> {args.cell_timeout}s)", flush=True)


if __name__ == "__main__":
    main()

"""Large-scene demo: generate a >=1M-world-triangle glTF and render it on
the TPU packet path.

The reference handles multi-million-triangle scenes via budgeted multi-pass
BLAS builds (renderer.cpp:1699-1721); our analog is the VMEM-budget ladder in
renderer._config (fits_vmem -> packet, else HBM wavefront).  This demo
exercises the ladder at scale with a grid of instanced displaced terrain
patches.  Two regimes (~237 B of PADDED resident tables per world triangle —
Mosaic tiles the 16-wide nodes_fi rows to 128 VMEM lanes; an 819k-tri run
with 85.6 MB of raw tables failed AOT with a 137 MB nodes window, which is
what taught vmem_bytes() to count padded sizes):

  --tris 300000   packet regime: padded tables ~71 MB, inside the 88 MB budget
  --tris 1050000  (default) wavefront regime: the ladder auto-selects the
                  HBM wavefront path

Usage:
    python tools/large_scene_demo.py [--tris 1050000] [--size 512] [--depth 2]

Prints the world-triangle count, table bytes vs budget, selected traversal,
and measured frame time / Mrays/s.
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _patch_mesh(n: int, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """One displaced-terrain patch: (n x n) quad grid -> 2*(n-1)^2 triangles."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    # a few random sinusoids -> non-degenerate, BVH-unfriendly-enough terrain
    gy = np.zeros_like(gx)
    for _ in range(4):
        fx, fz = rng.uniform(2.0, 9.0, size=2)
        ph = rng.uniform(0, 2 * np.pi, size=2)
        gy += rng.uniform(0.02, 0.08) * np.sin(fx * gx * 2 * np.pi + ph[0]) * np.cos(
            fz * gz * 2 * np.pi + ph[1]
        )
    pos = np.stack([gx, gy.astype(np.float32), gz], axis=-1).reshape(-1, 3)
    i = np.arange(n * n, dtype=np.uint32).reshape(n, n)
    a, b, c, d = i[:-1, :-1], i[1:, :-1], i[:-1, 1:], i[1:, 1:]
    tris = np.concatenate(
        [np.stack([a, b, d], -1).reshape(-1, 3), np.stack([a, d, c], -1).reshape(-1, 3)]
    )
    return pos, tris.astype(np.uint32).reshape(-1)


def write_large_glb(path: str, target_tris: int = 1_050_000, grid: int = 8) -> int:
    """Grid of grid x grid instances of one patch mesh; returns world tris."""
    per_inst = target_tris // (grid * grid)
    n = int(np.sqrt(per_inst / 2)) + 2  # 2*(n-1)^2 >= per_inst approx
    pos, idx = _patch_mesh(n)
    tris_per = len(idx) // 3
    world_tris = tris_per * grid * grid

    pos_b = pos.tobytes()
    idx_b = idx.tobytes()
    bin_chunk = pos_b + idx_b
    nodes = []
    for gi in range(grid):
        for gj in range(grid):
            nodes.append(
                {
                    "mesh": 0,
                    "translation": [float(gi - grid / 2 + 0.5) * 1.1, 0.0,
                                    float(gj - grid / 2 + 0.5) * 1.1],
                }
            )
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1,
                                    "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.7, 0.68, 0.62, 1.0], "roughnessFactor": 0.8}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos), "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5125, "count": len(idx), "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(idx_b)},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk += b"\0" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    return world_tris


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_050_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    glb = str(Path(tempfile.gettempdir()) / "large_scene_demo.glb")
    world_tris = write_large_glb(glb, args.tris)
    print(f"scene: {glb}  world triangles: {world_tris:,}")

    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.ops.bvh_flatten import VMEM_TABLE_BUDGET, fits_vmem, vmem_bytes

    t0 = time.perf_counter()
    r = GltfRenderer(width=args.size, height=args.size, spp=1, max_depth=args.depth)
    r.create_scene(glb)
    print(f"load+BVH build: {time.perf_counter() - t0:.1f} s")
    vb = vmem_bytes(r.bvh)
    print(f"packet tables: {vb / 1e6:.1f} MB (budget {VMEM_TABLE_BUDGET / 1e6:.0f} MB) "
          f"fits={fits_vmem(r.bvh)}  traversal={r._config().traversal}")

    aux = r.on_render()
    float(aux["rays"])  # sync
    t0 = time.perf_counter()
    auxes = [r.on_render() for _ in range(args.frames)]
    rays = float(sum(a["rays"] for a in auxes))
    wall = time.perf_counter() - t0
    print(f"frame: {wall / args.frames * 1000:.1f} ms   {rays / wall / 1e6:.2f} Mrays/s "
          f"@{args.size}x{args.size} depth {args.depth}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Packet-union traversal cost model, simulated on CPU (numpy).

The Pallas packet kernel's frame cost is (node pops + leaf rows) x the
per-visit scalar latency, where a node is popped iff ANY live lane in the
packet wants it (the packed any() reduction). This simulator reproduces
that cost exactly for a given tree + ray set, so BVH build policies
(SAH vs SBVH spatial splits, leaf size, bin count) can be compared by
their real figure of merit WITHOUT TPU time.

Usage: python tools/visit_count.py [--rays 65536] [--packet 8192]
                                   [--kinds primary,bounce] [--bvh sah]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def packet_union_cost(nodes_i, nodes_self, tris, ro, rd, packet):
    """Simulate the shared-stack packet traversal (v2 cost model: binary
    nodes, ordered near-child first, per-lane t_best pruning, union pop
    test). Returns (pops, leaf_rows, tri_tests) summed over packets."""
    n = ro.shape[0]
    pops = leaf_rows = tri_tests = 0
    inv = np.where(np.abs(rd) < 1e-20, np.where(rd >= 0, 1e30, -1e30), 1.0 / rd)
    for s in range(0, n, packet):
        e = min(s + packet, n)
        o = ro[s:e]
        iv = inv[s:e]
        t_best = np.full(e - s, np.inf, np.float32)
        stack = [0]
        while stack:
            nid = stack.pop()
            pops += 1
            cnt = nodes_i[nid, 3]
            if cnt > 0:
                first = nodes_i[nid, 2]
                leaf_rows += (cnt + 7) // 8
                tri_tests += int(cnt)
                for k in range(first, first + cnt):
                    v = tris[k]
                    t = _mt(v, o, rd[s:e])
                    hit = (t > 1e-4) & (t < t_best)
                    t_best = np.where(hit, t, t_best)
                continue
            for child in (nodes_i[nid, 1], nodes_i[nid, 0]):  # near last -> popped first
                lo = nodes_self[child, 0:3]
                hi = nodes_self[child, 3:6]
                t0 = (lo - o) * iv
                t1 = (hi - o) * iv
                tn = np.minimum(t0, t1).max(axis=1)
                tf = np.maximum(t0, t1).min(axis=1)
                if bool(((tn <= tf) & (tf > 0) & (tn < t_best)).any()):
                    stack.append(int(child))
    return pops, leaf_rows, tri_tests


def _mt(v, o, d):
    """Vectorized Moller-Trumbore: one triangle (16f row) vs all lanes."""
    v0, e1, e2 = v[0:3], v[3:6] - v[0:3], v[6:9] - v[0:3]
    p = np.cross(d, e2)
    det = p @ e1
    det = np.where(np.abs(det) < 1e-12, 1e-12, det)
    tv = o - v0
    u = (tv * p).sum(1) / det
    q = np.cross(tv, e1)
    vv = (q * d).sum(1) / det
    t = (q @ e2) / det
    ok = (u >= 0) & (vv >= 0) & (u + vv <= 1)
    return np.where(ok, t, np.inf).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--packet", type=int, default=8192)
    ap.add_argument("--scene", default="/root/reference/resources/shader_ball.gltf")
    ap.add_argument("--kinds", default="primary,bounce")
    ap.add_argument("--bvh", default=os.environ.get("VKGR_BVH", "sah"))
    args = ap.parse_args()
    os.environ["VKGR_BVH"] = args.bvh

    import jax

    jax.config.update("jax_platforms", "cpu")
    from kbench import make_rays, sort_rays  # noqa: E402  (tools/ sibling)

    from vk_gltf_renderer_tpu.models.scene import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    scene = Scene()
    scene.load(args.scene)
    flat = build_scene_flat(scene)
    wb = build_world_bvh(flat)
    print(f"bvh={args.bvh} world_tris={wb.num_world_tris} nodes={wb.nodes_i.shape[0]} "
          f"tri_rows={wb.tris.shape[0]}", flush=True)
    nodes_i = np.asarray(wb.nodes_i)
    nodes_self = np.asarray(wb.nodes_self)
    tris = np.asarray(wb.tris)
    for kind in args.kinds.split(","):
        ro, rd = make_rays(wb, args.rays, kind)
        ro, rd = sort_rays(wb, np.asarray(ro), np.asarray(rd))
        ro, rd = np.asarray(ro, np.float32), np.asarray(rd, np.float32)
        pops, rows, tt = packet_union_cost(nodes_i, nodes_self, tris, ro, rd, args.packet)
        npk = (ro.shape[0] + args.packet - 1) // args.packet
        print(f"{kind:8s} packets={npk} pops={pops} leaf_rows={rows} "
              f"tri_tests={tt}  pops/packet={pops/npk:.0f} visits/packet={(pops+rows)/npk:.0f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

"""Flattened world-space BVH: the device layout consumed by the Pallas
packet-traversal kernel.

Instance transforms are baked into triangle vertices (one world triangle
per (render node, triangle)), producing a single-level BVH — the kernel
then needs no per-instance matrix fetch. The two-level BLAS/TLAS contract
(ops/bvh.py) stays the semantic source; this is a derived layout, rebuilt
when PRIMITIVES_CHANGED and re-bakeable (refit) on transform-only changes.

Tables (see pallas_traverse._traverse_kernel and traverse_wavefront):
  nodes_f [Nn, 8] f32   lo.xyz, hi.xyz, 0, 0
  nodes_i [Nn, 8] i32   left, right, tri(or -1), parent, axis, 0, 0, 0
                        (root = node 0; children ordered so LEFT has the
                        smaller centroid along `axis` — the stackless
                        traversal's near-child contract)
  tris    [T', 16] f32  v0.xyz v1.xyz v2.xyz pad
  wtri_rnode [T'] i32   world tri -> render node
  wtri_tri   [T'] i32   world tri -> global tri id (flat.tri_idx row)
"""

from __future__ import annotations

from dataclasses import dataclass, fields as dc_fields

import numpy as np

from .bvh import _build_single


@dataclass
class WorldBvh:
    nodes_f: np.ndarray
    nodes_i: np.ndarray
    tris: np.ndarray
    wtri_rnode: np.ndarray
    wtri_tri: np.ndarray
    refit_levels: np.ndarray  # [L,K] internal-node ids, deepest level first (-1 pad)
    num_world_tris: int

    def tree_flatten(self):
        names = [f.name for f in dc_fields(self) if f.name != "num_world_tris"]
        return [getattr(self, n) for n in names], (self.num_world_tris,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names = [f.name for f in dc_fields(cls) if f.name != "num_world_tris"]
        kw = dict(zip(names, children))
        kw["num_world_tris"] = aux[0]
        return cls(**kw)


def _register():
    import jax

    jax.tree_util.register_pytree_node(WorldBvh, WorldBvh.tree_flatten, WorldBvh.tree_unflatten)


_register()


def build_world_bvh(flat) -> WorldBvh:
    """Bake instances to world space + LBVH over all world triangles."""
    vtx = np.asarray(flat.vtx_pos, np.float64)
    tri_idx = np.asarray(flat.tri_idx)
    rn_o2w = np.asarray(flat.rn_o2w, np.float64)
    rn_prim = np.asarray(flat.rn_prim)
    rn_visible = np.asarray(flat.rn_visible)
    pft = np.asarray(flat.prim_first_tri)
    ptc = np.asarray(flat.prim_tri_count)

    v_chunks, rnode_chunks, tri_chunks = [], [], []
    for i in range(rn_o2w.shape[0]):
        if not rn_visible[i]:
            continue
        p = rn_prim[i]
        f, c = int(pft[p]), int(ptc[p])
        ids = np.arange(f, f + c)
        idx = tri_idx[ids]  # [c,3]
        m = rn_o2w[i]
        w0 = vtx[idx[:, 0]] @ m[:3, :3].T + m[:3, 3]
        w1 = vtx[idx[:, 1]] @ m[:3, :3].T + m[:3, 3]
        w2 = vtx[idx[:, 2]] @ m[:3, :3].T + m[:3, 3]
        v_chunks.append(np.concatenate([w0, w1, w2], axis=1).astype(np.float32))
        rnode_chunks.append(np.full(c, i, np.int32))
        tri_chunks.append(ids.astype(np.int32))

    if not v_chunks:  # empty scene: one far-away degenerate triangle
        v_chunks = [np.full((1, 9), 3e37, np.float32)]
        rnode_chunks = [np.zeros(1, np.int32)]
        tri_chunks = [np.zeros(1, np.int32)]

    wv = np.concatenate(v_chunks)  # [T',9]
    wtri_rnode = np.concatenate(rnode_chunks)
    wtri_tri = np.concatenate(tri_chunks)
    nt = wv.shape[0]

    v0, v1, v2 = wv[:, 0:3], wv[:, 3:6], wv[:, 6:9]
    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    cen = (tlo + thi) * 0.5
    lo, hi, left, right, tri, parent = _build_single(tlo, thi, cen, np.arange(nt, dtype=np.int64))

    nn = lo.shape[0]
    # split axis per internal node + spatial child ordering: left child must
    # have the smaller center along that axis (near-child contract of the
    # stackless traversal; also improves packet near-first ordering).
    internal = tri < 0
    ii = np.nonzero(internal)[0]
    if ii.size:
        cl = (lo[left[ii]] + hi[left[ii]]) * 0.5
        cr = (lo[right[ii]] + hi[right[ii]]) * 0.5
        axis_i = np.argmax(np.abs(cr - cl), axis=1)
        swap = cr[np.arange(ii.size), axis_i] < cl[np.arange(ii.size), axis_i]
        l_new = np.where(swap, right[ii], left[ii])
        r_new = np.where(swap, left[ii], right[ii])
        left[ii] = l_new
        right[ii] = r_new
        # reattach parents after swap (parent array unchanged by swap)
    axis = np.zeros(nn, np.int64)
    if ii.size:
        axis[ii] = axis_i

    nodes_f = np.zeros((nn, 8), np.float32)
    nodes_f[:, 0:3] = lo
    nodes_f[:, 3:6] = hi
    nodes_i = np.zeros((nn, 8), np.int32)
    nodes_i[:, 0] = left
    nodes_i[:, 1] = right
    nodes_i[:, 2] = tri  # -1 for internal; world-tri id for leaves
    nodes_i[:, 3] = parent
    nodes_i[:, 4] = axis

    tris16 = np.zeros((nt, 16), np.float32)
    tris16[:, :9] = wv

    # refit schedule: internal nodes grouped by depth, deepest first, so a
    # bottom-up scan sees children before parents (jitted refit,
    # ops/animation.refit_world_bvh)
    depth = np.full(nn, -1, np.int64)
    depth[0] = 0
    order = [0]
    for nd in order:  # BFS (children appended after parents)
        if tri[nd] < 0:
            for c in (left[nd], right[nd]):
                depth[c] = depth[nd] + 1
                order.append(int(c))
    internal_ids = np.nonzero(tri < 0)[0]
    levels = []
    if internal_ids.size:
        for d in range(int(depth[internal_ids].max()), -1, -1):
            lv = internal_ids[depth[internal_ids] == d]
            if lv.size:
                levels.append(lv)
        k = max(len(l) for l in levels)
        refit_levels = np.full((len(levels), k), -1, np.int32)
        for i, lv in enumerate(levels):
            refit_levels[i, : len(lv)] = lv
    else:
        refit_levels = np.full((1, 1), -1, np.int32)

    return WorldBvh(
        nodes_f=nodes_f,
        nodes_i=nodes_i,
        tris=tris16,
        wtri_rnode=wtri_rnode,
        wtri_tri=wtri_tri,
        refit_levels=refit_levels,
        num_world_tris=nt,
    )


def vmem_bytes(wb: WorldBvh) -> int:
    return wb.nodes_f.nbytes + wb.nodes_i.nbytes + wb.tris.nbytes

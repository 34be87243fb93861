"""Flattened world-space BVH: the device layout consumed by the Pallas
packet-traversal kernel.

Instance transforms are baked into triangle vertices (one world triangle
per (render node, triangle)), producing a single-level BVH — the kernel
then needs no per-instance matrix fetch. The two-level BLAS/TLAS contract
(ops/bvh.py) stays the semantic source; this is a derived layout, rebuilt
when PRIMITIVES_CHANGED and re-bakeable (refit) on transform-only changes.

Tables (see pallas_traverse._traverse_kernel and traverse_wavefront):
  nodes_f  [Nn, 16] f32  BOTH child AABBs: l_lo, l_hi, r_lo, r_hi, pad4 —
                         one scalar fetch tests both children (garbage for
                         leaves, never read)
  nodes_self [Nn, 8] f32 the node's OWN AABB (stackless traversal + refit)
  nodes_i  [Nn, 8] i32   left, right, first, count, parent, axis, 0, 0
                         count > 0 -> leaf covering world-tri rows
                         [first, first+count) (triangles stored in BVH
                         order, so leaf ranges are contiguous);
                         root = node 0; LEFT child has the smaller centroid
                         along `axis` (near-child contract)
  tris     [T', 16] f32  v0.xyz v1.xyz v2.xyz pad — BVH (Morton) order
  wtri_rnode [T'] i32    world tri -> render node
  wtri_tri   [T'] i32    world tri -> global tri id (flat.tri_idx row)

Leaves are collapsed radix-tree subtrees of up to LEAF_SIZE triangles —
fewer node visits per ray at the cost of a few extra triangle tests, a
good trade when triangle tests are vectorized over the packet.
"""

from __future__ import annotations

from dataclasses import dataclass, fields as dc_fields

import numpy as np

from .bvh import _build_radix_tree, morton3d

LEAF_SIZE = 8


def _lane_tables(nodes_i, nodes_self, tris16, wtri_rnode=None, wtri_tri=None):
    from .lane_traverse import build_lane_tree

    return build_lane_tree(nodes_i, nodes_self, tris16, None,
                           wtri_rnode=wtri_rnode, wtri_tri=wtri_tri)


def _packet2_tables(nodes_i, nodes_f, tris16, wtri_rnode, wtri_tri):
    """Fused tables for the v2 packet kernel (pallas_traverse).

    Measured on v5e: a scalar-indexed [1,16] dynamic slice costs ~78 cycles
    and pipelined [1,128] fetches ~3 — so v2 does ONE [1,16] fetch per
    internal visit (boxes + child codes + axis fused) and ONE [1,128]
    fetch per leaf visit (all 8 triangles in a leaf-aligned block row),
    replacing v1's nodes_f + nodes_i + 8 single-tri fetches.

      nodes_fi [Nn,16] f32: l_lo(3) l_hi(3) r_lo(3) r_hi(3) code_l code_r
                            axis pad.  code >= 0: internal child id;
                            code < 0: leaf, -(code+1) = leafrow*16 + count.
      tris128  [L,128] f32: per-leaf block of 8 tris, 16 floats each
                            (v0.xyz v1.xyz v2.xyz pad7); count < 8 padded
                            with degenerate zero triangles.
      wtri8_rnode/wtri8_tri [L*8] i32: render-node / global tri id per
                            leaf-block slot (-1 for padding).
      tri8_src [L*8] i32:   source row in tris16 per slot (-1 pad) — lets
                            the refit path regather block values on device.

    Caps: leafrow*16+count must stay exact in f32 -> <= 2^20 leaves
    (~8M world triangles).
    """
    nodes_i = np.asarray(nodes_i)
    nn = nodes_i.shape[0]
    count = nodes_i[:, 3].astype(np.int64)
    first = nodes_i[:, 2].astype(np.int64)
    is_leaf = count > 0
    leaf_ids = np.nonzero(is_leaf)[0]
    leafrow = np.full(nn, -1, np.int64)
    leafrow[leaf_ids] = np.arange(leaf_ids.size)
    L = max(leaf_ids.size, 1)
    if leaf_ids.size >= 1 << 20:
        raise ValueError("packet2 kernel caps at 2^20 leaves")

    code = np.where(is_leaf, -(leafrow * 16 + count) - 1, np.arange(nn)).astype(np.float64)
    nodes_fi = np.zeros((nn, 16), np.float32)
    nodes_fi[:, 0:12] = np.asarray(nodes_f)[:, 0:12]
    l = nodes_i[:, 0].astype(np.int64)
    r = nodes_i[:, 1].astype(np.int64)
    nodes_fi[:, 12] = code[l]
    nodes_fi[:, 13] = code[r]
    nodes_fi[:, 14] = nodes_i[:, 5]

    tris16 = np.asarray(tris16, np.float32)
    tris128 = np.zeros((L, 8, 16), np.float32)
    tris128[:, :, 9:11] = -1.0
    w8r = np.full(L * 8, -1, np.int32)
    w8t = np.full(L * 8, -1, np.int32)
    t8s = np.full(L * 8, -1, np.int32)
    if leaf_ids.size:
        c = count[leaf_ids]
        reps = np.repeat(np.arange(leaf_ids.size), c)
        k = np.arange(reps.size) - np.repeat(np.cumsum(c) - c, c)
        rows = first[leaf_ids][reps] + k
        tris128[reps, k] = tris16[rows]
        # slots 9/10 carry the per-triangle render-node and global tri ids
        # so the kernel can OUTPUT them directly (XLA gathers on TPU are
        # ~34 ns/element — profiling showed post-trace id lookups costing
        # more than traversal itself)
        tris128[reps, k, 9] = np.asarray(wtri_rnode)[rows].astype(np.float32)
        tris128[reps, k, 10] = np.asarray(wtri_tri)[rows].astype(np.float32)
        slot = reps * 8 + k
        w8r[slot] = np.asarray(wtri_rnode)[rows]
        w8t[slot] = np.asarray(wtri_tri)[rows]
        t8s[slot] = rows
    root_code = int(code[0])
    return (
        nodes_fi,
        tris128.reshape(L, 128),
        w8r,
        w8t,
        t8s,
        root_code,
    )


@dataclass
class WorldBvh:
    nodes_f: np.ndarray
    nodes_self: np.ndarray
    nodes_i: np.ndarray
    tris: np.ndarray
    wtri_rnode: np.ndarray
    wtri_tri: np.ndarray
    refit_levels: np.ndarray  # [L,K] internal-node ids, deepest level first (-1 pad)
    portal_roots: np.ndarray  # [P] node ids of the treelet cut (phase-B roots)
    nodes4_i: np.ndarray  # [M,8] BVH4: c0..c3 (see build_bvh4), axis0..2, pad
    nodes4_f: np.ndarray  # [M,32] BVH4: 4 child AABBs
    map4: np.ndarray  # [M,4] binary source node per child slot (refit)
    lane_pages: np.ndarray  # [P*FIELDS,128] f32 skip-DFS page table (ops/lane_traverse.py)
    lane_geo_idx: np.ndarray  # [P*FIELDS,128] i32 geometry-source map for device refit
    nodes_fi: np.ndarray  # [Nn,16] f32 fused v2 node rows (_packet2_tables)
    tris128: np.ndarray  # [L,128] f32 leaf-aligned tri blocks (8 tris/row)
    wtri8_rnode: np.ndarray  # [L*8] i32 render node per leaf slot (-1 pad)
    wtri8_tri: np.ndarray  # [L*8] i32 global tri per leaf slot (-1 pad)
    tri8_src: np.ndarray  # [L*8] i32 tris16 source row per slot (refit)
    # fused hit-state rows (ops/hitstate.py HIT_ATTR layout): one wide row
    # per world triangle in the ORIGINAL per-render-node emit order, so
    # row = rn_attr_base[rnode] + tri for any traversal backend. Lives in
    # HBM (XLA gathers) — NOT counted by vmem_bytes.
    hit_attr: np.ndarray  # [Ta,64] f32
    rn_attr_base: np.ndarray  # [N] i32 (attr offset - prim_first_tri; 0 if invisible)
    attr_rnode: np.ndarray  # [Ta] i32 emit-order render node (refit rebake)
    attr_tri: np.ndarray  # [Ta] i32 emit-order global tri id (refit rebake)
    attr_has_uv: np.ndarray  # [Ta] i32 (static: texel-density gate)
    # conservative per-emit-row opacity class (ops/omm.py: 0 opaque,
    # 1 mixed, 2 transparent-culled) — the SceneOmm role: OPAQUE rows skip
    # the stochastic-alpha opacity eval entirely
    attr_alpha_class: np.ndarray  # [Ta] i8
    # subtriangle OMM (ops/omm.classify_subtri + build_world_bvh subtri
    # emission): MIXED triangles with provably-transparent subdivision
    # cells are replaced by their non-transparent cells as world geometry
    # with VIRTUAL tri ids (gid = prim_first + count + j), each owning a
    # hit-attr row baked at the cell's parent-barycentric corners — the
    # kernels and the fused hit state need NO changes (the (rnode, tri)
    # contract addresses the virtual rows like any other). attr_tri holds
    # the bake SOURCE (parent) tri id; attr_bary the 3 corner (u,v)s
    # (identity [0,0,1,0,0,1] for ordinary rows). wtri_src_tri/wtri_bary
    # are the same mapping per BVH tri row, used by the device refit bake.
    attr_bary: np.ndarray  # [Ta,6] f32
    wtri_src_tri: np.ndarray  # [T'+pad] i32
    wtri_bary: np.ndarray  # [T'+pad,6] f32
    # v3 fused BVH4 rows (_packet3_tables): 4 child boxes + codes + axes in
    # one [M,32] row — half the scalar visits of the binary v2 layout
    nodes4_fi: np.ndarray
    # v6 dense BVH16 rows (_packet6_tables): 16 child boxes + 16 codes +
    # 15 order axes in exactly 128 floats (zero Mosaic padding waste;
    # halves internal visits vs BVH4) + refit slot->binary-node map
    nodes16_fi: np.ndarray
    map16: np.ndarray
    # v7 SMEM sidecar: the 7 per-node scalars of a v3 visit (4 child codes
    # + 3 near-order axes) as an int32 [M,8] table read from SMEM, so the
    # kernel's scalar chain skips 7 VMEM->SREG extracts per visit
    nodes4_sc: np.ndarray
    # emit-row -> reordered world-tri ref (-1 where culled): inverts
    # (rnode, tri) -> tris row for the primary-seed fast path
    # (ops/pathtrace._primary_seed_hits); under SBVH duplication any copy
    # is valid (identical vertices)
    emit2ref: np.ndarray
    num_world_tris: int
    root_code: int = 0
    root4_code: int = 0

    _STATIC = ("num_world_tris", "root_code", "root4_code")

    def tree_flatten(self):
        names = [f.name for f in dc_fields(self) if f.name not in self._STATIC]
        return [getattr(self, n) for n in names], (
            self.num_world_tris, self.root_code, self.root4_code)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names = [f.name for f in dc_fields(cls) if f.name not in cls._STATIC]
        kw = dict(zip(names, children))
        kw["num_world_tris"], kw["root_code"], kw["root4_code"] = aux
        return cls(**kw)


def _register():
    import jax

    jax.tree_util.register_pytree_node(WorldBvh, WorldBvh.tree_flatten, WorldBvh.tree_unflatten)


_register()


def _levels_and_portals(nodes_i):
    """Shared post-pass: BFS depths -> (refit_levels, portal cut).

    Mutates nodes_i[:, 6] with portal ids (treelet cut) and returns
    (refit_levels, portal_roots)."""
    nn = nodes_i.shape[0]
    depth = np.full(nn, -1, np.int64)
    depth[0] = 0
    bfs = [0]
    for nd in bfs:
        if nodes_i[nd, 3] == 0:  # internal
            for c in (nodes_i[nd, 0], nodes_i[nd, 1]):
                depth[c] = depth[nd] + 1
                bfs.append(int(c))

    # treelet cut (see traversal notes): portals = nodes at depth K, or
    # shallower leaves; K targets ~256 portals.
    target = 256
    K = max(1, int(np.ceil(np.log2(min(target, max(nn // 8, 2))))))
    portal_list = []
    for nd in bfs:
        d = depth[nd]
        if d == K or (d < K and nodes_i[nd, 3] > 0):
            portal_list.append(nd)
    nodes_i[:, 6] = -1
    for pid, nd in enumerate(portal_list):
        nodes_i[nd, 6] = pid
    portal_roots = np.asarray(portal_list, np.int32)

    internal_ids = np.nonzero(nodes_i[:, 3] == 0)[0]
    levels = []
    if internal_ids.size:
        for d in range(int(depth[internal_ids].max()), -1, -1):
            lv = internal_ids[depth[internal_ids] == d]
            if lv.size:
                levels.append(lv)
    if not levels:
        return np.full((1, 1), -1, np.int32), portal_roots
    kmax = max(len(lv) for lv in levels)
    refit_levels = np.full((len(levels), kmax), -1, np.int32)
    for idx, lv in enumerate(levels):
        refit_levels[idx, : len(lv)] = lv
    return refit_levels, portal_roots


_SAH_BINS = 16


def _build_sah(tlo, thi, cen):
    """Top-down binned SAH build (Wald 2007-style, 16 bins per axis).

    Replaces the LBVH radix tree for moderate triangle counts: SAH trees
    cost ~1.3-2x fewer node visits per ray, which multiplies directly into
    the packet kernel's per-frame traversal time (its cost is
    visits x packet count). Same output contract as the LBVH path:
      (order, nodes_i, nodes_f, nodes_self)
    with leaves <= LEAF_SIZE tris over the REORDERED triangle array, the
    near-child contract (left = smaller centroid on nodes_i[:,5]) and
    parents in nodes_i[:,4]. Reference builds its BLAS via the Vulkan
    driver (gltf_scene_rtx.cpp); the build policy here is ours.
    """
    nt = tlo.shape[0]
    perm = np.arange(nt, dtype=np.int64)
    # first pass: recursive partition producing (first,count) leaves and a
    # temp tree in parent-before-child order
    t_left, t_right, t_first, t_count, t_axis = [], [], [], [], []
    t_lo, t_hi = [], []

    def new_node():
        t_left.append(-1)
        t_right.append(-1)
        t_first.append(-1)
        t_count.append(0)
        t_axis.append(0)
        t_lo.append(None)
        t_hi.append(None)
        return len(t_left) - 1

    root = new_node()
    stack = [(root, 0, nt)]
    while stack:
        nid, s, e = stack.pop()
        ids = perm[s:e]
        n = e - s
        lo = tlo[ids].min(axis=0)
        hi = thi[ids].max(axis=0)
        t_lo[nid] = lo
        t_hi[nid] = hi
        if n <= LEAF_SIZE:
            t_first[nid] = s
            t_count[nid] = n
            continue
        c = cen[ids]
        clo = c.min(axis=0)
        chi = c.max(axis=0)
        ext = chi - clo
        best_cost = np.inf
        best_axis = -1
        best_split = -1
        best_bins = None
        for axis in range(3):
            if ext[axis] <= 1e-12:
                continue
            b = np.minimum(
                ((c[:, axis] - clo[axis]) * (_SAH_BINS / ext[axis])).astype(np.int64),
                _SAH_BINS - 1,
            )
            cnt = np.bincount(b, minlength=_SAH_BINS)
            blo = np.full((_SAH_BINS, 3), np.inf)
            bhi = np.full((_SAH_BINS, 3), -np.inf)
            np.minimum.at(blo, b, tlo[ids])
            np.maximum.at(bhi, b, thi[ids])
            # prefix (left) and suffix (right) sweep boxes
            llo = np.minimum.accumulate(blo, axis=0)
            lhi = np.maximum.accumulate(bhi, axis=0)
            rlo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
            rhi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
            lcnt = np.cumsum(cnt)

            def area(alo, ahi):
                d = np.maximum(ahi - alo, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            # split after bin k: left = bins [0,k], right = [k+1, NB)
            la = area(llo[:-1], lhi[:-1])
            ra = area(rlo[1:], rhi[1:])
            lc = lcnt[:-1]
            rc = n - lc
            cost = la * lc + ra * rc
            cost[(lc == 0) | (rc == 0)] = np.inf
            k = int(np.argmin(cost))
            if cost[k] < best_cost:
                best_cost = cost[k]
                best_axis = axis
                best_split = k
                best_bins = b
        if best_axis < 0:
            # degenerate (all centroids equal): median split keeps depth log n
            mid = s + n // 2
        else:
            mask = best_bins <= best_split
            mid = s + int(mask.sum())
            perm[s:e] = np.concatenate([ids[mask], ids[~mask]])
            t_axis[nid] = best_axis
        if mid == s or mid == e:  # SAH refused; force median
            mid = s + n // 2
        l_id = new_node()
        r_id = new_node()
        t_left[nid] = l_id
        t_right[nid] = r_id
        stack.append((r_id, mid, e))
        stack.append((l_id, s, mid))

    nn = len(t_left)
    nodes_i = np.zeros((nn, 8), np.int32)
    nodes_f = np.zeros((nn, 16), np.float32)
    nodes_self = np.zeros((nn, 8), np.float32)
    parent = np.full(nn, -1, np.int32)
    for nid in range(nn):
        nodes_self[nid, 0:3] = t_lo[nid]
        nodes_self[nid, 3:6] = t_hi[nid]
        if t_count[nid] > 0:
            nodes_i[nid, 2] = t_first[nid]
            nodes_i[nid, 3] = t_count[nid]
            continue
        l_id, r_id, axis = t_left[nid], t_right[nid], t_axis[nid]
        # near-child contract: left = smaller centroid on the split axis
        cl = (t_lo[l_id][axis] + t_hi[l_id][axis]) * 0.5
        cr = (t_lo[r_id][axis] + t_hi[r_id][axis]) * 0.5
        if cr < cl:
            l_id, r_id = r_id, l_id
        nodes_i[nid, 0] = l_id
        nodes_i[nid, 1] = r_id
        nodes_i[nid, 5] = axis
        nodes_f[nid, 0:3] = t_lo[l_id]
        nodes_f[nid, 3:6] = t_hi[l_id]
        nodes_f[nid, 6:9] = t_lo[r_id]
        nodes_f[nid, 9:12] = t_hi[r_id]
        parent[l_id] = nid
        parent[r_id] = nid
    nodes_i[:, 4] = parent
    return perm, nodes_i, nodes_f, nodes_self


def _clip_tri_slab(tri, axis, lo, hi):
    """AABB of a triangle clipped to the slab lo <= x[axis] <= hi
    (Sutherland-Hodgman against the two planes). tri: [3,3] float64."""
    poly = [tri[0], tri[1], tri[2]]
    for plane_v, keep_ge in ((lo, True), (hi, False)):
        out = []
        for i in range(len(poly)):
            a = poly[i]
            b = poly[(i + 1) % len(poly)]
            da = a[axis] - plane_v
            db = b[axis] - plane_v
            ina = da >= 0 if keep_ge else da <= 0
            inb = db >= 0 if keep_ge else db <= 0
            if ina:
                out.append(a)
            if ina != inb:
                t = da / (da - db)
                out.append(a + (b - a) * t)
        poly = out
        if not poly:
            return None
    p = np.asarray(poly)
    return p.min(axis=0), p.max(axis=0)


def _build_sbvh(tlo, thi, cen, wv, alpha=1e-5, ref_budget=0.5):
    """Top-down SBVH (Stich et al. 2009): binned object SAH + spatial
    splits with triangle-clipped reference duplication.

    When the best object split's child boxes overlap by more than
    alpha * root_area, a spatial-split candidate is also evaluated: 16
    uniform bins along each axis, each reference entering every bin its
    clipped box straddles; straddling references are DUPLICATED into both
    children with their boxes re-clipped to the winning plane. Total
    duplicates are capped at ref_budget * num_tris, after which only
    object splits are taken. Same output contract as _build_sah except
    `order` is a REFERENCE -> triangle map that may repeat triangle ids
    (downstream tables simply carry duplicated tris128 rows; hits on
    either copy resolve to the same (rnode, tri)).

    The reference builds its BLAS inside the Vulkan driver
    (gltf_scene_rtx.cpp:173) where spatial splits are the vendor's call;
    here the build policy is in-repo. Gated to static scenes: refit
    conservatively re-expands clipped boxes (correct, just looser).
    """
    nt = tlo.shape[0]
    wv3 = np.asarray(wv, np.float64)[:, :9].reshape(nt, 3, 3)
    max_refs = nt + int(ref_budget * nt)
    # reference arrays (grow as refs split)
    rlo = [tlo[i].astype(np.float64) for i in range(nt)]
    rhi = [thi[i].astype(np.float64) for i in range(nt)]
    rtri = list(range(nt))

    root_d = thi.max(axis=0) - tlo.min(axis=0)
    root_area = float(root_d[0] * root_d[1] + root_d[1] * root_d[2] + root_d[2] * root_d[0])
    if root_area <= 0:
        return _build_sah(tlo, thi, cen)

    t_left, t_right, t_first, t_count, t_axis = [], [], [], [], []
    t_lo, t_hi = [], []

    def new_node():
        t_left.append(-1)
        t_right.append(-1)
        t_first.append(-1)
        t_count.append(0)
        t_axis.append(0)
        t_lo.append(None)
        t_hi.append(None)
        return len(t_left) - 1

    def area3(d):
        d = np.maximum(d, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    # node work items carry explicit ref-id lists (duplication makes the
    # in-place permutation of _build_sah unusable)
    root = new_node()
    stack = [(root, list(range(nt)))]
    leaves = []  # (nid, ref ids) — order assembled at the end

    while stack:
        nid, ids = stack.pop()
        n = len(ids)
        nlo = np.min([rlo[i] for i in ids], axis=0)
        nhi = np.max([rhi[i] for i in ids], axis=0)
        t_lo[nid] = nlo
        t_hi[nid] = nhi
        if n <= LEAF_SIZE:
            t_first[nid] = -2  # filled in the order pass
            t_count[nid] = n
            leaves.append((nid, ids))
            continue
        blo_r = np.asarray([rlo[i] for i in ids])
        bhi_r = np.asarray([rhi[i] for i in ids])
        c = (blo_r + bhi_r) * 0.5

        # ---- object split (binned SAH over reference boxes)
        clo = c.min(axis=0)
        chi = c.max(axis=0)
        ext = chi - clo
        best = dict(cost=np.inf, axis=-1, kind="obj")
        for axis in range(3):
            if ext[axis] <= 1e-12:
                continue
            b = np.minimum(((c[:, axis] - clo[axis]) * (_SAH_BINS / ext[axis])).astype(np.int64),
                           _SAH_BINS - 1)
            cnt = np.bincount(b, minlength=_SAH_BINS)
            blo = np.full((_SAH_BINS, 3), np.inf)
            bhi = np.full((_SAH_BINS, 3), -np.inf)
            np.minimum.at(blo, b, blo_r)
            np.maximum.at(bhi, b, bhi_r)
            llo = np.minimum.accumulate(blo, axis=0)
            lhi = np.maximum.accumulate(bhi, axis=0)
            rlo_s = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
            rhi_s = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
            lcnt = np.cumsum(cnt)

            def areas(alo, ahi):
                d = np.maximum(ahi - alo, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            la = areas(llo[:-1], lhi[:-1])
            ra = areas(rlo_s[1:], rhi_s[1:])
            lc = lcnt[:-1]
            rc = n - lc
            cost = la * lc + ra * rc
            cost[(lc == 0) | (rc == 0)] = np.inf
            k = int(np.argmin(cost))
            if cost[k] < best["cost"]:
                ov_lo = np.maximum(llo[k], rlo_s[k + 1])
                ov_hi = np.minimum(lhi[k], rhi_s[k + 1])
                best = dict(cost=float(cost[k]), axis=axis, kind="obj",
                            mask=b <= k, overlap=area3(ov_hi - ov_lo))

        # ---- spatial split candidate (only when object children overlap)
        if (best["axis"] >= 0 and best.get("overlap", 0.0) > alpha * root_area
                and len(rtri) < max_refs):
            for axis in range(3):
                w = nhi[axis] - nlo[axis]
                if w <= 1e-12:
                    continue
                inv_w = _SAH_BINS / w
                b0 = np.clip(((blo_r[:, axis] - nlo[axis]) * inv_w).astype(np.int64),
                             0, _SAH_BINS - 1)
                b1 = np.clip(((bhi_r[:, axis] - nlo[axis]) * inv_w).astype(np.int64),
                             0, _SAH_BINS - 1)
                enter = np.bincount(b0, minlength=_SAH_BINS)
                exit_ = np.bincount(b1, minlength=_SAH_BINS)
                # per-bin boxes from clipped fragments (AABB-clip estimate
                # for costing; the actual split re-clips the triangle)
                blo = np.full((_SAH_BINS, 3), np.inf)
                bhi = np.full((_SAH_BINS, 3), -np.inf)
                for j in range(n):
                    lo_j, hi_j = blo_r[j].copy(), bhi_r[j].copy()
                    for bb in range(int(b0[j]), int(b1[j]) + 1):
                        s0 = nlo[axis] + bb * w / _SAH_BINS
                        s1 = s0 + w / _SAH_BINS
                        fl = lo_j.copy()
                        fh = hi_j.copy()
                        fl[axis] = max(fl[axis], s0)
                        fh[axis] = min(fh[axis], s1)
                        blo[bb] = np.minimum(blo[bb], fl)
                        bhi[bb] = np.maximum(bhi[bb], fh)
                llo = np.minimum.accumulate(blo, axis=0)
                lhi = np.maximum.accumulate(bhi, axis=0)
                rlo_s = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
                rhi_s = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
                lc = np.cumsum(enter)[:-1]
                rc = n - np.cumsum(exit_)[:-1]

                def areas(alo, ahi):
                    d = np.maximum(ahi - alo, 0.0)
                    return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

                la = areas(llo[:-1], lhi[:-1])
                ra = areas(rlo_s[1:], rhi_s[1:])
                cost = la * lc + ra * rc
                bad = (lc == 0) | (rc == 0)
                cost[bad] = np.inf
                k = int(np.argmin(cost))
                if cost[k] < best["cost"]:
                    best = dict(cost=float(cost[k]), axis=axis, kind="spatial",
                                plane=float(nlo[axis] + (k + 1) * w / _SAH_BINS))

        if best["axis"] < 0:
            mid = n // 2
            lids, rids = ids[:mid], ids[mid:]
        elif best["kind"] == "obj":
            mask = best["mask"]
            lids = [ids[j] for j in range(n) if mask[j]]
            rids = [ids[j] for j in range(n) if not mask[j]]
            t_axis[nid] = best["axis"]
        else:
            axis, plane = best["axis"], best["plane"]
            lids, rids = [], []
            for j in range(n):
                rid = ids[j]
                if rhi[rid][axis] <= plane:
                    lids.append(rid)
                elif rlo[rid][axis] >= plane:
                    rids.append(rid)
                else:
                    tri = wv3[rtri[rid]]
                    cl = _clip_tri_slab(tri, axis, rlo[rid][axis], plane)
                    cr = _clip_tri_slab(tri, axis, plane, rhi[rid][axis])
                    if cl is None or cr is None or len(rtri) >= max_refs:
                        # degenerate clip or budget exhausted: assign whole
                        (lids if (rlo[rid][axis] + rhi[rid][axis]) * 0.5 <= plane
                         else rids).append(rid)
                        continue
                    # left fragment reuses the ref id; right gets a new one
                    rlo[rid] = np.maximum(cl[0], rlo[rid])
                    rhi[rid] = np.minimum(cl[1], rhi[rid])
                    lids.append(rid)
                    rlo.append(np.maximum(cr[0], np.asarray(tlo[rtri[rid]], np.float64)))
                    rhi.append(np.minimum(cr[1], np.asarray(thi[rtri[rid]], np.float64)))
                    rtri.append(rtri[rid])
                    rids.append(len(rtri) - 1)
            t_axis[nid] = axis
            if not lids or not rids:  # numerical corner: fall back
                mid = n // 2
                lids, rids = ids[:mid], ids[mid:]
        l_id = new_node()
        r_id = new_node()
        t_left[nid] = l_id
        t_right[nid] = r_id
        stack.append((r_id, rids))
        stack.append((l_id, lids))

    # assemble reference order from leaves (leaf tris must be contiguous)
    order = np.empty(sum(len(ids) for _, ids in leaves), np.int64)
    pos = 0
    for nid, ids in leaves:
        t_first[nid] = pos
        order[pos : pos + len(ids)] = [rtri[i] for i in ids]
        pos += len(ids)

    nn = len(t_left)
    nodes_i = np.zeros((nn, 8), np.int32)
    nodes_f = np.zeros((nn, 16), np.float32)
    nodes_self = np.zeros((nn, 8), np.float32)
    parent = np.full(nn, -1, np.int32)
    for nid in range(nn):
        nodes_self[nid, 0:3] = t_lo[nid]
        nodes_self[nid, 3:6] = t_hi[nid]
        if t_count[nid] > 0:
            nodes_i[nid, 2] = t_first[nid]
            nodes_i[nid, 3] = t_count[nid]
            continue
        l_id, r_id, axis = t_left[nid], t_right[nid], t_axis[nid]
        cl = (t_lo[l_id][axis] + t_hi[l_id][axis]) * 0.5
        cr = (t_lo[r_id][axis] + t_hi[r_id][axis]) * 0.5
        if cr < cl:
            l_id, r_id = r_id, l_id
        nodes_i[nid, 0] = l_id
        nodes_i[nid, 1] = r_id
        nodes_i[nid, 5] = axis
        nodes_f[nid, 0:3] = t_lo[l_id]
        nodes_f[nid, 3:6] = t_hi[l_id]
        nodes_f[nid, 6:9] = t_lo[r_id]
        nodes_f[nid, 9:12] = t_hi[r_id]
        parent[l_id] = nid
        parent[r_id] = nid
    nodes_i[:, 4] = parent
    return order, nodes_i, nodes_f, nodes_self


IDENT_BARY = np.array([0.0, 0.0, 1.0, 0.0, 0.0, 1.0], np.float32)


def build_world_bvh(flat, tri_class=None, subtri_cells=None,
                    subtri_level=2) -> WorldBvh:
    """Bake instances to world space + SAH/LBVH over all world triangles.

    tri_class: optional [sum of visible-node tri counts] int8 in EMIT order
    (ops/omm.classify_attr_alpha): rows classified ALPHA_TRANSPARENT are
    CULLED from the world BVH — they can never occlude, so the image is
    identical with fewer triangles (the reference's SceneOmm role:
    accelerate alpha-tested traversal only, RENDERING_ARCHITECTURE.md:65-95).
    The fused hit-attr table keeps the FULL emit (hits never land on culled
    rows), so rn_attr_base addressing is unchanged.

    subtri_cells: optional [same rows, 4**subtri_level] int8 per-cell
    classes (ops/omm.classify_subtri). MIXED triangles containing provably
    TRANSPARENT cells are SPLIT: their non-transparent subdivision cells
    are emitted as world geometry with virtual tri ids and their own
    hit-attr rows (baked at the cells' parent-barycentric corners, see
    WorldBvh.attr_bary) — the subtriangle-granular culling of the
    reference's VkMicromapEXT build (gltf_scene_omm.cpp)."""
    vtx = np.asarray(flat.vtx_pos, np.float64)
    tri_idx = np.asarray(flat.tri_idx)
    rn_o2w = np.asarray(flat.rn_o2w, np.float64)
    rn_prim = np.asarray(flat.rn_prim)
    rn_visible = np.asarray(flat.rn_visible)
    pft = np.asarray(flat.prim_first_tri)
    ptc = np.asarray(flat.prim_tri_count)

    sub_bary_tab = None
    if subtri_cells is not None and tri_class is not None:
        from .omm import subtri_corners

        sub_bary_tab = subtri_corners(subtri_level).reshape(-1, 6)  # [m,6]

    v_chunks, rnode_chunks, tri_chunks = [], [], []
    wsrc_chunks, wbary_chunks = [], []
    attr_rnode_chunks, attr_tri_chunks = [], []
    attr_bary_chunks, attr_cls_chunks = [], []
    rn_attr_base = np.zeros(rn_o2w.shape[0], np.int32)
    attr_off = 0
    cls_off = 0  # row offset into tri_class/subtri_cells (PARENT emit order)
    for i in range(rn_o2w.shape[0]):
        if not rn_visible[i]:
            continue
        p = rn_prim[i]
        f, c = int(pft[p]), int(ptc[p])
        ids = np.arange(f, f + c)
        attr_rnode_chunks.append(np.full(c, i, np.int32))
        attr_tri_chunks.append(ids.astype(np.int32))
        attr_bary_chunks.append(np.tile(IDENT_BARY, (c, 1)))
        keep = np.ones(c, bool)
        split = np.zeros(c, bool)
        cells = None
        if tri_class is not None:
            from .omm import ALPHA_MIXED, ALPHA_TRANSPARENT

            cl = np.asarray(tri_class[cls_off : cls_off + c])
            keep = cl != ALPHA_TRANSPARENT
            attr_cls_chunks.append(cl.astype(np.int8))
            if sub_bary_tab is not None:
                cells = np.asarray(subtri_cells[cls_off : cls_off + c])
                any_trans = (cells == ALPHA_TRANSPARENT).any(axis=1)
                all_trans = (cells == ALPHA_TRANSPARENT).all(axis=1)
                split = (cl == ALPHA_MIXED) & any_trans & ~all_trans
                # finer cell bounds can prove a whole MIXED tri transparent
                keep &= ~(split | ((cl == ALPHA_MIXED) & all_trans))
        else:
            attr_cls_chunks.append(np.ones(c, np.int8))  # default MIXED
        kept_ids = ids[keep]
        idx = tri_idx[kept_ids]  # [c',3]
        m = rn_o2w[i]
        w0 = vtx[idx[:, 0]] @ m[:3, :3].T + m[:3, 3]
        w1 = vtx[idx[:, 1]] @ m[:3, :3].T + m[:3, 3]
        w2 = vtx[idx[:, 2]] @ m[:3, :3].T + m[:3, 3]
        v_chunks.append(np.concatenate([w0, w1, w2], axis=1).astype(np.float32))
        rnode_chunks.append(np.full(kept_ids.shape[0], i, np.int32))
        tri_chunks.append(kept_ids.astype(np.int32))
        wsrc_chunks.append(kept_ids.astype(np.int32))
        wbary_chunks.append(np.tile(IDENT_BARY, (kept_ids.shape[0], 1)))
        # fused hit-state addressing: this node's world tris occupy emit
        # rows [attr_off, attr_off + c) and carry global tri ids [f, f+c);
        # virtual subtri rows extend the span with gids f+c, f+c+1, ...
        rn_attr_base[i] = attr_off - f
        n_virtual = 0
        if split.any():
            sids = ids[split]  # parent gids [k]
            scls = cells[split]  # [k, m]
            from .omm import ALPHA_TRANSPARENT

            emit_mask = scls != ALPHA_TRANSPARENT
            kk, cell_ids = np.nonzero(emit_mask)
            par = sids[kk]  # parent gid per subtri emission [S]
            bary = sub_bary_tab[cell_ids]  # [S,6]
            pidx = tri_idx[par]
            pw0 = vtx[pidx[:, 0]] @ m[:3, :3].T + m[:3, 3]
            pw1 = vtx[pidx[:, 1]] @ m[:3, :3].T + m[:3, 3]
            pw2 = vtx[pidx[:, 2]] @ m[:3, :3].T + m[:3, 3]

            def comb(bu, bv):
                return (pw0 * (1.0 - bu - bv)[:, None] + pw1 * bu[:, None]
                        + pw2 * bv[:, None])

            s0 = comb(bary[:, 0], bary[:, 1])
            s1 = comb(bary[:, 2], bary[:, 3])
            s2 = comb(bary[:, 4], bary[:, 5])
            v_chunks.append(np.concatenate([s0, s1, s2], axis=1).astype(np.float32))
            S = par.shape[0]
            vgid = (f + c + np.arange(S)).astype(np.int32)
            rnode_chunks.append(np.full(S, i, np.int32))
            tri_chunks.append(vgid)
            wsrc_chunks.append(par.astype(np.int32))
            wbary_chunks.append(bary.astype(np.float32))
            attr_rnode_chunks.append(np.full(S, i, np.int32))
            attr_tri_chunks.append(par.astype(np.int32))
            attr_bary_chunks.append(bary.astype(np.float32))
            attr_cls_chunks.append(scls[kk, cell_ids].astype(np.int8))
            n_virtual = S
        attr_off += c + n_virtual
        cls_off += c

    # emit-order copies survive the BVH reorder below — they drive the
    # fused hit-attr bake (build + device refit rebake). FULL emit, even
    # when tri_class culls rows from the BVH itself.
    attr_rnode = (np.concatenate(attr_rnode_chunks) if attr_rnode_chunks
                  else np.zeros(0, np.int32))
    attr_tri = (np.concatenate(attr_tri_chunks) if attr_tri_chunks
                else np.zeros(0, np.int32))
    attr_bary = (np.concatenate(attr_bary_chunks).astype(np.float32)
                 if attr_bary_chunks else np.zeros((0, 6), np.float32))

    wv = (np.concatenate(v_chunks) if v_chunks
          else np.zeros((0, 9), np.float32))  # [T',9]
    wtri_rnode = np.concatenate(rnode_chunks) if rnode_chunks else np.zeros(0, np.int32)
    wtri_tri = np.concatenate(tri_chunks) if tri_chunks else np.zeros(0, np.int32)
    wtri_src_tri = np.concatenate(wsrc_chunks) if wsrc_chunks else np.zeros(0, np.int32)
    wtri_bary = (np.concatenate(wbary_chunks).astype(np.float32)
                 if wbary_chunks else np.zeros((0, 6), np.float32))
    if wv.shape[0] == 0:  # empty scene (or fully culled): one degenerate tri
        wv = np.full((1, 9), 3e37, np.float32)
        wtri_rnode = np.zeros(1, np.int32)
        wtri_tri = np.zeros(1, np.int32)
        wtri_src_tri = np.zeros(1, np.int32)
        wtri_bary = np.tile(IDENT_BARY, (1, 1))
    nt = wv.shape[0]

    from .hitstate import bake_hit_attrs_np, narrow_attr_ok

    hit_attr, attr_has_uv = bake_hit_attrs_np(flat, attr_rnode, attr_tri,
                                              narrow=narrow_attr_ok(flat),
                                              attr_bary=attr_bary)
    attr_alpha_class = (np.concatenate(attr_cls_chunks) if attr_cls_chunks
                        else np.zeros(0, np.int8))

    v0, v1, v2 = wv[:, 0:3], wv[:, 3:6], wv[:, 6:9]
    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    cen = (tlo + thi) * 0.5

    # ---- radix tree over morton-sorted triangles
    if nt == 1:
        order = np.zeros(1, np.int64)
        nodes_i = np.zeros((1, 8), np.int32)
        nodes_i[0] = [0, 0, 0, 1, -1, 0, 0, 0]
        nodes_f = np.zeros((1, 16), np.float32)
        nodes_self = np.zeros((1, 8), np.float32)
        nodes_self[0, 0:3] = tlo[0]
        nodes_self[0, 3:6] = thi[0]
        tris16 = np.zeros((1 + LEAF_SIZE, 16), np.float32)
        tris16[0, :9] = wv[0]
        wtri_rnode = np.concatenate([wtri_rnode, np.zeros(LEAF_SIZE, np.int32)])
        wtri_tri = np.concatenate([wtri_tri, np.zeros(LEAF_SIZE, np.int32)])
        wtri_src_tri = np.concatenate([wtri_src_tri, np.zeros(LEAF_SIZE, np.int32)])
        wtri_bary = np.concatenate([wtri_bary, np.tile(IDENT_BARY, (LEAF_SIZE, 1))])
        n4i, n4f, m4 = build_bvh4(nodes_i, nodes_f, nodes_self)
        lp, lgi, _ = _lane_tables(nodes_i, nodes_self, tris16, wtri_rnode, wtri_tri)
        nfi, t128, w8r, w8t, t8s, rcode = _packet2_tables(nodes_i, nodes_f, tris16, wtri_rnode, wtri_tri)
        nfi4, r4 = _packet3_tables(nodes_i, n4i, n4f)
        nfi16, m16 = _packet6_tables(nodes_i, nodes_self)
        return WorldBvh(
            nodes_f=nodes_f, nodes_self=nodes_self, nodes_i=nodes_i, tris=tris16,
            wtri_rnode=wtri_rnode, wtri_tri=wtri_tri,
            refit_levels=np.full((1, 1), -1, np.int32),
            portal_roots=np.zeros(1, np.int32),
            nodes4_i=n4i, nodes4_f=n4f, map4=m4, lane_pages=lp, lane_geo_idx=lgi,
        nodes_fi=nfi, tris128=t128, wtri8_rnode=w8r, wtri8_tri=w8t, tri8_src=t8s,
        hit_attr=hit_attr, rn_attr_base=rn_attr_base, attr_rnode=attr_rnode,
        emit2ref=_emit2ref(rn_attr_base, wtri_rnode, wtri_tri,
                           attr_rnode.shape[0], wtri_rnode.shape[0] - LEAF_SIZE),
        attr_tri=attr_tri, attr_has_uv=attr_has_uv,
        attr_alpha_class=attr_alpha_class,
        attr_bary=attr_bary, wtri_src_tri=wtri_src_tri, wtri_bary=wtri_bary,
        nodes4_fi=nfi4, nodes4_sc=_packet3_sidecar(nfi4), root4_code=r4,
        nodes16_fi=nfi16, map16=m16,
        root_code=rcode, num_world_tris=1,
        )

    # binned SAH (default: better trees -> fewer node visits per packet);
    # LBVH radix tree above the size cutoff or via VKGR_BVH=lbvh
    import os

    bvh_kind = os.environ.get("VKGR_BVH", "sah")
    use_sah = bvh_kind in ("sah", "sbvh")
    if use_sah and nt > LEAF_SIZE:
        if bvh_kind == "sbvh" and nt <= 300_000:
            built = _build_sbvh(tlo, thi, cen, wv)
        else:
            from ..native import build_sah_native

            built = build_sah_native(tlo, thi, cen, LEAF_SIZE)
            if built is None and nt <= 300_000:  # numpy oracle path (slow: python loop)
                built = _build_sah(tlo, thi, cen)
        if built is None:
            use_sah = False
    if use_sah and nt > LEAF_SIZE:
        order, nodes_i, nodes_f, nodes_self = built
        wv = wv[order]
        wtri_rnode = wtri_rnode[order]
        wtri_tri = wtri_tri[order]
        wtri_src_tri = wtri_src_tri[order]
        wtri_bary = wtri_bary[order]
        nrefs = order.shape[0]  # == nt except under SBVH duplication
        refit_levels, portal_roots = _levels_and_portals(nodes_i)
        tris16 = np.zeros((nrefs + LEAF_SIZE, 16), np.float32)
        tris16[:nrefs, :9] = wv
        wtri_rnode = np.concatenate([wtri_rnode, np.zeros(LEAF_SIZE, np.int32)])
        wtri_tri = np.concatenate([wtri_tri, np.zeros(LEAF_SIZE, np.int32)])
        wtri_src_tri = np.concatenate([wtri_src_tri, np.zeros(LEAF_SIZE, np.int32)])
        wtri_bary = np.concatenate([wtri_bary, np.tile(IDENT_BARY, (LEAF_SIZE, 1))])
        n4i, n4f, m4 = build_bvh4(nodes_i, nodes_f, nodes_self)
        lp, lgi, _ = _lane_tables(nodes_i, nodes_self, tris16, wtri_rnode, wtri_tri)
        nfi, t128, w8r, w8t, t8s, rcode = _packet2_tables(nodes_i, nodes_f, tris16, wtri_rnode, wtri_tri)
        nfi4, r4 = _packet3_tables(nodes_i, n4i, n4f)
        nfi16, m16 = _packet6_tables(nodes_i, nodes_self)
        return WorldBvh(
            nodes_f=nodes_f, nodes_self=nodes_self, nodes_i=nodes_i, tris=tris16,
            wtri_rnode=wtri_rnode, wtri_tri=wtri_tri,
            refit_levels=refit_levels, portal_roots=portal_roots,
            nodes4_i=n4i, nodes4_f=n4f, map4=m4, lane_pages=lp, lane_geo_idx=lgi,
        nodes_fi=nfi, tris128=t128, wtri8_rnode=w8r, wtri8_tri=w8t, tri8_src=t8s,
        hit_attr=hit_attr, rn_attr_base=rn_attr_base, attr_rnode=attr_rnode,
        emit2ref=_emit2ref(rn_attr_base, wtri_rnode, wtri_tri,
                           attr_rnode.shape[0], wtri_rnode.shape[0] - LEAF_SIZE),
        attr_tri=attr_tri, attr_has_uv=attr_has_uv,
        attr_alpha_class=attr_alpha_class,
        attr_bary=attr_bary, wtri_src_tri=wtri_src_tri, wtri_bary=wtri_bary,
        nodes4_fi=nfi4, nodes4_sc=_packet3_sidecar(nfi4), root4_code=r4,
        nodes16_fi=nfi16, map16=m16,
        root_code=rcode, num_world_tris=nt,
        )

    # native (C++) builder when available; numpy path is the oracle/fallback
    from ..native import build_radix_tree_native

    native = build_radix_tree_native(tlo, thi, cen)
    if native is not None:
        order, lc, rc, leaf_l, leaf_r = native
    else:
        scene_lo = tlo.min(axis=0)
        scene_hi = thi.max(axis=0)
        codes = morton3d(cen, scene_lo, scene_hi)
        order = np.argsort(codes, kind="stable")
        keys = (codes[order].astype(np.uint64) << np.uint64(32)) | np.arange(nt, dtype=np.uint64)
        lc, rc, leaf_l, leaf_r = _build_radix_tree(keys)

    # reorder triangle storage into morton order (leaf ranges contiguous)
    wv = wv[order]
    tlo, thi = tlo[order], thi[order]
    wtri_rnode = wtri_rnode[order]
    wtri_tri = wtri_tri[order]
    wtri_src_tri = wtri_src_tri[order]
    wtri_bary = wtri_bary[order]

    # ---- subtree leaf ranges (internal node i of the radix tree covers a
    # contiguous sorted range [range_lo, range_hi])
    ni = nt - 1  # internal nodes
    range_lo = np.full(ni, -1, np.int64)
    range_hi = np.full(ni, -1, np.int64)

    # children encoding: value j is a LEAF (sorted index) if flag set
    # compute ranges bottom-up with passes
    child_l = lc
    child_r = rc
    lo_l = np.where(leaf_l, child_l, -1)
    hi_l = np.where(leaf_l, child_l, -1)
    lo_r = np.where(leaf_r, child_r, -1)
    hi_r = np.where(leaf_r, child_r, -1)
    pend = np.ones(ni, bool)
    cl_i = np.clip(child_l, 0, ni - 1)  # only valid where ~leaf_l
    cr_i = np.clip(child_r, 0, ni - 1)
    while pend.any():
        need_l = ~leaf_l & (lo_l < 0)
        lo_l = np.where(need_l & (range_lo[cl_i] >= 0), range_lo[cl_i], lo_l)
        hi_l = np.where(need_l & (range_hi[cl_i] >= 0), range_hi[cl_i], hi_l)
        need_r = ~leaf_r & (lo_r < 0)
        lo_r = np.where(need_r & (range_lo[cr_i] >= 0), range_lo[cr_i], lo_r)
        hi_r = np.where(need_r & (range_hi[cr_i] >= 0), range_hi[cr_i], hi_r)
        ready = pend & (lo_l >= 0) & (lo_r >= 0)
        if not ready.any():
            raise RuntimeError("range propagation deadlock")
        range_lo[ready] = np.minimum(lo_l[ready], lo_r[ready])
        range_hi[ready] = np.maximum(hi_l[ready], hi_r[ready])
        pend &= ~ready

    counts = range_hi - range_lo + 1

    # ---- choose collapse roots: subtrees with <= LEAF_SIZE tris whose
    # parent has more; plus bare leaves hanging from kept internal nodes
    parent_int = np.full(ni, -1, np.int64)
    parent_int[child_l[~leaf_l].astype(np.int64)] = np.nonzero(~leaf_l)[0]
    parent_int[child_r[~leaf_r].astype(np.int64)] = np.nonzero(~leaf_r)[0]
    small = counts <= LEAF_SIZE
    par_small = np.zeros(ni, bool)
    has_par = parent_int >= 0
    par_small[has_par] = small[parent_int[has_par]]
    collapse_root_int = small & ~par_small  # internal node becomes a leaf

    kept_int = ~small  # internal nodes that survive
    # map old internal id -> new node id; collapsed roots + single-tri leaf
    # children of kept internals become leaf nodes
    new_ids = {}
    nodes = []  # (kind, payload)

    def add_node(kind, payload):
        nodes.append((kind, payload))
        return len(nodes) - 1

    # BFS from root (internal 0) over kept internals for deterministic layout
    order_nodes = [0]
    for i in order_nodes:
        if not kept_int[i]:
            continue
        for c, is_leaf_child in ((child_l[i], leaf_l[i]), (child_r[i], leaf_r[i])):
            if not is_leaf_child and kept_int[c]:
                order_nodes.append(int(c))

    # assign ids: internals first in BFS order, then leaves as encountered
    if kept_int.any():
        for i in order_nodes:
            if kept_int[i]:
                new_ids[("i", i)] = add_node("i", i)
        for i in order_nodes:
            if not kept_int[i]:
                continue
            for c, is_leaf_child in ((child_l[i], leaf_l[i]), (child_r[i], leaf_r[i])):
                if is_leaf_child:
                    new_ids[("t", int(c), i, "lr")] = None  # placeholder below
    else:
        pass

    # simpler: build arrays by walking kept internals and materializing children
    n_new = 0
    id_of_int = {}
    for i in order_nodes:
        if kept_int[i]:
            id_of_int[i] = n_new
            n_new += 1
    leaf_rows = []  # (first, count, self_lo, self_hi) appended after internals

    def child_ref(i, c, is_leaf_child):
        """Return (new_id, lo, hi) for child c of kept-internal i."""
        if is_leaf_child:
            first, count = int(c), 1
        elif kept_int[c]:
            nid = id_of_int[c]
            lo, hi = subtree_box(c)
            return nid, lo, hi
        else:  # collapsed subtree -> leaf
            first, count = int(range_lo[c]), int(counts[c])
        lo = tlo[first : first + count].min(axis=0)
        hi = thi[first : first + count].max(axis=0)
        leaf_rows.append((first, count, lo, hi))
        return n_new + len(leaf_rows) - 1, lo, hi

    box_cache = {}

    def subtree_box(i):
        if i in box_cache:
            return box_cache[i]
        f, c = int(range_lo[i]), int(counts[i])
        lo = tlo[f : f + c].min(axis=0)
        hi = thi[f : f + c].max(axis=0)
        box_cache[i] = (lo, hi)
        return lo, hi

    if not kept_int.any():
        # whole tree collapses to one leaf node (nt <= LEAF_SIZE)
        nn = 1
        nodes_i = np.zeros((1, 8), np.int32)
        nodes_i[0] = [0, 0, 0, nt, -1, 0, 0, 0]
        nodes_f = np.zeros((1, 16), np.float32)
        nodes_self = np.zeros((1, 8), np.float32)
        nodes_self[0, 0:3] = tlo.min(axis=0)
        nodes_self[0, 3:6] = thi.max(axis=0)
        refit_levels = np.full((1, 1), -1, np.int32)
        portal_roots = np.zeros(1, np.int32)
    else:
        child_info = {}
        for i in order_nodes:
            if not kept_int[i]:
                continue
            l_id, l_lo, l_hi = child_ref(i, child_l[i], bool(leaf_l[i]))
            r_id, r_lo, r_hi = child_ref(i, child_r[i], bool(leaf_r[i]))
            child_info[i] = (l_id, r_id, l_lo, l_hi, r_lo, r_hi)

        nn = n_new + len(leaf_rows)
        nodes_i = np.zeros((nn, 8), np.int32)
        nodes_f = np.zeros((nn, 16), np.float32)
        nodes_self = np.zeros((nn, 8), np.float32)
        parent_new = np.full(nn, -1, np.int32)
        for i in order_nodes:
            if not kept_int[i]:
                continue
            nid = id_of_int[i]
            l_id, r_id, l_lo, l_hi, r_lo, r_hi = child_info[i]
            # near-child contract: left = smaller centroid on split axis
            cl = (l_lo + l_hi) * 0.5
            cr = (r_lo + r_hi) * 0.5
            axis = int(np.argmax(np.abs(cr - cl)))
            if cr[axis] < cl[axis]:
                l_id, r_id = r_id, l_id
                l_lo, l_hi, r_lo, r_hi = r_lo, r_hi, l_lo, l_hi
            nodes_i[nid, 0] = l_id
            nodes_i[nid, 1] = r_id
            nodes_i[nid, 5] = axis
            nodes_f[nid, 0:3] = l_lo
            nodes_f[nid, 3:6] = l_hi
            nodes_f[nid, 6:9] = r_lo
            nodes_f[nid, 9:12] = r_hi
            slo, shi = subtree_box(i)
            nodes_self[nid, 0:3] = slo
            nodes_self[nid, 3:6] = shi
            parent_new[l_id] = nid
            parent_new[r_id] = nid
        for k, (first, count, lo, hi) in enumerate(leaf_rows):
            nid = n_new + k
            nodes_i[nid, 2] = first
            nodes_i[nid, 3] = count
            nodes_self[nid, 0:3] = lo
            nodes_self[nid, 3:6] = hi
        nodes_i[:, 4] = parent_new
        refit_levels, portal_roots = _levels_and_portals(nodes_i)

    # LEAF_SIZE padding rows let leaf loops fetch fixed-size slabs without
    # bounds checks (degenerate zero triangles never hit)
    tris16 = np.zeros((nt + LEAF_SIZE, 16), np.float32)
    tris16[:nt, :9] = wv
    wtri_rnode = np.concatenate([wtri_rnode, np.zeros(LEAF_SIZE, np.int32)])
    wtri_tri = np.concatenate([wtri_tri, np.zeros(LEAF_SIZE, np.int32)])
    wtri_src_tri = np.concatenate([wtri_src_tri, np.zeros(LEAF_SIZE, np.int32)])
    wtri_bary = np.concatenate([wtri_bary, np.tile(IDENT_BARY, (LEAF_SIZE, 1))])
    n4i, n4f, m4 = build_bvh4(nodes_i, nodes_f, nodes_self)
    lp, lgi, _ = _lane_tables(nodes_i, nodes_self, tris16, wtri_rnode, wtri_tri)
    nfi, t128, w8r, w8t, t8s, rcode = _packet2_tables(nodes_i, nodes_f, tris16, wtri_rnode, wtri_tri)
    nfi4, r4 = _packet3_tables(nodes_i, n4i, n4f)
    nfi16, m16 = _packet6_tables(nodes_i, nodes_self)
    return WorldBvh(
        nodes_f=nodes_f, nodes_self=nodes_self, nodes_i=nodes_i, tris=tris16,
        wtri_rnode=wtri_rnode, wtri_tri=wtri_tri,
        refit_levels=refit_levels, portal_roots=portal_roots,
        nodes4_i=n4i, nodes4_f=n4f, map4=m4, lane_pages=lp, lane_geo_idx=lgi,
        nodes_fi=nfi, tris128=t128, wtri8_rnode=w8r, wtri8_tri=w8t, tri8_src=t8s,
        hit_attr=hit_attr, rn_attr_base=rn_attr_base, attr_rnode=attr_rnode,
        emit2ref=_emit2ref(rn_attr_base, wtri_rnode, wtri_tri,
                           attr_rnode.shape[0], wtri_rnode.shape[0] - LEAF_SIZE),
        attr_tri=attr_tri, attr_has_uv=attr_has_uv,
        attr_alpha_class=attr_alpha_class,
        attr_bary=attr_bary, wtri_src_tri=wtri_src_tri, wtri_bary=wtri_bary,
        nodes4_fi=nfi4, nodes4_sc=_packet3_sidecar(nfi4), root4_code=r4,
        nodes16_fi=nfi16, map16=m16,
        root_code=rcode, num_world_tris=nt,
    )


# VMEM budget for resident traversal tables: v5e has 128 MB of VMEM; the
# packet kernel caps itself at 100 MB (pallas_traverse.py vmem_limit_bytes)
# and needs headroom for ray blocks, stack and double-buffering.
VMEM_TABLE_BUDGET = 88 * 1024 * 1024


def vmem_bytes(wb: WorldBvh, kernel: str = "v2") -> int:
    """Bytes of BVH tables ONE packet-kernel invocation keeps resident in
    VMEM (its node table + tris128 — the only tables the hot kernel binds;
    VMEM is per-pallas_call, so a frame mixing v2 and v3 calls pays the MAX
    of the two footprints, not the sum).

    Counts PADDED sizes: Mosaic tiles f32 blocks to (8, 128) lanes, so the
    16-wide v2 nodes_fi rows occupy 128 lanes of VMEM each (8x the raw
    bytes — measured: an 819k-tri scene with 85.6 MB of raw tables failed
    AOT with a u8[136962048] window for nodes_fi [267497,16]); the 32-wide
    v3 nodes4_fi rows occupy 128 lanes too (4x raw), but a BVH4 has ~half
    the nodes, so the v3 footprint is ~half of v2's. tris128 is already
    128-wide."""
    if kernel == "v6":
        # BVH16 rows are exactly 128 floats — zero Mosaic padding waste
        return wb.nodes16_fi.nbytes + wb.tris128.nbytes
    if kernel == "lane":
        # skip-DFS page table is already 128-wide (no padding waste)
        return wb.lane_pages.nbytes
    if kernel == "lane_stream":
        # pages stay in HBM; resident footprint is ONE 8 KB page scratch
        from .lane_traverse import FIELDS

        return FIELDS * 128 * 4
    rows = (wb.nodes4_fi.shape[0]
            if kernel in ("v3", "v5", "v7", "v8", "v9", "v9x4")
            else wb.nodes_fi.shape[0])
    return rows * 128 * 4 + wb.tris128.nbytes


def fits_vmem(wb: WorldBvh, kernel: str = "v2") -> bool:
    """Whether the given packet kernel's resident tables fit the VMEM
    budget. Over-budget scenes must take the HBM wavefront path — the
    reference's analog is the budgeted multi-pass BLAS build
    (renderer.cpp:1699-1721): bounded device memory, graceful degradation,
    never an abort."""
    return vmem_bytes(wb, kernel) <= VMEM_TABLE_BUDGET


# ---------------------------------------------------------------- BVH4
# 2-level collapse of the binary tree into 4-wide nodes for the packet
# kernel: per pop, ONE [1,32] fetch tests 4 child boxes — the vector work
# per tree progress is unchanged (4 box tests either way) while the scalar
# work (pops, fetches, conds — the measured kernel bottleneck) is ~halved.
#
#   nodes4_f [M, 32] f32: 4 child AABBs (lo3 hi3 each, slots of 6; 24 used,
#                         pad 8). Missing children get inverted boxes
#                         (lo=+BIG, hi=-BIG) so their slab test never hits.
#   nodes4_i [M, 8]  i32: c0..c3 (>=0: BVH4 internal id; <0: leaf encoded
#                         as -(first*16+count)-1; missing = -1 i.e. count 0),
#                         axis0 (this split), axis1 (left pair), axis2
#                         (right pair), pad
#   map4     [M, 4]  i32: source BINARY node id per child slot (-1 missing)
#                         — refit recomputes nodes4_f = nodes_self[map4].

_B4_EMPTY_LO = 3e38
_B4_EMPTY_HI = -3e38


def _packet3_tables(nodes_i, nodes4_i, nodes4_f):
    """Fused BVH4 rows for the v3 packet kernel (pallas_traverse
    _traverse3_body): ONE [1,32] fetch per internal visit carries 4 child
    AABBs (cols 0:24), 4 child codes (24:28, v2 sign convention: >= 0 is a
    BVH4 node id, < 0 is a tris128 leaf code -(leafrow*16+count)-1; missing
    children carry code 0 — unambiguous, the root is never a child — and
    the always-miss POINT box lo=hi=+3e38: the kernel's straddling slab
    (tnear=max of mins, tfar=min of maxes) treats an INVERTED box as a
    guaranteed hit, so build_bvh4's EMPTY_LO/HI convention must be
    rewritten here or traversal loops forever) and 3 near-order axes
    (28:31).

    Halves the scalar work per unit of tree progress vs the binary v2 rows
    (pops, fetches, packed reductions are the measured kernel bottleneck at
    ~0.35us/visit vs ~40 VPU cycles of vector work)."""
    nodes_i = np.asarray(nodes_i)
    count = nodes_i[:, 3].astype(np.int64)
    leaf_ids = np.nonzero(count > 0)[0]
    # binary leaf 'first' -> tris128 row (matches _packet2_tables leafrow order)
    first2row = np.full(int(nodes_i[:, 2].max()) + 2, -1, np.int64)
    first2row[nodes_i[leaf_ids, 2].astype(np.int64)] = np.arange(leaf_ids.size)

    n4i = np.asarray(nodes4_i).astype(np.int64)
    fi = np.asarray(nodes4_f, np.float32).copy()  # [M,32], cols 24:32 free
    slots = n4i[:, 0:4]
    c1 = -slots - 1  # valid where slots < -1... v1 leaf codes are < 0
    is_leafslot = slots < 0
    is_missing = slots == -1
    v1c = np.where(is_leafslot & ~is_missing, c1, 0)
    vfirst, vcnt = v1c // 16, v1c % 16
    v2c = -(first2row[vfirst] * 16 + vcnt) - 1
    code = np.where(is_missing, 0, np.where(is_leafslot, v2c, slots)).astype(np.float64)
    fi[:, 24:28] = code
    fi[:, 28:31] = n4i[:, 4:7]
    fi[:, 31] = 0.0
    for s in range(4):
        fi[is_missing[:, s], 6 * s : 6 * s + 6] = 3e38
    return fi, 0


def _packet3_sidecar(nodes4_fi):
    """int32 [M,8] SMEM sidecar of the v3 rows: cols 0:4 child codes,
    4:7 near-order axes, 7 pad (codes are exact in f32: |code| < 2^24)."""
    sc = np.zeros((nodes4_fi.shape[0], 8), np.int32)
    sc[:, 0:7] = nodes4_fi[:, 24:31].astype(np.int32)
    return sc


def _emit2ref(rn_attr_base, wtri_rnode, wtri_tri, n_attr, nrefs):
    """emit-row -> reordered ref table (see WorldBvh.emit2ref)."""
    e2r = np.full(max(int(n_attr), 1), -1, np.int32)
    if nrefs > 0:
        rows = (np.asarray(rn_attr_base)[wtri_rnode[:nrefs]]
                + np.asarray(wtri_tri[:nrefs], np.int64))
        e2r[rows] = np.arange(nrefs, dtype=np.int32)
    return e2r


def _leaf_code(first, count):
    return -(int(first) * 16 + int(count)) - 1


def build_bvh4(nodes_i, nodes_f, nodes_self):
    """Collapse the flattened binary tree into the BVH4 layout."""
    del nodes_f  # boxes come from nodes_self (child own-boxes)

    def child_entry(b):
        """binary child id -> (slot4_value_or_placeholder, is_internal)"""
        if nodes_i[b, 3] > 0:  # binary leaf
            return _leaf_code(nodes_i[b, 2], nodes_i[b, 3]), False, b
        return None, True, b

    n4_i, n4_f, m4 = [], [], []
    id_of = {}
    from collections import deque

    if nodes_i[0, 3] > 0:  # root is a leaf: single BVH4 node with 1 child
        n4_i.append([_leaf_code(nodes_i[0, 2], nodes_i[0, 3]), -1, -1, -1, 0, 0, 0, 0])
        f = np.full(32, 0.0, np.float32)
        f[0:24:6] = _B4_EMPTY_LO
        f[0:3] = nodes_self[0, 0:3]
        f[3:6] = nodes_self[0, 3:6]
        for s in range(1, 4):
            f[6 * s : 6 * s + 3] = _B4_EMPTY_LO
            f[6 * s + 3 : 6 * s + 6] = _B4_EMPTY_HI
        n4_f.append(f)
        m4.append([0, -1, -1, -1])
        return (
            np.asarray(n4_i, np.int32),
            np.stack(n4_f).astype(np.float32),
            np.asarray(m4, np.int32),
        )

    work = deque([0])
    id_of[0] = 0
    n4_i.append(None)
    n4_f.append(None)
    m4.append(None)
    while work:
        b = work.popleft()
        nid = id_of[b]
        l, r = int(nodes_i[b, 0]), int(nodes_i[b, 1])
        slots = []  # (binary id or None, leaf_code or None)
        axes = [int(nodes_i[b, 5]), 0, 0]
        for side, c in ((1, l), (2, r)):
            if nodes_i[c, 3] > 0:  # leaf child occupies one slot, pad one
                slots.append(c)
                slots.append(None)
            else:
                axes[side] = int(nodes_i[c, 5])
                slots.append(int(nodes_i[c, 0]))
                slots.append(int(nodes_i[c, 1]))
        row_i = [0, 0, 0, 0, axes[0], axes[1], axes[2], 0]
        row_f = np.empty(32, np.float32)
        row_f[24:] = 0.0
        row_m = [-1, -1, -1, -1]
        for s, c in enumerate(slots):
            if c is None:
                row_i[s] = -1
                row_f[6 * s : 6 * s + 3] = _B4_EMPTY_LO
                row_f[6 * s + 3 : 6 * s + 6] = _B4_EMPTY_HI
                continue
            row_m[s] = c
            row_f[6 * s : 6 * s + 3] = nodes_self[c, 0:3]
            row_f[6 * s + 3 : 6 * s + 6] = nodes_self[c, 3:6]
            if nodes_i[c, 3] > 0:
                row_i[s] = _leaf_code(nodes_i[c, 2], nodes_i[c, 3])
            else:
                if c not in id_of:
                    id_of[c] = len(n4_i)
                    n4_i.append(None)
                    n4_f.append(None)
                    m4.append(None)
                    work.append(c)
                row_i[s] = id_of[c]
        n4_i[nid] = row_i
        n4_f[nid] = row_f
        m4[nid] = row_m
    return (
        np.asarray(n4_i, np.int32),
        np.stack(n4_f).astype(np.float32),
        np.asarray(m4, np.int32),
    )


# ---------------------------------------------------------------- BVH16
# 4-level collapse of the binary tree into 16-wide nodes, ONE DENSE
# 128-float row per node for the v6 packet kernel:
#
#   cols   0: 96  16 child AABBs (slot s at 6s: lo3 hi3); missing slots
#                 carry the always-miss POINT box lo=hi=+3e38 (same
#                 convention as _packet3_tables — the straddling slab
#                 treats INVERTED boxes as guaranteed hits)
#   cols  96:112  16 child codes (v2 sign convention: >= 0 BVH16 node id,
#                 < 0 tris128 leaf code -(leafrow*16+count)-1; missing 0)
#   cols 112:127  15 near-order axes of the collapsed binary subtree,
#                 level-order: [root, l, r, ll, lr, rl, rr, 8x level-3];
#                 slot index = 4-bit root-to-leaf path (MSB = top split)
#   col  127      pad
#
# Why: Mosaic pads the 32-wide BVH4 rows to 128 VMEM lanes (4x raw bytes
# — the measured packet-path scene ceiling, ~370k world tris); a BVH16
# row is exactly 128 floats (zero padding waste) AND halves the number of
# internal visits vs BVH4 (the per-visit scalar latency chain is the
# measured kernel bottleneck). Reference role: the budgeted BLAS build's
# capacity story, renderer.cpp:1699-1721.


def _axis_idx(depth, path):
    """Level-order index of a collapsed-subtree position into cols 112+."""
    return (1 << depth) - 1 + path


def _packet6_tables(nodes_i, nodes_self):
    """Build (nodes16_fi [M,128] f32, map16 [M,16] i32) from the flattened
    binary tree. Root BVH16 node is id 0 (root16_code == 0)."""
    nodes_i = np.asarray(nodes_i)
    nodes_self = np.asarray(nodes_self, np.float32)
    count = nodes_i[:, 3].astype(np.int64)
    leaf_ids = np.nonzero(count > 0)[0]
    first2row = np.full(int(nodes_i[:, 2].max()) + 2, -1, np.int64)
    first2row[nodes_i[leaf_ids, 2].astype(np.int64)] = np.arange(leaf_ids.size)

    def leaf_code(b):
        return -(int(first2row[nodes_i[b, 2]]) * 16 + int(nodes_i[b, 3])) - 1

    rows_f, rows_m = [], []
    from collections import deque

    if nodes_i[0, 3] > 0:  # root is a leaf: single row, one child slot
        f = np.full(128, 0.0, np.float32)
        f[0:96:6] = 3e38
        for s in range(16):
            f[6 * s : 6 * s + 6] = 3e38
        f[0:3] = nodes_self[0, 0:3]
        f[3:6] = nodes_self[0, 3:6]
        f[96] = leaf_code(0)
        m = np.full(16, -1, np.int32)
        m[0] = 0
        return f[None, :].copy(), m[None, :].copy()

    id_of = {0: 0}
    work = deque([0])
    rows_f.append(None)
    rows_m.append(None)
    while work:
        b = work.popleft()
        nid = id_of[b]
        f = np.zeros(128, np.float32)
        for s in range(16):
            f[6 * s : 6 * s + 6] = 3e38  # missing = point box
        m = np.full(16, -1, np.int32)
        # expand the binary subtree at b up to 4 levels
        stack = [(b, 0, 0)]  # (internal binary id, path, depth)
        while stack:
            nb, path, depth = stack.pop()
            f[112 + _axis_idx(depth, path)] = float(nodes_i[nb, 5])
            for side, child in ((0, int(nodes_i[nb, 0])), (1, int(nodes_i[nb, 1]))):
                cpath = path * 2 + side
                cdepth = depth + 1
                if nodes_i[child, 3] > 0 or cdepth == 4:  # terminal slot
                    slot = cpath << (4 - cdepth)
                    f[6 * slot : 6 * slot + 3] = nodes_self[child, 0:3]
                    f[6 * slot + 3 : 6 * slot + 6] = nodes_self[child, 3:6]
                    m[slot] = child
                    if nodes_i[child, 3] > 0:
                        f[96 + slot] = leaf_code(child)
                    else:
                        if child not in id_of:
                            id_of[child] = len(rows_f)
                            rows_f.append(None)
                            rows_m.append(None)
                            work.append(child)
                        f[96 + slot] = id_of[child]
                else:
                    stack.append((child, cpath, cdepth))
        rows_f[nid] = f
        rows_m[nid] = m
    return np.stack(rows_f).astype(np.float32), np.stack(rows_m).astype(np.int32)

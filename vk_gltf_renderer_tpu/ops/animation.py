"""Device animation compute: skinning, morphing, world-matrix propagation.

TPU equivalents of the reference's GPU compute animation
(gltf_scene_animation_vk.* + shaders/skinning.comp.slang:28-70 /
morph.comp.slang:28-70) and the transform compute path
(gltf_scene_transform_vk.* + world_matrix_propagate.comp.slang:19-32).
All are batched jnp expressions — XLA turns the vertex loops into MXU/VPU
work; the per-BFS-level propagation mirrors the reference's one-dispatch-
per-level strategy with padded level arrays (static shapes).

CPU oracles live in models/animation.py (cpu_skin / cpu_morph) — the same
oracle relationship the reference's test_compute_animation.cpp uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bvh_flatten import LEAF_SIZE


def skin_vertices(positions, normals, joints0, weights0, joint_matrices):
    """4-influence linear-blend skinning (skinning.comp.slang:28-70).

    positions [V,3], normals [V,3], joints0 [V,4] i32, weights0 [V,4],
    joint_matrices [J,4,4]. Returns (positions', normals').
    """
    w = weights0
    ws = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(ws > 0, w / jnp.maximum(ws, 1e-9), w)
    m = joint_matrices[joints0]  # [V,4,4,4]
    skin_m = jnp.einsum("vj,vjkl->vkl", w, m)
    p1 = jnp.concatenate([positions, jnp.ones((positions.shape[0], 1))], axis=1)
    pos = jnp.einsum("vkl,vl->vk", skin_m, p1)[:, :3]
    nrm = jnp.einsum("vkl,vl->vk", skin_m[:, :3, :3], normals)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    return pos, nrm


def morph_vertices(base, deltas, weights):
    """Weighted morph-target blend (morph.comp.slang:28-70).

    base [V,3], deltas [T,V,3], weights [T]. Returns blended [V,3].
    """
    return base + jnp.einsum("t,tvc->vc", weights, deltas)


def propagate_world_matrices(locals_, parents_padded, levels_padded, level_mask):
    """Level-order world-matrix propagation
    (world_matrix_propagate.comp.slang:19-32; buildTopologicalLevels
    gltf_scene.cpp:1867).

    locals_ [N,4,4]; levels_padded [L,K] node ids (-1 pad);
    parents_padded [L,K] parent ids (-1 for roots); level_mask [L,K] bool.
    Returns world [N,4,4]. Jit-friendly: static level count/width.
    """
    n = locals_.shape[0]
    world0 = jnp.tile(jnp.eye(4, dtype=locals_.dtype), (n, 1, 1))

    def per_level(world, args):
        nodes, parents, mask = args
        safe_nodes = jnp.maximum(nodes, 0)
        safe_parents = jnp.maximum(parents, 0)
        parent_world = jnp.where(
            (parents >= 0)[:, None, None], world[safe_parents], jnp.eye(4, dtype=world.dtype)
        )
        new = jnp.einsum("nij,njk->nik", parent_world, locals_[safe_nodes])
        upd = jnp.where(mask[:, None, None], new, world[safe_nodes])
        world = world.at[safe_nodes].set(upd)
        return world, None

    world, _ = jax.lax.scan(per_level, world0, (levels_padded, parents_padded, level_mask))
    return world


def pack_levels(topo_levels: list, parents: np.ndarray):
    """Host-side: pad BFS levels to a rectangle for the jitted propagation."""
    if not topo_levels:
        z = np.zeros((1, 1), np.int32)
        return z - 1, z - 1, np.zeros((1, 1), bool)
    k = max(len(l) for l in topo_levels)
    L = len(topo_levels)
    nodes = np.full((L, k), -1, np.int32)
    pars = np.full((L, k), -1, np.int32)
    mask = np.zeros((L, k), bool)
    for i, lev in enumerate(topo_levels):
        nodes[i, : len(lev)] = lev
        pars[i, : len(lev)] = parents[lev]
        mask[i, : len(lev)] = True
    return nodes, pars, mask


def refit_world_bvh(wb, new_tris):
    """Refit node AABBs after vertex/transform animation (the reference's
    BLAS ALLOW_UPDATE path, gltf_scene_rtx.cpp:551 updateBottomLevelAS).

    wb: WorldBvh (child-box layout, <=LEAF_SIZE-tri leaves) with
    precomputed refit levels; new_tris [T'+pad,16] in BVH order.
    Returns (nodes_f', nodes_self', nodes4_f', tris') — topology unchanged;
    the BVH4 mirror is regathered through wb.map4.
    """
    v0 = new_tris[:, 0:3]
    v1 = new_tris[:, 3:6]
    v2 = new_tris[:, 6:9]
    tlo = jnp.minimum(jnp.minimum(v0, v1), v2)
    thi = jnp.maximum(jnp.maximum(v0, v1), v2)

    ni = jnp.asarray(wb.nodes_i)
    nn = ni.shape[0]
    first = ni[:, 2]
    count = ni[:, 3]
    leaf_mask = count > 0

    # leaf self boxes: min/max over up to LEAF_SIZE padded rows
    big = jnp.float32(3e37)
    leaf_lo = jnp.full((nn, 3), big)
    leaf_hi = jnp.full((nn, 3), -big)
    for c in range(LEAF_SIZE):
        row = first + c
        valid = (leaf_mask & (c < count))[:, None]
        leaf_lo = jnp.where(valid, jnp.minimum(leaf_lo, tlo[row]), leaf_lo)
        leaf_hi = jnp.where(valid, jnp.maximum(leaf_hi, thi[row]), leaf_hi)

    old_self = jnp.asarray(wb.nodes_self)
    lo = jnp.concatenate([jnp.where(leaf_mask[:, None], leaf_lo, old_self[:, 0:3]), jnp.zeros((1, 3))])
    hi = jnp.concatenate([jnp.where(leaf_mask[:, None], leaf_hi, old_self[:, 3:6]), jnp.zeros((1, 3))])

    left = ni[:, 0]
    right = ni[:, 1]

    def per_level(carry, nodes):
        lo, hi = carry
        safe = jnp.where(nodes >= 0, nodes, nn)  # pad -> dummy row
        l = jnp.maximum(left[jnp.minimum(safe, nn - 1)], 0)
        r = jnp.maximum(right[jnp.minimum(safe, nn - 1)], 0)
        nlo = jnp.minimum(lo[l], lo[r])
        nhi = jnp.maximum(hi[l], hi[r])
        lo = lo.at[safe].set(nlo)
        hi = hi.at[safe].set(nhi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(per_level, (lo, hi), jnp.asarray(wb.refit_levels))
    lo, hi = lo[:nn], hi[:nn]
    nodes_self = jnp.concatenate([lo, hi, jnp.zeros((nn, 2))], axis=1).astype(jnp.float32)
    # child-box rows for the packet kernel
    lsafe = jnp.maximum(left, 0)
    rsafe = jnp.maximum(right, 0)
    nodes_f = jnp.concatenate(
        [lo[lsafe], hi[lsafe], lo[rsafe], hi[rsafe], jnp.zeros((nn, 4))], axis=1
    ).astype(jnp.float32)
    # BVH4 mirror: child boxes regathered from the binary self boxes; empty
    # slots (map4 == -1) keep their inverted never-hit boxes
    map4 = jnp.asarray(wb.map4)
    old4 = jnp.asarray(wb.nodes4_f)
    parts = []
    for slot in range(4):
        src = map4[:, slot]
        safe_src = jnp.maximum(src, 0)
        box = jnp.concatenate([lo[safe_src], hi[safe_src]], axis=1)
        box = jnp.where((src >= 0)[:, None], box, old4[:, 6 * slot : 6 * slot + 6])
        parts.append(box)
    nodes4_f = jnp.concatenate(parts + [old4[:, 24:]], axis=1).astype(jnp.float32)

    # v2 fused rows: boxes are columns 0:12; codes/axis (12:16) are topology
    old_fi = jnp.asarray(wb.nodes_fi)
    nodes_fi = jnp.concatenate([nodes_f[:, 0:12], old_fi[:, 12:16]], axis=1).astype(jnp.float32)
    # v3 fused BVH4 rows: boxes 0:24, codes/axes (24:32) are topology.
    # Missing-child slots (code 0 — the root is never a child) must keep
    # the always-miss POINT box (+3e38), not whatever the refit produced:
    # the v3 slab treats inverted boxes as guaranteed hits.
    old_fi4 = jnp.asarray(wb.nodes4_fi)
    boxes4 = nodes4_f[:, 0:24]
    miss4 = jnp.repeat(old_fi4[:, 24:28] == 0, 6, axis=1)
    boxes4 = jnp.where(miss4, jnp.float32(3e38), boxes4)
    nodes4_fi = jnp.concatenate([boxes4, old_fi4[:, 24:32]], axis=1).astype(jnp.float32)
    # v6 dense BVH16 rows: 16 child boxes (cols 0:96) regathered from the
    # binary self boxes via map16; codes/axes (96:128) are topology.
    # Missing slots (map16 == -1) keep their always-miss POINT boxes.
    map16 = jnp.asarray(wb.map16)
    old16 = jnp.asarray(wb.nodes16_fi)
    parts16 = []
    for slot in range(16):
        src = map16[:, slot]
        safe_src = jnp.maximum(src, 0)
        box = jnp.concatenate([lo[safe_src], hi[safe_src]], axis=1)
        box = jnp.where((src >= 0)[:, None], box, jnp.float32(3e38))
        parts16.append(box)
    nodes16_fi = jnp.concatenate(parts16 + [old16[:, 96:128]], axis=1).astype(jnp.float32)
    # leaf tri blocks regathered from the refit triangles
    t8s = jnp.asarray(wb.tri8_src)
    Lrows = t8s.shape[0] // 8
    blk = new_tris[jnp.maximum(t8s, 0), 0:16]
    blk = jnp.where((t8s >= 0)[:, None], blk, 0.0)
    # slots 9.. are static metadata (per-tri rnode/tri ids), not geometry
    old128 = jnp.asarray(wb.tris128).reshape(Lrows * 8, 16)
    blk = jnp.concatenate([blk[:, 0:9], old128[:, 9:16]], axis=1)
    tris128 = blk.reshape(Lrows, 128).astype(jnp.float32)
    # lane-traversal page values (topology static, geometry regathered)
    from .lane_traverse import refit_lane_pages

    lane_pages = refit_lane_pages(
        jnp.asarray(wb.lane_pages), jnp.asarray(wb.lane_geo_idx), nodes_self, new_tris
    )
    return nodes_f, nodes_self, nodes4_f, new_tris, nodes_fi, tris128, lane_pages, nodes4_fi, nodes16_fi


def bake_world_tris(vtx_pos, tri_idx, rn_o2w, wtri_rnode, wtri_tri, wtri_bary=None):
    """Recompute world-space triangle vertices (the animation rebake):
    vtx_pos may be post-skin/morph; rn_o2w may have moved.

    wtri_tri must be the bake SOURCE tri ids (WorldBvh.wtri_src_tri when
    subtriangle OMM rows exist); wtri_bary [T',6] recombines the parent
    corners at each row's barycentric corners (identity rows pass through
    exactly)."""
    idx = tri_idx[wtri_tri]  # [T',3]
    m = rn_o2w[wtri_rnode]  # [T',4,4]

    def xf(p):
        return (
            m[:, :3, 0] * p[:, 0:1] + m[:, :3, 1] * p[:, 1:2] + m[:, :3, 2] * p[:, 2:3] + m[:, :3, 3]
        )

    p0 = vtx_pos[idx[:, 0]]
    p1 = vtx_pos[idx[:, 1]]
    p2 = vtx_pos[idx[:, 2]]
    if wtri_bary is not None:
        def comb(bu, bv):
            return (p0 * (1.0 - bu - bv)[:, None] + p1 * bu[:, None]
                    + p2 * bv[:, None])

        p0, p1, p2 = (comb(wtri_bary[:, 0], wtri_bary[:, 1]),
                      comb(wtri_bary[:, 2], wtri_bary[:, 3]),
                      comb(wtri_bary[:, 4], wtri_bary[:, 5]))
    w0 = xf(p0)
    w1 = xf(p1)
    w2 = xf(p2)
    pad = jnp.zeros((w0.shape[0], 7), vtx_pos.dtype)
    return jnp.concatenate([w0, w1, w2, pad], axis=1).astype(jnp.float32)

"""Stackless wavefront BVH traversal in pure XLA — the incoherent-ray path.

Complement to the Pallas packet kernel (ops/pallas_traverse.py): packets
excel on coherent primary/shadow rays but collapse when a packet's rays
want disjoint subtrees (diffuse bounces). This module instead runs ONE
traversal step for ALL rays as dense array ops — two row-gathers (current
node + its parent) and branch-free state updates per step. XLA keeps the
node tables in VMEM, where vector gathers are fast, and there is no vmap,
no lax.cond, and no per-lane stack.

Algorithm: stackless come-from traversal (Hapala et al. 2011, "Efficient
Stack-less Hierarchy Traversal"): per-ray state = (current node, came-from
in {PARENT, SIBLING, CHILD}). Near/far child per ray = sign of the ray
direction along the node's split axis (bvh_flatten orders children so LEFT
is the smaller-centroid child on that axis). Each node is visited at most
twice; no stack memory or scatter ops at all.

This is the TPU answer to the reference's reliance on per-thread HW
traversal stacks (raytracer_interface.h.slang) — replace thread-local
control flow with lockstep masked iteration, which is exactly what the
VPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bvh_flatten import LEAF_SIZE

INFINITE = jnp.float32(1e32)

FROM_PARENT = 0
FROM_SIBLING = 1
FROM_CHILD = 2
DONE = 3


def _gather_node(nodes_self, nodes_i, idx):
    f = nodes_self[idx]  # [N,8] own AABB
    m = nodes_i[idx]  # [N,8] left,right,first,count,parent,axis
    return f, m


@functools.partial(jax.jit, static_argnames=("max_steps",))
def traverse_wavefront(nodes_self, nodes_i, tris, ro, rd, tmin, tmax, max_steps=16384):
    """Closest hit for [N] rays against the flattened world BVH.

    Returns (t, wtri, u, v): wtri = world-triangle id, -1 on miss.
    """
    n = ro.shape[0]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]

    def sinv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = sinv(rdx), sinv(rdy), sinv(rdz)
    # per-ray direction sign per axis: True -> left child is NEAR
    dir_pos = jnp.stack([rdx >= 0, rdy >= 0, rdz >= 0], axis=-1)  # [N,3]

    cur = jnp.zeros(n, jnp.int32)  # root
    st = jnp.full(n, FROM_PARENT, jnp.int32)
    t_best = tmax
    tri_best = jnp.full(n, -1, jnp.int32)
    u_best = jnp.zeros(n)
    v_best = jnp.zeros(n)

    def aabb_hit(f, t_cur):
        t0x = (f[:, 0] - rox) * ix
        t1x = (f[:, 3] - rox) * ix
        t0y = (f[:, 1] - roy) * iy
        t1y = (f[:, 4] - roy) * iy
        t0z = (f[:, 2] - roz) * iz
        t1z = (f[:, 5] - roz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), t_cur),
        )
        return tnear <= tfar

    def tri_hit(tv, t_cur):
        e1 = tv[:, 3:6] - tv[:, 0:3]
        e2 = tv[:, 6:9] - tv[:, 0:3]
        px = rdy * e2[:, 2] - rdz * e2[:, 1]
        py = rdz * e2[:, 0] - rdx * e2[:, 2]
        pz = rdx * e2[:, 1] - rdy * e2[:, 0]
        det = e1[:, 0] * px + e1[:, 1] * py + e1[:, 2] * pz
        ok = jnp.abs(det) >= 1e-12
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = rox - tv[:, 0], roy - tv[:, 1], roz - tv[:, 2]
        uu = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[:, 2] - tz * e1[:, 1]
        qy = tz * e1[:, 0] - tx * e1[:, 2]
        qz = tx * e1[:, 1] - ty * e1[:, 0]
        vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (e2[:, 0] * qx + e2[:, 1] * qy + e2[:, 2] * qz) * inv_det
        hit = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_cur)
        return hit, tt, uu, vv

    def near_of(meta):
        """Per-ray near child of the gathered node rows."""
        axis = meta[:, 5]
        pos = jnp.take_along_axis(dir_pos, axis[:, None], axis=1)[:, 0]
        return jnp.where(pos, meta[:, 0], meta[:, 1]), jnp.where(pos, meta[:, 1], meta[:, 0])

    def body(state):
        cur, st, t_best, tri_best, u_best, v_best, step = state
        f, meta = _gather_node(nodes_self, nodes_i, cur)
        count = meta[:, 3]
        leaf = count > 0
        parent = meta[:, 4]
        _, pmeta = _gather_node(nodes_self, nodes_i, jnp.maximum(parent, 0))
        p_near, p_far = near_of(pmeta)
        c_near, c_far = near_of(meta)

        testing = (st == FROM_PARENT) | (st == FROM_SIBLING)

        # ---- test current node (AABB), leaf triangle tests (<= LEAF_SIZE)
        hit = aabb_hit(f, t_best) & testing
        do_tri = hit & leaf
        first = meta[:, 2]
        for c in range(LEAF_SIZE):  # tris padded at build
            row = first + c
            tv = tris[row]
            thit, tt, uu, vv = tri_hit(tv, t_best)
            thit = thit & do_tri & (c < count)
            t_best = jnp.where(thit, tt, t_best)
            tri_best = jnp.where(thit, row, tri_best)
            u_best = jnp.where(thit, uu, u_best)
            v_best = jnp.where(thit, vv, v_best)

        # ---- transitions
        descend = hit & ~leaf
        finished_here = testing & (~hit | leaf)  # advance past this subtree

        at_root = cur == 0
        # advance rules:
        #   FROM_PARENT  (cur is near child of parent, or root) -> far sibling
        #   FROM_SIBLING (cur is far child)                     -> parent, FROM_CHILD
        adv_to_sibling = finished_here & (st == FROM_PARENT) & ~at_root
        adv_to_parent = finished_here & (st == FROM_SIBLING)
        adv_done = finished_here & (st == FROM_PARENT) & at_root

        # FROM_CHILD handling (no test): climb or cross to far sibling
        from_child = st == FROM_CHILD
        was_near = from_child & (cur == p_near)
        fc_to_sibling = was_near
        fc_to_parent = from_child & ~was_near & ~at_root
        fc_done = from_child & at_root

        new_cur = cur
        new_st = st
        new_cur = jnp.where(descend, c_near, new_cur)
        new_st = jnp.where(descend, FROM_PARENT, new_st)
        new_cur = jnp.where(adv_to_sibling | fc_to_sibling, p_far, new_cur)
        new_st = jnp.where(adv_to_sibling | fc_to_sibling, FROM_SIBLING, new_st)
        new_cur = jnp.where(adv_to_parent | fc_to_parent, parent, new_cur)
        new_st = jnp.where(adv_to_parent | fc_to_parent, FROM_CHILD, new_st)
        new_st = jnp.where(adv_done | fc_done, DONE, new_st)
        keep = st == DONE
        new_cur = jnp.where(keep, cur, new_cur)
        new_st = jnp.where(keep, st, new_st)

        return new_cur, new_st, t_best, tri_best, u_best, v_best, step + 1

    def cond(state):
        st = state[1]
        return (state[6] < max_steps) & jnp.any(st != DONE)

    state = (cur, st, t_best, tri_best, u_best, v_best, jnp.int32(0))
    _, _, t_best, tri_best, u_best, v_best, _ = jax.lax.while_loop(cond, body, state)
    return t_best, tri_best, u_best, v_best


def intersect_rays_wavefront(wb, ro, rd, tmin=0.0, tmax=None):
    """intersect_rays-compatible API (dict with t, rnode, tri, u, v)."""
    n = ro.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INFINITE)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax)
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    t, wtri, u, v = traverse_wavefront(wb.nodes_self, wb.nodes_i, wb.tris, ro, rd, tmin_a, tmax)
    valid = wtri >= 0
    safe = jnp.maximum(wtri, 0)
    return {
        "t": jnp.where(valid, t, INFINITE),
        "rnode": jnp.where(valid, wb.wtri_rnode[safe], -1),
        "tri": jnp.where(valid, wb.wtri_tri[safe], -1),
        "u": u,
        "v": v,
    }

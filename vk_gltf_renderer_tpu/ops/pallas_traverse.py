"""Pallas TPU packet-BVH traversal — the hot kernel of the framework.

Replaces the Vulkan RT hardware the reference leans on (TraceRay /
RayQuery, raytracer_interface.h.slang). TPU has no per-lane pointer
chasing, so per-ray stacks are out; instead this kernel uses *packet
traversal* (Wald et al. 2001), re-architected for the TPU execution model:

  * one shared traversal stack per ray PACKET, driven by the scalar core
    (SMEM scratch + scalar dynamic slices of the node table — the only
    random-access pattern TPU supports natively);
  * every visited node is broadcast to all W lanes; AABB and
    Möller-Trumbore tests are full-width (8x128) VPU ops;
  * children are pushed if ANY live lane intersects them (vector -> scalar
    reduction), near-child-first by majority vote over lane tnear.

The BVH is the *flattened world-space* single-level structure
(ops/bvh_flatten.py): instance transforms are baked into triangle vertices
at build time, so the kernel needs no per-instance matrix fetch and no
nested TLAS/BLAS loop. The two-level structure (ops/bvh.py) remains the
semantic contract + refit source; flattening is a device-layout decision.

Node/tri tables live in VMEM for the whole kernel, capping scene size at
roughly VMEM/112B per triangle (~120k world triangles). Larger scenes fall
back to the XLA traversal; treelet streaming is future work.

Packet coherence: primary and shadow packets are naturally coherent;
bounce packets degrade toward union-of-nodes. The path tracer sorts bounce
rays (octant + Morton) to recover coherence — the TPU analog of the
reference's SER ReorderThread (raytracer_interface.h.slang:199-222).

Layout notes (Mosaic constraints): all per-lane math is on (8, 128) f32
tiles; rays arrive pre-packed as [grid, 4, 8, 128] (component-major) so the
kernel never reshapes; node/tri rows are fetched as [1, k] 2D dynamic
slices with scalar element reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh_flatten import LEAF_SIZE

INFINITE = jnp.float32(1e32)
SUB, LANE = 8, 128
PACKET = SUB * LANE  # base packet: 1024 rays (bounce rays)
PACKET_BIG_TILES = 8  # coherent rays: 8 tiles (8192 rays) share one stack
STACK = 128


def _make_kernel(anyhit: bool):
    def kernel(nodes_f_ref, nodes_i_ref, tris_ref, ro_ref, rd_ref, out_ref, stack_ref):
        return _traverse_body(nodes_f_ref, nodes_i_ref, tris_ref, ro_ref, rd_ref, out_ref, stack_ref, anyhit)

    return kernel


def _traverse_body(nodes_f_ref, nodes_i_ref, tris_ref, ro_ref, rd_ref, out_ref, stack_ref, anyhit=False):
    """One packet vs the whole VMEM-resident BVH.

    nodes_f: [Nn, 16] f32 (l_lo, l_hi, r_lo, r_hi, pad) — child AABB pairs
    nodes_i: [Nn, 8]  i32 (left, right, first, count, parent, axis, 0, 0)
                      count > 0 -> leaf over tris rows [first, first+count)
    tris:    [T+4, 16] f32 (v0.xyz, v1.xyz, v2.xyz, pad...) BVH order
    ro:      [1, 4, 8, 128] f32 (x, y, z, tmax) per lane
    rd:      [1, 4, 8, 128] f32 (x, y, z, tmin)
    out:     [1, 4, 8, 128] f32 (t, tri(as f32), u, v)
    stack:   SMEM (STACK,) i32 scratch
    """
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    tmax = ro_ref[0, 3]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    sub = rox.shape[0]  # 8 per tile; multi-tile packets share ONE stack

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    t0_ = tmax
    tri0 = jnp.full((sub, LANE), -1.0)
    u0 = jnp.zeros((sub, LANE))
    v0 = jnp.zeros((sub, LANE))

    # packet-majority direction signs (computed once): drives near-child
    # ordering by the node's split axis — no per-step reduction needed
    sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
    sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
    sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0

    stack_ref[0] = 0  # root is node 0

    def aabb_pair(f, t_cur):
        """Both child slab tests from one fetched [1,16] row."""

        def one(o):
            t0x = (f[0, o + 0] - rox) * ix
            t1x = (f[0, o + 3] - rox) * ix
            t0y = (f[0, o + 1] - roy) * iy
            t1y = (f[0, o + 4] - roy) * iy
            t0z = (f[0, o + 2] - roz) * iz
            t1z = (f[0, o + 5] - roz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), t_cur),
            )
            return tnear <= tfar, tnear

        hit_l, tn_l = one(0)
        hit_r, tn_r = one(6)
        return hit_l, tn_l, hit_r, tn_r

    def tri_test(row, t_best, tri_best, u_best, v_best, valid):
        tv = tris_ref[pl.ds(row, 1), :]  # [1, 16]
        v0x, v0y, v0z = tv[0, 0], tv[0, 1], tv[0, 2]
        e1x, e1y, e1z = tv[0, 3] - v0x, tv[0, 4] - v0y, tv[0, 5] - v0z
        e2x, e2y, e2z = tv[0, 6] - v0x, tv[0, 7] - v0y, tv[0, 8] - v0z
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = valid & (jnp.abs(det) >= 1e-12)
        inv_det = 1.0 / jnp.where(jnp.abs(det) >= 1e-12, det, 1.0)
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_best)
        t_best = jnp.where(hit, tt, t_best)
        tri_best = jnp.where(hit, row.astype(jnp.float32), tri_best)
        u_best = jnp.where(hit, uu, u_best)
        v_best = jnp.where(hit, vv, v_best)
        return t_best, tri_best, u_best, v_best

    def process(node, en, sp, t_best, tri_best, u_best, v_best):
        """Visit one node; all effects gated on scalar `en` (enabled).
        Disabled visits read valid-but-stale ids and mask every write:
        tri tests get valid=False, pushes write to stack[sp] (a free slot
        when en is False, since sp is then the true top) and don't bump sp."""
        meta = nodes_i_ref[pl.ds(node, 1), :]  # [1, 8]
        first = meta[0, 2]
        count = meta[0, 3]
        is_leaf = count > 0

        def leaf(sp, t_best, tri_best, u_best, v_best):
            for c in range(LEAF_SIZE):  # tris table is padded
                t_best, tri_best, u_best, v_best = tri_test(
                    first + c, t_best, tri_best, u_best, v_best, (c < count) & en
                )
            return sp, t_best, tri_best, u_best, v_best

        def internal(sp, t_best, tri_best, u_best, v_best):
            f = nodes_f_ref[pl.ds(node, 1), :]  # [1, 16] both child boxes
            hit_l, tn_l, hit_r, tn_r = aabb_pair(f, t_best)
            l = meta[0, 0]
            r = meta[0, 1]
            # ONE reduction for both any() flags (reductions to scalar are
            # expensive; lanes <= 16*1024 so 65536-weighted packing stays
            # inside int32 — MAX_TILES guards this)
            packed = jnp.sum(hit_l.astype(jnp.int32) * 65536 + hit_r.astype(jnp.int32))
            any_l = (packed >= 65536) & en
            any_r = ((packed & 65535) > 0) & en
            # near-child by majority direction sign vs split axis (children
            # are spatially ordered at build: LEFT = smaller centroid)
            axis = meta[0, 5]
            sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            l_nearer = sign
            first_c = jnp.where(l_nearer, l, r)
            second = jnp.where(l_nearer, r, l)
            any_first = jnp.where(l_nearer, any_l, any_r)
            any_second = jnp.where(l_nearer, any_r, any_l)
            stack_ref[sp] = second
            sp = sp + jnp.where(any_second, 1, 0)
            stack_ref[sp] = first_c
            sp = sp + jnp.where(any_first, 1, 0)
            return sp, t_best, tri_best, u_best, v_best

        return jax.lax.cond(is_leaf, leaf, internal, sp, t_best, tri_best, u_best, v_best)

    def body(state):
        # NOTE: a 2-pops-per-iteration unroll (masked second visit) was
        # measured at parity (329 vs 327 ms/frame) — Mosaic does not overlap
        # scalar latency across the leaf/internal cond — so this stays the
        # simple single-pop form.
        sp, t_best, tri_best, u_best, v_best = state
        sp = sp - 1
        node = stack_ref[sp]
        return process(node, True, sp, t_best, tri_best, u_best, v_best)

    state = (jnp.int32(1), t0_, tri0, u0, v0)
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(lambda s: s[0] > 0, body, state)

    out_ref[0, 0] = t_best
    out_ref[0, 1] = tri_best  # triangle id exact in f32 (< 2^24)
    out_ref[0, 2] = u_best
    out_ref[0, 3] = v_best


def _traverse4_body(nodes4_f_ref, nodes4_i_ref, tris_ref, ro_ref, rd_ref, out_ref, stack_ref):
    """BVH4 packet traversal: one pop fetches 4 child boxes ([1,32] row).

    Vector work per tree progress matches the binary kernel (4 box tests
    either way) while the scalar work — pops, fetches, conds, the measured
    bottleneck (~0.35us/visit vs ~40 VPU cycles) — is roughly halved.
    Stack entries are sign-encoded: id >= 0 is a BVH4 internal node; id < 0
    is a leaf, code = -id-1 = first*16 + count (bvh_flatten.build_bvh4).
    Missing children carry inverted AABBs, so they never hit and are never
    pushed.
    """
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    tmax = ro_ref[0, 3]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    sub = rox.shape[0]

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
    sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
    sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0

    def sign_of(axis):
        return jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

    stack_ref[0] = 0  # root

    def slab(f, o, t_cur):
        t0x = (f[0, o + 0] - rox) * ix
        t1x = (f[0, o + 3] - rox) * ix
        t0y = (f[0, o + 1] - roy) * iy
        t1y = (f[0, o + 4] - roy) * iy
        t0z = (f[0, o + 2] - roz) * iz
        t1z = (f[0, o + 5] - roz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), t_cur),
        )
        return tnear <= tfar

    def tri_test(row, t_best, tri_best, u_best, v_best, valid):
        tv = tris_ref[pl.ds(row, 1), :]
        v0x, v0y, v0z = tv[0, 0], tv[0, 1], tv[0, 2]
        e1x, e1y, e1z = tv[0, 3] - v0x, tv[0, 4] - v0y, tv[0, 5] - v0z
        e2x, e2y, e2z = tv[0, 6] - v0x, tv[0, 7] - v0y, tv[0, 8] - v0z
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = valid & (jnp.abs(det) >= 1e-12)
        inv_det = 1.0 / jnp.where(jnp.abs(det) >= 1e-12, det, 1.0)
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_best)
        t_best = jnp.where(hit, tt, t_best)
        tri_best = jnp.where(hit, row.astype(jnp.float32), tri_best)
        u_best = jnp.where(hit, uu, u_best)
        v_best = jnp.where(hit, vv, v_best)
        return t_best, tri_best, u_best, v_best

    def body(state):
        sp, t_best, tri_best, u_best, v_best = state
        sp = sp - 1
        node = stack_ref[sp]
        is_leaf = node < 0

        def leaf(sp, t_best, tri_best, u_best, v_best):
            code = -node - 1
            first = code // 16
            count = code - first * 16
            for c in range(LEAF_SIZE):
                t_best, tri_best, u_best, v_best = tri_test(
                    first + c, t_best, tri_best, u_best, v_best, c < count
                )
            return sp, t_best, tri_best, u_best, v_best

        def internal(sp, t_best, tri_best, u_best, v_best):
            f = nodes4_f_ref[pl.ds(node, 1), :]  # [1, 32] all 4 child boxes
            meta = nodes4_i_ref[pl.ds(node, 1), :]
            h0 = slab(f, 0, t_best)
            h1 = slab(f, 6, t_best)
            h2 = slab(f, 12, t_best)
            h3 = slab(f, 18, t_best)
            p01 = jnp.sum(h0.astype(jnp.int32) * 65536 + h1.astype(jnp.int32))
            p23 = jnp.sum(h2.astype(jnp.int32) * 65536 + h3.astype(jnp.int32))
            a0 = p01 >= 65536
            a1 = (p01 & 65535) > 0
            a2 = p23 >= 65536
            a3 = (p23 & 65535) > 0
            c0, c1, c2, c3 = meta[0, 0], meta[0, 1], meta[0, 2], meta[0, 3]
            s0 = sign_of(meta[0, 4])  # True: left pair (slots 0,1) is nearer
            s1 = sign_of(meta[0, 5])  # True: slot 0 nearer within left pair
            s2 = sign_of(meta[0, 6])

            ln_id = jnp.where(s1, c0, c1)
            lf_id = jnp.where(s1, c1, c0)
            ln_a = jnp.where(s1, a0, a1)
            lf_a = jnp.where(s1, a1, a0)
            rn_id = jnp.where(s2, c2, c3)
            rf_id = jnp.where(s2, c3, c2)
            rn_a = jnp.where(s2, a2, a3)
            rf_a = jnp.where(s2, a3, a2)

            # push order far pair first (far.far, far.near, near.far, near.near)
            p1_id = jnp.where(s0, rf_id, lf_id)
            p1_a = jnp.where(s0, rf_a, lf_a)
            p2_id = jnp.where(s0, rn_id, ln_id)
            p2_a = jnp.where(s0, rn_a, ln_a)
            p3_id = jnp.where(s0, lf_id, rf_id)
            p3_a = jnp.where(s0, lf_a, rf_a)
            p4_id = jnp.where(s0, ln_id, rn_id)
            p4_a = jnp.where(s0, ln_a, rn_a)

            for pid, pa in ((p1_id, p1_a), (p2_id, p2_a), (p3_id, p3_a), (p4_id, p4_a)):
                stack_ref[sp] = pid
                sp = sp + jnp.where(pa, 1, 0)
            return sp, t_best, tri_best, u_best, v_best

        return jax.lax.cond(is_leaf, leaf, internal, sp, t_best, tri_best, u_best, v_best)

    state = (jnp.int32(1), tmax, jnp.full((sub, LANE), -1.0), jnp.zeros((sub, LANE)), jnp.zeros((sub, LANE)))
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(lambda s: s[0] > 0, body, state)

    out_ref[0, 0] = t_best
    out_ref[0, 1] = tri_best
    out_ref[0, 2] = u_best
    out_ref[0, 3] = v_best


def _traverse2_body(nodes_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref, stack_ref, root_code=0, anyhit=False):
    """v2 packet traversal: fused node rows + leaf-block tri rows.

    Per INTERNAL visit: ONE [1,16] fetch (both child boxes + child codes +
    axis), two slab tests, one packed any() reduction, two pushes. Per LEAF
    visit: ONE [1,128] fetch (8 triangles with ALL their vertices), zero
    node-table fetches — the leaf is sign-encoded in the stack entry
    (e < 0, -(e+1) = leafrow*16 + count).

    anyhit: an accepted triangle hit poisons the lane with t_best = -1 so
    every subsequent box test fails (tfar <= t_cur < 0 <= tnear) — occluded
    lanes stop generating work and the stack drains, WITHOUT any extra
    per-visit reduction. Callers read occlusion from tri >= 0 (t is the
    sentinel, not a distance). Reference anchor: the RTX any-hit
    early-accept path, raytracer_interface.h.slang:149-187.
    """
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    tmax = ro_ref[0, 3]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    sub = rox.shape[0]

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
    sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
    sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0

    stack_ref[0] = root_code

    def tri_tests(row, t_best, rn_best, tri_best, u_best, v_best, count):
        tv = tris128_ref[pl.ds(row, 1), :]  # [1,128] = 8 tris
        for c in range(LEAF_SIZE):
            o = c * 16
            v0x, v0y, v0z = tv[0, o + 0], tv[0, o + 1], tv[0, o + 2]
            e1x, e1y, e1z = tv[0, o + 3] - v0x, tv[0, o + 4] - v0y, tv[0, o + 5] - v0z
            e2x, e2y, e2z = tv[0, o + 6] - v0x, tv[0, o + 7] - v0y, tv[0, o + 8] - v0z
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = (c < count) & (jnp.abs(det) >= 1e-12)
            inv_det = 1.0 / jnp.where(jnp.abs(det) >= 1e-12, det, 1.0)
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_best)
            t_best = jnp.where(hit, jnp.float32(-1.0) if anyhit else tt, t_best)
            rn_best = jnp.where(hit, tv[0, o + 9], rn_best)
            tri_best = jnp.where(hit, tv[0, o + 10], tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)
        return t_best, rn_best, tri_best, u_best, v_best

    def body(state):
        sp, t_best, rn_best, tri_best, u_best, v_best = state
        sp = sp - 1
        e = stack_ref[sp]

        def leaf(sp, t_best, rn_best, tri_best, u_best, v_best):
            code = -e - 1
            row = code // 16
            cnt = code - row * 16
            t_best, rn_best, tri_best, u_best, v_best = tri_tests(
                row, t_best, rn_best, tri_best, u_best, v_best, cnt
            )
            return sp, t_best, rn_best, tri_best, u_best, v_best

        def internal(sp, t_best, rn_best, tri_best, u_best, v_best):
            f = nodes_fi_ref[pl.ds(e, 1), :]  # [1,16]

            def one(o):
                t0x = (f[0, o + 0] - rox) * ix
                t1x = (f[0, o + 3] - rox) * ix
                t0y = (f[0, o + 1] - roy) * iy
                t1y = (f[0, o + 4] - roy) * iy
                t0z = (f[0, o + 2] - roz) * iz
                t1z = (f[0, o + 5] - roz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), t_best),
                )
                return tnear <= tfar

            hit_l = one(0)
            hit_r = one(6)
            # Single packed reduction for both any() flags. Lane count caps
            # tiles at MAX_TILES=16: 16*1024 lanes * 65536 = 2^30 stays
            # inside int32; wider packets would overflow and corrupt the
            # any() bits (observed as dropped hits at tiles=32).
            packed = jnp.sum(hit_l.astype(jnp.int32) * 65536 + hit_r.astype(jnp.int32))
            any_l = packed >= 65536
            any_r = (packed & 65535) > 0
            code_l = f[0, 12].astype(jnp.int32)
            code_r = f[0, 13].astype(jnp.int32)
            axis = f[0, 14].astype(jnp.int32)
            sign = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            first_c = jnp.where(sign, code_l, code_r)
            second = jnp.where(sign, code_r, code_l)
            any_first = jnp.where(sign, any_l, any_r)
            any_second = jnp.where(sign, any_r, any_l)
            stack_ref[sp] = second
            sp = sp + jnp.where(any_second, 1, 0)
            stack_ref[sp] = first_c
            sp = sp + jnp.where(any_first, 1, 0)
            return sp, t_best, rn_best, tri_best, u_best, v_best

        return jax.lax.cond(e < 0, leaf, internal, sp, t_best, rn_best, tri_best, u_best, v_best)

    state = (
        jnp.int32(1),
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    _, t_best, rn_best, tri_best, u_best, v_best = jax.lax.while_loop(
        lambda s: s[0] > 0, body, state
    )

    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best  # render-node id (from tris128 slot 9), f32
    out_ref[0, 2] = tri_best  # global tri id (slot 10), f32
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best


def _traverse3_body(nodes4_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref, stack_ref, root_code=0, anyhit=False):
    """v3 packet traversal: fused BVH4 rows + v2 leaf blocks.

    Per INTERNAL visit ONE [1,32] fetch carries 4 child AABBs, 4 child
    codes and 3 near-order axes (bvh_flatten._packet3_tables) — per unit of
    tree progress the vector work matches v2 (4 box tests either way) while
    the scalar work (pops, fetches, conds, packed reductions — the measured
    bottleneck at ~0.35us/visit) is roughly halved. Leaf visits and the
    anyhit poisoning are identical to _traverse2_body (tris128 blocks,
    sign-encoded stack entries)."""
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    tmax = ro_ref[0, 3]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    sub = rox.shape[0]

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
    sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
    sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0

    def sign_of(axis):
        return jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

    stack_ref[0] = root_code

    def tri_tests(row, t_best, rn_best, tri_best, u_best, v_best, count):
        tv = tris128_ref[pl.ds(row, 1), :]  # [1,128] = 8 tris
        for c in range(LEAF_SIZE):
            o = c * 16
            v0x, v0y, v0z = tv[0, o + 0], tv[0, o + 1], tv[0, o + 2]
            e1x, e1y, e1z = tv[0, o + 3] - v0x, tv[0, o + 4] - v0y, tv[0, o + 5] - v0z
            e2x, e2y, e2z = tv[0, o + 6] - v0x, tv[0, o + 7] - v0y, tv[0, o + 8] - v0z
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = (c < count) & (jnp.abs(det) >= 1e-12)
            inv_det = 1.0 / jnp.where(jnp.abs(det) >= 1e-12, det, 1.0)
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_best)
            t_best = jnp.where(hit, jnp.float32(-1.0) if anyhit else tt, t_best)
            rn_best = jnp.where(hit, tv[0, o + 9], rn_best)
            tri_best = jnp.where(hit, tv[0, o + 10], tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)
        return t_best, rn_best, tri_best, u_best, v_best

    def body(state):
        sp, t_best, rn_best, tri_best, u_best, v_best = state
        sp = sp - 1
        e = stack_ref[sp]

        def leaf(sp, t_best, rn_best, tri_best, u_best, v_best):
            code = -e - 1
            row = code // 16
            cnt = code - row * 16
            t_best, rn_best, tri_best, u_best, v_best = tri_tests(
                row, t_best, rn_best, tri_best, u_best, v_best, cnt
            )
            return sp, t_best, rn_best, tri_best, u_best, v_best

        def internal(sp, t_best, rn_best, tri_best, u_best, v_best):
            f = nodes4_fi_ref[pl.ds(e, 1), :]  # [1,32]

            def slab(o):
                t0x = (f[0, o + 0] - rox) * ix
                t1x = (f[0, o + 3] - rox) * ix
                t0y = (f[0, o + 1] - roy) * iy
                t1y = (f[0, o + 4] - roy) * iy
                t0z = (f[0, o + 2] - roz) * iz
                t1z = (f[0, o + 5] - roz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), t_best),
                )
                return tnear <= tfar

            h0 = slab(0)
            h1 = slab(6)
            h2 = slab(12)
            h3 = slab(18)
            p01 = jnp.sum(h0.astype(jnp.int32) * 65536 + h1.astype(jnp.int32))
            p23 = jnp.sum(h2.astype(jnp.int32) * 65536 + h3.astype(jnp.int32))
            a0 = p01 >= 65536
            a1 = (p01 & 65535) > 0
            a2 = p23 >= 65536
            a3 = (p23 & 65535) > 0
            c0 = f[0, 24].astype(jnp.int32)
            c1 = f[0, 25].astype(jnp.int32)
            c2 = f[0, 26].astype(jnp.int32)
            c3 = f[0, 27].astype(jnp.int32)
            s0 = sign_of(f[0, 28].astype(jnp.int32))  # left pair nearer?
            s1 = sign_of(f[0, 29].astype(jnp.int32))  # slot0 nearer in left pair
            s2 = sign_of(f[0, 30].astype(jnp.int32))

            ln_id = jnp.where(s1, c0, c1)
            lf_id = jnp.where(s1, c1, c0)
            ln_a = jnp.where(s1, a0, a1)
            lf_a = jnp.where(s1, a1, a0)
            rn_id = jnp.where(s2, c2, c3)
            rf_id = jnp.where(s2, c3, c2)
            rn_a = jnp.where(s2, a2, a3)
            rf_a = jnp.where(s2, a3, a2)

            p1_id = jnp.where(s0, rf_id, lf_id)
            p1_a = jnp.where(s0, rf_a, lf_a)
            p2_id = jnp.where(s0, rn_id, ln_id)
            p2_a = jnp.where(s0, rn_a, ln_a)
            p3_id = jnp.where(s0, lf_id, rf_id)
            p3_a = jnp.where(s0, lf_a, rf_a)
            p4_id = jnp.where(s0, ln_id, rn_id)
            p4_a = jnp.where(s0, ln_a, rn_a)

            for pid, pa in ((p1_id, p1_a), (p2_id, p2_a), (p3_id, p3_a), (p4_id, p4_a)):
                stack_ref[sp] = pid
                sp = sp + jnp.where(pa, 1, 0)
            return sp, t_best, rn_best, tri_best, u_best, v_best

        return jax.lax.cond(e < 0, leaf, internal, sp, t_best, rn_best, tri_best, u_best, v_best)

    state = (
        jnp.int32(1),
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    _, t_best, rn_best, tri_best, u_best, v_best = jax.lax.while_loop(
        lambda s: s[0] > 0, body, state
    )

    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best
    out_ref[0, 2] = tri_best
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit", "root_code"))
def traverse_packets3(nodes4_fi, tris128, rays_ro, rays_rd, root_code, interpret=False, tiles=1, anyhit=False):
    """v3 kernel dispatch (BVH4 fused rows); same I/O as traverse_packets2."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_traverse3_body, root_code=root_code, anyhit=anyhit)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes4_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes4_fi, tris128, rays_ro, rays_rd)


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit", "root_code"))
def traverse_packets2(nodes_fi, tris128, rays_ro, rays_rd, root_code, interpret=False, tiles=1, anyhit=False):
    """v2 kernel dispatch; rays packed like traverse_packets. Returns
    [G, 5, tiles*8, 128] (t|sentinel, rnode, tri, u, v) — ids resolved
    IN-KERNEL from tris128 slots 9/10 (post-trace XLA id gathers measured
    ~9 ms per 262k rays — more than the traversal itself)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_traverse2_body, root_code=root_code, anyhit=anyhit)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes_fi, tris128, rays_ro, rays_rd)


def _pack_soa(comps, packet):
    """SoA ray packing: 4 [N] component vectors -> [G, 4, sub, 128] with
    pure reshapes + one concat (NO minor-dim transpose — XLA TPU layout
    changes on [N,4] arrays cost more than the traversal kernel)."""
    n = comps[0].shape[0]
    pad = (-n) % packet
    if pad:
        comps = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)]) for c in comps]
    m = n + pad
    g = m // packet
    sub = packet // LANE
    return jnp.concatenate([c.reshape(g, 1, sub, LANE) for c in comps], axis=1), n


MAX_TILES = 16  # packed-reduction int32 headroom (see _traverse2_body)


def intersect_rays_packet_soa(
    wb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    interpret=False, anyhit=False, tiles=8, kernel="v2",
):
    """SoA-component variant of intersect_rays_packet (v2/v3 kernels):
    takes 8 [N] vectors, returns dict of [N] channels with ids resolved
    in-kernel. The caller is responsible for any coherence ordering."""
    n = rox.shape[0]
    tiles = max(1, min(tiles, max(n // PACKET, 1), MAX_TILES))
    ro_p, _ = _pack_soa([rox, roy, roz, tmax], PACKET * tiles)
    rd_p, _ = _pack_soa([rdx, rdy, rdz, tmin], PACKET * tiles)
    if kernel == "v3":
        out = traverse_packets3(
            wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
            interpret=interpret, tiles=tiles, anyhit=anyhit,
        )
    else:
        out = traverse_packets2(
            wb.nodes_fi, wb.tris128, ro_p, rd_p, wb.root_code,
            interpret=interpret, tiles=tiles, anyhit=anyhit,
        )
    g = out.shape[0]

    def chan(k):
        return out[:, k].reshape(-1)[:n]

    t = chan(0)
    rnode = chan(1).astype(jnp.int32)
    tri = chan(2).astype(jnp.int32)
    valid = tri >= 0
    if anyhit:
        t = jnp.where(valid, 0.0, INFINITE)
    else:
        t = jnp.where(valid, t, INFINITE)
    return {
        "t": t,
        "rnode": jnp.where(valid, rnode, -1),
        "tri": jnp.where(valid, tri, -1),
        "u": chan(3),
        "v": chan(4),
    }


@functools.partial(jax.jit, static_argnames=("interpret", "tiles"))
def traverse_packets4(nodes4_f, nodes4_i, tris, rays_ro, rays_rd, interpret=False, tiles=1):
    """BVH4 variant of traverse_packets; same ray packing + output."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    return pl.pallas_call(
        _traverse4_body,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes4_f.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes4_i.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 4, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes4_f, nodes4_i, tris, rays_ro, rays_rd)


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit"))
def traverse_packets(nodes_f, nodes_i, tris, rays_ro, rays_rd, interpret=False, tiles=1, anyhit=False):
    """rays_ro/rays_rd: [G, 4, tiles*8, 128] packed (x,y,z,tmax|tmin).
    Returns [G, 4, tiles*8, 128] (t, tri, u, v)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    return pl.pallas_call(
        _make_kernel(anyhit),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes_f.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes_i.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 4, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes_f, nodes_i, tris, rays_ro, rays_rd)


def _pack(ro, rd, tmin, tmax, packet):
    n = ro.shape[0]
    pad = (-n) % packet
    ro4 = jnp.concatenate([ro, tmax[:, None]], axis=-1)
    rd4 = jnp.concatenate([rd, tmin[:, None]], axis=-1)
    if pad:
        ro4 = jnp.concatenate([ro4, jnp.zeros((pad, 4))], axis=0)
        rd4 = jnp.concatenate([rd4, jnp.zeros((pad, 4))], axis=0)
    m = ro4.shape[0]
    g = m // packet
    sub = packet // LANE
    ro_p = ro4.reshape(g, sub, LANE, 4).transpose(0, 3, 1, 2)
    rd_p = rd4.reshape(g, sub, LANE, 4).transpose(0, 3, 1, 2)
    return ro_p, rd_p, n


def intersect_rays_packet(wb, ro, rd, tmin=0.0, tmax=None, interpret=False, coherent=False, anyhit=False, max_tiles=None, wide=False, v2=True):
    """intersect_rays-compatible API over the flattened world BVH.

    coherent=True uses bigger packets (many tiles, one shared stack): the
    scalar traversal cost is the kernel bottleneck (measured ~0.35us/node
    visit vs ~40 VPU cycles of vector work), so amortizing one stack over
    more rays wins even for INCOHERENT rays until the packet goes
    VPU-bound (every ray paying every node in the union). Measured on
    262k random-direction rays, v5e: 1024 lanes/stack = 0.98 Mrays/s,
    8192 = 2.2, 65536 = 6.0, 262144 = 8.4. max_tiles overrides the
    packet size (RenderConfig.packet_tiles).
    Returns dict(t, rnode, tri(global per-prim tri id), u, v)."""
    n = ro.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INFINITE)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    cap = max_tiles if max_tiles is not None else PACKET_BIG_TILES
    tiles = max(1, min(cap, n // PACKET, MAX_TILES)) if coherent else 1
    ro_p, rd_p, n0 = _pack(ro, rd, tmin, tmax, PACKET * tiles)
    if wide:
        out = traverse_packets4(wb.nodes4_f, wb.nodes4_i, wb.tris, ro_p, rd_p, interpret=interpret, tiles=tiles)
    elif v2:
        out = traverse_packets2(
            wb.nodes_fi, wb.tris128, ro_p, rd_p, wb.root_code,
            interpret=interpret, tiles=tiles, anyhit=anyhit,
        )
    else:
        out = traverse_packets(wb.nodes_f, wb.nodes_i, wb.tris, ro_p, rd_p, interpret=interpret, tiles=tiles, anyhit=anyhit)
    if v2 and not wide:
        # 5-channel output with ids already resolved in-kernel
        def chan(k):
            return out[:, k].reshape(-1)[:n0]

        t = chan(0)
        rnode = chan(1).astype(jnp.int32)
        tri = chan(2).astype(jnp.int32)
        valid = tri >= 0
        if anyhit:
            # v2 any-hit poisons t with a -1 sentinel; report 0 for occluded
            t = jnp.where(valid, 0.0, INFINITE)
        else:
            t = jnp.where(valid, t, INFINITE)
        return {
            "t": t,
            "rnode": jnp.where(valid, rnode, -1),
            "tri": jnp.where(valid, tri, -1),
            "u": chan(3),
            "v": chan(4),
        }
    flatd = out.transpose(0, 2, 3, 1).reshape(-1, 4)[:n0]
    t = flatd[:, 0]
    wtri = flatd[:, 1].astype(jnp.int32)
    valid = wtri >= 0
    safe = jnp.maximum(wtri, 0)
    rnode = jnp.where(valid, wb.wtri_rnode[safe], -1)
    tri = jnp.where(valid, wb.wtri_tri[safe], -1)
    return {
        "t": jnp.where(valid, t, INFINITE),
        "rnode": rnode,
        "tri": tri,
        "u": flatd[:, 2],
        "v": flatd[:, 3],
    }

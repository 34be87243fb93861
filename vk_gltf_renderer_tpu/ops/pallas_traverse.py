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


def _traverse3_body(nodes4_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref, stack_ref,
                    root_code=0, anyhit=False, entry_ref=None, count_visits=False,
                    sc_ref=None):
    """v3 packet traversal: fused BVH4 rows + v2 leaf blocks.

    Per INTERNAL visit ONE [1,32] fetch carries 4 child AABBs, 4 child
    codes and 3 near-order axes (bvh_flatten._packet3_tables) — per unit of
    tree progress the vector work matches v2 (4 box tests either way) while
    the scalar work (pops, fetches, conds, packed reductions — the measured
    bottleneck at ~0.35us/visit) is roughly halved. Leaf visits and the
    anyhit poisoning are identical to _traverse2_body (tris128 blocks,
    sign-encoded stack entries).

    sc_ref (the v7 variant): optional [M,8] int32 SMEM sidecar carrying
    each node's 4 child codes + 3 near-order axes
    (bvh_flatten._packet3_sidecar) — the visit's 7 scalar reads become
    cheap SMEM loads instead of VMEM->SREG extracts off the fetched row."""
    rox = ro_ref[0, 0]
    roy = ro_ref[0, 1]
    roz = ro_ref[0, 2]
    tmax = ro_ref[0, 3]
    rdx = rd_ref[0, 0]
    rdy = rd_ref[0, 1]
    rdz = rd_ref[0, 2]
    tmin = rd_ref[0, 3]
    visits, t_best, rn_best, tri_best, u_best, v_best = _traverse3_core(
        nodes4_fi_ref, tris128_ref, stack_ref,
        rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
        root_code=root_code, anyhit=anyhit, entry_ref=entry_ref, sc_ref=sc_ref)

    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best
    out_ref[0, 2] = tri_best
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best
    if count_visits:
        sub = rox.shape[0]
        out_ref[0, 5] = jnp.full((sub, LANE), 1.0) * visits.astype(jnp.float32)


def _traverse3_core(nodes4_fi_ref, tris128_ref, stack_ref,
                    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                    root_code=0, anyhit=False, entry_ref=None, sc_ref=None):
    """Value-based v3 traversal core: rays in registers in, hit tuple out.

    Factored out of _traverse3_body so a kernel can run SEVERAL traversals
    per launch (the megakernel experiment, ops/megakernel.py): the stack is
    reset on entry, node/tri tables stay VMEM-resident across calls.
    Returns (visits, t_best, rn_best, tri_best, u_best, v_best)."""
    sub = rox.shape[0]

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    ix, iy, iz = inv(rdx), inv(rdy), inv(rdz)

    sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
    sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
    sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0

    def sign_of(axis):
        return jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))

    if entry_ref is None:
        stack_ref[0] = root_code
        sp0 = jnp.int32(1)
    else:
        # per-packet seeded stack (entry-point traversal): col 0 is the
        # seed count, cols 1..E the entries bottom-to-top (the packet's
        # deepest bounding node on top, off-path siblings below). The
        # whole [G, ENTRY_WIDTH] table sits in SMEM (Mosaic requires
        # full-array blocks there); rows are selected by program_id.
        pk = pl.program_id(0)
        for k in range(ENTRY_WIDTH - 1):
            stack_ref[k] = entry_ref[pk, k + 1]
        sp0 = entry_ref[pk, 0]

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
        sp, visits, t_best, rn_best, tri_best, u_best, v_best = state
        visits = visits + 1
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
            if sc_ref is None:
                c0 = f[0, 24].astype(jnp.int32)
                c1 = f[0, 25].astype(jnp.int32)
                c2 = f[0, 26].astype(jnp.int32)
                c3 = f[0, 27].astype(jnp.int32)
                ax0, ax1, ax2 = (f[0, 28].astype(jnp.int32),
                                 f[0, 29].astype(jnp.int32),
                                 f[0, 30].astype(jnp.int32))
            else:
                c0, c1, c2, c3 = sc_ref[e, 0], sc_ref[e, 1], sc_ref[e, 2], sc_ref[e, 3]
                ax0, ax1, ax2 = sc_ref[e, 4], sc_ref[e, 5], sc_ref[e, 6]
            s0 = sign_of(ax0)  # left pair nearer?
            s1 = sign_of(ax1)  # slot0 nearer in left pair
            s2 = sign_of(ax2)

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

        res = jax.lax.cond(e < 0, leaf, internal, sp, t_best, rn_best, tri_best, u_best, v_best)
        return (res[0], visits) + res[1:]

    state = (
        sp0,
        jnp.int32(0),
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    _, visits, t_best, rn_best, tri_best, u_best, v_best = jax.lax.while_loop(
        lambda s: s[0] > 0, body, state
    )
    return visits, t_best, rn_best, tri_best, u_best, v_best


def _traverse5_body(nodes4_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref, stack_ref,
                    root_code=0, anyhit=False, entry_ref=None, multipop=4):
    """v5 packet traversal: BVH4 fused rows + branch-free MULTI-POP.

    MEASURED SLOWER than v3 on the v5e (102.6 ms vs 76.7 ms, 262k sorted
    bounce rays, shader_ball, tiles=8, multipop=4): the speculative vector
    work (every popped entry pays BOTH 8 tri tests AND 4 slab tests) costs
    more than the scalar latency it hides. Kept as a measured experiment —
    kbench --variants p5 reproduces; do not re-derive (NEXT.md).

    The measured v2/v3 bottleneck is per-visit SCALAR latency (~0.35us:
    SMEM pop -> dynamic-slice fetch -> cond -> packed any() reduction),
    while the VPU work per visit is ~40 cycles. v5 pops up to `multipop`
    stack entries per loop iteration and:

      * issues ALL fetches up front — for every popped entry it fetches
        BOTH its BVH4 row and its tris128 row speculatively (one is
        wasted; VMEM bandwidth is free next to the latency), so the 2M
        dynamic-slice latencies overlap instead of serializing;
      * eliminates the leaf/internal `lax.cond` entirely: every entry
        runs BOTH the 4 slab tests and the 8 triangle tests with masked
        results (cnt=0 for internals, inverted boxes for leaves). Mosaic
        cannot overlap scalar latency across cond boundaries (measured:
        the 2-pop cond unroll was parity), so the branch-free body is
        what lets the loop pipeline;
      * chains t_best through the popped group, so pruning quality within
        a group is preserved; ordering degrades only by the group width
        (entries were all already on the stack, so traversal stays exact).
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

    if entry_ref is None:
        stack_ref[0] = root_code
        sp0 = jnp.int32(1)
    else:
        pk = pl.program_id(0)
        for k in range(ENTRY_WIDTH - 1):
            stack_ref[k] = entry_ref[pk, k + 1]
        sp0 = entry_ref[pk, 0]

    nrows = nodes4_fi_ref.shape[0]
    trows = tris128_ref.shape[0]

    def body(state):
        sp, t_best, rn_best, tri_best, u_best, v_best = state
        # ---- pop up to M entries (scalar only)
        es, ens = [], []
        avail = sp
        for j in range(multipop):
            en_j = avail >= (j + 1)
            e_j = stack_ref[jnp.maximum(avail - 1 - j, 0)]
            es.append(jnp.where(en_j, e_j, 0))
            ens.append(en_j)
        sp = jnp.maximum(avail - multipop, 0)

        # ---- speculative fetches for the whole group, all issued before
        # any vector work (independent dynamic slices -> overlapped)
        nfs, tvs = [], []
        for j in range(multipop):
            e = es[j]
            is_leaf = e < 0
            code = -e - 1
            nrow = jnp.clip(e, 0, nrows - 1)
            trow = jnp.clip(code // 16, 0, trows - 1)
            nfs.append(nodes4_fi_ref[pl.ds(nrow, 1), :])   # [1,32]
            tvs.append(tris128_ref[pl.ds(trow, 1), :])     # [1,128]

        # ---- masked vector phase, t_best chained through the group
        for j in range(multipop):
            e = es[j]
            en = ens[j]
            is_leaf = e < 0
            code = -e - 1
            cnt = jnp.where(is_leaf & en, code - (code // 16) * 16, 0)
            tv = tvs[j]
            for c in range(LEAF_SIZE):
                o = c * 16
                v0x, v0y, v0z = tv[0, o + 0], tv[0, o + 1], tv[0, o + 2]
                e1x, e1y, e1z = tv[0, o + 3] - v0x, tv[0, o + 4] - v0y, tv[0, o + 5] - v0z
                e2x, e2y, e2z = tv[0, o + 6] - v0x, tv[0, o + 7] - v0y, tv[0, o + 8] - v0z
                px = rdy * e2z - rdz * e2y
                py = rdz * e2x - rdx * e2z
                pz = rdx * e2y - rdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = (c < cnt) & (jnp.abs(det) >= 1e-12)
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

            f = nfs[j]
            en_int = en & ~is_leaf

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
            a0 = (p01 >= 65536) & en_int
            a1 = ((p01 & 65535) > 0) & en_int
            a2 = (p23 >= 65536) & en_int
            a3 = ((p23 & 65535) > 0) & en_int
            c0 = f[0, 24].astype(jnp.int32)
            c1 = f[0, 25].astype(jnp.int32)
            c2 = f[0, 26].astype(jnp.int32)
            c3 = f[0, 27].astype(jnp.int32)
            s0 = sign_of(f[0, 28].astype(jnp.int32))
            s1 = sign_of(f[0, 29].astype(jnp.int32))
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

    state = (
        sp0,
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


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit", "root_code", "multipop"))
def traverse_packets5(nodes4_fi, tris128, rays_ro, rays_rd, root_code, interpret=False,
                      tiles=1, anyhit=False, entry=None, multipop=4):
    """v5 kernel dispatch (branch-free multi-pop over BVH4 fused rows);
    same I/O as traverse_packets3 (no count_visits)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_traverse5_body, root_code=root_code, anyhit=anyhit,
                               multipop=multipop)
    in_specs = [
        pl.BlockSpec(nodes4_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [nodes4_fi, tris128, rays_ro, rays_rd]
    if entry is not None:
        def kernel(n_ref, t_ref, ro_ref, rd_ref, e_ref, out_ref, stack_ref):
            return _traverse5_body(n_ref, t_ref, ro_ref, rd_ref, out_ref, stack_ref,
                                   root_code=root_code, anyhit=anyhit, entry_ref=e_ref,
                                   multipop=multipop)
        in_specs.append(pl.BlockSpec(entry.shape, lambda i: (0, 0), memory_space=pltpu.SMEM))
        operands.append(entry)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK + 64,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit", "root_code", "count_visits"))
def traverse_packets3(nodes4_fi, tris128, rays_ro, rays_rd, root_code, interpret=False,
                      tiles=1, anyhit=False, entry=None, count_visits=False,
                      sidecar=None):
    """v3 kernel dispatch (BVH4 fused rows); same I/O as traverse_packets2.
    entry: optional [G, ENTRY_WIDTH] i32 per-packet seeded stacks
    (packet_entry_stacks); count_visits adds a 6th output channel with the
    packet's node-visit count (debug/measurement only); sidecar: optional
    [M,8] i32 SMEM table (bvh_flatten._packet3_sidecar) = the v7 variant
    (per-visit codes/axes from SMEM instead of VMEM scalar extracts)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    nchan = 6 if count_visits else 5
    in_specs = [
        pl.BlockSpec(nodes4_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [nodes4_fi, tris128, rays_ro, rays_rd]
    opt = []  # (kw_name, operand) in in_specs order after the fixed four
    if entry is not None:
        in_specs.append(pl.BlockSpec(entry.shape, lambda i: (0, 0), memory_space=pltpu.SMEM))
        operands.append(entry)
        opt.append("entry_ref")
    if sidecar is not None:
        in_specs.append(pl.BlockSpec(sidecar.shape, lambda i: (0, 0), memory_space=pltpu.SMEM))
        operands.append(sidecar)
        opt.append("sc_ref")

    def kernel(n_ref, t_ref, ro_ref, rd_ref, *rest):
        *opt_refs, out_ref, stack_ref = rest
        kw = dict(zip(opt, opt_refs))
        return _traverse3_body(n_ref, t_ref, ro_ref, rd_ref, out_ref, stack_ref,
                               root_code=root_code, anyhit=anyhit,
                               count_visits=count_visits, **kw)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nchan, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nchan, sub, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


LQ_CAP = 512       # leaf-queue capacity (v8); SMEM cost 2 KB
LQ_HIGH = LQ_CAP - 4  # producer gate: an internal visit adds <= 4 leaves


def _traverse8_body(nodes4_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref,
                    stack_ref, lq_ref, root_code=0, anyhit=False):
    """v8 leaf-queue packet traversal (branchless dual-pop over BVH4 rows).

    The v3 kernel's measured per-visit floor is the SCALAR chain: pop ->
    `lax.cond(leaf, internal)` -> (internal) vector slab tests -> packed
    any() reduction (vector->scalar round trip, ~0.35 us) -> pushes. Leaf
    visits are the opposite: almost pure VPU work (8 Moeller-Trumbore
    tests) behind a trivial scalar decode. v8 stops alternating between
    the two regimes: the traversal stack holds ONLY internal codes, leaf
    children are diverted to a separate SMEM queue, and every iteration
    pops one of EACH (masked, no lax.cond) — one internal row (slab tests
    + reduction + pushes) and one queued leaf (tri tests). The leaf's VPU
    work is independent of the internal's reduction, so the scalar
    latency hides under it, and total iterations drop from
    internal+leaf visits to ~max(internal, leaf).

    Deferring leaves means tri tests see a slightly stale t_best — purely
    conservative (t_best only shrinks; every queued leaf is still
    drained), so hits are identical to v2/v3. The producer side is gated
    when the queue nears capacity (lq >= LQ_HIGH pauses internal pops),
    which bounds the queue without drops. anyhit poisoning is v2's
    (t_best = -1 kills all future box tests for the lane).

    Reference role: the RTX traversal loop raytracer_interface.h.slang:
    69-228 — hardware interleaves node and triangle stages per ray; this
    is the packet-level analog of that stage overlap.
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

    # Both scratch slot-0s are written so masked-off pops read in-bounds
    # codes: a stale stack read fetches node row 0, a stale queue read
    # decodes to (row 0, count 0) and every tri test is masked by c<cnt.
    stack_ref[0] = max(root_code, 0)
    lq_ref[0] = min(root_code, -1)
    if root_code >= 0:
        sp0, lq0 = jnp.int32(1), jnp.int32(0)
    else:  # degenerate single-leaf scene: seed the queue instead
        sp0, lq0 = jnp.int32(0), jnp.int32(1)

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
        sp, lq, t_best, rn_best, tri_best, u_best, v_best = state

        # -- dual pop (masked; indices clamped into written slots) -------
        take_i = (sp > 0) & (lq < LQ_HIGH)
        # clamp: dead slots above the top can hold leaf codes (<0) written
        # by the dual-target push; a masked-off pop must still fetch a
        # real row index
        e = jnp.maximum(stack_ref[jnp.maximum(sp - 1, 0)], 0)
        sp = sp - jnp.where(take_i, 1, 0)
        take_l = lq > 0
        le = lq_ref[jnp.maximum(lq - 1, 0)]
        lq = lq - jnp.where(take_l, 1, 0)

        # -- internal half: one [1,32] BVH4 row ---------------------------
        f = nodes4_fi_ref[pl.ds(e, 1), :]

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

        # -- leaf half: one queued [1,128] tri block (pure VPU work,
        #    independent of the reduction below -> overlaps it) ----------
        code = -le - 1
        # clamp mirrors the stack side: dead queue slots can hold internal
        # codes (>= 0) -> code < 0 -> a negative row on a masked-off pop
        row = jnp.maximum(code // 16, 0)
        cnt = jnp.where(take_l, code - row * 16, 0)
        t_best, rn_best, tri_best, u_best, v_best = tri_tests(
            row, t_best, rn_best, tri_best, u_best, v_best, cnt
        )

        # -- packed any() reductions + dual-target pushes -----------------
        p01 = jnp.sum(h0.astype(jnp.int32) * 65536 + h1.astype(jnp.int32))
        p23 = jnp.sum(h2.astype(jnp.int32) * 65536 + h3.astype(jnp.int32))
        a0 = (p01 >= 65536) & take_i
        a1 = ((p01 & 65535) > 0) & take_i
        a2 = (p23 >= 65536) & take_i
        a3 = ((p23 & 65535) > 0) & take_i
        c0 = f[0, 24].astype(jnp.int32)
        c1 = f[0, 25].astype(jnp.int32)
        c2 = f[0, 26].astype(jnp.int32)
        c3 = f[0, 27].astype(jnp.int32)
        ax0, ax1, ax2 = (f[0, 28].astype(jnp.int32),
                         f[0, 29].astype(jnp.int32),
                         f[0, 30].astype(jnp.int32))
        s0 = sign_of(ax0)
        s1 = sign_of(ax1)
        s2 = sign_of(ax2)

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
            is_leaf = pid < 0
            stack_ref[sp] = pid
            sp = sp + jnp.where(pa & (~is_leaf), 1, 0)
            lq_ref[lq] = pid
            lq = lq + jnp.where(pa & is_leaf, 1, 0)

        return sp, lq, t_best, rn_best, tri_best, u_best, v_best

    state = (
        sp0,
        lq0,
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    _, _, t_best, rn_best, tri_best, u_best, v_best = jax.lax.while_loop(
        lambda s: (s[0] > 0) | (s[1] > 0), body, state
    )

    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best
    out_ref[0, 2] = tri_best
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit", "root_code"))
def traverse_packets8(nodes4_fi, tris128, rays_ro, rays_rd, root_code, interpret=False,
                      tiles=1, anyhit=False):
    """v8 kernel dispatch (leaf-queue dual-pop over BVH4 fused rows); same
    I/O as traverse_packets3 (5-channel, ids resolved in-kernel)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_traverse8_body, root_code=root_code, anyhit=anyhit)
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
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((LQ_CAP,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes4_fi, tris128, rays_ro, rays_rd)


def _traverse9_body(nodes4_fi_ref, tris128_ref, ro_ref, rd_ref, out_ref,
                    stack_ref, lq_ref, root_code=0, anyhit=False, ways=2):
    """v9: WAYS-way interleaved v8 (leaf-queue dual-pop over BVH4 rows).

    The measured wall of every packet kernel is the per-visit SCALAR chain
    (pop -> row fetch -> packed any() reduction -> pushes, ~0.33 us on the
    v5e, tools/exp_visit.py variant b). v9 splits the launch packet into
    WAYS independent sub-packets, each with its OWN stack, leaf queue, hit
    state and octant signs, and runs their v8 visit bodies back-to-back in
    ONE while-loop iteration. The bodies are fully branchless (v8's masked
    dual-pop — no lax.cond), so Mosaic's scheduler overlaps the WAYS
    independent scalar chains under each other's vector work.

    Measured on the probe (exp_visit, 2026-08-19, v5e): 317 ns/visit
    1-way -> 241 (2-way) -> 215 (4-way) -> 202 (8-way). Sub-packets also
    see SMALLER traversal unions than the full packet (rows are sliced
    from the Morton/octant-sorted order, so each sub-packet is more
    coherent than their union) at unchanged total vector width.

    A way whose stack AND queue are empty keeps popping masked-off visits
    until all ways finish; sorted packets drain at similar rates so the
    tail waste is small.

    Reference role: SER/RT-core latency hiding across rays
    (raytracer_interface.h.slang:69-228) — the packet-level analog.
    """
    sub = ro_ref[0, 0].shape[0]
    h = sub // ways

    def inv(d):
        return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)

    # per-way ray registers, octant signs, seeds
    W = []
    for w in range(ways):
        rs = slice(w * h, (w + 1) * h)  # static per-way row window
        rox = ro_ref[0, 0, rs]
        roy = ro_ref[0, 1, rs]
        roz = ro_ref[0, 2, rs]
        tmax = ro_ref[0, 3, rs]
        rdx = rd_ref[0, 0, rs]
        rdy = rd_ref[0, 1, rs]
        rdz = rd_ref[0, 2, rs]
        tmin = rd_ref[0, 3, rs]
        sx = jnp.sum(jnp.where(rdx >= 0, 1, -1)) >= 0
        sy = jnp.sum(jnp.where(rdy >= 0, 1, -1)) >= 0
        sz = jnp.sum(jnp.where(rdz >= 0, 1, -1)) >= 0
        W.append(dict(rox=rox, roy=roy, roz=roz, tmax=tmax,
                      rdx=rdx, rdy=rdy, rdz=rdz, tmin=tmin,
                      ix=inv(rdx), iy=inv(rdy), iz=inv(rdz),
                      sx=sx, sy=sy, sz=sz, sbase=w * STACK, qbase=w * LQ_CAP))
        # slot-0 seeding per way (v8 invariants: masked-off pops must read
        # in-bounds codes of the right sign)
        stack_ref[w * STACK] = max(root_code, 0)
        lq_ref[w * LQ_CAP] = min(root_code, -1)

    if root_code >= 0:
        sp0, lq0 = jnp.int32(1), jnp.int32(0)
    else:
        sp0, lq0 = jnp.int32(0), jnp.int32(1)

    def tri_tests(wd, row, t_best, rn_best, tri_best, u_best, v_best, count):
        tv = tris128_ref[pl.ds(row, 1), :]
        rox, roy, roz = wd["rox"], wd["roy"], wd["roz"]
        rdx, rdy, rdz = wd["rdx"], wd["rdy"], wd["rdz"]
        tmin = wd["tmin"]
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

    def visit_way(wd, sp, lq, t_best, rn_best, tri_best, u_best, v_best):
        """One masked v8 dual-pop visit for one way (verbatim v8 logic with
        stack/queue indices offset into the way's SMEM region)."""
        sb, qb = wd["sbase"], wd["qbase"]
        rox, roy, roz = wd["rox"], wd["roy"], wd["roz"]
        ix, iy, iz = wd["ix"], wd["iy"], wd["iz"]

        take_i = (sp > 0) & (lq < LQ_HIGH)
        e = jnp.maximum(stack_ref[sb + jnp.maximum(sp - 1, 0)], 0)
        sp = sp - jnp.where(take_i, 1, 0)
        take_l = lq > 0
        le = lq_ref[qb + jnp.maximum(lq - 1, 0)]
        lq = lq - jnp.where(take_l, 1, 0)

        f = nodes4_fi_ref[pl.ds(e, 1), :]

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

        code = -le - 1
        row = jnp.maximum(code // 16, 0)
        cnt = jnp.where(take_l, code - row * 16, 0)
        t_best, rn_best, tri_best, u_best, v_best = tri_tests(
            wd, row, t_best, rn_best, tri_best, u_best, v_best, cnt
        )

        p01 = jnp.sum(h0.astype(jnp.int32) * 65536 + h1.astype(jnp.int32))
        p23 = jnp.sum(h2.astype(jnp.int32) * 65536 + h3.astype(jnp.int32))
        a0 = (p01 >= 65536) & take_i
        a1 = ((p01 & 65535) > 0) & take_i
        a2 = (p23 >= 65536) & take_i
        a3 = ((p23 & 65535) > 0) & take_i
        c0 = f[0, 24].astype(jnp.int32)
        c1 = f[0, 25].astype(jnp.int32)
        c2 = f[0, 26].astype(jnp.int32)
        c3 = f[0, 27].astype(jnp.int32)
        ax0, ax1, ax2 = (f[0, 28].astype(jnp.int32),
                         f[0, 29].astype(jnp.int32),
                         f[0, 30].astype(jnp.int32))

        def sign_of(axis):
            return jnp.where(axis == 0, wd["sx"], jnp.where(axis == 1, wd["sy"], wd["sz"]))

        s0 = sign_of(ax0)
        s1 = sign_of(ax1)
        s2 = sign_of(ax2)

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
            is_leaf = pid < 0
            stack_ref[sb + sp] = pid
            sp = sp + jnp.where(pa & (~is_leaf), 1, 0)
            lq_ref[qb + lq] = pid
            lq = lq + jnp.where(pa & is_leaf, 1, 0)

        return sp, lq, t_best, rn_best, tri_best, u_best, v_best

    def body(state):
        out = []
        for w in range(ways):
            out.extend(visit_way(W[w], *state[7 * w:7 * w + 7]))
        return tuple(out)

    def cond(state):
        busy = (state[0] > 0) | (state[1] > 0)
        for w in range(1, ways):
            busy = busy | (state[7 * w] > 0) | (state[7 * w + 1] > 0)
        return busy

    state = ()
    for w in range(ways):
        state = state + (
            sp0, lq0, W[w]["tmax"],
            jnp.full((h, LANE), -1.0), jnp.full((h, LANE), -1.0),
            jnp.zeros((h, LANE)), jnp.zeros((h, LANE)),
        )
    state = jax.lax.while_loop(cond, body, state)

    for k in range(5):
        out_ref[0, k] = jnp.concatenate(
            [state[7 * w + 2 + k] for w in range(ways)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit",
                                              "root_code", "ways"))
def traverse_packets9(nodes4_fi, tris128, rays_ro, rays_rd, root_code,
                      interpret=False, tiles=1, anyhit=False, ways=2):
    """v9 kernel dispatch (WAYS-way interleaved leaf-queue dual-pop); same
    I/O as traverse_packets3."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    assert sub % ways == 0, (sub, ways)
    kernel = functools.partial(_traverse9_body, root_code=root_code,
                               anyhit=anyhit, ways=ways)
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
        scratch_shapes=[pltpu.SMEM((STACK * ways,), jnp.int32),
                        pltpu.SMEM((LQ_CAP * ways,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes4_fi, tris128, rays_ro, rays_rd)


def _traverse6_body(nodes16_ref, tris128_ref, ro_ref, rd_ref, out_ref, stack_ref,
                    anyhit=False):
    """v6 packet traversal: dense BVH16 rows (bvh_flatten._packet6_tables).

    Per INTERNAL visit ONE [1,128] fetch carries 16 child AABBs, 16 child
    codes and the 15 near-order axes of the collapsed binary subtree.
    Rationale: (a) a BVH16 row is exactly 128 floats, so the resident node
    table has ZERO Mosaic padding waste (v3's 32-wide BVH4 rows occupy 128
    VMEM lanes = 4x raw bytes — the measured packet-path scene ceiling);
    (b) per unit of tree progress the scalar visit count is HALF of BVH4
    (the per-visit scalar latency chain pop -> dynamic-slice fetch ->
    packed reductions -> pushes is the measured kernel bottleneck at
    ~0.35us/visit). Vector work per visit is 4x v3 (16 slab tests) —
    cheap next to the scalar chain at the measured tile sizes. Children
    are pushed in EXACT hierarchical near-first order (per-level sign_of
    the 15 stored split axes), so early-termination quality matches the
    binary near-order traversal. Leaf visits and anyhit poisoning are
    identical to v2/v3 (tris128 blocks, sign-encoded stack entries)."""
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

    stack_ref[0] = jnp.int32(0)  # BVH16 root row is always id 0

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
            f = nodes16_ref[pl.ds(e, 1), :]  # [1,128]

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

            h = [slab(6 * s) for s in range(16)]
            # 8 independent packed any() reductions (2 children per int32;
            # lane count <= 16*8*128 < 2^16 so the low field never carries)
            a = []
            for k in range(8):
                p = jnp.sum(h[2 * k].astype(jnp.int32) * 65536 + h[2 * k + 1].astype(jnp.int32))
                a.append(p >= 65536)
                a.append((p & 65535) > 0)
            c = [f[0, 96 + s].astype(jnp.int32) for s in range(16)]
            nb = [sign_of(f[0, 112 + i].astype(jnp.int32)) for i in range(15)]

            def merge(near_first, la, lb):
                """Visit-ordered concat of two equal-length (code, any)
                lists: la then lb when near_first, else swapped."""
                out = []
                for i in range(len(la)):
                    out.append((jnp.where(near_first, la[i][0], lb[i][0]),
                                jnp.where(near_first, la[i][1], lb[i][1])))
                for i in range(len(lb)):
                    out.append((jnp.where(near_first, lb[i][0], la[i][0]),
                                jnp.where(near_first, lb[i][1], la[i][1])))
                return out

            pairs = [merge(nb[7 + j], [(c[2 * j], a[2 * j])], [(c[2 * j + 1], a[2 * j + 1])])
                     for j in range(8)]
            quads = [merge(nb[3 + q], pairs[2 * q], pairs[2 * q + 1]) for q in range(4)]
            halves = [merge(nb[1 + hh], quads[2 * hh], quads[2 * hh + 1]) for hh in range(2)]
            visit = merge(nb[0], halves[0], halves[1])

            for cid, ca in reversed(visit):
                stack_ref[sp] = cid
                sp = sp + jnp.where(ca, 1, 0)
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


@functools.partial(jax.jit, static_argnames=("interpret", "tiles", "anyhit"))
def traverse_packets6(nodes16_fi, tris128, rays_ro, rays_rd, interpret=False,
                      tiles=1, anyhit=False):
    """v6 kernel dispatch (dense BVH16 rows); same ray I/O as
    traverse_packets3. Root row is always BVH16 id 0."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(_traverse6_body, anyhit=anyhit)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(nodes16_fi.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris128.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        # a BVH16 visit pushes up to 15 extra entries — extra headroom
        scratch_shapes=[pltpu.SMEM((STACK + 128,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes16_fi, tris128, rays_ro, rays_rd)


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

# seeded-stack width: col 0 = seed count, cols 1..31 = stack entries
ENTRY_WIDTH = 32
_ENTRY_ITERS = 24  # max descent depth (BVH4 depth of an 8M-tri scene ~12)


@functools.partial(jax.jit, static_argnames=("packet",))
def packet_entry_stacks(nodes4_fi, root4_code, ro_p, packet):
    """Per-packet traversal entry points from the Morton-sort prefix.

    For each ray packet (already spatially sorted — tile-order primaries or
    Morton-sorted bounce/shadow rays), descend the BVH4 from the root as
    long as SOME child box CONTAINS the packet's live-origin AABB: the
    descended-into child becomes the packet's entry node (popped first, so
    origin-local geometry establishes small t_best before anything else),
    and every non-descended sibling is pre-seeded below it on the stack —
    the seeded cut covers the whole tree, so traversal stays lossless. This
    skips the shared top levels every pop otherwise pays and is the TPU
    analog of the reference's SER coherence hints
    (raytracer_interface.h.slang:199-222) applied to traversal itself.

    ro_p: [G, 4, sub, 128] packed origins (x, y, z, tmax) — the same layout
    traverse_packets3 consumes; lanes with tmax <= 0 (dead or padding) are
    excluded from the packet box. Returns [G, ENTRY_WIDTH] i32.
    """
    del packet  # shape is already packed; kept for cache-key clarity
    g = ro_p.shape[0]
    ox = ro_p[:, 0].reshape(g, -1)
    oy = ro_p[:, 1].reshape(g, -1)
    oz = ro_p[:, 2].reshape(g, -1)
    live = ro_p[:, 3].reshape(g, -1) > 0.0
    big = jnp.float32(3e38)

    def box(c):
        lo = jnp.min(jnp.where(live, c, big), axis=1)
        hi = jnp.max(jnp.where(live, c, -big), axis=1)
        return lo, hi

    (px0, px1), (py0, py1), (pz0, pz1) = box(ox), box(oy), box(oz)
    any_live = jnp.any(live, axis=1)

    depth = ENTRY_WIDTH - 1
    cols = jnp.arange(depth, dtype=jnp.int32)[None, :]

    def step(_, st):
        node, sp, stack, entry, done = st
        rows = nodes4_fi[jnp.maximum(node, 0)]  # [G, 32]
        conts, valids, codes = [], [], []
        for j in range(4):
            o = 6 * j
            lo_x, lo_y, lo_z = rows[:, o], rows[:, o + 1], rows[:, o + 2]
            hi_x, hi_y, hi_z = rows[:, o + 3], rows[:, o + 4], rows[:, o + 5]
            valid = lo_x < 1e38  # missing children carry the 3e38 point box
            cont = (
                valid
                & (lo_x <= px0) & (px1 <= hi_x)
                & (lo_y <= py0) & (py1 <= hi_y)
                & (lo_z <= pz0) & (pz1 <= hi_z)
            )
            conts.append(cont)
            valids.append(valid)
            codes.append(rows[:, 24 + j].astype(jnp.int32))
        has_pick = conts[0] | conts[1] | conts[2] | conts[3]
        # room for up to 3 sibling pushes + the final entry slot
        act = ~done & has_pick & (sp <= depth - 5)
        taken = jnp.zeros_like(has_pick)
        pick_code = jnp.full_like(node, 0)
        for j in range(4):
            pick_j = conts[j] & ~taken
            taken = taken | pick_j
            pick_code = jnp.where(pick_j, codes[j], pick_code)
            push_j = act & valids[j] & ~pick_j
            stack = jnp.where(
                push_j[:, None] & (cols == sp[:, None]), codes[j][:, None], stack
            )
            sp = sp + push_j.astype(jnp.int32)
        descend = act & (pick_code >= 0)
        # containing child is a leaf: it becomes the entry directly
        entry = jnp.where(act, pick_code, entry)
        done = done | ~act | (pick_code < 0)
        node = jnp.where(descend, pick_code, node)
        return node, sp, stack, entry, done

    node0 = jnp.full((g,), root4_code, jnp.int32)
    sp0 = jnp.zeros((g,), jnp.int32)
    stack0 = jnp.zeros((g, depth), jnp.int32)
    entry0 = node0
    done0 = (node0 < 0) | ~any_live
    node, sp, stack, entry, _ = jax.lax.fori_loop(
        0, _ENTRY_ITERS, step, (node0, sp0, stack0, entry0, done0)
    )
    stack = jnp.where(cols == sp[:, None], entry[:, None], stack)
    count = sp + 1
    return jnp.concatenate([count[:, None], stack], axis=1)


def intersect_rays_packet_soa(
    wb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    interpret=False, anyhit=False, tiles=8, kernel="v2", entry_points=False,
):
    """SoA-component variant of intersect_rays_packet (v2/v3 kernels):
    takes 8 [N] vectors, returns dict of [N] channels with ids resolved
    in-kernel. The caller is responsible for any coherence ordering.
    entry_points=True (v3 only) seeds each packet's stack at its deepest
    bounding node (packet_entry_stacks) — profitable for surface-origin
    bounce/shadow packets, a no-op-cost root fallback for camera packets."""
    n = rox.shape[0]
    if kernel in ("lane", "lane_stream"):
        # per-lane skip-pointer kernel (ops/lane_traverse.py): VMEM pages
        # ("lane") or HBM-resident pages DMA-streamed one 6 KB page at a
        # time ("lane_stream" — unbounded scene size, the beyond-v6 rung)
        from .lane_traverse import intersect_rays_lane_soa

        return intersect_rays_lane_soa(
            wb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
            interpret=interpret, anyhit=anyhit, tiles=tiles,
            stream=kernel == "lane_stream",
        )
    tiles = max(1, min(tiles, max(n // PACKET, 1), MAX_TILES))
    ro_p, _ = _pack_soa([rox, roy, roz, tmax], PACKET * tiles)
    rd_p, _ = _pack_soa([rdx, rdy, rdz, tmin], PACKET * tiles)
    if kernel == "v6":
        out = traverse_packets6(
            wb.nodes16_fi, wb.tris128, ro_p, rd_p,
            interpret=interpret, tiles=tiles, anyhit=anyhit,
        )
    elif kernel == "v8":
        out = traverse_packets8(
            wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
            interpret=interpret, tiles=tiles, anyhit=anyhit,
        )
    elif kernel in ("v9", "v9x4", "v9x8"):
        # sub = tiles*8 rows is always divisible by 2 and 4; 8-way needs
        # tiles >= 8 so each way keeps at least one full (8,128) tile
        ways = {"v9": 2, "v9x4": 4, "v9x8": 8}[kernel]
        out = traverse_packets9(
            wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
            interpret=interpret, tiles=tiles, anyhit=anyhit, ways=ways,
        )
    elif kernel in ("v3", "v5", "v7"):
        entry = (
            packet_entry_stacks(wb.nodes4_fi, wb.root4_code, ro_p, PACKET * tiles)
            if entry_points else None
        )
        if kernel == "v5":
            out = traverse_packets5(
                wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
                interpret=interpret, tiles=tiles, anyhit=anyhit, entry=entry,
            )
        else:
            out = traverse_packets3(
                wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
                interpret=interpret, tiles=tiles, anyhit=anyhit, entry=entry,
                sidecar=wb.nodes4_sc if kernel == "v7" else None,
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

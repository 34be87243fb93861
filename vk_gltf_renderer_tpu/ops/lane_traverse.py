"""Per-lane stackless BVH traversal — second-generation TPU hot kernel.

The round-1 packet kernel (ops/pallas_traverse.py) is bound by one
vector->scalar reduction per node visit (~293 cycles measured on v5e) and
by the packet-union cost: every ray in a packet pays every node any member
visits. This kernel removes both:

  * every lane (ray) traverses INDEPENDENTLY — no per-visit any() reduction,
    no shared stack, no union cost;
  * the tree is stored in *skip-pointer DFS order* (threaded tree): an
    internal hit advances to `cur+1` (its first child — a DFS invariant),
    a miss jumps the subtree via the skip pointer, a triangle entry tests
    and continues. Every lane's entry index is strictly INCREASING, so a
    whole packet sweeps the tree monotonically;
  * entries are grouped into 128-entry PAGES (the lane-gather width).
    Per page: one scalar min-reduction picks the lowest page any live lane
    needs, a [12,128] dynamic slice loads it, and lanes step through it
    with `take_along_axis` lane-gathers (~7 cycles each, measured) — all
    VPU work, zero per-node scalar involvement.

Leaves are expanded to ONE TRIANGLE PER ENTRY with precomputed edge
vectors, so a step evaluates either a slab test or a Möller-Trumbore test
(both masked; fields overlap in a 14-float union layout). Triangle entries
carry their (render-node, global-tri) ids IN the page, so hits resolve
in-kernel — the post-trace XLA id gathers the v2 packet kernel eliminated
(measured ~34 ns/element, i.e. ~68 ms per 2M rays) never happen here
either.

This is the TPU replacement for the per-thread RT-core traversal the
reference gets from Vulkan (raytracer_interface.h.slang:69-228): the role
of SER ReorderThread is played by the caller's Morton sort, and the role
of the per-thread stack by the skip-pointer threading.

Entry layout (16 f32 fields per entry, page-major [P*16, 128]):
  internal: [lo.xyz, hi.xyz,  0, 0, 0,        miss, 0,      0, 0,     0,   0, 0]
  triangle: [v0.xyz, e1.xyz,  e2.xyz,         next, triRow, 1, rnode, tri, 0, 0]
with `miss`/`next`/`triRow`/`rnode`/`tri` stored as exact f32 integers
(< 2^24 — capping the kernel at 16M entries, ~14M world triangles).

FIELDS is padded 14 -> 16 so every page is EXACTLY two (8,128) f32 tiles:
the stream kernel's dynamic-offset DMA (page*FIELDS rows) is then always
sublane-aligned. tools/exp_stream_dma.py measured that mid-tile
dynamic-offset DMAs (FIELDS=12/14) crash the v5e TPU worker, while all
tile-aligned FIELDS=16 variants survive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FIELDS = 16  # 14 used + 2 pad: 2 exact (8,128) f32 tiles per page
PAGE = 128
SUB, LANE = 8, 128
PACKET = SUB * LANE
INFINITE = jnp.float32(1e32)
_BIG = 3e37


def build_lane_tree(nodes_i, nodes_self, tris16, num_tris,
                    wtri_rnode=None, wtri_tri=None):
    """DFS skip-pointer layout of the collapsed binary BVH.

    nodes_i: [N,8] i32 (left,right,first,count,parent,axis,...)
    nodes_self: [N,8] f32 (own lo.xyz, hi.xyz, pad) per node
    tris16: [T+pad,16] f32 (v0.xyz, v1.xyz, v2.xyz, pad) in BVH tri order
    wtri_rnode/wtri_tri: optional [T'] i32 per-tri-row (render-node,
    global-tri) id tables — baked into triangle entries (fields 12/13) so
    hits resolve in-kernel; zeros when omitted.
    Returns (pages [P*14,128] f32, geo_idx [P*14,128] i32, n_entries int).

    geo_idx maps each page element to the flattened *geometry source*
    vector  concat(nodes_self[:, :6].ravel(), tri_geo.ravel())  with -1 for
    static (topology) elements — `refit_lane_pages` uses it to rebuild the
    page values on device after a BVH refit without re-running this
    builder (tri_geo = [T,9] of v0,e1,e2 derived from tris16).
    """
    nodes_i = np.asarray(nodes_i)
    nodes_self = np.asarray(nodes_self, np.float32)
    tris16 = np.asarray(tris16, np.float32)
    nn = nodes_i.shape[0]
    left, right = nodes_i[:, 0].astype(np.int64), nodes_i[:, 1].astype(np.int64)
    first, count = nodes_i[:, 2].astype(np.int64), nodes_i[:, 3].astype(np.int64)
    is_leaf = count > 0

    # ---- subtree entry counts, bottom-up (children have larger ids is NOT
    # guaranteed; iterate until fixed point over unresolved internals)
    size = np.where(is_leaf, count, -1)
    pending = ~is_leaf
    while pending.any():
        sl = size[left[pending]]
        sr = size[right[pending]]
        ready = (sl >= 0) & (sr >= 0)
        idx = np.nonzero(pending)[0][ready]
        size[idx] = 1 + sl[ready] + sr[ready]
        pending[idx] = False

    total = int(size[0])
    # ---- entry start + skip per node, top-down (BFS)
    start = np.zeros(nn, np.int64)
    skip = np.zeros(nn, np.int64)
    start[0], skip[0] = 0, total
    order = [0]
    for n in order:
        if is_leaf[n]:
            continue
        l, r = left[n], right[n]
        start[l] = start[n] + 1
        start[r] = start[l] + size[l]
        skip[l] = start[r]
        skip[r] = skip[n]
        order.append(l)
        order.append(r)

    ent = np.zeros((total, FIELDS), np.float32)
    geo = np.full((total, FIELDS), -1, np.int64)

    # internal entries
    ints = np.asarray([n for n in order if not is_leaf[n]], np.int64)
    if ints.size:
        s = start[ints]
        ent[s, 0:6] = nodes_self[ints, 0:6]
        ent[s, 9] = skip[ints].astype(np.float32)
        # geometry source rows: nodes_self[n, 0:6] lives at n*6 .. n*6+5
        geo[s, 0:6] = ints[:, None] * 6 + np.arange(6)[None, :]

    # triangle entries (vectorized over all leaf runs)
    leaves = np.asarray([n for n in order if is_leaf[n]], np.int64)
    if leaves.size:
        c = count[leaves]
        reps = np.repeat(np.arange(leaves.size), c)  # leaf index per entry
        k = np.arange(reps.size) - np.repeat(np.cumsum(c) - c, c)  # 0..c-1
        rows = first[leaves][reps] + k  # tri row in tris16
        s = start[leaves][reps] + k  # entry index
        last = k == (c[reps] - 1)
        nxt = np.where(last, skip[leaves][reps], s + 1)
        v0 = tris16[rows, 0:3]
        e1 = tris16[rows, 3:6] - v0
        e2 = tris16[rows, 6:9] - v0
        ent[s, 0:3] = v0
        ent[s, 3:6] = e1
        ent[s, 6:9] = e2
        ent[s, 9] = nxt.astype(np.float32)
        ent[s, 10] = rows.astype(np.float32)
        ent[s, 11] = 1.0
        if wtri_rnode is not None:
            ent[s, 12] = np.asarray(wtri_rnode)[rows].astype(np.float32)
            ent[s, 13] = np.asarray(wtri_tri)[rows].astype(np.float32)
        nsrc = nn * 6
        geo[s, 0:9] = nsrc + rows[:, None] * 9 + np.arange(9)[None, :]

    # pad to whole pages with never-hit internal entries
    pad = (-total) % PAGE
    if pad:
        pe = np.zeros((pad, FIELDS), np.float32)
        pe[:, 0:3] = _BIG
        pe[:, 3:6] = -_BIG
        pe[:, 9] = total + pad
        ent = np.concatenate([ent, pe], axis=0)
        geo = np.concatenate([geo, np.full((pad, FIELDS), -1, np.int64)], axis=0)

    p = ent.shape[0] // PAGE
    pages = ent.reshape(p, PAGE, FIELDS).transpose(0, 2, 1).reshape(p * FIELDS, PAGE)
    geo_idx = geo.reshape(p, PAGE, FIELDS).transpose(0, 2, 1).reshape(p * FIELDS, PAGE)
    return np.ascontiguousarray(pages), geo_idx.astype(np.int32), total


def refit_lane_pages(pages, geo_idx, nodes_self, tris16):
    """Device-side rebuild of page VALUES after a refit (topology static)."""
    v0 = tris16[:, 0:3]
    tri_geo = jnp.concatenate([v0, tris16[:, 3:6] - v0, tris16[:, 6:9] - v0], axis=1)
    src = jnp.concatenate([nodes_self[:, 0:6].reshape(-1), tri_geo.reshape(-1)])
    gathered = src[jnp.maximum(geo_idx, 0)]
    return jnp.where(geo_idx >= 0, gathered, pages)


def _make_step(rox, roy, roz, rdx, rdy, rdz, ix, iy, iz, tmin, end, anyhit):
    """Shared per-step body of the lane kernels: lane-gather 12 fields from
    the resident page, evaluate BOTH the slab test (internal union layout)
    and Möller-Trumbore (triangle layout), advance each in-page lane."""

    def step(cur, page, fld, t_best, rn_best, tri_best, u_best, v_best):
        in_pg = (cur >> 7) == page
        loc = cur & 127

        def g(f):
            return jnp.take_along_axis(fld[f], loc, axis=1)

        f0, f1, f2 = g(0), g(1), g(2)
        f3, f4, f5 = g(3), g(4), g(5)
        f6, f7, f8 = g(6), g(7), g(8)
        nxt_skip = g(9).astype(jnp.int32)
        leaf = g(11) > 0.5
        rnode_id = g(12)
        tri_id = g(13)

        # ---- internal: slab test (f0..2 = lo, f3..5 = hi)
        t0x = (f0 - rox) * ix
        t1x = (f3 - rox) * ix
        t0y = (f1 - roy) * iy
        t1y = (f4 - roy) * iy
        t0z = (f2 - roz) * iz
        t1z = (f5 - roz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.minimum(jnp.maximum(t0z, t1z), t_best),
        )
        bhit = tnear <= tfar

        # ---- triangle: Möller-Trumbore (f0..2 = v0, f3..5 = e1, f6..8 = e2)
        px = rdy * f8 - rdz * f7
        py = rdz * f6 - rdx * f8
        pz = rdx * f7 - rdy * f6
        det = f3 * px + f4 * py + f5 * pz
        ok = jnp.abs(det) >= 1e-12
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tvx, tvy, tvz = rox - f0, roy - f1, roz - f2
        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * f5 - tvz * f4
        qy = tvz * f3 - tvx * f5
        qz = tvx * f4 - tvy * f3
        vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (f6 * qx + f7 * qy + f8 * qz) * inv_det
        thit = (
            in_pg & leaf & ok
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > tmin) & (tt < t_best)
        )
        t_best = jnp.where(thit, tt, t_best)
        rn_best = jnp.where(thit, rnode_id, rn_best)
        tri_best = jnp.where(thit, tri_id, tri_best)
        u_best = jnp.where(thit, uu, u_best)
        v_best = jnp.where(thit, vv, v_best)

        nxt = jnp.where(leaf, nxt_skip, jnp.where(bhit, cur + 1, nxt_skip))
        if anyhit:
            nxt = jnp.where(thit, end, nxt)
        cur = jnp.where(in_pg, nxt, cur)
        return cur, t_best, rn_best, tri_best, u_best, v_best

    return step


def _lane_kernel_body(pages_ref, ro_ref, rd_ref, out_ref, *, n_pages, inner_steps, anyhit):
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

    end = jnp.int32(n_pages * PAGE)
    cur0 = jnp.where(tmax < 0, end, 0).astype(jnp.int32)

    step = _make_step(rox, roy, roz, rdx, rdy, rdz, ix, iy, iz, tmin, end, anyhit)

    def outer(state):
        page, cur, t_best, rn_best, tri_best, u_best, v_best = state
        rows = pages_ref[pl.ds(page * FIELDS, FIELDS), :]  # [14,128]
        fld = [jnp.broadcast_to(rows[f : f + 1, :], (sub, LANE)) for f in range(FIELDS)]
        for _ in range(inner_steps):
            cur, t_best, rn_best, tri_best, u_best, v_best = step(
                cur, page, fld, t_best, rn_best, tri_best, u_best, v_best
            )
        # ONE reduction per outer iteration: the next page any lane needs
        # (monotone — lane entry indices only increase)
        page = jnp.min(cur) >> 7
        return page, cur, t_best, rn_best, tri_best, u_best, v_best

    state = (
        jnp.min(cur0) >> 7,
        cur0,
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    state = jax.lax.while_loop(lambda s: s[0] < n_pages, outer, state)
    _, _, t_best, rn_best, tri_best, u_best, v_best = state
    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best
    out_ref[0, 2] = tri_best
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best


def _lane_kernel_stream(pages_ref, ro_ref, rd_ref, out_ref, scratch_ref, sem, *, n_pages, inner_steps, anyhit):
    """HBM-streaming variant: the page table stays in HBM and each page
    activation DMAs its [12,128] block into a VMEM scratch. Because lane
    entry indices are strictly increasing, pages arrive as a monotone
    stream — VMEM footprint is ONE page (6 KB) regardless of scene size.
    EXPERIMENTAL: interpret-mode validated, but the dynamic-offset DMA
    inside a while_loop hangs the v5e worker through the axon tunnel
    (reproduced with a minimal kernel) — do NOT wire into the renderer
    until that is resolved. The production large-scene path is the
    automatic packet->wavefront fallback (bvh_flatten.fits_vmem).
    Reference analog: the budgeted multi-pass BLAS build,
    renderer.cpp:1699-1721 (bounded device memory at some trace cost)."""
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
    end = jnp.int32(n_pages * PAGE)
    cur0 = jnp.where(tmax < 0, end, 0).astype(jnp.int32)

    step = _make_step(
        rox, roy, roz, rdx, rdy, rdz, ix, iy, iz, tmin, end, anyhit
    )

    def outer(state):
        page, cur, t_best, rn_best, tri_best, u_best, v_best = state
        dma = pltpu.make_async_copy(
            pages_ref.at[pl.ds(page * FIELDS, FIELDS), :], scratch_ref, sem
        )
        dma.start()
        dma.wait()
        fld = [
            jnp.broadcast_to(scratch_ref[f : f + 1, :], (sub, LANE)) for f in range(FIELDS)
        ]
        for _ in range(inner_steps):
            cur, t_best, rn_best, tri_best, u_best, v_best = step(
                cur, page, fld, t_best, rn_best, tri_best, u_best, v_best
            )
        page = jnp.min(cur) >> 7
        return page, cur, t_best, rn_best, tri_best, u_best, v_best

    state = (
        jnp.min(cur0) >> 7,
        cur0,
        tmax,
        jnp.full((sub, LANE), -1.0),
        jnp.full((sub, LANE), -1.0),
        jnp.zeros((sub, LANE)),
        jnp.zeros((sub, LANE)),
    )
    state = jax.lax.while_loop(lambda s: s[0] < n_pages, outer, state)
    _, _, t_best, rn_best, tri_best, u_best, v_best = state
    out_ref[0, 0] = t_best
    out_ref[0, 1] = rn_best
    out_ref[0, 2] = tri_best
    out_ref[0, 3] = u_best
    out_ref[0, 4] = v_best


@functools.partial(
    jax.jit, static_argnames=("n_pages", "interpret", "tiles", "anyhit", "inner_steps")
)
def traverse_lanes_stream(pages, rays_ro, rays_rd, n_pages, interpret=False, tiles=1, anyhit=False, inner_steps=8):
    """HBM-resident page table (unbounded scene size; 6 KB VMEM scratch)."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(
        _lane_kernel_stream, n_pages=n_pages, inner_steps=inner_steps, anyhit=anyhit
    )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # pages stay in HBM
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FIELDS, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pages, rays_ro, rays_rd)


@functools.partial(
    jax.jit, static_argnames=("n_pages", "interpret", "tiles", "anyhit", "inner_steps")
)
def traverse_lanes(pages, rays_ro, rays_rd, n_pages, interpret=False, tiles=1, anyhit=False, inner_steps=4):
    """rays packed [G, 4, tiles*8, 128] like traverse_packets; returns
    [G, 5, tiles*8, 128] (t, rnode, tri, u, v) — ids resolved in-kernel."""
    g = rays_ro.shape[0]
    sub = tiles * SUB
    kernel = functools.partial(
        _lane_kernel_body, n_pages=n_pages, inner_steps=inner_steps, anyhit=anyhit
    )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(pages.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, sub, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 5, sub, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pages, rays_ro, rays_rd)


def intersect_rays_lane_soa(
    wb, rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
    interpret=False, anyhit=False, tiles=8, stream=False, inner_steps=4,
):
    """SoA-component lane-kernel dispatch, contract-compatible with
    pallas_traverse.intersect_rays_packet_soa: takes 8 [N] vectors, returns
    dict(t, rnode, tri, u, v) with misses t=INFINITE / ids -1. This is the
    production entry the renderer's kernel ladder uses to reach the
    HBM-resident page table (stream=True) for scenes beyond the v6 VMEM
    ceiling — the packet-class answer to the reference's budgeted BLAS
    passes (renderer.cpp:1699-1721: bounded device memory at any size)."""
    from .pallas_traverse import _pack_soa

    n = rox.shape[0]
    tiles = max(1, min(tiles, max(n // PACKET, 1)))
    ro_p, _ = _pack_soa([rox, roy, roz, tmax], PACKET * tiles)
    rd_p, _ = _pack_soa([rdx, rdy, rdz, tmin], PACKET * tiles)
    fn = traverse_lanes_stream if stream else traverse_lanes
    out = fn(
        wb.lane_pages, ro_p, rd_p, wb.lane_pages.shape[0] // FIELDS,
        interpret=interpret, tiles=tiles, anyhit=anyhit, inner_steps=inner_steps,
    )

    def chan(k):
        return out[:, k].reshape(-1)[:n]

    t = chan(0)
    tri = chan(2).astype(jnp.int32)
    valid = tri >= 0
    return {
        "t": jnp.where(valid, 0.0 if anyhit else t, INFINITE),
        "rnode": jnp.where(valid, chan(1).astype(jnp.int32), -1),
        "tri": jnp.where(valid, tri, -1),
        "u": chan(3),
        "v": chan(4),
    }


def intersect_rays_lane(wb, ro, rd, tmin=0.0, tmax=None, interpret=False, coherent=False, anyhit=False, max_tiles=None, inner_steps=4, stream=False):
    """intersect_rays-compatible API over the lane-traversal page table.

    Same contract as pallas_traverse.intersect_rays_packet: returns
    dict(t, rnode, tri, u, v) with misses marked t=INFINITE / ids -1.
    stream=True keeps the page table in HBM (unbounded scene size)."""
    from .pallas_traverse import _pack

    n = ro.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INFINITE)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tiles = max_tiles if max_tiles is not None else 1
    tiles = max(1, min(tiles, max(n // PACKET, 1)))
    ro_p, rd_p, n0 = _pack(ro, rd, tmin, tmax, PACKET * tiles)
    fn = traverse_lanes_stream if stream else traverse_lanes
    out = fn(
        wb.lane_pages, ro_p, rd_p, wb.lane_pages.shape[0] // FIELDS,
        interpret=interpret, tiles=tiles, anyhit=anyhit, inner_steps=inner_steps,
    )
    flatd = out.transpose(0, 2, 3, 1).reshape(-1, 5)[:n0]
    t = flatd[:, 0]
    tri = flatd[:, 2].astype(jnp.int32)
    valid = tri >= 0
    return {
        "t": jnp.where(valid, t, INFINITE),
        "rnode": jnp.where(valid, flatd[:, 1].astype(jnp.int32), -1),
        "tri": jnp.where(valid, tri, -1),
        "u": flatd[:, 3],
        "v": flatd[:, 4],
    }

"""Two-level BVH traversal in JAX (XLA while-loops, vmapped over rays).

Replaces what the reference gets from the Vulkan ray-tracing hardware
(raytracer_interface.h.slang Trace/TraceShadow/TraceLow). The wavefront
path tracer calls these on big SoA ray batches; per-ray control flow is a
nested lax.while_loop (outer TLAS stack, inner BLAS stack) which XLA
compiles into a masked batched loop under vmap.

INFINITE (miss sentinel) mirrors the reference's payload.hitT convention.
A Pallas VMEM-stack kernel is the planned fast path; this module is the
portable/correctness implementation and the oracle for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INFINITE = jnp.float32(1e32)
STACK_DEPTH = 64


def dot3(a, b):
    """f32-exact 3-vector dot (jnp.dot lowers to bf16-default dot_general on TPU)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def cross3(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def xform_point(m, p):
    """Apply 4x4 (row-major, column-vector convention) to a point — elementwise
    math only, so it stays f32 on TPU."""
    return m[:3, 0] * p[0] + m[:3, 1] * p[1] + m[:3, 2] * p[2] + m[:3, 3]


def xform_dir(m, d):
    return m[:3, 0] * d[0] + m[:3, 1] * d[1] + m[:3, 2] * d[2]


def _safe_inv(d):
    return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e30, -1e30), 1.0 / d)


def _ray_aabb(lo, hi, ro, inv_d, tmin, tmax):
    t0 = (lo - ro) * inv_d
    t1 = (hi - ro) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn), tmin)
    far = jnp.minimum(jnp.min(tf), tmax)
    return near, near <= far


def _tri_intersect(v0, v1, v2, ro, rd, tmin, tmax):
    """Möller-Trumbore; returns (hit, t, u, v). No backface culling — the
    reference traces without cull flags and resolves sidedness at shading
    (get_hit.h.slang:99-163)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = cross3(rd, e2)
    det = dot3(e1, p)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvec = ro - v0
    u = dot3(tvec, p) * inv_det
    q = cross3(tvec, e1)
    v = dot3(rd, q) * inv_det
    t = dot3(e2, q) * inv_det
    hit = (jnp.abs(det) >= 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > tmin) & (t < tmax)
    return hit, t, u, v


def _blas_traverse(bvh, flat, root, ro, rd, tmin, tmax):
    """Single-BLAS closest hit. Returns (t, tri_global, u, v)."""
    inv_d = _safe_inv(rd)

    def cond(s):
        sp = s[1]
        return sp > 0

    def body(s):
        stack, sp, t_best, tri_best, u_best, v_best = s
        sp = sp - 1
        node = stack[sp]
        is_leaf = bvh.tri[node] >= 0

        # --- leaf: one triangle test
        def leaf_fn(stack, sp, t_best, tri_best, u_best, v_best):
            tri_id = bvh.tri[node]
            idx = flat.tri_idx[tri_id]
            v0 = flat.vtx_pos[idx[0]]
            v1 = flat.vtx_pos[idx[1]]
            v2 = flat.vtx_pos[idx[2]]
            hit, t, u, v = _tri_intersect(v0, v1, v2, ro, rd, tmin, t_best)
            t_best = jnp.where(hit, t, t_best)
            tri_best = jnp.where(hit, tri_id, tri_best)
            u_best = jnp.where(hit, u, u_best)
            v_best = jnp.where(hit, v, v_best)
            return stack, sp, t_best, tri_best, u_best, v_best

        # --- internal: test children, push near-last (popped first)
        def inner_fn(stack, sp, t_best, tri_best, u_best, v_best):
            l = bvh.left[node]
            r = bvh.right[node]
            tl, hl = _ray_aabb(bvh.lo[l], bvh.hi[l], ro, inv_d, tmin, t_best)
            tr, hr = _ray_aabb(bvh.lo[r], bvh.hi[r], ro, inv_d, tmin, t_best)
            # order: near child on top of stack
            near_first = tl <= tr
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            hit_first = jnp.where(near_first, hl, hr)
            hit_second = jnp.where(near_first, hr, hl)
            stack = stack.at[sp].set(second)
            sp = sp + jnp.where(hit_second, 1, 0)
            stack = stack.at[sp].set(first)
            sp = sp + jnp.where(hit_first, 1, 0)
            return stack, sp, t_best, tri_best, u_best, v_best

        return jax.lax.cond(is_leaf, leaf_fn, inner_fn, stack, sp, t_best, tri_best, u_best, v_best)

    stack = jnp.zeros(STACK_DEPTH, jnp.int32).at[0].set(root)
    init = (stack, jnp.int32(1), tmax, jnp.int32(-1), jnp.float32(0), jnp.float32(0))
    _, _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
    return t, tri, u, v


def _intersect_one(bvh, flat, ro, rd, tmin, tmax):
    """Two-level closest hit for a single ray.

    Returns dict(t, rnode, tri, u, v); miss -> t == INFINITE, ids == -1.
    """
    inv_d = _safe_inv(rd)

    def cond(s):
        return s[1] > 0

    def body(s):
        stack, sp, t_best, rn_best, tri_best, u_best, v_best = s
        sp = sp - 1
        node = stack[sp]
        is_leaf = bvh.tl_inst[node] >= 0

        def leaf_fn(stack, sp, t_best, rn_best, tri_best, u_best, v_best):
            inst = bvh.tl_inst[node]
            w2o = flat.rn_w2o[inst]
            ro_o = xform_point(w2o, ro)
            rd_o = xform_dir(w2o, rd)  # unnormalized: keeps t in world units
            root = bvh.prim_root[flat.rn_prim[inst]]
            t, tri, u, v = _blas_traverse(bvh, flat, root, ro_o, rd_o, tmin, t_best)
            hit = tri >= 0
            t_best = jnp.where(hit, t, t_best)
            rn_best = jnp.where(hit, inst, rn_best)
            tri_best = jnp.where(hit, tri, tri_best)
            u_best = jnp.where(hit, u, u_best)
            v_best = jnp.where(hit, v, v_best)
            return stack, sp, t_best, rn_best, tri_best, u_best, v_best

        def inner_fn(stack, sp, t_best, rn_best, tri_best, u_best, v_best):
            l = bvh.tl_left[node]
            r = bvh.tl_right[node]
            tl, hl = _ray_aabb(bvh.tl_lo[l], bvh.tl_hi[l], ro, inv_d, tmin, t_best)
            tr, hr = _ray_aabb(bvh.tl_lo[r], bvh.tl_hi[r], ro, inv_d, tmin, t_best)
            near_first = tl <= tr
            first = jnp.where(near_first, l, r)
            second = jnp.where(near_first, r, l)
            hit_first = jnp.where(near_first, hl, hr)
            hit_second = jnp.where(near_first, hr, hl)
            stack = stack.at[sp].set(second)
            sp = sp + jnp.where(hit_second, 1, 0)
            stack = stack.at[sp].set(first)
            sp = sp + jnp.where(hit_first, 1, 0)
            return stack, sp, t_best, rn_best, tri_best, u_best, v_best

        return jax.lax.cond(is_leaf, leaf_fn, inner_fn, stack, sp, t_best, rn_best, tri_best, u_best, v_best)

    stack = jnp.zeros(STACK_DEPTH, jnp.int32).at[0].set(jnp.int32(bvh.tl_root))
    init = (stack, jnp.int32(1), tmax, jnp.int32(-1), jnp.int32(-1), jnp.float32(0), jnp.float32(0))
    _, _, t, rn, tri, u, v = jax.lax.while_loop(cond, body, init)
    t = jnp.where(tri >= 0, t, INFINITE)
    return {"t": t, "rnode": rn, "tri": tri, "u": u, "v": v}


def as_device(tree):
    """numpy pytree -> jnp pytree (no-op for arrays already on device)."""
    return jax.tree.map(jnp.asarray, tree)


def intersect_rays(bvh, flat, ro, rd, tmin=0.0, tmax=None):
    """Closest-hit for a ray batch. ro/rd: [N,3]. Returns dict of [N] arrays."""
    bvh = as_device(bvh)
    flat = as_device(flat)
    n = ro.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INFINITE)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    return jax.vmap(lambda o, d, t0, t1: _intersect_one(bvh, flat, o, d, t0, t1))(ro, rd, tmin, tmax)


def occluded_rays(bvh, flat, ro, rd, tmax):
    """Binary occlusion test (opaque-only TraceShadow). Returns bool [N].

    The colored-transmission shadow path (rahitShadow semantics,
    gltf_pathtrace.slang:776-820) is layered on top by the path tracer,
    which marches repeated closest hits through transmissive surfaces.
    """
    hits = intersect_rays(bvh, flat, ro, rd, tmin=0.0, tmax=tmax)
    return hits["tri"] >= 0


def intersect_brute(flat, ro, rd, tmin=0.0):
    """O(rays x tris x instances) closest-hit oracle for tests."""
    flat = as_device(flat)
    tri = flat.tri_idx

    def one_ray(o, d):
        best = dict(t=INFINITE, rnode=jnp.int32(-1), tri=jnp.int32(-1), u=jnp.float32(0), v=jnp.float32(0))

        def per_instance(i, best):
            w2o = flat.rn_w2o[i]
            o_o = xform_point(w2o, o)
            d_o = xform_dir(w2o, d)
            p = flat.rn_prim[i]
            first = flat.prim_first_tri[p]
            count = flat.prim_tri_count[p]
            tids = jnp.arange(tri.shape[0])
            in_prim = (tids >= first) & (tids < first + count) & (flat.rn_visible[i] > 0)
            v0 = flat.vtx_pos[tri[:, 0]]
            v1 = flat.vtx_pos[tri[:, 1]]
            v2 = flat.vtx_pos[tri[:, 2]]
            hit, t, u, v = jax.vmap(lambda a, b, c: _tri_intersect(a, b, c, o_o, d_o, tmin, INFINITE))(v0, v1, v2)
            t = jnp.where(hit & in_prim, t, INFINITE)
            k = jnp.argmin(t)
            better = t[k] < best["t"]
            return dict(
                t=jnp.where(better, t[k], best["t"]),
                rnode=jnp.where(better, i, best["rnode"]),
                tri=jnp.where(better, k.astype(jnp.int32), best["tri"]),
                u=jnp.where(better, u[k], best["u"]),
                v=jnp.where(better, v[k], best["v"]),
            )

        return jax.lax.fori_loop(0, flat.rn_o2w.shape[0], per_instance, best)

    return jax.vmap(one_ray)(ro, rd)

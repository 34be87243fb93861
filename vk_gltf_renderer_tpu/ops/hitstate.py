"""Hit-state reconstruction: barycentric attribute interpolation, normal
handling, shadow-terminator offset (reference get_hit.h.slang:59-173).

Batched over ray lanes: every input is [...,] shaped; gathers use the
SceneFlat concatenated vertex arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .traverse import cross3, dot3, xform_dir, xform_point


def _xform_point_b(m, p):
    """Batched 4x4 point transform. m: [...,4,4], p: [...,3]."""
    return (
        m[..., :3, 0] * p[..., 0:1] + m[..., :3, 1] * p[..., 1:2] + m[..., :3, 2] * p[..., 2:3] + m[..., :3, 3]
    )


def _xform_dir_b(m, d):
    return m[..., :3, 0] * d[..., 0:1] + m[..., :3, 1] * d[..., 1:2] + m[..., :3, 2] * d[..., 2:3]


def _xform_normal_b(w2o, n):
    """Normals transform by the inverse-transpose: rows of w2o."""
    return (
        w2o[..., 0, :3] * n[..., 0:1] + w2o[..., 1, :3] * n[..., 1:2] + w2o[..., 2, :3] * n[..., 2:3]
    )


def _normalize(v):
    return v / jnp.maximum(jnp.sqrt(dot3(v, v)), 1e-20)[..., None]


def _point_offset(p, p0, p1, p2, n0, n1, n2, bary):
    """Shadow-terminator offset (Hanika 2021, 'Hacking the Shadow Terminator'
    — reference pointOffset via get_hit.h.slang:105). Object space."""
    u, v, w = bary[..., 0:1], bary[..., 1:2], bary[..., 2:3]
    tmp_u = p - p0
    tmp_v = p - p1
    tmp_w = p - p2
    du = jnp.minimum(0.0, dot3(tmp_u, n0))[..., None] * n0
    dv = jnp.minimum(0.0, dot3(tmp_v, n1))[..., None] * n1
    dw = jnp.minimum(0.0, dot3(tmp_w, n2))[..., None] * n2
    return p - (u * du + v * dv + w * dw)


def _make_fast_tangent(n):
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1)
    return t


def get_hit_state(flat, hit, ray_dir):
    """Reconstruct the shading frame at hit points.

    hit: dict from intersect_rays (t, rnode, tri, u, v) — lanes with tri<0
    produce garbage values that the caller masks. Returns dict with
    pos, nrm, geonrm, tangent, bitangent, uv0, uv1, color, shadow_pos,
    texel_density, front_face.
    """
    tri = jnp.maximum(hit["tri"], 0)
    rnode = jnp.maximum(hit["rnode"], 0)
    idx = flat.tri_idx[tri]  # [...,3]
    i0, i1, i2 = idx[..., 0], idx[..., 1], idx[..., 2]
    u = hit["u"][..., None]
    v = hit["v"][..., None]
    w = 1.0 - u - v
    bary = jnp.concatenate([w, u, v], axis=-1)

    rn_row = flat.rn_packed[rnode]  # one 32-wide gather for both matrices
    o2w = rn_row[..., :16].reshape(rn_row.shape[:-1] + (4, 4))
    w2o = rn_row[..., 16:].reshape(rn_row.shape[:-1] + (4, 4))

    # ONE packed row per corner (pos3 nrm3 tan4 uv0_2 uv1_2 color4): gathers
    # cost per row on TPU, so this replaces ~18 narrow gathers with 3
    va = flat.vtx_packed[i0]
    vb = flat.vtx_packed[i1]
    vc = flat.vtx_packed[i2]
    p0, p1, p2 = va[..., 0:3], vb[..., 0:3], vc[..., 0:3]
    pos_obj = p0 * w + p1 * u + p2 * v
    pos = _xform_point_b(o2w, pos_obj)

    geo_n_obj = _normalize(cross3(p1 - p0, p2 - p0))
    geonrm = _normalize(_xform_normal_b(w2o, geo_n_obj))

    n0 = va[..., 3:6]
    n1 = vb[..., 3:6]
    n2 = vc[..., 3:6]
    nrm_obj = _normalize(n0 * w + n1 * u + n2 * v)
    nrm = _normalize(_xform_normal_b(w2o, nrm_obj))

    front_face = dot3(geonrm, ray_dir) < 0.0
    side = jnp.where(front_face, 1.0, -1.0)[..., None]

    # shadow-terminator offset position (object space, then to world)
    sp_obj = _point_offset(pos_obj, p0, p1, p2, n0 * side, n1 * side, n2 * side, bary)
    shadow_pos = _xform_point_b(o2w, sp_obj)

    uv0 = va[..., 10:12] * w + vb[..., 10:12] * u + vc[..., 10:12] * v
    uv1 = va[..., 12:14] * w + vb[..., 12:14] * u + vc[..., 12:14] * v
    color = va[..., 14:18] * w + vb[..., 14:18] * u + vc[..., 14:18] * v

    # texel density for ray-cone LOD (get_hit.h.slang:44-55)
    we1 = _xform_dir_b(o2w, p1 - p0)
    we2 = _xform_dir_b(o2w, p2 - p0)
    w_area = jnp.sqrt(dot3(cross3(we1, we2), cross3(we1, we2)))
    duv1 = vb[..., 10:12] - va[..., 10:12]
    duv2 = vc[..., 10:12] - va[..., 10:12]
    uv_area = jnp.abs(duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0])
    prim = flat.rn_prim[rnode]
    has_uv = flat.prim_has_uv0[prim] > 0
    texel_density = jnp.where(
        has_uv, jnp.sqrt(jnp.maximum(uv_area, 1e-20) / jnp.maximum(w_area, 1e-20)), 0.0
    )

    # tangent: vertex tangents (always present in SceneFlat — synthesized at
    # flatten time when missing), orthonormalized against the shading normal
    t0 = va[..., 6:10]
    tan_obj = _normalize((t0[..., :3] * w + vb[..., 6:9] * u + vc[..., 6:9] * v))
    tangent = _xform_dir_b(o2w, tan_obj)
    tangent = _normalize(tangent - nrm * dot3(nrm, tangent)[..., None])
    bitangent = cross3(nrm, tangent) * t0[..., 3:4]

    # flip geometric normal toward ray origin for back-face hits
    geonrm = jnp.where(front_face[..., None], geonrm, -geonrm)
    # shading normal on the same side as the geometric normal
    flip_sh = dot3(geonrm, nrm) < 0.0
    nrm = jnp.where(flip_sh[..., None], -nrm, nrm)
    tangent = jnp.where(flip_sh[..., None], -tangent, tangent)
    bitangent = jnp.where(flip_sh[..., None], -bitangent, bitangent)

    # low-tessellation internal-reflection guard (get_hit.h.slang:166-170)
    r = ray_dir - 2.0 * dot3(ray_dir, nrm)[..., None] * nrm
    nrm = jnp.where((dot3(r, geonrm) < 0.0)[..., None], geonrm, nrm)

    return {
        "pos": pos,
        "nrm": nrm,
        "geonrm": geonrm,
        "shadow_pos": shadow_pos,
        "tangent": tangent,
        "bitangent": bitangent,
        "uv0": uv0,
        "uv1": uv1,
        "color": color,
        "texel_density": texel_density,
        "front_face": front_face,
    }


# ----------------------------------------------------------- fused hit state
#
# The per-bounce shading glue above costs 5 row-gathers per lane (tri_idx,
# rn_packed, 3x vtx_packed) plus two 4x4 transforms — profiled at ~31 ms per
# 2M lanes on v5e, comparable to the traversal itself. The fused path bakes
# everything hit reconstruction needs into ONE per-WORLD-triangle row
# (world-space corners, normal/tangent corners pre-transformed, uvs, colors,
# per-tri texel density): shading then costs ONE wide gather + pure vector
# math. Addressing needs no new kernel outputs: world tris are emitted
# per-render-node contiguously (bvh_flatten.build_world_bvh), so
# row = rn_attr_base[rnode] + tri for every traversal backend.
# Reference anchor: get_hit.h.slang:59-173 (same outputs).

HIT_ATTR_COLS = 64
# column layout (see bake_hit_attrs):
#  0:9   n0,n1,n2   world-space corner normals (inverse-transpose transformed,
#                   UNnormalized — interpolation then one normalize matches
#                   the legacy normalize(M @ normalize(interp)) direction)
#  9:18  t0,t1,t2   world-space corner tangent dirs (UNnormalized)
#  18    tan_w      handedness (corner a's tangent w)
#  19:25 uv0 a,b,c
#  25:31 uv1 a,b,c
#  31:43 color a,b,c (rgba each)
#  43    texel_density (per tri, precomputed; 0 when the prim has no UVs)
#  44:53 p0,p1,p2   world-space corner positions
#  53    geo_sign   sign(det(o2w)) — world-space edge cross flips on mirrored
#                   instances; multiply restores the object-space orientation
#  54:64 pad

# NARROW rows: the GLTF_USE-style data specialization of the row itself.
# When the scene has NO textures (uv0/uv1/texel_density are provably
# unconsumed: every sampling subgraph is compile-dropped, and tex_lod only
# feeds those subgraphs) and NO vertex colors (the color columns are
# constant 1), the row shrinks 64 -> 32 f32 — the get_hit_state_fused wide
# gather is the single largest frame-glue item (~39 ms per 2M lanes on
# v5e, tools/exp_glue.py), and its cost is linear in row bytes. Tangents
# are KEPT so the bsdf sampling frame (and therefore every golden image)
# is bit-identical to the wide path. Eligibility is decided from the flat
# scene data at build time (bvh_flatten build_world_bvh).
HIT_ATTR_COLS_NARROW = 32
# narrow column layout:
#  0:9   n0,n1,n2    9:18 t0,t1,t2    18 tan_w
#  19:28 p0,p1,p2   28 geo_sign      29:32 pad


def _bake_hit_attrs(xp, vtx_packed, tri_idx, rn_packed, attr_rnode, attr_tri, attr_has_uv,
                    narrow=False, attr_bary=None):
    """Shared np/jnp implementation (xp = numpy or jax.numpy).

    attr_bary: optional [Ta,6] parent-barycentric corner (u,v)s (subtriangle
    OMM rows, bvh_flatten.WorldBvh.attr_bary). Every per-corner attribute is
    linear over the triangle, so a subtriangle row is the barycentric
    recombination of its parent's corner data — interpolating inside the
    subtriangle then composes to EXACTLY the parent interpolation at the
    composed barycentrics. Handedness (tangent w) is non-interpolable and
    keeps the parent's corner-a value (the row already uses only corner a)."""
    idx = tri_idx[attr_tri]  # [Ta,3]
    rn_row = rn_packed[attr_rnode]  # [Ta,32]
    o2w = rn_row[:, :16].reshape(-1, 4, 4)
    w2o = rn_row[:, 16:32].reshape(-1, 4, 4)
    va = vtx_packed[idx[:, 0]]
    vb = vtx_packed[idx[:, 1]]
    vc = vtx_packed[idx[:, 2]]
    if attr_bary is not None:
        tanw = va[:, 9:10]

        def interp(bu, bv):
            w = (1.0 - bu - bv)[:, None]
            return va * w + vb * bu[:, None] + vc * bv[:, None]

        va2 = interp(attr_bary[:, 0], attr_bary[:, 1])
        vb2 = interp(attr_bary[:, 2], attr_bary[:, 3])
        vc2 = interp(attr_bary[:, 4], attr_bary[:, 5])
        if xp is np:
            va2[:, 9:10] = tanw
            vb2[:, 9:10] = tanw
            vc2[:, 9:10] = tanw
        else:
            va2 = va2.at[:, 9:10].set(tanw)
            vb2 = vb2.at[:, 9:10].set(tanw)
            vc2 = vc2.at[:, 9:10].set(tanw)
        va, vb, vc = va2, vb2, vc2

    def xf_point(p):
        return (
            o2w[:, :3, 0] * p[:, 0:1] + o2w[:, :3, 1] * p[:, 1:2] + o2w[:, :3, 2] * p[:, 2:3] + o2w[:, :3, 3]
        )

    def xf_dir(d):
        return o2w[:, :3, 0] * d[:, 0:1] + o2w[:, :3, 1] * d[:, 1:2] + o2w[:, :3, 2] * d[:, 2:3]

    def xf_nrm(n):
        return w2o[:, 0, :3] * n[:, 0:1] + w2o[:, 1, :3] * n[:, 1:2] + w2o[:, 2, :3] * n[:, 2:3]

    p0, p1, p2 = xf_point(va[:, 0:3]), xf_point(vb[:, 0:3]), xf_point(vc[:, 0:3])
    n0, n1, n2 = xf_nrm(va[:, 3:6]), xf_nrm(vb[:, 3:6]), xf_nrm(vc[:, 3:6])
    t0, t1, t2 = xf_dir(va[:, 6:9]), xf_dir(vb[:, 6:9]), xf_dir(vc[:, 6:9])

    we1 = p1 - p0
    we2 = p2 - p0
    wc = xp.cross(we1, we2)
    w_area = xp.sqrt(xp.maximum((wc * wc).sum(-1), 1e-20))
    duv1 = vb[:, 10:12] - va[:, 10:12]
    duv2 = vc[:, 10:12] - va[:, 10:12]
    uv_area = xp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    texel_density = xp.where(
        attr_has_uv > 0, xp.sqrt(xp.maximum(uv_area, 1e-20) / w_area), xp.zeros_like(w_area)
    )
    m = o2w[:, :3, :3]
    det = (
        m[:, 0, 0] * (m[:, 1, 1] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 1])
        - m[:, 0, 1] * (m[:, 1, 0] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 0])
        + m[:, 0, 2] * (m[:, 1, 0] * m[:, 2, 1] - m[:, 1, 1] * m[:, 2, 0])
    )
    geo_sign = xp.where(det < 0, -1.0, 1.0)

    if narrow:
        cols = [
            n0, n1, n2,                  # 0:9
            t0, t1, t2,                  # 9:18
            va[:, 9:10],                 # 18 tangent w
            p0, p1, p2,                  # 19:28
            geo_sign[:, None],           # 28
            xp.zeros((va.shape[0], HIT_ATTR_COLS_NARROW - 29), va.dtype),
        ]
    else:
        cols = [
            n0, n1, n2,                      # 0:9
            t0, t1, t2,                      # 9:18
            va[:, 9:10],                     # 18 tangent w
            va[:, 10:12], vb[:, 10:12], vc[:, 10:12],  # 19:25 uv0
            va[:, 12:14], vb[:, 12:14], vc[:, 12:14],  # 25:31 uv1
            va[:, 14:18], vb[:, 14:18], vc[:, 14:18],  # 31:43 color
            texel_density[:, None],          # 43
            p0, p1, p2,                      # 44:53
            geo_sign[:, None],               # 53
            xp.zeros((va.shape[0], HIT_ATTR_COLS - 54), va.dtype),
        ]
    return xp.concatenate(cols, axis=1).astype(xp.float32)


def narrow_attr_ok(flat) -> bool:
    """Is the NARROW hit-attr row (HIT_ATTR_COLS_NARROW) image-identical for
    this scene?  True iff the texture pool is the 1x1 white fallback (no
    images -> every texture-sampling subgraph is compile-dropped, so
    uv0/uv1/texel_density are unconsumed) and vertex colors are constant 1
    (the color columns would gather a constant).  VKGR_WIDE_ATTR=1 forces
    the wide row for A/B."""
    import os

    import numpy as np

    if os.environ.get("VKGR_WIDE_ATTR", "0") != "0":
        return False
    td = np.asarray(flat.tex_desc)
    untextured = td.shape[0] == 1 and int(td[0, 1]) == 1 and int(td[0, 2]) == 1
    colors_const = bool((np.asarray(flat.vtx_packed)[:, 14:18] == 1.0).all())
    return untextured and colors_const


def bake_hit_attrs_np(flat, attr_rnode, attr_tri, narrow=False, attr_bary=None):
    """Build-time numpy bake (bvh_flatten.build_world_bvh)."""
    import numpy as np

    vtx_packed = np.asarray(flat.vtx_packed, np.float32)
    tri_idx = np.asarray(flat.tri_idx)
    rn_packed = np.asarray(flat.rn_packed, np.float32)
    rn_prim = np.asarray(flat.rn_prim)
    has_uv = np.asarray(flat.prim_has_uv0)[rn_prim[attr_rnode]]
    if attr_bary is not None:
        attr_bary = np.asarray(attr_bary, np.float32)
    out = _bake_hit_attrs(np, vtx_packed, tri_idx, rn_packed, attr_rnode, attr_tri, has_uv,
                          narrow=narrow, attr_bary=attr_bary)
    return out.astype(np.float32), has_uv.astype(np.int32)


def bake_hit_attrs(vtx_packed, tri_idx, rn_packed, attr_rnode, attr_tri, attr_has_uv,
                   narrow=False, attr_bary=None):
    """Refit-time device bake (jit from renderer._refit_device; `narrow`
    must match the build-time table width and be static under jit)."""
    return _bake_hit_attrs(jnp, vtx_packed, tri_idx, rn_packed, attr_rnode, attr_tri,
                           attr_has_uv, narrow=narrow, attr_bary=attr_bary)


def get_hit_state_fused(hit_attr, rn_attr_base, hit, ray_dir):
    """get_hit_state from the baked per-world-tri rows: ONE wide gather.

    Same outputs/contract as get_hit_state (get_hit.h.slang:59-173); the
    math runs directly in world space on pre-transformed corner data."""
    tri = jnp.maximum(hit["tri"], 0)
    rnode = jnp.maximum(hit["rnode"], 0)
    row_id = jnp.clip(rn_attr_base[rnode] + tri, 0, hit_attr.shape[0] - 1)
    row = hit_attr[row_id]  # [...,64|32] — the one gather
    narrow = hit_attr.shape[-1] == HIT_ATTR_COLS_NARROW  # static under jit

    u = hit["u"][..., None]
    v = hit["v"][..., None]
    w = 1.0 - u - v

    n0, n1, n2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
    t0, t1, t2 = row[..., 9:12], row[..., 12:15], row[..., 15:18]
    if narrow:
        p0, p1, p2 = row[..., 19:22], row[..., 22:25], row[..., 25:28]
        geo_sign = row[..., 28:29]
    else:
        p0, p1, p2 = row[..., 44:47], row[..., 47:50], row[..., 50:53]
        geo_sign = row[..., 53:54]

    pos = p0 * w + p1 * u + p2 * v
    geonrm = _normalize(cross3(p1 - p0, p2 - p0)) * geo_sign
    nrm = _normalize(n0 * w + n1 * u + n2 * v)

    front_face = dot3(geonrm, ray_dir) < 0.0
    side = jnp.where(front_face, 1.0, -1.0)[..., None]

    # shadow-terminator offset in world space (unit corner normals)
    n0h, n1h, n2h = _normalize(n0) * side, _normalize(n1) * side, _normalize(n2) * side
    du = jnp.minimum(0.0, dot3(pos - p0, n0h))[..., None] * n0h
    dv = jnp.minimum(0.0, dot3(pos - p1, n1h))[..., None] * n1h
    dw = jnp.minimum(0.0, dot3(pos - p2, n2h))[..., None] * n2h
    shadow_pos = pos - (w * du + u * dv + v * dw)

    if narrow:
        # provably-unconsumed / constant channels (see HIT_ATTR_COLS_NARROW)
        uv0 = jnp.zeros(row.shape[:-1] + (2,), row.dtype)
        uv1 = uv0
        color = jnp.ones(row.shape[:-1] + (4,), row.dtype)
    else:
        uv0 = row[..., 19:21] * w + row[..., 21:23] * u + row[..., 23:25] * v
        uv1 = row[..., 25:27] * w + row[..., 27:29] * u + row[..., 29:31] * v
        color = row[..., 31:35] * w + row[..., 35:39] * u + row[..., 39:43] * v

    tangent = _normalize(t0 * w + t1 * u + t2 * v)
    tangent = _normalize(tangent - nrm * dot3(nrm, tangent)[..., None])
    bitangent = cross3(nrm, tangent) * row[..., 18:19]

    geonrm = jnp.where(front_face[..., None], geonrm, -geonrm)
    flip_sh = dot3(geonrm, nrm) < 0.0
    nrm = jnp.where(flip_sh[..., None], -nrm, nrm)
    tangent = jnp.where(flip_sh[..., None], -tangent, tangent)
    bitangent = jnp.where(flip_sh[..., None], -bitangent, bitangent)

    r = ray_dir - 2.0 * dot3(ray_dir, nrm)[..., None] * nrm
    nrm = jnp.where((dot3(r, geonrm) < 0.0)[..., None], geonrm, nrm)

    return {
        "pos": pos,
        "nrm": nrm,
        "geonrm": geonrm,
        "shadow_pos": shadow_pos,
        "tangent": tangent,
        "bitangent": bitangent,
        "uv0": uv0,
        "uv1": uv1,
        "color": color,
        "texel_density": jnp.zeros(row.shape[:-1], row.dtype) if narrow else row[..., 43],
        "front_face": front_face,
    }


def safe_offset_ray(pos, offset_dir):
    """Self-intersection offset, Wächter & Binder 2019 (reference
    pathtrace_functions.h.slang:151-167): integer ULP nudge scaled by
    magnitude, float fallback near the origin."""
    import jax

    int_scale = (256.0 * offset_dir).astype(jnp.int32)
    pi = jax.lax.bitcast_convert_type(pos, jnp.int32)
    moved = jax.lax.bitcast_convert_type(
        pi + jnp.where(pos < 0, -int_scale, int_scale), jnp.float32
    )
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    return jnp.where(jnp.abs(pos) < origin, pos + float_scale * offset_dir, moved)

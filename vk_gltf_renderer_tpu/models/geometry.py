"""Primitive geometry extraction + tangent synthesis (host-side, numpy).

Replaces the decode half of the reference's SceneVk::createVertexBuffers
(gltf_scene_vk.cpp:741) and the tangent generator
(gltf_create_tangent.cpp: UV-gradient fast path; MikkTSpace parity is a
later milestone).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import accessors as acc
from .gltf import GltfModel


@dataclass
class PrimitiveData:
    """Decoded SoA geometry for one RenderPrimitive (float32/uint32)."""

    positions: np.ndarray  # [V,3] f32
    indices: np.ndarray  # [T,3] u32
    normals: np.ndarray | None = None  # [V,3] f32
    tangents: np.ndarray | None = None  # [V,4] f32 (w = handedness)
    uv0: np.ndarray | None = None  # [V,2] f32
    uv1: np.ndarray | None = None  # [V,2] f32
    color0: np.ndarray | None = None  # [V,4] f32
    joints0: np.ndarray | None = None  # [V,4] u16/int
    weights0: np.ndarray | None = None  # [V,4] f32
    morph_targets: list = field(default_factory=list)  # list of dicts attr->delta [V,3]


def extract_primitive(model: GltfModel, prim: dict) -> PrimitiveData:
    attrs = prim.get("attributes", {})
    positions = np.ascontiguousarray(acc.read_accessor(model, attrs["POSITION"]), np.float32)
    nv = positions.shape[0]
    if "indices" in prim:
        idx = acc.read_accessor(model, prim["indices"]).astype(np.uint32)
    else:
        idx = np.arange(nv, dtype=np.uint32)
    tri = idx.reshape(-1, 3)

    def opt(name, ncomp=None, dtype=np.float32):
        if name not in attrs:
            return None
        a = acc.read_accessor(model, attrs[name])
        a = np.asarray(a, dtype)
        if ncomp is not None and a.ndim == 2 and a.shape[1] != ncomp:
            if a.shape[1] < ncomp:  # COLOR_0 VEC3 -> VEC4 (alpha=1)
                pad = np.ones((a.shape[0], ncomp - a.shape[1]), dtype)
                a = np.concatenate([a, pad], axis=1)
            else:
                a = a[:, :ncomp]
        return np.ascontiguousarray(a)

    morphs = []
    for target in prim.get("targets", []):
        m = {}
        for k, ai in target.items():
            m[k] = np.asarray(acc.read_accessor(model, ai), np.float32)
        morphs.append(m)

    return PrimitiveData(
        positions=positions,
        indices=tri,
        normals=opt("NORMAL", 3),
        tangents=opt("TANGENT", 4),
        uv0=opt("TEXCOORD_0", 2),
        uv1=opt("TEXCOORD_1", 2),
        color0=opt("COLOR_0", 4),
        joints0=(acc.read_accessor(model, attrs["JOINTS_0"], dequantize=False).astype(np.int32) if "JOINTS_0" in attrs else None),
        weights0=opt("WEIGHTS_0", 4),
        morph_targets=morphs,
    )


def compute_face_normals(positions: np.ndarray, tri: np.ndarray) -> np.ndarray:
    e1 = positions[tri[:, 1]] - positions[tri[:, 0]]
    e2 = positions[tri[:, 2]] - positions[tri[:, 0]]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(ln, 1e-20)


def compute_smooth_normals(positions: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals for primitives lacking NORMAL."""
    fn = np.cross(positions[tri[:, 1]] - positions[tri[:, 0]], positions[tri[:, 2]] - positions[tri[:, 0]])
    vn = np.zeros_like(positions)
    for k in range(3):
        np.add.at(vn, tri[:, k], fn)
    ln = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(ln, 1e-20)).astype(np.float32)


def generate_tangents_uv(positions, normals, uv0, tri) -> np.ndarray:
    """UV-gradient tangent synthesis (reference gltf_create_tangent.cpp fast
    path — Lengyel's method, accumulated per vertex then orthonormalized).

    MikkTSpace-exact parity (with vertex splitting) is a later milestone;
    this path matches the reference's behavior for the common case where a
    primitive has normals+UVs but no TANGENT attribute.
    """
    v0, v1, v2 = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    w0, w1, w2 = uv0[tri[:, 0]], uv0[tri[:, 1]], uv0[tri[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    du1, dv1 = w1[:, 0] - w0[:, 0], w1[:, 1] - w0[:, 1]
    du2, dv2 = w2[:, 0] - w0[:, 0], w2[:, 1] - w0[:, 1]
    det = du1 * dv2 - du2 * dv1
    r = np.where(np.abs(det) < 1e-20, 0.0, 1.0 / np.where(det == 0, 1.0, det))
    tdir = (e1 * dv2[:, None] - e2 * dv1[:, None]) * r[:, None]
    bdir = (e2 * du1[:, None] - e1 * du2[:, None]) * r[:, None]

    tan = np.zeros_like(positions)
    bitan = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tan, tri[:, k], tdir)
        np.add.at(bitan, tri[:, k], bdir)

    # Gram-Schmidt orthonormalize against the normal; fall back to any
    # perpendicular axis for degenerate UVs (reference makeFastTangent).
    n = normals
    t = tan - n * np.sum(n * tan, axis=1, keepdims=True)
    tl = np.linalg.norm(t, axis=1, keepdims=True)
    bad = (tl[:, 0] < 1e-8)
    fallback = _make_fast_tangent(n)
    t = np.where(bad[:, None], fallback, t / np.maximum(tl, 1e-20))
    handed = np.where(np.sum(np.cross(n, t) * bitan, axis=1) < 0.0, -1.0, 1.0)
    return np.concatenate([t, handed[:, None]], axis=1).astype(np.float32)


def _make_fast_tangent(n: np.ndarray) -> np.ndarray:
    """Branchless ONB tangent from a normal (Frisvad-style; reference
    nvshaders makeFastTangent semantics)."""
    sgn = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sgn + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1.0 + sgn * n[:, 0] * n[:, 0] * a, sgn * b, -sgn * n[:, 0]], axis=1)
    return t

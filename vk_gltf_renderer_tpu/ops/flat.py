"""SceneFlat: the device-side scene mirror as a pytree of arrays.

TPU-native equivalent of SceneVk (gltf_scene_vk.hpp:53-245) + the
buffer-device-address scene table (GltfScene, gltf_scene_io.h.slang:314-322).
Where the reference uploads SSBOs behind pointers, we build ONE pytree of
jnp-compatible numpy arrays:

  geometry   concatenated SoA over all RenderPrimitives (vertex arrays with
             per-primitive offsets, triangle indices pre-offset to global)
  rnodes     render-node table {o2w, w2o, materialID, renderPrimID, visible}
  materials  struct-of-arrays with GltfShadeMaterial field semantics
  tex_infos  texture-info table (slot 0 = "no texture" sentinel)
  textures   flat texel pool + per-(texture,mip) descriptors (ops/textures.py)
  lights     punctual light table (KHR_lights_punctual)

Missing attributes are synthesized exactly like SceneVk::createVertexBuffers
(gltf_scene_vk.cpp:741): smooth normals when NORMAL is absent, UV-gradient
tangents when TANGENT is absent (MikkTSpace parity later), white COLOR_0,
zero UVs. Everything is float32/int32, static shapes — jit-stable as long as
geometry doesn't change (geometry edits raise PRIMITIVES_CHANGED and force a
rebuild, matching the reference's BLAS rebuild ladder renderer.hpp:82-116).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields as dc_fields

import numpy as np

from ..models import materials as mats
from ..models.geometry import (
    PrimitiveData,
    compute_smooth_normals,
    extract_primitive,
    generate_tangents_uv,
    _make_fast_tangent,
)

_LIGHT_TYPES = {"directional": 1, "spot": 2, "point": 3}


@dataclass
class SceneFlat:
    """Pytree of scene arrays. All jnp-compatible numpy (or jnp) arrays."""

    # geometry (concatenated)
    vtx_pos: np.ndarray  # [V,3] f32
    vtx_nrm: np.ndarray  # [V,3] f32
    vtx_tan: np.ndarray  # [V,4] f32
    vtx_uv0: np.ndarray  # [V,2] f32
    vtx_uv1: np.ndarray  # [V,2] f32
    vtx_color: np.ndarray  # [V,4] f32
    tri_idx: np.ndarray  # [T,3] i32 global vertex indices
    prim_first_tri: np.ndarray  # [P] i32
    prim_tri_count: np.ndarray  # [P] i32
    prim_first_vtx: np.ndarray  # [P] i32
    prim_vtx_count: np.ndarray  # [P] i32
    prim_has_nrm: np.ndarray  # [P] i32 (source had NORMAL)
    prim_has_uv0: np.ndarray  # [P] i32
    prim_has_color: np.ndarray  # [P] i32
    # render nodes
    rn_o2w: np.ndarray  # [N,4,4] f32
    rn_w2o: np.ndarray  # [N,4,4] f32
    rn_material: np.ndarray  # [N] i32 (clamped >= 0)
    rn_prim: np.ndarray  # [N] i32
    rn_visible: np.ndarray  # [N] i32
    # materials SoA: field name -> [M, ...]
    materials: dict
    # packed copies: gathers on TPU cost per ROW, so shading gathers one
    # wide row instead of ~40 scalars (see docs/ARCHITECTURE.md)
    vtx_packed: np.ndarray  # [V,24] pos3 nrm3 tan4 uv0_2 uv1_2 color4 pad
    mat_packed: np.ndarray  # [M,K] all material fields flattened (f32)
    rn_packed: np.ndarray  # [N,32] o2w(16) + w2o(16) row-major — one gather
    # texture infos
    ti_index: np.ndarray  # [TI] i32 (into texture descriptor table; -1 none)
    ti_texcoord: np.ndarray  # [TI] i32
    ti_uvxform: np.ndarray  # [TI,2,3] f32
    # lights
    light_type: np.ndarray  # [L] i32 (1=dir,2=spot,3=point); L>=1 padded
    light_pos: np.ndarray  # [L,3]
    light_dir: np.ndarray  # [L,3]
    light_color: np.ndarray  # [L,3]
    light_intensity: np.ndarray  # [L]
    light_radius: np.ndarray  # [L]
    light_angular_or_invrange: np.ndarray  # [L] angular size (dir) / 1/range
    light_cone: np.ndarray  # [L,2] cos(outer), 1/(cos(inner)-cos(outer))
    num_lights: int  # static
    # textures (filled by ops/textures.py; white 1x1 fallback).
    # QUAD-PACKED: row i holds the 4 bilinear taps anchored at texel i
    # (self, right, down, diag; REPEAT wrap baked in at pack time) so one
    # bilinear fetch is ONE row gather instead of four — TPU gathers cost
    # per row, and texel-pool gathers dominate textured-frame time
    # (helmet mateval 1603 ms naive, tools/exp_glue.py).
    tex_quads: np.ndarray  # [K,16] f32 quad-packed pool
    tex_desc: np.ndarray  # [D,4] i32 (offset, width, height, _)
    tex_mip_table: np.ndarray  # [ntex, max_mips] i32 -> desc row (-1 pad)
    tex_num_mips: np.ndarray  # [ntex] i32

    @property
    def tex_texels(self):
        """Plain [K,4] texel view (tap 0 of each quad row) for host-side
        consumers (ops/omm.py alpha maps, codec conformance tests)."""
        return self.tex_quads[..., :4]

    def tree_flatten(self):
        names = [f.name for f in dc_fields(self) if f.name not in ("num_lights",)]
        return [getattr(self, n) for n in names], (self.num_lights,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names = [f.name for f in dc_fields(cls) if f.name not in ("num_lights",)]
        kw = dict(zip(names, children))
        kw["num_lights"] = aux[0]
        return cls(**kw)


def _register():
    import jax

    jax.tree_util.register_pytree_node(SceneFlat, SceneFlat.tree_flatten, SceneFlat.tree_unflatten)


_register()

MATERIAL_ARRAY_FIELDS = None  # initialized on first build

# static layout of mat_packed rows: field -> (offset, width). Computed once
# from the ShadeMaterial dataclass; shared by ops/materials_eval.py.
MAT_LAYOUT: dict = {}
MAT_ROW_WIDTH = 0


def _init_mat_layout():
    global MAT_LAYOUT, MAT_ROW_WIDTH
    if MAT_LAYOUT:
        return
    off = 0
    probe = mats.ShadeMaterial()
    for f in dc_fields(mats.ShadeMaterial):
        v = np.asarray(getattr(probe, f.name))
        w = int(v.size)
        MAT_LAYOUT[f.name] = (off, w)
        off += w
    MAT_ROW_WIDTH = off


def _materials_packed(mat_soa: dict, m: int) -> np.ndarray:
    _init_mat_layout()
    out = np.zeros((m, MAT_ROW_WIDTH), np.float32)
    for name, (off, w) in MAT_LAYOUT.items():
        arr = mat_soa[name].reshape(m, -1).astype(np.float32)
        out[:, off : off + w] = arr
    return out


def _materials_soa(shade_materials: list) -> dict:
    out = {}
    for f in dc_fields(mats.ShadeMaterial):
        vals = [np.asarray(getattr(m, f.name)) for m in shade_materials]
        arr = np.stack(vals).astype(np.float32 if vals[0].dtype.kind == "f" else np.int32)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        if arr.dtype.kind in "iu":
            arr = arr.astype(np.int32)
        out[f.name] = arr
    return out


def build_scene_flat(scene, *, with_textures: bool = True) -> SceneFlat:
    """Scene (host) -> SceneFlat (device arrays). Reference SceneVk::create
    (gltf_scene_vk.cpp:218) + updateSceneDescBuffer (:330)."""
    model = scene.model

    pos_l, nrm_l, tan_l, uv0_l, uv1_l, col_l, tri_l = [], [], [], [], [], [], []
    pft, ptc, pfv, pvc, phn, phu, phc = [], [], [], [], [], [], []
    v_off = 0
    t_off = 0
    for rp in scene.render_primitives:
        pd: PrimitiveData = extract_primitive(model, rp.primitive(model))
        nv = pd.positions.shape[0]
        nt = pd.indices.shape[0]
        nrm = pd.normals if pd.normals is not None else compute_smooth_normals(pd.positions, pd.indices)
        if pd.tangents is not None:
            tan = pd.tangents.astype(np.float32)
        elif pd.uv0 is not None:
            tan = generate_tangents_uv(pd.positions, nrm, pd.uv0, pd.indices)
        else:
            t3 = _make_fast_tangent(nrm)
            tan = np.concatenate([t3, np.ones((nv, 1), np.float32)], axis=1).astype(np.float32)
        uv0 = pd.uv0 if pd.uv0 is not None else np.zeros((nv, 2), np.float32)
        uv1 = pd.uv1 if pd.uv1 is not None else uv0
        col = pd.color0 if pd.color0 is not None else np.ones((nv, 4), np.float32)

        pos_l.append(pd.positions)
        nrm_l.append(nrm.astype(np.float32))
        tan_l.append(tan)
        uv0_l.append(uv0.astype(np.float32))
        uv1_l.append(uv1.astype(np.float32))
        col_l.append(col.astype(np.float32))
        tri_l.append(pd.indices.astype(np.int64) + v_off)
        pft.append(t_off)
        ptc.append(nt)
        pfv.append(v_off)
        pvc.append(nv)
        phn.append(1 if pd.normals is not None else 0)
        phu.append(1 if pd.uv0 is not None else 0)
        phc.append(1 if pd.color0 is not None else 0)
        v_off += nv
        t_off += nt

    if v_off == 0:  # empty scene: one degenerate triangle keeps shapes valid
        pos_l = [np.zeros((3, 3), np.float32)]
        nrm_l = [np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))]
        tan_l = [np.tile(np.array([[1, 0, 0, 1]], np.float32), (3, 1))]
        uv0_l = uv1_l = [np.zeros((3, 2), np.float32)]
        col_l = [np.ones((3, 4), np.float32)]
        tri_l = [np.array([[0, 1, 2]], np.int64)]
        pft, ptc, pfv, pvc, phn, phu, phc = [0], [1], [0], [3], [0], [0], [0]

    rnodes = scene.render_nodes or []
    n = max(len(rnodes), 1)
    rn_o2w = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    rn_w2o = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    rn_material = np.zeros(n, np.int32)
    rn_prim = np.zeros(n, np.int32)
    rn_visible = np.zeros(n, np.int32)
    for i, rn in enumerate(rnodes):
        rn_o2w[i] = rn.world_matrix
        rn_w2o[i] = np.linalg.inv(rn.world_matrix.astype(np.float64)).astype(np.float32)
        rn_material[i] = max(rn.material_id, 0)
        rn_prim[i] = rn.render_prim_id
        rn_visible[i] = 1 if rn.visible else 0

    rn_packed = np.concatenate([rn_o2w.reshape(n, 16), rn_w2o.reshape(n, 16)], axis=1).astype(np.float32)

    conv = mats.MaterialConverter(model)
    shade_mats = conv.convert_all()
    mat_soa = _materials_soa(shade_mats)
    mat_packed = _materials_packed(mat_soa, len(shade_mats))
    ti = conv.texture_infos
    ti_index = np.array([t.index for t in ti], np.int32)
    ti_texcoord = np.array([t.tex_coord for t in ti], np.int32)
    ti_uvxform = np.stack([t.uv_transform for t in ti]).astype(np.float32)

    lights = _build_lights(scene)

    if with_textures and model.images:
        from .textures import build_texture_pool

        tex = build_texture_pool(model, used_texinfos=ti)
    else:
        tex = _white_texture_pool()

    vtx_pos = np.concatenate(pos_l).astype(np.float32)
    vtx_nrm = np.concatenate(nrm_l).astype(np.float32)

    # ---- apply skinning/morph deformation (reference AnimationVk writes
    # deformed vertices IN PLACE into SceneVk buffers,
    # gltf_scene_animation_vk.cpp:414; CPU oracle path here, jitted device
    # version in ops/animation.py)
    from ..models.animation import compute_joint_matrices, cpu_morph, cpu_skin

    pfv_arr = pfv
    for rn in (scene.render_nodes or []):
        rp = scene.render_primitives[rn.render_prim_id]
        prim = rp.primitive(model)
        v0 = pfv_arr[rn.render_prim_id]
        nv = pvc[rn.render_prim_id]
        node = model.nodes[rn.ref_node_id] if rn.ref_node_id >= 0 else {}
        weights = node.get("weights", model.meshes[node.get("mesh", 0)].get("weights") if "mesh" in node else None)
        pd = extract_primitive(model, prim)
        base_pos = pd.positions
        base_nrm = vtx_nrm[v0 : v0 + nv].copy()
        deformed = False
        if weights and pd.morph_targets:
            deltas = [t.get("POSITION") for t in pd.morph_targets]
            base_pos = cpu_morph(base_pos, deltas, np.asarray(weights, np.float32))
            ndeltas = [t.get("NORMAL") for t in pd.morph_targets]
            if any(d is not None for d in ndeltas):
                base_nrm = cpu_morph(base_nrm, [d if d is not None else None for d in ndeltas], np.asarray(weights, np.float32))
            deformed = True
        if rn.skin_id >= 0 and pd.joints0 is not None and pd.weights0 is not None:
            jm = compute_joint_matrices(scene, rn.skin_id, scene.world_matrices[rn.ref_node_id])
            base_pos, skinned_nrm = cpu_skin(base_pos, base_nrm, pd.joints0, pd.weights0, jm)
            if skinned_nrm is not None:
                base_nrm = skinned_nrm
            deformed = True
        if deformed:
            vtx_pos[v0 : v0 + nv] = base_pos.astype(np.float32)
            ln = np.linalg.norm(base_nrm, axis=1, keepdims=True)
            vtx_nrm[v0 : v0 + nv] = (base_nrm / np.maximum(ln, 1e-20)).astype(np.float32)

    vtx_tan = np.concatenate(tan_l).astype(np.float32)
    vtx_uv0 = np.concatenate(uv0_l).astype(np.float32)
    vtx_uv1 = np.concatenate(uv1_l).astype(np.float32)
    vtx_color = np.concatenate(col_l).astype(np.float32)
    vtx_packed = np.concatenate(
        [vtx_pos, vtx_nrm, vtx_tan, vtx_uv0, vtx_uv1, vtx_color,
         np.zeros((vtx_pos.shape[0], 6), np.float32)], axis=1
    )  # [V,24]
    return SceneFlat(
        vtx_pos=vtx_pos,
        vtx_nrm=vtx_nrm,
        vtx_tan=vtx_tan,
        vtx_uv0=vtx_uv0,
        vtx_uv1=vtx_uv1,
        vtx_color=vtx_color,
        tri_idx=np.concatenate(tri_l).astype(np.int32),
        prim_first_tri=np.array(pft, np.int32),
        prim_tri_count=np.array(ptc, np.int32),
        prim_first_vtx=np.array(pfv, np.int32),
        prim_vtx_count=np.array(pvc, np.int32),
        prim_has_nrm=np.array(phn, np.int32),
        prim_has_uv0=np.array(phu, np.int32),
        prim_has_color=np.array(phc, np.int32),
        rn_o2w=rn_o2w,
        rn_w2o=rn_w2o,
        rn_material=rn_material,
        rn_prim=rn_prim,
        rn_visible=rn_visible,
        materials=mat_soa,
        mat_packed=mat_packed,
        vtx_packed=vtx_packed,
        rn_packed=rn_packed,
        ti_index=ti_index,
        ti_texcoord=ti_texcoord,
        ti_uvxform=ti_uvxform,
        num_lights=len(scene.render_lights),
        tex_quads=tex[0],
        tex_desc=tex[1],
        tex_mip_table=tex[2],
        tex_num_mips=tex[3],
        **lights,
    )


def _white_texture_pool():
    quads = np.ones((1, 16), np.float32)
    desc = np.array([[0, 1, 1, 0]], np.int32)
    mip_table = np.zeros((1, 1), np.int32)
    num_mips = np.ones(1, np.int32)
    return quads, desc, mip_table, num_mips


def _build_lights(scene) -> dict:
    """Punctual lights -> SoA (reference SceneVk light SSBO + GltfLight
    gltf_scene_io.h.slang:86-100)."""
    model = scene.model
    defs = model.gltf.get("extensions", {}).get("KHR_lights_punctual", {}).get("lights", [])
    rls = scene.render_lights
    n = max(len(rls), 1)
    out = dict(
        light_type=np.zeros(n, np.int32),
        light_pos=np.zeros((n, 3), np.float32),
        light_dir=np.tile(np.array([[0, -1, 0]], np.float32), (n, 1)),
        light_color=np.ones((n, 3), np.float32),
        light_intensity=np.zeros(n, np.float32),
        light_radius=np.zeros(n, np.float32),
        light_angular_or_invrange=np.zeros(n, np.float32),
        light_cone=np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1)),
    )
    for i, rl in enumerate(rls):
        ld = defs[rl.light] if rl.light < len(defs) else {}
        ltype = _LIGHT_TYPES.get(ld.get("type", "directional"), 1)
        w = rl.world_matrix
        out["light_type"][i] = ltype
        out["light_pos"][i] = w[:3, 3]
        d = -w[:3, 2]
        out["light_dir"][i] = d / max(np.linalg.norm(d), 1e-9)
        out["light_color"][i] = np.asarray(ld.get("color", [1, 1, 1]), np.float32)
        out["light_intensity"][i] = ld.get("intensity", 1.0)
        rng = ld.get("range", 0.0)
        ext = ld.get("extensions", {}).get("KHR_lights_radius", {})
        out["light_radius"][i] = ext.get("radius", 0.0)
        if ltype == 1:
            out["light_angular_or_invrange"][i] = np.radians(0.53)  # sun-like default
        else:
            out["light_angular_or_invrange"][i] = 1.0 / rng if rng > 0 else 0.0
        if ltype == 2:
            spot = ld.get("spot", {})
            inner = spot.get("innerConeAngle", 0.0)
            outer = spot.get("outerConeAngle", np.pi / 4)
            ci, co = np.cos(inner), np.cos(outer)
            out["light_cone"][i] = [co, 1.0 / max(ci - co, 1e-4)]
    return out


def refresh_materials(flat: SceneFlat, scene) -> SceneFlat:
    """Surgical material/light sync: re-pack ONLY the material + texture-info
    + light arrays and swap them into the existing SceneFlat — the analog of
    the reference's updateMaterialBuffer / updateLightBuffer partial uploads
    (gltf_scene_vk.cpp updateMaterial path) instead of a full SceneVk
    rebuild. Geometry, BVH and the texture pool are untouched (image data
    cannot change through material edits; texture ASSIGNMENTS can, which the
    ti_* arrays carry)."""
    import dataclasses

    model = scene.model
    conv = mats.MaterialConverter(model)
    shade_mats = conv.convert_all()
    mat_soa = _materials_soa(shade_mats)
    mat_packed = _materials_packed(mat_soa, len(shade_mats))
    ti = conv.texture_infos
    lights = _build_lights(scene)
    extra = {}
    # the pool is pruned to textures in use; an edit can reference new ones
    old_refs = set(int(v) for v in np.asarray(flat.ti_index).tolist() if v >= 0)
    new_refs = set(int(t.index) for t in ti if t.index >= 0)
    if not new_refs <= old_refs:
        if model.images:
            from .textures import build_texture_pool

            tex = build_texture_pool(model, used_texinfos=ti)
        else:
            tex = _white_texture_pool()
        extra = dict(tex_quads=tex[0], tex_desc=tex[1], tex_mip_table=tex[2], tex_num_mips=tex[3])
    return dataclasses.replace(
        flat,
        materials=mat_soa,
        mat_packed=mat_packed,
        ti_index=np.array([t.index for t in ti], np.int32),
        ti_texcoord=np.array([t.tex_coord for t in ti], np.int32),
        ti_uvxform=np.stack([t.uv_transform for t in ti]).astype(np.float32),
        num_lights=len(scene.render_lights),
        **lights,
        **extra,
    )

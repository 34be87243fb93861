"""Material evaluation: SceneFlat material SoA + hit state -> PbrMaterial dict.

Port of the reference's evaluateMaterial (gltf_material_eval.h.slang:168-462)
with the same block ordering (volume BEFORE the IOR inside/outside swap —
the thin-walled check depends on it, :256-302). Extension blocks are gated
by the scene FeatureSet at trace time: `features` is a static frozenset, so
jit specializes the shade function exactly like the reference's GLTF_USE_*
recompile (scene_shader_macros.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

from .traverse import cross3, dot3
from .textures import sample_texture

MICROFACET_MIN_ROUGHNESS = 0.0014142


def _present(slot):
    return (slot > 0).astype(jnp.float32)


_INT_FIELDS = ("alpha_mode", "double_sided", "unlit", "pbr_model")


def _gather_materials(flat, mat_id):
    """ONE wide row gather instead of ~40 per-field gathers (TPU gathers
    cost per row, independent of width). Slices restore the field dict;
    integer/texture-slot fields round-trip exactly through f32 (< 2^24)."""
    from .flat import MAT_LAYOUT, _init_mat_layout

    _init_mat_layout()
    row = flat.mat_packed[mat_id]  # [..., K]
    m = {}
    for name, (off, w) in MAT_LAYOUT.items():
        v = row[..., off] if w == 1 else row[..., off : off + w]
        if name in _INT_FIELDS or name.endswith("texture") or name.endswith("_texture"):
            v = v.astype(jnp.int32)
        m[name] = v
    return m


def evaluate_material(flat, mat_id, hit, *, features: frozenset, is_inside=None, tex_lod=None):
    """mat_id: [..] int32. Returns the PbrMaterial dict for ops/bsdf.py.

    When the feature set contains "textured", texture lookups are compiled
    in; otherwise every sampling subgraph is dropped (the NO_TEXTURES
    specialization of the reference, gltf_material_eval.h.slang:67-74) —
    a large compile-time and runtime win for untextured scenes.
    """
    # local closure (NOT a module global): two render fns with different
    # texture specializations can trace concurrently without leaking state.
    # Gating is per SLOT: a texture slot no material in the scene uses
    # compiles to constant white (detect_scene_features emits "tex:<slot>"
    # flags — the data half of the reference's GLTF_USE_* specialization,
    # scene_shader_macros.cpp). Each dropped slot saves full-width texel
    # gathers, the dominant textured-frame cost on TPU.
    # "textured" alone (no slot flags) samples every slot — callers that
    # predate per-slot detection keep their contract.
    slot_gated = any(f.startswith("tex:") for f in features)

    def _tex(flat, m, name, hit, lod):
        off = "textured" not in features or (slot_gated and ("tex:" + name) not in features)
        if off:
            return jnp.ones(m[name].shape + (4,), jnp.float32)
        return sample_texture(flat, m[name], hit["uv0"], hit["uv1"], lod)
    m = _gather_materials(flat, mat_id)
    lod = jnp.zeros_like(hit["texel_density"]) if tex_lod is None else tex_lod
    if is_inside is None:
        is_inside = jnp.zeros(mat_id.shape, bool)

    pbr = {}
    shape = mat_id.shape

    # ---- base color / metallic-roughness (or spec-gloss conversion)
    base_color = m["base_color_factor"] * hit["color"]
    bc_tex = _tex(flat, m, "base_color_texture", hit, lod)
    base_color = base_color * jnp.where((m["base_color_texture"] > 0)[..., None], bc_tex, 1.0)

    roughness = m["roughness_factor"]
    metallic = m["metallic_factor"]
    mr_tex = _tex(flat, m, "metallic_roughness_texture", hit, lod)
    has_mr = m["metallic_roughness_texture"] > 0
    roughness = roughness * jnp.where(has_mr, mr_tex[..., 1], 1.0)
    metallic = metallic * jnp.where(has_mr, mr_tex[..., 2], 1.0)

    if "specular_glossiness" in features:
        sg = m["pbr_model"] == 1
        diffuse = m["diffuse_factor"] * hit["color"]
        d_tex = _tex(flat, m, "diffuse_texture", hit, lod)
        diffuse = diffuse * jnp.where((m["diffuse_texture"] > 0)[..., None], d_tex, 1.0)
        spec3 = m["specular_glossiness_factor"]
        gloss = m["glossiness_factor"]
        sg_tex = _tex(flat, m, "specular_glossiness_texture", hit, lod)
        has_sg = m["specular_glossiness_texture"] > 0
        spec3 = spec3 * jnp.where(has_sg[..., None], sg_tex[..., :3], 1.0)
        gloss = gloss * jnp.where(has_sg, sg_tex[..., 3], 1.0)
        # convertSGToMR (gltf_material_eval.h.slang:136-161)
        spec_int = jnp.max(spec3, axis=-1)
        is_metal = jnp.clip((spec_int - 0.05) / 0.04, 0.0, 1.0)
        is_metal = is_metal * is_metal * (3.0 - 2.0 * is_metal)  # smoothstep
        sg_base = jnp.where(
            (is_metal > 0)[..., None], spec3, jnp.clip(diffuse[..., :3] / (1.0 - 0.04 * (1.0 - is_metal))[..., None], 0.0, 1.0)
        )
        r_sg = (1.0 - gloss) ** 2
        base_color = jnp.where(sg[..., None], jnp.concatenate([sg_base, diffuse[..., 3:4]], -1), base_color)
        metallic = jnp.where(sg, is_metal, metallic)
        roughness = jnp.where(sg, jnp.sqrt(jnp.maximum(r_sg, 0.0)), roughness)  # re-squared below

    pbr["base_color"] = base_color[..., :3]
    pbr["opacity"] = base_color[..., 3]
    roughness = jnp.maximum(roughness, MICROFACET_MIN_ROUGHNESS)
    alpha = roughness * roughness
    pbr["roughness"] = jnp.stack([alpha, alpha], axis=-1)
    pbr["metallic"] = jnp.clip(metallic, 0.0, 1.0)

    # ---- occlusion
    occ = m["occlusion_strength"]
    o_tex = _tex(flat, m, "occlusion_texture", hit, lod)
    pbr["occlusion"] = jnp.where(m["occlusion_texture"] > 0, 1.0 + occ * (o_tex[..., 0] - 1.0), occ)

    # ---- normal map + frame
    N, T, B = hit["nrm"], hit["tangent"], hit["bitangent"]
    needs_tb_update = jnp.zeros(shape, bool)
    has_nm = m["normal_texture"] > 0
    n_tex = _tex(flat, m, "normal_texture", hit, lod)[..., :3] * 2.0 - 1.0
    n_tex = n_tex * jnp.stack([m["normal_texture_scale"], m["normal_texture_scale"], jnp.ones(shape)], axis=-1)
    n_mapped = n_tex[..., 0:1] * T + n_tex[..., 1:2] * B + n_tex[..., 2:3] * N
    n_mapped = n_mapped / jnp.maximum(jnp.sqrt(dot3(n_mapped, n_mapped)), 1e-12)[..., None]
    N = jnp.where(has_nm[..., None], n_mapped, N)
    needs_tb_update = needs_tb_update | has_nm
    pbr["N"] = N
    pbr["Ng"] = hit["geonrm"]

    # ---- emissive
    emissive = m["emissive_factor"]
    e_tex = _tex(flat, m, "emissive_texture", hit, lod)
    emissive = emissive * jnp.where((m["emissive_texture"] > 0)[..., None], e_tex[..., :3], 1.0)
    pbr["emissive"] = jnp.maximum(emissive, 0.0)

    # ---- volume (BEFORE ior swap: thin-walled check needs thickness)
    if "volume" in features:
        thickness = m["thickness_factor"]
        th_tex = _tex(flat, m, "thickness_texture", hit, lod)
        thickness = thickness * jnp.where(m["thickness_texture"] > 0, th_tex[..., 1], 1.0)
        pbr["thickness"] = thickness
        pbr["attenuation_color"] = m["attenuation_color"]
        pbr["attenuation_distance"] = m["attenuation_distance"]
    else:
        pbr["thickness"] = jnp.zeros(shape)
        pbr["attenuation_color"] = jnp.ones(shape + (3,))
        pbr["attenuation_distance"] = jnp.zeros(shape)

    # ---- specular (KHR_materials_specular)
    if "specular" in features:
        sc = m["specular_color_factor"]
        sc_tex = _tex(flat, m, "specular_color_texture", hit, lod)
        sc = sc * jnp.where((m["specular_color_texture"] > 0)[..., None], sc_tex[..., :3], 1.0)
        sf = m["specular_factor"]
        sf_tex = _tex(flat, m, "specular_texture", hit, lod)
        sf = sf * jnp.where(m["specular_texture"] > 0, sf_tex[..., 3], 1.0)
        pbr["specular_color"] = sc
        pbr["specular"] = sf
    else:
        pbr["specular_color"] = jnp.ones(shape + (3,))
        pbr["specular"] = jnp.ones(shape)

    # ---- IOR with inside/outside swap for thick volumes
    ior2 = m["ior"] if "ior" in features else jnp.full(shape, 1.5)
    ior1 = jnp.ones(shape)
    swap = is_inside & (pbr["thickness"] > 0.0)
    pbr["ior1"] = jnp.where(swap, ior2, ior1)
    pbr["ior2"] = jnp.where(swap, ior1, ior2)

    # ---- transmission
    if "transmission" in features:
        tr = m["transmission_factor"]
        tr_tex = _tex(flat, m, "transmission_texture", hit, lod)
        tr = tr * jnp.where(m["transmission_texture"] > 0, tr_tex[..., 0], 1.0)
        pbr["transmission"] = tr
    else:
        pbr["transmission"] = jnp.zeros(shape)

    # ---- volume scatter
    if "volume_scatter" in features:
        rho = m["multiscatter_color_factor"]
        t = 4.09712 + 4.20863 * rho - jnp.sqrt(9.59217 + 41.6808 * rho + 17.7126 * rho * rho)
        ss_albedo = 1.0 - t * t
        att = -jnp.log(jnp.maximum(pbr["attenuation_color"], 0.001)) / jnp.maximum(
            pbr["attenuation_distance"], 0.001
        )[..., None]
        pbr["scatter_coefficient"] = jnp.where(jnp.any(rho > 0, axis=-1, keepdims=True), att * ss_albedo, 0.0)
        pbr["scatter_anisotropy"] = m["scatter_anisotropy"]
    else:
        pbr["scatter_coefficient"] = jnp.zeros(shape + (3,))
        pbr["scatter_anisotropy"] = jnp.zeros(shape)

    # ---- clearcoat
    if "clearcoat" in features:
        cc = m["clearcoat_factor"]
        cc_tex = _tex(flat, m, "clearcoat_texture", hit, lod)
        cc = cc * jnp.where(m["clearcoat_texture"] > 0, cc_tex[..., 0], 1.0)
        ccr = m["clearcoat_roughness"]
        ccr_tex = _tex(flat, m, "clearcoat_roughness_texture", hit, lod)
        ccr = ccr * jnp.where(m["clearcoat_roughness_texture"] > 0, ccr_tex[..., 1], 1.0)
        Nc = pbr["N"]
        has_ccn = m["clearcoat_normal_texture"] > 0
        ccn = _tex(flat, m, "clearcoat_normal_texture", hit, lod)[..., :3] * 2.0 - 1.0
        ncc = ccn[..., 0:1] * T + ccn[..., 1:2] * B + ccn[..., 2:3] * Nc
        ncc = ncc / jnp.maximum(jnp.sqrt(dot3(ncc, ncc)), 1e-12)[..., None]
        pbr["Nc"] = jnp.where(has_ccn[..., None], ncc, Nc)
        pbr["clearcoat"] = cc
        pbr["clearcoat_roughness"] = jnp.maximum(ccr, 0.001)
    else:
        pbr["Nc"] = pbr["N"]
        pbr["clearcoat"] = jnp.zeros(shape)
        pbr["clearcoat_roughness"] = jnp.full(shape, 0.001)

    # ---- iridescence
    if "iridescence" in features:
        ir = m["iridescence_factor"]
        ir_tex = _tex(flat, m, "iridescence_texture", hit, lod)
        ir = ir * jnp.where(m["iridescence_texture"] > 0, ir_tex[..., 0], 1.0)
        th_max = m["iridescence_thickness_maximum"]
        th_tex = _tex(flat, m, "iridescence_thickness_texture", hit, lod)
        th = jnp.where(
            m["iridescence_thickness_texture"] > 0,
            m["iridescence_thickness_minimum"] + (th_max - m["iridescence_thickness_minimum"]) * th_tex[..., 1],
            th_max,
        )
        pbr["iridescence"] = jnp.where(th > 0.0, ir, 0.0)
        pbr["iridescence_thickness"] = th
        pbr["iridescence_ior"] = m["iridescence_ior"]
    else:
        pbr["iridescence"] = jnp.zeros(shape)
        pbr["iridescence_thickness"] = jnp.zeros(shape)
        pbr["iridescence_ior"] = jnp.full(shape, 1.3)

    # ---- anisotropy (rotates T in tangent plane, widens roughness.x)
    if "anisotropy" in features:
        strength = m["anisotropy_strength"]
        a_tex = _tex(flat, m, "anisotropy_texture", hit, lod)
        has_at = m["anisotropy_texture"] > 0
        a_dir = jnp.where(
            has_at[..., None],
            a_tex[..., :2] * 2.0 - 1.0,
            jnp.broadcast_to(jnp.array([1.0, 0.0]), shape + (2,)),
        )
        a_dir = a_dir / jnp.maximum(jnp.sqrt(jnp.sum(a_dir**2, -1, keepdims=True)), 1e-9)
        strength = strength * jnp.where(has_at, a_tex[..., 2], 1.0)
        on = strength > 0.0
        rx = pbr["roughness"][..., 1] * (1 - strength**2) + 1.0 * strength**2
        pbr["roughness"] = jnp.stack([jnp.where(on, rx, pbr["roughness"][..., 0]), pbr["roughness"][..., 1]], -1)
        s_, c_ = m["anisotropy_rotation"][..., 0], m["anisotropy_rotation"][..., 1]
        ad = jnp.stack(
            [c_ * a_dir[..., 0] + s_ * a_dir[..., 1], c_ * a_dir[..., 1] - s_ * a_dir[..., 0]], axis=-1
        )
        t_aniso = T * ad[..., 0:1] + B * ad[..., 1:2]
        T = jnp.where(on[..., None], t_aniso, T)
        needs_tb_update = needs_tb_update | on

    # ---- re-orthonormalize frame if N or T changed
    Bn = cross3(pbr["N"], T)
    Bn = Bn / jnp.maximum(jnp.sqrt(dot3(Bn, Bn)), 1e-12)[..., None]
    bsign = jnp.where(dot3(hit["bitangent"], Bn) < 0.0, -1.0, 1.0)[..., None]
    B_new = Bn * bsign
    T_new = cross3(B_new, pbr["N"]) * bsign
    T_new = T_new / jnp.maximum(jnp.sqrt(dot3(T_new, T_new)), 1e-12)[..., None]
    pbr["T"] = jnp.where(needs_tb_update[..., None], T_new, T)
    pbr["B"] = jnp.where(needs_tb_update[..., None], B_new, hit["bitangent"])

    # ---- sheen
    if "sheen" in features:
        sc = m["sheen_color_factor"]
        sc_tex = _tex(flat, m, "sheen_color_texture", hit, lod)
        sc = sc * jnp.where((m["sheen_color_texture"] > 0)[..., None], sc_tex[..., :3], 1.0)
        sr = m["sheen_roughness_factor"]
        sr_tex = _tex(flat, m, "sheen_roughness_texture", hit, lod)
        sr = sr * jnp.where(m["sheen_roughness_texture"] > 0, sr_tex[..., 3], 1.0)
        pbr["sheen_color"] = sc
        pbr["sheen_roughness"] = jnp.maximum(sr, MICROFACET_MIN_ROUGHNESS)
        pbr["_sheen_on"] = (jnp.max(sc, axis=-1) > 0).astype(jnp.float32)
    else:
        pbr["sheen_color"] = jnp.zeros(shape + (3,))
        pbr["sheen_roughness"] = jnp.full(shape, MICROFACET_MIN_ROUGHNESS)
        pbr["_sheen_on"] = jnp.zeros(shape)

    # ---- dispersion
    pbr["dispersion"] = m["dispersion"] if "dispersion" in features else jnp.zeros(shape)

    # ---- retroreflection (consumed by the preview's MRM blend only; the
    # reference's path tracer likewise ignores it)
    if "retroreflection" in features:
        retro = m["retroreflection_factor"]
        retro = retro * _tex(flat, m, "retroreflection_texture", hit, lod)[..., 0]
        pbr["retroreflection"] = retro
    else:
        pbr["retroreflection"] = jnp.zeros(shape)

    # ---- diffuse transmission
    if "diffuse_transmission" in features:
        dt = m["diffuse_transmission_factor"]
        dt_tex = _tex(flat, m, "diffuse_transmission_texture", hit, lod)
        dt = dt * jnp.where(m["diffuse_transmission_texture"] > 0, dt_tex[..., 3], 1.0)
        dtc = m["diffuse_transmission_color"]
        dtc_tex = _tex(flat, m, "diffuse_transmission_color_texture", hit, lod)
        dtc = dtc * jnp.where((m["diffuse_transmission_color_texture"] > 0)[..., None], dtc_tex[..., :3], 1.0)
        pbr["diffuse_transmission"] = dt
        pbr["diffuse_transmission_color"] = dtc
    else:
        pbr["diffuse_transmission"] = jnp.zeros(shape)
        pbr["diffuse_transmission_color"] = jnp.ones(shape + (3,))

    pbr["unlit"] = m["unlit"].astype(jnp.float32) if "unlit" in features else jnp.zeros(shape)
    pbr["alpha_mode"] = m["alpha_mode"]
    pbr["alpha_cutoff"] = m["alpha_cutoff"]
    pbr["double_sided"] = m["double_sided"]
    return pbr


def get_opacity(flat, mat_id, hit, *, textured: bool = True):
    """Stochastic-alpha opacity at a hit (reference getOpacity,
    pathtrace_functions.h.slang:189-234): baseColor alpha x texture alpha x
    vertex alpha; MASK mode thresholds at cutoff."""
    m = _gather_materials(flat, mat_id)
    m_alpha_mode = m["alpha_mode"]
    m_cutoff = m["alpha_cutoff"]
    bc = m["base_color_factor"]
    slot = m["base_color_texture"]
    if textured:
        tex = sample_texture(flat, slot, hit["uv0"], hit["uv1"], jnp.zeros_like(hit["texel_density"]))
        a = bc[..., 3] * jnp.where(slot > 0, tex[..., 3], 1.0) * hit["color"][..., 3]
    else:
        a = bc[..., 3] * hit["color"][..., 3]
    a = jnp.where(m_alpha_mode == 1, jnp.where(a >= m_cutoff, 1.0, 0.0), a)
    return jnp.where(m_alpha_mode == 0, 1.0, a)

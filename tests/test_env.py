"""Environment tests: sky/HDR sampling self-consistency (MIS invariants).

The MIS math requires sample() and pdf()/eval() to agree, and the
importance sampler to integrate to the same value as uniform sampling.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vk_gltf_renderer_tpu.ops.hdr import (
    build_environment,
    eval_hdr,
    load_hdr_environment,
    read_hdr,
    sample_hdr,
)
from vk_gltf_renderer_tpu.ops.sky import SkyParams, eval_sky, pdf_sky, sample_sky


def _uniform_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def test_sky_pdf_integrates_to_one():
    sp = SkyParams().as_arrays()
    d = jnp.asarray(_uniform_dirs(200_000))
    pdf = pdf_sky(sp, d)
    integral = float(jnp.mean(pdf) * 4.0 * np.pi)
    assert abs(integral - 1.0) < 0.05


def test_sky_sample_pdf_consistent():
    sp = SkyParams().as_arrays()
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((10_000, 3)), jnp.float32)
    d, rad, pdf = sample_sky(sp, u)
    pdf2 = pdf_sky(sp, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
    # unbiasedness: E[L/pdf] == uniform estimate of the integral
    est_imp = float(jnp.mean(jnp.mean(rad, -1) / jnp.maximum(pdf, 1e-9)))
    du = jnp.asarray(_uniform_dirs(200_000, 2))
    est_uni = float(jnp.mean(jnp.mean(eval_sky(sp, du), -1)) * 4 * np.pi)
    assert abs(est_imp - est_uni) / max(est_uni, 1e-9) < 0.05


def test_read_hdr_reference_asset():
    rgb = read_hdr("/root/reference/resources/std_env.hdr")
    assert rgb.ndim == 3 and rgb.shape[2] == 3
    assert rgb.min() >= 0.0 and np.isfinite(rgb).all()
    assert rgb.max() > 0.1


def test_hdr_env_consistency():
    env = load_hdr_environment("/root/reference/resources/std_env.hdr")
    # pdf integrates to ~1 over the sphere
    d = jnp.asarray(_uniform_dirs(200_000, 3))
    _, pdf = eval_hdr(env, d)
    integral = float(jnp.mean(pdf) * 4 * np.pi)
    assert abs(integral - 1.0) < 0.08
    # sample/eval agreement
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.random((20_000, 3)), jnp.float32)
    ds, rad_s, pdf_s = sample_hdr(env, u)
    rad_e, pdf_e = eval_hdr(env, ds)
    np.testing.assert_allclose(np.asarray(rad_s), np.asarray(rad_e), rtol=1e-4)
    # importance estimate matches uniform estimate of total irradiance
    est_imp = float(jnp.mean(jnp.mean(rad_s, -1) / jnp.maximum(pdf_s, 1e-9)))
    rad_u, _ = eval_hdr(env, d)
    est_uni = float(jnp.mean(jnp.mean(rad_u, -1)) * 4 * np.pi)
    assert abs(est_imp - est_uni) / max(est_uni, 1e-9) < 0.05


def test_hdr_rotation_consistency():
    env = load_hdr_environment("/root/reference/resources/env3.hdr", rotation=1.0)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.random((2_000, 3)), jnp.float32)
    ds, rad_s, pdf_s = sample_hdr(env, u)
    rad_e, pdf_e = eval_hdr(env, ds)
    np.testing.assert_allclose(np.asarray(rad_s), np.asarray(rad_e), rtol=1e-4)


def test_ktx2_zstd_supercompression(tmp_path):
    """KTX2 with scheme-2 (zstd) payload decodes (gltf_image_loader.cpp role)."""
    import struct

    import numpy as np
    import zstandard

    from vk_gltf_renderer_tpu.ops.dds import decode_ktx2

    w = h = 8
    rgba = (np.arange(w * h * 4) % 255).astype(np.uint8)
    comp = zstandard.ZstdCompressor().compress(rgba.tobytes())
    ident = b"\xabKTX 20\xbb\r\n\x1a\n"
    header = struct.pack("<9I", 37, 1, w, h, 0, 0, 1, 1, 2)  # RGBA8, zstd
    rest = struct.pack("<4I2Q", 0, 0, 0, 0, 0, 0)  # dfd/kvd offsets+lengths (4x u32) + sgd (2x u64)
    off = 80 + 24
    level = struct.pack("<3Q", off, len(comp), len(rgba))
    blob = ident + header + rest + level + comp
    img = decode_ktx2(blob)
    np.testing.assert_allclose(img.reshape(-1), rgba.astype(np.float32) / 255.0, atol=1e-6)

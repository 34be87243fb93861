"""Static lobe gating parity: bsdf_evaluate/bsdf_sample with a features
frozenset must match the ungated (features=None) path exactly whenever the
gated-out features are materially absent (their pbr fields are zero) — the
GLTF_USE_* shader-variant analog (scene_feature_detection.cpp:1-244,
renderer_pathtracer.cpp optimal-recompile system)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vk_gltf_renderer_tpu.ops.bsdf import bsdf_evaluate, bsdf_sample

from test_furnace import _pbr_default, _view_dirs

BASIC = frozenset()  # plain metal-rough scene (shader_ball, helmet)


def _rand_inputs(n, seed=0):
    r = np.random.default_rng(seed)
    k1 = _view_dirs(n, seed + 1)
    k2 = _view_dirs(n, seed + 2)
    u3 = jnp.asarray(r.random((n, 3)), jnp.float32)
    ue = jnp.asarray(r.random((n, 2)), jnp.float32)
    return k1, k2, u3, ue


def _mixed_pbr(n, seed=3):
    """Metal/rough/base_color varied per lane; every gated feature zero."""
    r = np.random.default_rng(seed)
    a = jnp.asarray(r.random(n), jnp.float32) ** 2
    return _pbr_default(
        n,
        base_color=jnp.asarray(r.random((n, 3)), jnp.float32),
        metallic=jnp.asarray(r.random(n), jnp.float32),
        roughness=jnp.stack([a, a], axis=-1),
    )


def test_evaluate_gated_matches_ungated():
    n = 4096
    pbr = _mixed_pbr(n)
    k1, k2, _, _ = _rand_inputs(n)
    full = bsdf_evaluate(pbr, k1, k2)
    gated = bsdf_evaluate(pbr, k1, k2, BASIC)
    for key in ("bsdf_diffuse", "bsdf_glossy", "pdf"):
        np.testing.assert_allclose(
            np.asarray(gated[key]), np.asarray(full[key]), rtol=2e-5, atol=2e-6,
            err_msg=key)


def test_sample_gated_matches_ungated():
    n = 4096
    pbr = _mixed_pbr(n)
    k1, _, u3, ue = _rand_inputs(n)
    full = bsdf_sample(pbr, k1, u3, ue)
    gated = bsdf_sample(pbr, k1, u3, ue, BASIC)
    # residue lanes (fp catch-all moved dt -> glossy) are measure-zero; mask
    # lanes where the two paths picked different lobes
    same = np.asarray(full["event"]) == np.asarray(gated["event"])
    assert same.mean() > 0.999
    for key in ("k2", "bsdf_over_pdf", "pdf"):
        np.testing.assert_allclose(
            np.asarray(gated[key])[same], np.asarray(full[key])[same],
            rtol=2e-5, atol=2e-6, err_msg=key)


def test_gated_features_still_active_when_listed():
    """Listing a feature keeps its lobe live: a clearcoat material under a
    features set CONTAINING clearcoat must differ from the gated-out path."""
    n = 2048
    pbr = _mixed_pbr(n)
    pbr["clearcoat"] = jnp.full(n, 0.8)
    k1, k2, _, _ = _rand_inputs(n, seed=9)
    with_cc = bsdf_evaluate(pbr, k1, k2, frozenset({"clearcoat"}))
    without = bsdf_evaluate(pbr, k1, k2, BASIC)
    full = bsdf_evaluate(pbr, k1, k2)
    np.testing.assert_allclose(
        np.asarray(with_cc["bsdf_glossy"]), np.asarray(full["bsdf_glossy"]),
        rtol=2e-5, atol=2e-6)
    assert not np.allclose(
        np.asarray(with_cc["bsdf_glossy"]), np.asarray(without["bsdf_glossy"]))


def test_sample_gated_jits_and_is_finite():
    n = 1024
    pbr = _mixed_pbr(n, seed=11)
    k1, _, u3, ue = _rand_inputs(n, seed=12)
    f = jax.jit(lambda p, a, b, c: bsdf_sample(p, a, b, c, BASIC))
    out = f(pbr, k1, u3, ue)
    assert np.isfinite(np.asarray(out["bsdf_over_pdf"])).all()
    assert np.isfinite(np.asarray(out["k2"])).all()

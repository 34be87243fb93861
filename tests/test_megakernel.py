"""Megakernel-vs-wavefront parity (interpret mode): the two arms of the
ops/megakernel.py experiment must produce the same radiance — they run the
same traversal core, the same LCG streams and the same shade/regeneration
map, differing only in WHERE the bounce loop lives (inside one Pallas
kernel vs per-bounce kernels + XLA glue)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from vk_gltf_renderer_tpu.ops.traverse import as_device
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=8, height=8, spp=1, max_depth=1)
    r.create_scene("/root/reference/resources/Box.glb")
    return as_device(r.bvh)


def _rays(n, seed=7):
    rng = np.random.RandomState(seed)
    # origins on a shell looking inward at the box
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = -3.0 * d
    seeds = rng.randint(0, 2**31, size=n).astype(np.uint32)
    return jnp.asarray(ro), jnp.asarray(d), jnp.asarray(seeds)


def test_mega_matches_wavefront_interpret(scene):
    from vk_gltf_renderer_tpu.ops.megakernel import (pack_rays, render_mega,
                                                     render_wavefront)

    n = 2048
    ro, rd, seeds = _rays(n)
    ro_p, rd_p, seed_p, n_real = pack_rays(ro, rd, seeds, tiles=1)

    out_m = render_mega(scene.nodes4_fi, scene.tris128, ro_p, rd_p, seed_p,
                        depth=3, root_code=scene.root4_code, tiles=1,
                        interpret=True)
    out_w = render_wavefront(scene.nodes4_fi, scene.tris128, ro_p, rd_p,
                             seed_p, depth=3, root_code=scene.root4_code,
                             tiles=1, interpret=True)
    rad_m = np.asarray(out_m)[:, 0].reshape(-1)[:n_real]
    rad_w = np.asarray(out_w)[:, 0].reshape(-1)[:n_real]
    np.testing.assert_allclose(rad_m, rad_w, rtol=1e-5, atol=1e-6)
    # the path is non-trivial: some lanes bounced (albedo-attenuated sky),
    # some escaped straight to the sky
    assert (rad_m > 0.0).any()
    assert len(np.unique(np.round(rad_m, 4))) >= 2


def test_mega_depth1_equals_single_trace(scene):
    """depth=1 megakernel == plain traversal + one shade step."""
    from vk_gltf_renderer_tpu.ops.megakernel import (ALBEDO, SKY, pack_rays,
                                                     render_mega)
    from vk_gltf_renderer_tpu.ops.pallas_traverse import traverse_packets3

    n = 1024
    ro, rd, seeds = _rays(n, seed=11)
    ro_p, rd_p, seed_p, n_real = pack_rays(ro, rd, seeds, tiles=1)
    out_m = render_mega(scene.nodes4_fi, scene.tris128, ro_p, rd_p, seed_p,
                        depth=1, root_code=scene.root4_code, tiles=1,
                        interpret=True)
    out_t = traverse_packets3(scene.nodes4_fi, scene.tris128, ro_p, rd_p,
                              scene.root4_code, tiles=1, interpret=True)
    tri = np.asarray(out_t)[:, 2].reshape(-1)[:n_real]
    rad = np.asarray(out_m)[:, 0].reshape(-1)[:n_real]
    expect = np.where(tri >= 0, 0.0, float(SKY))
    np.testing.assert_allclose(rad, expect, atol=1e-6)

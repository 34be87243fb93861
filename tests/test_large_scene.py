"""Scene-size ladder tests (the budgeted-BLAS analog, renderer.cpp:1699-1721).

The TPU packet kernel keeps its BVH tables resident in VMEM; scenes whose
tables exceed the budget must automatically fall back to the HBM wavefront
path.  tools/large_scene_demo.py is the >=1M-triangle TPU demo; these tests
exercise the same generator and the selection ladder at CPU-friendly scale.
"""

import numpy as np
import pytest


def _mk(tmp_path, tris, grid):
    from tools.large_scene_demo import write_large_glb

    p = str(tmp_path / "large.glb")
    wt = write_large_glb(p, target_tris=tris, grid=grid)
    return p, wt


def test_generator_hits_target(tmp_path):
    p, wt = _mk(tmp_path, 40_000, 4)
    assert wt >= 40_000 * 0.9


def test_instanced_grid_renders(tmp_path):
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    p, wt = _mk(tmp_path, 8_000, 2)
    r = GltfRenderer(width=48, height=48, spp=1, max_depth=2)
    r.create_scene(p)
    r.on_render()
    img = np.asarray(r.accum)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # terrain visible, not a black frame


def test_vmem_ladder_selects_wavefront_over_budget(tmp_path, monkeypatch):
    """Over-budget scenes must take the HBM wavefront path automatically."""
    import vk_gltf_renderer_tpu.ops.bvh_flatten as bf
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    p, wt = _mk(tmp_path, 8_000, 2)
    r = GltfRenderer(width=32, height=32, spp=1, max_depth=1)
    r.create_scene(p)
    assert bf.fits_vmem(r.bvh)
    # shrink the budget below this scene's tables -> fits_vmem flips
    monkeypatch.setattr(bf, "VMEM_TABLE_BUDGET", bf.vmem_bytes(r.bvh) - 1)
    assert not bf.fits_vmem(r.bvh)


def test_vmem_crossover_scale():
    """Document the ladder's crossover: ~300k world triangles fit the packet
    kernel's PADDED VMEM tables (Mosaic tiles nodes_fi's 16-wide rows to 128
    lanes — 8x raw bytes; measured AOT failure at 819k tris proved the raw
    count lied); beyond that the ladder must take the HBM wavefront path.
    Extrapolated from a small build (both tables scale linearly in world
    triangles)."""
    from tools.large_scene_demo import write_large_glb
    from vk_gltf_renderer_tpu.renderer import GltfRenderer
    from vk_gltf_renderer_tpu.ops.bvh_flatten import VMEM_TABLE_BUDGET, vmem_bytes
    import tempfile, os

    p = os.path.join(tempfile.mkdtemp(), "t.glb")
    write_large_glb(p, target_tris=40_000, grid=4)
    r = GltfRenderer(width=16, height=16, spp=1, max_depth=1)
    r.create_scene(p)
    per_tri = vmem_bytes(r.bvh) / r.bvh.num_world_tris
    assert per_tri * 300_000 < VMEM_TABLE_BUDGET  # hybrid packet regime
    assert per_tri * 500_000 > VMEM_TABLE_BUDGET  # v2 table over budget...
    # ...but the v3 BVH4 table (~half the node rows at the same 128-lane
    # padding) keeps the packet path alive well past the v2 ceiling
    per_tri3 = vmem_bytes(r.bvh, "v3") / r.bvh.num_world_tris
    assert per_tri3 * 500_000 < VMEM_TABLE_BUDGET  # v3-only packet regime
    assert per_tri3 < per_tri * 0.75

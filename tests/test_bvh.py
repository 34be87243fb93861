"""BVH build + traversal correctness vs brute-force oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.ops.bvh import build_scene_bvh, build_blas_forest
from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
from vk_gltf_renderer_tpu.ops.traverse import INFINITE, intersect_brute, intersect_rays


def _rays_at(flat, n, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(flat.vtx_pos).min(axis=0)
    hi = np.asarray(flat.vtx_pos).max(axis=0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) + 1e-3
    origins = center + rng.normal(size=(n, 3)) * radius * 1.5
    targets = center + rng.uniform(-0.5, 0.5, size=(n, 3)) * (hi - lo + 1e-3)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


def _check_matches_brute(flat, bvh, n_rays=128, seed=0):
    ro, rd = _rays_at(flat, n_rays, seed)
    got = intersect_rays(bvh, flat, ro, rd)
    want = intersect_brute(flat, ro, rd)
    got_hit = np.asarray(got["tri"] >= 0)
    want_hit = np.asarray(want["tri"] >= 0)
    np.testing.assert_array_equal(got_hit, want_hit)
    gt = np.asarray(got["t"])[got_hit]
    wt = np.asarray(want["t"])[want_hit]
    np.testing.assert_allclose(gt, wt, rtol=1e-4, atol=1e-5)
    # hit rate sanity: rays aimed at the scene should mostly hit
    assert want_hit.mean() > 0.4


def test_box_traversal_matches_brute(box_glb):
    sc = Scene()
    sc.load(box_glb)
    flat = build_scene_flat(sc)
    bvh = build_scene_bvh(flat)
    _check_matches_brute(flat, bvh)


def test_shader_ball_traversal_matches_brute(shader_ball):
    sc = Scene()
    sc.load(shader_ball)
    flat = build_scene_flat(sc)
    bvh = build_scene_bvh(flat)
    _check_matches_brute(flat, bvh, n_rays=64)


def test_random_soup_instanced(triangle_model):
    # 50 random triangles + 3 instances of the mesh with different transforms
    rng = np.random.default_rng(1)
    tris = rng.uniform(-1, 1, size=(50, 3, 3)).astype(np.float32)
    pos = tris.reshape(-1, 3)
    idx = np.arange(150, dtype=np.uint32)
    g = triangle_model.gltf
    buf = triangle_model.buffers[0]
    off = len(buf)
    buf.extend(pos.tobytes())
    g["bufferViews"].append({"buffer": 0, "byteOffset": off, "byteLength": pos.nbytes})
    g["accessors"].append(
        {"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126, "count": 150, "type": "VEC3",
         "min": pos.min(0).tolist(), "max": pos.max(0).tolist()}
    )
    g["buffers"][0]["byteLength"] = len(buf)
    g["meshes"].append({"primitives": [{"attributes": {"POSITION": len(g["accessors"]) - 1}, "material": 0}]})
    g["nodes"] = [
        {"mesh": 1},
        {"mesh": 1, "translation": [3, 0, 0]},
        {"mesh": 1, "translation": [0, 3, 0], "scale": [2, 2, 2]},
    ]
    g["scenes"] = [{"nodes": [0, 1, 2]}]
    sc = Scene()
    sc.load_from_model(triangle_model)
    flat = build_scene_flat(sc)
    bvh = build_scene_bvh(flat)
    _check_matches_brute(flat, bvh, n_rays=96, seed=7)


def test_visibility_masks_instance(triangle_model):
    g = triangle_model.gltf
    g["nodes"] = [{"mesh": 0}, {"mesh": 0, "extensions": {"KHR_node_visibility": {"visible": False}}}]
    g["scenes"] = [{"nodes": [0, 1]}]
    sc = Scene()
    sc.load_from_model(triangle_model)
    flat = build_scene_flat(sc)
    bvh = build_scene_bvh(flat)
    # ray through both (stacked at same place) must report visible instance only
    ro = jnp.array([[0.2, 0.2, 5.0]], jnp.float32)
    rd = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    got = intersect_rays(bvh, flat, ro, rd)
    assert int(got["rnode"][0]) == 0


def test_blas_forest_counts(box_glb):
    sc = Scene()
    sc.load(box_glb)
    flat = build_scene_flat(sc)
    lo, hi, left, right, tri, parent, roots = build_blas_forest(
        np.asarray(flat.vtx_pos), np.asarray(flat.tri_idx),
        np.asarray(flat.prim_first_tri), np.asarray(flat.prim_tri_count),
    )
    n_tris = flat.tri_idx.shape[0]
    assert (tri >= 0).sum() == n_tris  # one leaf per triangle
    assert lo.shape[0] == 2 * n_tris - 1
    # root AABB == scene AABB of the primitive
    np.testing.assert_allclose(lo[roots[0]], np.asarray(flat.vtx_pos).min(axis=0), atol=1e-6)
    np.testing.assert_allclose(hi[roots[0]], np.asarray(flat.vtx_pos).max(axis=0), atol=1e-6)


def test_sah_native_matches_numpy_oracle():
    """Native (C++) binned-SAH builder must produce a structurally valid
    tree with the same shape + cost as the numpy oracle (_build_sah)."""
    import numpy as np
    import pytest

    from vk_gltf_renderer_tpu.native import build_sah_native
    from vk_gltf_renderer_tpu.ops.bvh_flatten import LEAF_SIZE, _build_sah

    rng = np.random.RandomState(11)
    n = 3000
    v0 = rng.rand(n, 3).astype(np.float32) * 10
    e = rng.rand(n, 3, 3).astype(np.float32) * 0.3
    tris = v0[:, None, :] + e
    tlo, thi = tris.min(1), tris.max(1)
    cen = (tlo + thi) * 0.5

    nat = build_sah_native(tlo, thi, cen, LEAF_SIZE)
    if nat is None:
        pytest.skip("native toolchain unavailable")
    ref = _build_sah(tlo, thi, cen)

    for built in (nat, ref):
        perm, ni, nf, ns = built
        assert sorted(perm.tolist()) == list(range(n))
        leaves = ni[ni[:, 3] > 0]
        segs = sorted((int(f), int(c)) for f, c in leaves[:, 2:4])
        pos = 0
        for f, c in segs:
            assert f == pos
            pos += c
        assert pos == n
        tl, th = tlo[perm], thi[perm]
        internal = np.nonzero(ni[:, 3] == 0)[0]
        for nid in internal:
            l, r = ni[nid, 0], ni[nid, 1]
            assert ni[l, 4] == nid and ni[r, 4] == nid
            assert (nf[nid, 0:3] == ns[l, 0:3]).all()
            assert (nf[nid, 9:12] == ns[r, 3:6]).all()
        for nid in np.nonzero(ni[:, 3] > 0)[0]:
            f, c = ni[nid, 2], ni[nid, 3]
            assert (tl[f : f + c] >= ns[nid, 0:3] - 1e-4).all()
            assert (th[f : f + c] <= ns[nid, 3:6] + 1e-4).all()

    assert nat[1].shape == ref[1].shape  # same tree size


def test_bvh4_matches_brute_oracle():
    """BVH4 collapse + 4-wide kernel (interpret mode) vs per-triangle brute."""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet
    from vk_gltf_renderer_tpu.ops.traverse import as_device, intersect_brute

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    rng = np.random.RandomState(5)
    n = 1024
    ro = rng.randn(n, 3).astype(np.float32) * 2
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    h4 = intersect_rays_packet(as_device(wb), jnp.asarray(ro), jnp.asarray(rd), interpret=True, wide=True)
    hb = intersect_brute(as_device(flat), jnp.asarray(ro), jnp.asarray(rd))
    t4, tb = np.asarray(h4["t"]), np.asarray(hb["t"])
    assert ((t4 < 1e30) == (tb < 1e30)).all()
    m = tb < 1e30
    assert np.allclose(t4[m], tb[m], atol=1e-4)
    assert (np.asarray(h4["tri"])[m] == np.asarray(hb["tri"])[m]).all()


def test_lane_traversal_matches_brute_oracle():
    """Per-lane skip-pointer kernel (ops/lane_traverse.py, interpret mode)
    vs per-triangle brute force, closest-hit AND any-hit occlusion."""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.lane_traverse import intersect_rays_lane
    from vk_gltf_renderer_tpu.ops.traverse import as_device, intersect_brute

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    rng = np.random.RandomState(7)
    n = 2048
    ro = rng.randn(n, 3).astype(np.float32) * 2
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    hl = intersect_rays_lane(as_device(wb), jnp.asarray(ro), jnp.asarray(rd), interpret=True)
    hb = intersect_brute(as_device(flat), jnp.asarray(ro), jnp.asarray(rd))
    tl, tb = np.asarray(hl["t"]), np.asarray(hb["t"])
    assert ((tl < 1e30) == (tb < 1e30)).all()
    m = tb < 1e30
    assert np.allclose(tl[m], tb[m], atol=1e-4)
    assert (np.asarray(hl["tri"])[m] == np.asarray(hb["tri"])[m]).all()
    assert (np.asarray(hl["rnode"])[m] == np.asarray(hb["rnode"])[m]).all()
    # any-hit mode: identical OCCLUSION answer (not necessarily closest)
    ha = intersect_rays_lane(as_device(wb), jnp.asarray(ro), jnp.asarray(rd), interpret=True, anyhit=True)
    assert ((np.asarray(ha["tri"]) >= 0) == m).all()
    # SoA ladder dispatch (the production entry the renderer's beyond-v6
    # rung uses): kernel="lane" and kernel="lane_stream" through
    # intersect_rays_packet_soa must agree with the brute oracle too
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    comps = [jnp.asarray(ro[:, k]) for k in range(3)] + [jnp.asarray(rd[:, k]) for k in range(3)]
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e32)
    for kname in ("lane", "lane_stream"):
        hs = intersect_rays_packet_soa(
            as_device(wb), comps[0], comps[1], comps[2], comps[3], comps[4],
            comps[5], tmin, tmax, interpret=True, kernel=kname,
        )
        ts = np.asarray(hs["t"])
        assert ((ts < 1e30) == (tb < 1e30)).all(), kname
        assert np.allclose(ts[m], tb[m], atol=1e-4), kname
        assert (np.asarray(hs["tri"])[m] == np.asarray(hb["tri"])[m]).all(), kname


def test_packet_v2_anyhit_matches_occlusion_oracle():
    """v2 packet kernel any-hit mode (t_best poisoning early-accept,
    ops/pallas_traverse.py _traverse2_body) reports exactly the same
    OCCLUSION answer as closest-hit — reference anchor: the RTX any-hit
    early-accept path, raytracer_interface.h.slang:149-187."""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet
    from vk_gltf_renderer_tpu.ops.traverse import as_device, intersect_brute

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    rng = np.random.RandomState(11)
    n = 2048
    ro = rng.randn(n, 3).astype(np.float32) * 2
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    hb = intersect_brute(as_device(flat), jnp.asarray(ro), jnp.asarray(rd))
    occluded = np.asarray(hb["t"]) < 1e30
    ha = intersect_rays_packet(
        as_device(wb), jnp.asarray(ro), jnp.asarray(rd), interpret=True, anyhit=True
    )
    assert ((np.asarray(ha["tri"]) >= 0) == occluded).all()
    # any-hit t is the 0/INFINITE sentinel, not a distance
    assert (np.asarray(ha["t"])[occluded] == 0.0).all()


def test_lane_refit_pages_matches_rebuild():
    """refit_lane_pages (device path) == a fresh host build on moved geometry."""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.lane_traverse import build_lane_tree, refit_lane_pages

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    # perturb geometry: shift all tris; refit node boxes accordingly
    tris2 = np.asarray(wb.tris).copy()
    tris2[:, 0:9] += 0.25
    ns2 = np.asarray(wb.nodes_self).copy()
    ns2[:, 0:6] += 0.25
    fresh, _, _ = build_lane_tree(wb.nodes_i, ns2, tris2, None,
                                  wtri_rnode=wb.wtri_rnode, wtri_tri=wb.wtri_tri)
    refit = refit_lane_pages(
        jnp.asarray(wb.lane_pages), jnp.asarray(wb.lane_geo_idx),
        jnp.asarray(ns2), jnp.asarray(tris2),
    )
    assert np.allclose(np.asarray(refit), fresh, atol=1e-6)


def test_vmem_budget_traversal_selection(monkeypatch):
    """Scene-size ladder: packet (VMEM-resident tables) while the BVH fits
    the budget, wavefront (HBM) beyond — renderer._config flips the
    traversal automatically (the budgeted-BLAS analog,
    renderer.cpp:1699-1721)."""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops import bvh_flatten
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh, fits_vmem, vmem_bytes
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    wb = build_world_bvh(build_scene_flat(sc))
    # Mosaic pads the 16-wide nodes_fi rows to 128 VMEM lanes — the budget
    # counts the padded footprint (b7dfa48), not raw nbytes.
    assert vmem_bytes(wb) == wb.nodes_fi.shape[0] * 128 * 4 + wb.tris128.nbytes
    assert vmem_bytes(wb) >= wb.nodes_fi.nbytes + wb.tris128.nbytes
    assert fits_vmem(wb)
    monkeypatch.setattr(bvh_flatten, "VMEM_TABLE_BUDGET", 16)
    assert not fits_vmem(wb)

    # renderer-level: over-budget on a TPU-like platform selects wavefront
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.create_scene("/root/reference/resources/Box.glb")
    import jax

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    monkeypatch.delenv("VKGR_TRAVERSAL", raising=False)
    monkeypatch.delenv("VKGR_PRIMARY_KERNEL", raising=False)
    assert r._config().traversal == "wavefront"  # over the (tiny) budget
    monkeypatch.setattr(bvh_flatten, "VMEM_TABLE_BUDGET", 1 << 30)
    cfg = r._config()
    assert cfg.traversal == "packet"
    # measured round-5 split: v3 primaries + v9 interleaved bounce loop
    # (NEXT.md §-2)
    assert cfg.primary_kernel == "v3"
    assert cfg.packet_kernel == "v9"
    # middle rung: only the v6 table fits -> packet stays on v6 everywhere.
    # (On the 12-tri Box both tables pad to the same minimum, so force the
    # rung by faking the fits decision rather than the budget.)
    real_fits = bvh_flatten.fits_vmem
    monkeypatch.setattr(bvh_flatten, "fits_vmem",
                        lambda bvh, kind: kind == "v6" and real_fits(bvh, kind))
    cfg = r._config()
    assert cfg.traversal == "packet"
    assert cfg.primary_kernel == "v6"
    assert cfg.packet_kernel == "v6"


def test_lane_stream_kernel_matches_brute_oracle():
    """HBM-streaming lane kernel (interpret mode) — same results as the
    VMEM-resident variant. (Experimental: not wired into the renderer; the
    production large-scene path is the automatic wavefront fallback.)"""
    import numpy as np
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.lane_traverse import intersect_rays_lane
    from vk_gltf_renderer_tpu.ops.traverse import as_device, intersect_brute

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    rng = np.random.RandomState(3)
    n = 1024
    ro = rng.randn(n, 3).astype(np.float32) * 2
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    hs = intersect_rays_lane(as_device(wb), jnp.asarray(ro), jnp.asarray(rd), interpret=True, stream=True)
    hb = intersect_brute(as_device(flat), jnp.asarray(ro), jnp.asarray(rd))
    ts, tb = np.asarray(hs["t"]), np.asarray(hb["t"])
    assert ((ts < 1e30) == (tb < 1e30)).all()
    m = tb < 1e30
    assert np.allclose(ts[m], tb[m], atol=1e-4)
    assert (np.asarray(hs["tri"])[m] == np.asarray(hb["tri"])[m]).all()


def test_packet_v3_bvh4_matches_v2():
    """The fused-BVH4 v3 kernel (one [1,32] row per internal visit) must
    return identical hits to the binary v2 kernel on a multi-level tree —
    closest AND any-hit, including in-kernel id resolution."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=12)
    cube_nid = ed.add_primitive("cube")
    ed.set_translation(cube_nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))
    assert wb.nodes4_fi.shape[0] > 2  # real multi-level BVH4

    rng = np.random.default_rng(11)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    h3 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v3")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h3[k]), atol=1e-5, err_msg=k)
    a2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2", anyhit=True)
    a3 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v3", anyhit=True)
    assert (np.asarray(a2["tri"] >= 0) == np.asarray(a3["tri"] >= 0)).all()


def test_packet_v3_entry_points_lossless_and_fewer_visits(tmp_path):
    """Per-packet entry points (packet_entry_stacks + seeded v3 stacks):
    clustered bounce-like packets must return EXACTLY the brute oracle's
    hits (the seeded sibling cut covers the whole tree) while visiting
    measurably fewer nodes than root-started traversal. Reference role:
    SER coherence hints, raytracer_interface.h.slang:199-222."""
    import jax.numpy as jnp
    import numpy as np

    from tools.large_scene_demo import write_large_glb
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import (
        PACKET,
        _pack_soa,
        packet_entry_stacks,
        traverse_packets3,
    )
    from vk_gltf_renderer_tpu.ops.traverse import as_device, intersect_brute
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    p = str(tmp_path / "terrain.glb")
    write_large_glb(p, target_tris=8000, grid=2)
    r = GltfRenderer(width=8, height=8, spp=1, max_depth=1)
    r.create_scene(p)
    wb = as_device(r.bvh)
    flat = as_device(build_scene_flat(r.scene))

    rng = np.random.RandomState(3)
    tris = np.asarray(r.bvh.tris128).reshape(-1, 16)
    v0 = tris[tris[:, 10] >= 0][:, 0:3]
    packs = []
    for _ in range(4):  # each packet a tight surface cluster (post-Morton-sort shape)
        c = v0[rng.randint(0, v0.shape[0])]
        packs.append((c + rng.randn(PACKET, 3) * 0.01).astype(np.float32))
    ro = np.concatenate(packs)
    n = ro.shape[0]
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    ro_p, _ = _pack_soa(
        [jnp.asarray(ro[:, 0]), jnp.asarray(ro[:, 1]), jnp.asarray(ro[:, 2]), jnp.full(n, 1e32)],
        PACKET,
    )
    rd_p, _ = _pack_soa(
        [jnp.asarray(rd[:, 0]), jnp.asarray(rd[:, 1]), jnp.asarray(rd[:, 2]), jnp.zeros(n)],
        PACKET,
    )
    entry = packet_entry_stacks(wb.nodes4_fi, wb.root4_code, ro_p, PACKET)
    assert (np.asarray(entry)[:, 0] > 1).any()  # descent actually engaged
    o_ref = traverse_packets3(
        wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
        interpret=True, tiles=1, count_visits=True,
    )
    o_seed = traverse_packets3(
        wb.nodes4_fi, wb.tris128, ro_p, rd_p, wb.root4_code,
        interpret=True, tiles=1, count_visits=True, entry=entry,
    )
    hb = intersect_brute(flat, jnp.asarray(ro), jnp.asarray(rd))
    tb = np.asarray(hb["t"])
    m = tb < 1e30
    t_s = np.asarray(o_seed)[:, 0].reshape(-1)[:n]
    tri_s = np.asarray(o_seed)[:, 2].reshape(-1)[:n].astype(int)
    assert ((tri_s >= 0) == m).all()
    assert np.allclose(t_s[m], tb[m], atol=1e-4)
    assert (tri_s[m] == np.asarray(hb["tri"])[m]).all()
    v_ref = np.asarray(o_ref)[:, 5, 0, 0].sum()
    v_seed = np.asarray(o_seed)[:, 5, 0, 0].sum()
    assert v_seed < 0.75 * v_ref  # the >=25%-fewer-visits contract


@pytest.mark.slow  # parity for a KEPT-AS-NEGATIVE experiment (v5 measured slower; NEXT.md)
def test_packet_v5_multipop_matches_v2():
    """The branch-free multi-pop v5 kernel (speculative node+leaf fetches,
    masked vector phase, t_best chained through the popped group) must
    return identical hits to v2 — closest AND any-hit, root-started AND
    entry-seeded — on a multi-level BVH4."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=12)
    cube_nid = ed.add_primitive("cube")
    ed.set_translation(cube_nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))
    assert wb.nodes4_fi.shape[0] > 2

    rng = np.random.default_rng(23)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    h5 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v5")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h5[k]), atol=1e-5, err_msg=k)
    h5e = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v5",
                                    entry_points=True)
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h5e[k]), atol=1e-5, err_msg=k)
    a2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2", anyhit=True)
    a5 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v5", anyhit=True)
    assert (np.asarray(a2["tri"] >= 0) == np.asarray(a5["tri"] >= 0)).all()


def test_packet_v6_bvh16_matches_v2():
    """The dense-BVH16 v6 kernel (one [1,128] row per internal visit, 16
    child boxes + codes + 15 near-order axes) must return identical hits
    to the binary v2 kernel on a multi-level tree — closest AND any-hit.
    Also checks the v6 VMEM accounting is DENSE (no Mosaic padding)."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh, vmem_bytes
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=16)
    cube_nid = ed.add_primitive("cube")
    ed.set_translation(cube_nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))
    assert wb.nodes16_fi.shape[1] == 128
    assert wb.nodes16_fi.shape[0] < wb.nodes4_fi.shape[0]  # deeper collapse
    assert vmem_bytes(wb, "v6") == wb.nodes16_fi.nbytes + wb.tris128.nbytes

    rng = np.random.default_rng(31)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    h6 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v6")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h6[k]), atol=1e-5, err_msg=k)
    a2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2", anyhit=True)
    a6 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v6", anyhit=True)
    assert (np.asarray(a2["tri"] >= 0) == np.asarray(a6["tri"] >= 0)).all()


def test_packet_v6_refit_matches_brute():
    """After a vertex refit, the regathered BVH16 mirror must trace the
    MOVED geometry exactly (refit_world_bvh map16 path vs brute oracle)."""
    import dataclasses

    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.animation import refit_world_bvh
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa
    from vk_gltf_renderer_tpu.ops.traverse import intersect_brute

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=12)
    sc.parse_scene()
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)

    # move every world triangle by a smooth displacement and refit
    tris = jnp.asarray(wb.tris)
    disp = 0.25 * jnp.sin(tris[:, 0:1] * 3.0)
    moved = tris.at[:, 0:9:3].add(disp)
    nf, ns, n4f, tris2, nfi, t128, lpages, nfi4, nfi16 = refit_world_bvh(wb, moved)
    wb2 = dataclasses.replace(
        wb, nodes_f=nf, nodes_self=ns, nodes4_f=n4f, tris=tris2, nodes_fi=nfi,
        tris128=t128, lane_pages=lpages, nodes4_fi=nfi4, nodes16_fi=nfi16,
    )

    rng = np.random.default_rng(7)
    n = 512
    lo, hi = np.asarray(ns)[0, 0:3], np.asarray(ns)[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h6 = intersect_rays_packet_soa(wb2, *args, interpret=True, tiles=1, kernel="v6")
    # brute oracle directly over the MOVED world triangles
    mt = np.asarray(moved)
    valid = np.asarray(wb.wtri_tri) >= 0
    t_ref = np.full(n, np.inf, np.float32)
    tri_ref = np.full(n, -1, np.int64)
    ron, rdn = np.asarray(ro), np.asarray(rd)
    for i, (v0, v1, v2) in enumerate(zip(mt[:, 0:3], mt[:, 3:6], mt[:, 6:9])):
        if not valid[i] or i >= wb.num_world_tris:
            continue
        e1, e2 = v1 - v0, v2 - v0
        p = np.cross(rdn, e2)
        det = (e1 * p).sum(1)
        ok = np.abs(det) >= 1e-12
        invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = ron - v0
        u = (tv * p).sum(1) * invd
        q = np.cross(tv, e1)
        v = (rdn * q).sum(1) * invd
        t = (e2 * q).sum(1) * invd
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < t_ref)
        t_ref = np.where(hit, t, t_ref)
        tri_ref = np.where(hit, np.asarray(wb.wtri_tri)[i], tri_ref)
    m = np.isfinite(t_ref)
    t6 = np.asarray(h6["t"])
    assert ((t6 < 1e30) == m).all()
    np.testing.assert_allclose(t6[m], t_ref[m], atol=1e-4)
    assert (np.asarray(h6["tri"])[m] == tri_ref[m]).all()


def test_sbvh_spatial_splits_match_sah_hits():
    """SBVH (spatial splits + triangle-clipped reference duplication,
    bvh_flatten._build_sbvh) must return the exact closest hits of the
    plain SAH tree: duplicated references carry the same (rnode, tri)
    payload, and clipped child boxes stay conservative. Long thin
    triangles force the spatial-split path (object-split children overlap
    heavily). Reference anchor: the driver-side BLAS build policy this
    replaces (gltf_scene_rtx.cpp:173)."""
    from vk_gltf_renderer_tpu.ops.bvh_flatten import LEAF_SIZE, _build_sah, _build_sbvh

    rng = np.random.RandomState(7)
    n = 1500
    v0 = rng.rand(n, 3).astype(np.float64) * 10
    # long thin slivers: one huge edge along a random axis + a small one
    e_long = np.zeros((n, 3))
    e_long[np.arange(n), rng.randint(0, 3, n)] = 4.0 + rng.rand(n) * 4.0
    e_small = rng.rand(n, 3) * 0.2
    tris = np.stack([v0, v0 + e_long, v0 + e_small], axis=1)
    tlo, thi = tris.min(1).astype(np.float32), tris.max(1).astype(np.float32)
    cen = (tlo + thi) * 0.5
    wv = tris.reshape(n, 9).astype(np.float32)

    order_s, ni_s, nf_s, ns_s = _build_sbvh(tlo, thi, cen, wv)
    assert order_s.shape[0] > n  # spatial splits actually duplicated refs
    order_o, ni_o, _, ns_o = _build_sah(tlo, thi, cen)

    # structural: leaves tile [0, nrefs); every ref's tri is a valid id
    for ni, order in ((ni_s, order_s), (ni_o, order_o)):
        leaves = ni[ni[:, 3] > 0]
        segs = sorted((int(f), int(c)) for f, c in leaves[:, 2:4])
        pos = 0
        for f, c in segs:
            assert f == pos
            pos += c
        assert pos == order.shape[0]
    assert order_s.min() >= 0 and order_s.max() < n

    def closest(tree, order, ro, rd):
        ni, ns = tree
        tw = tris[order]  # [nrefs,3,3]
        hits_t = np.full(ro.shape[0], np.inf)
        hits_id = np.full(ro.shape[0], -1)
        for r in range(ro.shape[0]):
            o, d = ro[r], rd[r]
            inv = np.where(np.abs(d) < 1e-20, 1e30, 1.0 / d)
            stack = [0]
            while stack:
                nid = stack.pop()
                t0 = (ns[nid, 0:3] - o) * inv
                t1 = (ns[nid, 3:6] - o) * inv
                tn = np.minimum(t0, t1).max()
                tf = np.maximum(t0, t1).min()
                if tn > tf or tf < 0 or tn > hits_t[r]:
                    continue
                if ni[nid, 3] > 0:
                    f, c = int(ni[nid, 2]), int(ni[nid, 3])
                    for k in range(f, f + c):
                        a, b2, c2 = tw[k]
                        e1, e2 = b2 - a, c2 - a
                        p = np.cross(d, e2)
                        det = e1 @ p
                        if abs(det) < 1e-12:
                            continue
                        tv = o - a
                        u = (tv @ p) / det
                        q = np.cross(tv, e1)
                        v = (d @ q) / det
                        t = (e2 @ q) / det
                        if u >= 0 and v >= 0 and u + v <= 1 and 1e-6 < t < hits_t[r]:
                            hits_t[r] = t
                            hits_id[r] = order[k]
                    continue
                stack.append(int(ni[nid, 0]))
                stack.append(int(ni[nid, 1]))
        return hits_t, hits_id

    m = 200
    ro = rng.rand(m, 3) * 12 - 1
    rd = rng.randn(m, 3)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ts, ids_s = closest((ni_s, ns_s), order_s, ro, rd)
    to, ids_o = closest((ni_o, ns_o), order_o, ro, rd)
    np.testing.assert_allclose(ts, to, atol=1e-9)
    assert (ids_s == ids_o).all()


def test_packet_v7_smem_sidecar_matches_v2():
    """The v7 kernel (v3 rows + SMEM sidecar for child codes/near-order
    axes, bvh_flatten._packet3_sidecar) must return identical hits to v2 —
    closest AND with per-packet entry points (both SMEM operands bound at
    once)."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=8)
    nid = ed.add_primitive("cube")
    ed.set_translation(nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))
    assert wb.nodes4_sc.shape == (wb.nodes4_fi.shape[0], 8)
    # sidecar is byte-for-byte the int cast of the fused-row scalar block
    np.testing.assert_array_equal(
        np.asarray(wb.nodes4_sc[:, 0:7]), np.asarray(wb.nodes4_fi[:, 24:31]).astype(np.int32))

    rng = np.random.default_rng(13)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    h7 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v7")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h7[k]), atol=1e-5, err_msg=k)
    # anyhit shares the v2/v3-tested poisoning body; v7 only changes the
    # internal visit's scalar reads, which closest + entry already cover
    e7 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v7",
                                   entry_points=True)
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(e7[k]), atol=1e-5, err_msg=k)


def test_packet_v8_leaf_queue_matches_v2():
    """The v8 leaf-queue kernel (branchless dual-pop: internal-only stack +
    SMEM leaf queue drained one block per iteration) must return identical
    hits to v2 — closest AND any-hit. Deferred leaves see a stale t_best,
    which is conservative only; every queued leaf is drained before exit."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=8)
    nid = ed.add_primitive("cube")
    ed.set_translation(nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))

    rng = np.random.default_rng(17)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    h8 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v8")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for k in ("t", "rnode", "tri", "u", "v"):
        np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h8[k]), atol=1e-5, err_msg=k)
    a2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2", anyhit=True)
    a8 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v8", anyhit=True)
    assert (np.asarray(a2["tri"] >= 0) == np.asarray(a8["tri"] >= 0)).all()


def test_primary_seed_reverify_matches_trace():
    """_primary_seed_hits (the sound ray-path-prediction seed,
    RenderConfig.primary_seed) must re-derive EXACTLY the traced first
    hits when fed those hits' own (rnode, tri) via emit2ref — and reject
    or stay-true on garbage refs (a wrong prediction either fails the
    Moller-Trumbore re-verify or is itself a true intersection)."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pathtrace import _primary_seed_hits
    from vk_gltf_renderer_tpu.ops.traverse_wavefront import intersect_rays_wavefront

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    wb = build_world_bvh(build_scene_flat(sc))

    rng = np.random.default_rng(5)
    n = 512
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    h = intersect_rays_wavefront(wb, ro, rd)
    hit = np.asarray(h["tri"]) >= 0
    assert hit.sum() > 100

    # (rnode, tri) -> emit row -> ref, exactly as _render_frame does
    row = np.asarray(wb.rn_attr_base)[np.maximum(np.asarray(h["rnode"]), 0)] + np.maximum(np.asarray(h["tri"]), 0)
    ref = np.where(hit, np.asarray(wb.emit2ref)[np.clip(row, 0, wb.emit2ref.shape[0] - 1)], -1)
    t, rn, tri, u, v, valid = _primary_seed_hits(wb, ro, rd, jnp.asarray(ref, jnp.int32))
    np.testing.assert_array_equal(np.asarray(valid), hit)
    m = hit
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(h["t"])[m], rtol=1e-5)
    assert (np.asarray(rn)[m] == np.asarray(h["rnode"])[m]).all()
    assert (np.asarray(tri)[m] == np.asarray(h["tri"])[m]).all()
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(h["u"])[m], atol=1e-5)

    # garbage refs: valid only where a TRUE intersection with that exact
    # triangle exists (sound upper bound by construction)
    bad = jnp.asarray(rng.integers(0, wb.num_world_tris, n), jnp.int32)
    t2, rn2, tri2, u2, v2, valid2 = _primary_seed_hits(wb, ro, rd, bad)
    tb = np.asarray(wb.tris)[np.asarray(bad)]
    v0, e1, e2 = tb[:, 0:3], tb[:, 3:6] - tb[:, 0:3], tb[:, 6:9] - tb[:, 0:3]
    ron, rdn = np.asarray(ro), np.asarray(rd)
    p = np.cross(rdn, e2)
    det = (e1 * p).sum(1)
    ok = np.abs(det) >= 1e-12
    invd = 1.0 / np.where(ok, det, 1.0)
    tv = ron - v0
    uu = (tv * p).sum(1) * invd
    q = np.cross(tv, e1)
    vv = (rdn * q).sum(1) * invd
    tt = (e2 * q).sum(1) * invd
    truth = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
    np.testing.assert_array_equal(np.asarray(valid2), truth)


def test_packet_v9_interleaved_matches_v2():
    """The v9 WAYS-way interleaved kernel (independent per-way stacks/leaf
    queues over row-sliced sub-packets) must return identical hits to v2 —
    closest AND any-hit, 2-way and 4-way. Sub-packets traverse different
    node sets than the whole packet, but per-ray results are traversal-
    order independent."""
    import jax.numpy as jnp

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.models.editor import SceneEditor
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.ops.pallas_traverse import intersect_rays_packet_soa

    sc = Scene()
    sc.load("/root/reference/resources/Box.glb")
    ed = SceneEditor(sc)
    ed.add_primitive("sphere", segments=8)
    nid = ed.add_primitive("cube")
    ed.set_translation(nid, [2.0, 0.5, -1.0])
    sc.parse_scene()
    wb = build_world_bvh(build_scene_flat(sc))

    rng = np.random.default_rng(23)
    n = 1024
    lo, hi = wb.nodes_self[0, 0:3], wb.nodes_self[0, 3:6]
    c = (lo + hi) / 2
    r = float(np.linalg.norm(hi - lo))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(c + d * r)
    rd = jnp.asarray(-d)
    args = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            jnp.zeros(n), jnp.full(n, 1e32)]
    h2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2")
    assert np.asarray(h2["tri"] >= 0).sum() > 200
    for kern in ("v9", "v9x4", "v9x8"):
        h9 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel=kern)
        for k in ("t", "rnode", "tri", "u", "v"):
            np.testing.assert_allclose(np.asarray(h2[k]), np.asarray(h9[k]),
                                       atol=1e-5, err_msg=f"{kern}:{k}")
    a2 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v2", anyhit=True)
    a9 = intersect_rays_packet_soa(wb, *args, interpret=True, tiles=1, kernel="v9", anyhit=True)
    assert (np.asarray(a2["tri"] >= 0) == np.asarray(a9["tri"] >= 0)).all()

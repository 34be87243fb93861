"""Animation tests: channel evaluation, time wrapping, CPU vs device
skinning/morph parity, world-matrix propagation parity, BVH refit.

Mirrors reference test_animation_update.cpp / test_compute_animation.cpp
(device path checked against the CPU oracle)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vk_gltf_renderer_tpu.models import Scene
from vk_gltf_renderer_tpu.models.animation import (
    AnimationChannel,
    AnimationInfo,
    _sample_channel,
    cpu_morph,
    cpu_skin,
)
from vk_gltf_renderer_tpu.ops.animation import (
    morph_vertices,
    pack_levels,
    propagate_world_matrices,
    refit_world_bvh,
    skin_vertices,
    bake_world_tris,
)


def test_time_wrapping():
    info = AnimationInfo(start=1.0, end=3.0, current_time=1.0)
    assert info.increment_time(1.0) == pytest.approx(2.0)
    assert info.increment_time(1.5) == pytest.approx(1.5)  # wrapped
    info.current_time = 2.9
    assert info.increment_time(0.2, loop=False) == pytest.approx(3.0)  # clamped


def test_linear_and_step_channels():
    times = np.array([0.0, 1.0, 2.0], np.float32)
    vals = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    lin = AnimationChannel(node=0, path="translation", times=times, values=vals)
    np.testing.assert_allclose(_sample_channel(lin, 0.5), [0.5, 0, 0])
    step = AnimationChannel(node=0, path="translation", times=times, values=vals, interpolation="STEP")
    np.testing.assert_allclose(_sample_channel(step, 0.99), [0, 0, 0])
    np.testing.assert_allclose(_sample_channel(lin, 5.0), [2, 0, 0])  # clamp past end


def test_slerp_rotation():
    times = np.array([0.0, 1.0], np.float32)
    q0 = [0, 0, 0, 1]
    q1 = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]  # 90 deg about Z
    ch = AnimationChannel(node=0, path="rotation", times=times, values=np.array([q0, q1], np.float32))
    mid = _sample_channel(ch, 0.5)
    expect = [0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)]
    np.testing.assert_allclose(mid, expect, atol=1e-5)


def test_cubicspline_channel():
    times = np.array([0.0, 1.0], np.float32)
    # in-tangent, value, out-tangent per key
    vals = np.array([[0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [1, 0, 0], [0, 0, 0]], np.float32)
    ch = AnimationChannel(node=0, path="translation", times=times, values=vals, interpolation="CUBICSPLINE")
    v = _sample_channel(ch, 0.5)
    assert 0.0 < v[0] < 1.0  # smooth hermite between endpoints


def test_device_skin_matches_cpu():
    rng = np.random.default_rng(0)
    V, J = 64, 8
    pos = rng.normal(size=(V, 3)).astype(np.float32)
    nrm = rng.normal(size=(V, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    joints = rng.integers(0, J, size=(V, 4)).astype(np.int32)
    w = rng.random((V, 4)).astype(np.float32)
    mats = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    for j in range(J):
        mats[j, :3, 3] = rng.normal(size=3)
    cp, cn = cpu_skin(pos, nrm, joints, w, mats)
    dp, dn = skin_vertices(jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(joints), jnp.asarray(w), jnp.asarray(mats))
    np.testing.assert_allclose(np.asarray(dp), cp, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dn), cn, atol=2e-5)


def test_device_morph_matches_cpu():
    rng = np.random.default_rng(1)
    V, T = 50, 3
    base = rng.normal(size=(V, 3)).astype(np.float32)
    deltas = rng.normal(size=(T, V, 3)).astype(np.float32)
    w = np.array([0.3, 0.0, 0.7], np.float32)
    c = cpu_morph(base, list(deltas), w)
    d = morph_vertices(jnp.asarray(base), jnp.asarray(deltas), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(d), c, atol=2e-5)


def test_device_world_matrices_match_host(box_glb):
    sc = Scene()
    sc.load(box_glb)
    from vk_gltf_renderer_tpu.utils.mathutil import node_local_matrix

    n = len(sc.model.nodes)
    locals_ = np.stack([node_local_matrix(sc.model.nodes[i]) for i in range(n)])
    nodes, pars, mask = pack_levels(sc.topo_levels, sc.parents)
    w = propagate_world_matrices(jnp.asarray(locals_), jnp.asarray(pars), jnp.asarray(nodes), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(w), sc.world_matrices, atol=1e-5)


def test_refit_matches_rebuild(box_glb):
    from vk_gltf_renderer_tpu.ops.bvh_flatten import build_world_bvh
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat

    sc = Scene()
    sc.load(box_glb)
    flat = build_scene_flat(sc)
    wb = build_world_bvh(flat)
    # move vertices and refit
    moved = jnp.asarray(flat.vtx_pos) + jnp.asarray([1.0, 2.0, 3.0])
    tris = bake_world_tris(moved, jnp.asarray(flat.tri_idx), jnp.asarray(flat.rn_o2w),
                           jnp.asarray(wb.wtri_rnode), jnp.asarray(wb.wtri_tri))
    nodes_f, nodes_self, *_ = refit_world_bvh(wb, tris)
    root_lo = np.asarray(nodes_self[0, 0:3])
    root_hi = np.asarray(nodes_self[0, 3:6])
    # Box root world matrix is a pure rotation/identity scale; expect the
    # translated bounds
    lo0, hi0 = sc.scene_bounds()
    np.testing.assert_allclose(root_lo, lo0 + [1, 2, 3], atol=1e-4)
    np.testing.assert_allclose(root_hi, hi0 + [1, 2, 3], atol=1e-4)


def test_animated_scene_update(triangle_model):
    """Full loop: animation channel -> model -> world matrices -> dirty."""
    import struct

    g = triangle_model.gltf
    buf = triangle_model.buffers[0]
    times = np.array([0.0, 1.0], np.float32)
    vals = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
    off_t = len(buf); buf.extend(times.tobytes())
    off_v = len(buf); buf.extend(vals.tobytes())
    g["buffers"][0]["byteLength"] = len(buf)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": off_t, "byteLength": times.nbytes},
        {"buffer": 0, "byteOffset": off_v, "byteLength": vals.nbytes},
    ]
    g["accessors"] += [
        {"bufferView": len(g["bufferViews"]) - 2, "componentType": 5126, "count": 2, "type": "SCALAR", "min": [0], "max": [1]},
        {"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126, "count": 2, "type": "VEC3"},
    ]
    g["animations"] = [{
        "samplers": [{"input": len(g["accessors"]) - 2, "output": len(g["accessors"]) - 1, "interpolation": "LINEAR"}],
        "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
    }]
    sc = Scene()
    sc.load_from_model(triangle_model)
    from vk_gltf_renderer_tpu.models.animation import update_animation

    info = sc.animations[0]
    info.current_time = 0.5
    assert update_animation(sc, 0)
    sc.update_world_matrices_serial()
    sc.refresh_render_node_matrices()
    np.testing.assert_allclose(sc.render_nodes[0].world_matrix[:3, 3], [2, 0, 0], atol=1e-6)


def test_refit_frames_do_no_host_primitive_decode(triangle_model, monkeypatch):
    """Animated frames must NOT re-extract primitives from the Model: the
    skin/morph inputs are device-resident tables built once
    (gltf_scene_animation_vk.cpp:180 createGpuBuffers analog). Round-1
    regression: _refit_device called extract_primitive per node per frame."""
    import struct

    import numpy as np

    from vk_gltf_renderer_tpu.models import geometry
    from vk_gltf_renderer_tpu.renderer import GltfRenderer

    # tiny rotation animation on the triangle scene
    g = triangle_model.gltf
    buf = triangle_model.buffers[0]
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array([[0, 0, 0, 1], [0, 0, 1, 0]], np.float32)
    off_t = len(buf); buf.extend(times.tobytes())
    off_r = len(buf); buf.extend(rots.tobytes())
    g["buffers"][0]["byteLength"] = len(buf)
    g["bufferViews"] += [
        {"buffer": 0, "byteOffset": off_t, "byteLength": times.nbytes},
        {"buffer": 0, "byteOffset": off_r, "byteLength": rots.nbytes},
    ]
    g["accessors"] += [
        {"bufferView": len(g["bufferViews"]) - 2, "componentType": 5126, "count": 2,
         "type": "SCALAR", "min": [0.0], "max": [1.0]},
        {"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126, "count": 2, "type": "VEC4"},
    ]
    g["animations"] = [{
        "channels": [{"sampler": 0, "target": {"node": 0, "path": "rotation"}}],
        "samplers": [{"input": len(g["accessors"]) - 2, "output": len(g["accessors"]) - 1,
                      "interpolation": "LINEAR"}],
    }]

    # morph target so the refit actually exercises the deform path (the
    # round-1 regression: per-frame extract_primitive for morphed nodes)
    deltas = np.array([[0, 0, 0.2], [0, 0, 0.2], [0, 0, 0.2]], np.float32)
    off_d = len(buf); buf.extend(deltas.tobytes())
    g["buffers"][0]["byteLength"] = len(buf)
    g["bufferViews"].append({"buffer": 0, "byteOffset": off_d, "byteLength": deltas.nbytes})
    g["accessors"].append({"bufferView": len(g["bufferViews"]) - 1, "componentType": 5126,
                           "count": 3, "type": "VEC3",
                           "min": deltas.min(0).tolist(), "max": deltas.max(0).tolist()})
    g["meshes"][0]["primitives"][0]["targets"] = [{"POSITION": len(g["accessors"]) - 1}]
    g["nodes"][0]["weights"] = [0.5]

    r = GltfRenderer(width=16, height=16, spp=1, max_depth=2)
    r.scene.load_from_model(triangle_model)
    from vk_gltf_renderer_tpu.renderer import fit_camera

    r.camera = fit_camera(r.scene)
    r.rebuild_device_scene()
    r.animate = True
    r.on_render()  # first frame may build caches

    calls = {"n": 0}
    orig = geometry.extract_primitive

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(geometry, "extract_primitive", counting)
    for _ in range(3):
        r.on_render()
    assert calls["n"] == 0, f"{calls['n']} host primitive decodes during animated frames"

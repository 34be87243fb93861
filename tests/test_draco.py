"""KHR_draco_mesh_compression codec tests.

No Draco library or ground-truth binaries exist in this environment (the
reference downloads the official codec at build time, cmake/draco.cmake),
so conformance is asserted by (a) encoder/decoder round-trips through the
spec-described layers (rANS, symbol coding, sequential + edgebreaker
connectivity, attribute transforms), (b) the structural guard at the glTF
boundary (decoded counts + POSITION bounds vs the accessor declarations),
and (c) an end-to-end compressed-scene load + render (reference behavior:
tinygltf + USE_DRACO, gltf_scene.cpp:248-249)."""

import json

import numpy as np
import pytest

from vk_gltf_renderer_tpu.models.draco import (
    ATTR_NORMAL,
    ATTR_POSITION,
    ATTR_TEXCOORD,
    DT_FLOAT32,
    DT_UINT16,
    METHOD_EDGEBREAKER,
    METHOD_SEQUENTIAL,
    PRED_DIFFERENCE,
    PRED_NONE,
    PRED_PARALLELOGRAM,
    SEQ_ATTR_GENERIC,
    SEQ_ATTR_INTEGER,
    SEQ_ATTR_NORMALS,
    SEQ_ATTR_QUANTIZATION,
    ByteReader,
    ByteWriter,
    DracoError,
    RansDecoder,
    RansEncoder,
    build_probs,
    decode_mesh,
    decode_symbols,
    encode_mesh,
    encode_symbols,
)


# ------------------------------------------------------------ entropy layer
@pytest.mark.parametrize("nsym,count,seed", [(4, 100, 0), (256, 5000, 1), (17, 3, 2), (2, 1, 3)])
def test_rans_roundtrip(nsym, count, seed):
    rng = np.random.RandomState(seed)
    # skewed distribution (zipf-ish) — the regime rANS is built for
    syms = np.minimum(rng.zipf(1.5, count) - 1, nsym - 1).astype(np.int64)
    precision = 12
    probs = build_probs(syms, nsym, precision)
    payload = RansEncoder(probs, precision).encode(syms)
    w = ByteWriter()
    from vk_gltf_renderer_tpu.models.draco import write_prob_table

    write_prob_table(w, probs)
    w.varint(len(payload))
    w.bytes(payload)
    dec = RansDecoder(ByteReader(bytes(w.out)), nsym, precision)
    out = [dec.decode() for _ in range(count)]
    assert out == list(syms)


@pytest.mark.parametrize("maxv,count", [(3, 50), (1000, 400), (1 << 20, 64)])
def test_symbol_codec_roundtrip(maxv, count):
    rng = np.random.RandomState(maxv % 97)
    vals = rng.randint(0, maxv + 1, count).astype(np.uint32)
    w = ByteWriter()
    encode_symbols(w, vals, 3)
    out = decode_symbols(ByteReader(bytes(w.out)), count, 3)
    np.testing.assert_array_equal(out, vals)


# ----------------------------------------------------------- mesh sequential
def _grid_mesh(nx=5, ny=4):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel(), (xs * ys).ravel() * 0.1], -1).astype(np.float32)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = i * ny + j, (i + 1) * ny + j, (i + 1) * ny + j + 1, i * ny + j + 1
            faces += [[a, b, c], [a, c, d]]
    return pos, np.asarray(faces, np.uint32)


def test_sequential_mesh_raw_floats_bit_exact():
    pos, faces = _grid_mesh()
    blob = encode_mesh(
        faces,
        [{"attr_type": ATTR_POSITION, "data": pos, "seq_kind": SEQ_ATTR_GENERIC,
          "data_type": DT_FLOAT32, "unique_id": 0}],
    )
    out = decode_mesh(blob)
    np.testing.assert_array_equal(out["faces"], faces)
    np.testing.assert_array_equal(out["attributes"][0]["data"], pos)


@pytest.mark.parametrize("pred", [PRED_NONE, PRED_DIFFERENCE, PRED_PARALLELOGRAM])
def test_sequential_mesh_quantized(pred):
    pos, faces = _grid_mesh(7, 6)
    bits = 14
    blob = encode_mesh(
        faces,
        [{"attr_type": ATTR_POSITION, "data": pos, "seq_kind": SEQ_ATTR_QUANTIZATION,
          "quantization_bits": bits, "prediction": pred, "unique_id": 0}],
    )
    out = decode_mesh(blob)
    np.testing.assert_array_equal(out["faces"], faces)
    span = float((pos - pos.min(0)).max())
    np.testing.assert_allclose(
        out["attributes"][0]["data"], pos, atol=span / ((1 << bits) - 1) * 0.51 + 1e-7
    )


def test_sequential_mesh_normals_and_uvs_and_ints():
    pos, faces = _grid_mesh(4, 4)
    rng = np.random.RandomState(7)
    nrm = rng.standard_normal((pos.shape[0], 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    uv = rng.rand(pos.shape[0], 2).astype(np.float32)
    joints = rng.randint(0, 4, (pos.shape[0], 4)).astype(np.uint16)
    blob = encode_mesh(
        faces,
        [
            {"attr_type": ATTR_NORMAL, "data": nrm.astype(np.float32),
             "seq_kind": SEQ_ATTR_NORMALS, "quantization_bits": 12, "unique_id": 1},
            {"attr_type": ATTR_TEXCOORD, "data": uv, "seq_kind": SEQ_ATTR_QUANTIZATION,
             "quantization_bits": 12, "unique_id": 2},
            {"attr_type": 4, "data": joints, "seq_kind": SEQ_ATTR_INTEGER,
             "data_type": DT_UINT16, "prediction": PRED_DIFFERENCE, "unique_id": 3},
        ],
    )
    out = decode_mesh(blob)
    dn = out["attributes"][0]["data"]
    # octahedral 12-bit: direction preserved to ~1e-3
    assert (np.sum(dn * nrm, -1) > 1 - 2e-5).all()
    np.testing.assert_allclose(out["attributes"][1]["data"], uv, atol=1.5e-4)
    np.testing.assert_array_equal(out["attributes"][2]["data"], joints)


# ------------------------------------------------------------- edgebreaker
def _octahedron():
    pos = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.uint32
    )
    return pos, faces


def _tri_set(pos, faces):
    """Geometry as a set of position-triangles, rotation-normalized —
    permutation/reindex-invariant equality."""
    tris = pos[np.asarray(faces).reshape(-1, 3)]
    out = set()
    for t in tris:
        rows = [tuple(np.round(r, 5)) for r in t]
        k = min((rows[i:] + rows[:i] for i in range(3)), key=lambda x: x)
        out.add(tuple(k))
    return out


def test_edgebreaker_mesh_roundtrip():
    pos, faces = _octahedron()
    blob = encode_mesh(
        faces,
        [{"attr_type": ATTR_POSITION, "data": pos, "seq_kind": SEQ_ATTR_GENERIC,
          "data_type": DT_FLOAT32, "unique_id": 0}],
        method=METHOD_EDGEBREAKER,
    )
    out = decode_mesh(blob)
    assert out["faces"].shape == faces.shape
    # same surface, up to the codec's canonical vertex order
    assert _tri_set(out["attributes"][0]["data"], out["faces"]) == _tri_set(pos, faces)


# ------------------------------------------------------------ glTF boundary
def _draco_gltf(tmp_path, pos, faces, *, blob=None, count=None, pos_min=None, pos_max=None,
                method=METHOD_SEQUENTIAL):
    if blob is None:
        blob = encode_mesh(
            faces,
            [{"attr_type": ATTR_POSITION, "data": pos, "seq_kind": SEQ_ATTR_QUANTIZATION,
              "quantization_bits": 14, "unique_id": 0}],
            method=method,
        )
    gltf = {
        "asset": {"version": "2.0"},
        "extensionsUsed": ["KHR_draco_mesh_compression"],
        "extensionsRequired": ["KHR_draco_mesh_compression"],
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0,
            "extensions": {"KHR_draco_mesh_compression": {
                "bufferView": 0, "attributes": {"POSITION": 0}}},
        }]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.3, 0.2, 1]}}],
        "accessors": [
            {"componentType": 5126, "count": int(count if count is not None else len(pos)),
             "type": "VEC3",
             "min": (pos_min if pos_min is not None else pos.min(0)).tolist(),
             "max": (pos_max if pos_max is not None else pos.max(0)).tolist()},
            {"componentType": 5123, "count": int(np.asarray(faces).size), "type": "SCALAR"},
        ],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(blob)}],
        "buffers": [{"uri": "mesh.drc.bin", "byteLength": len(blob)}],
    }
    (tmp_path / "mesh.drc.bin").write_bytes(blob)
    p = tmp_path / "draco.gltf"
    p.write_text(json.dumps(gltf))
    return p


@pytest.mark.parametrize("method", [METHOD_SEQUENTIAL, METHOD_EDGEBREAKER])
def test_draco_scene_end_to_end(tmp_path, method):
    """A Draco-compressed glTF loads, decompresses, matches its uncompressed
    twin (within quantization), and renders."""
    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat
    from vk_gltf_renderer_tpu.renderer import GltfRenderer, fit_camera

    pos, faces = _octahedron()
    p = _draco_gltf(tmp_path, pos, faces, method=method)
    sc = Scene()
    sc.load(p)
    assert "KHR_draco_mesh_compression" not in sc.model.gltf.get("extensionsRequired", [])
    flat = build_scene_flat(sc)
    vp = np.asarray(flat.vtx_pos)
    ti = np.asarray(flat.tri_idx)
    assert vp.shape == pos.shape and ti.size == faces.size
    span = float((pos - pos.min(0)).max())
    tol = span / ((1 << 14) - 1) + 1e-6
    assert _tri_set(np.round(vp / tol) * tol, ti) == _tri_set(np.round(pos / tol) * tol, faces)

    r = GltfRenderer(width=24, height=24, spp=1, max_depth=2)
    r.scene = sc
    r.camera = fit_camera(sc)
    r.rebuild_device_scene()
    r.on_render()
    img = r.image_linear()
    assert np.isfinite(img).all() and img.mean() > 0.0


def test_draco_structural_guard_count(tmp_path):
    """Declared accessor count disagreeing with the decoded stream is a
    typed error (the silent-corruption failure mode the round-2 advisor
    flagged for meshopt)."""
    from vk_gltf_renderer_tpu.models.gltf import load_model

    pos, faces = _octahedron()
    p = _draco_gltf(tmp_path, pos, faces, count=len(pos) + 1)
    with pytest.raises(DracoError, match="count"):
        load_model(p)


def test_draco_structural_guard_position_bounds(tmp_path):
    from vk_gltf_renderer_tpu.models.gltf import load_model

    pos, faces = _octahedron()
    p = _draco_gltf(
        tmp_path, pos, faces,
        pos_min=pos.min(0) * 0.1, pos_max=pos.max(0) * 0.1,
    )
    with pytest.raises(DracoError, match="min/max"):
        load_model(p)


def test_draco_bad_magic():
    with pytest.raises(DracoError, match="magic"):
        decode_mesh(b"NOTDRACO" + b"\0" * 16)

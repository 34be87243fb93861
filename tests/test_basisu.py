"""KTX2 BasisLZ / ETC1S transcoder tests (ops/basisu.py).

No basisu-encoded assets exist in this environment, so conformance is
asserted the same way models/meshopt.py is: encoder/decoder round-trips
over the full symbol space, hand-derived bitstream vectors for the huffman
layer, an independent per-pixel ETC1S oracle, and an end-to-end KTX2
container decode through ops/dds.decode_ktx2 (reference role:
gltf_image_loader.cpp:34 nv_ktx loading KHR_texture_basisu payloads)."""

import struct

import numpy as np
import pytest

from vk_gltf_renderer_tpu.ops.basisu import (
    ETC1_INTEN,
    BitReader,
    BitWriter,
    HuffmanTable,
    SliceTables,
    _canonical_codes,
    _flat_lengths,
    decode_endpoints,
    decode_selectors,
    decode_slice,
    encode_endpoints,
    encode_selectors,
    encode_slice,
    encode_tables,
    etc1s_to_rgba,
    read_huffman_table,
    write_huffman_table,
)


def test_bitreader_lsb_first():
    br = BitReader(bytes([0b10110100, 0xFF]))
    assert br.get_bits(3) == 0b100
    assert br.get_bits(5) == 0b10110
    assert br.get_bits(4) == 0xF


def test_vlc_roundtrip():
    bw = BitWriter()
    vals = [0, 1, 15, 16, 255, 12345]
    for v in vals:
        bw.put_vlc(v, 4)
    br = BitReader(bw.tobytes())
    for v in vals:
        assert br.decode_vlc(4) == v


def test_canonical_codes_deflate_convention():
    """Hand-derived canonical assignment: lengths [2,1,3,3] ->
    codes b=0(len1), a=10(len2), c=110, d=111 — the DEFLATE convention."""
    codes = _canonical_codes([2, 1, 3, 3])
    assert codes[1] == (0b0, 1)
    assert codes[0] == (0b10, 2)
    assert codes[2] == (0b110, 3)
    assert codes[3] == (0b111, 3)


def test_huffman_table_serialization_roundtrip():
    for lengths in ([1, 1], [2, 1, 3, 3], _flat_lengths(41), _flat_lengths(257)):
        bw = BitWriter()
        write_huffman_table(bw, lengths)
        # follow with a known sentinel to catch overreads
        bw.put_bits(0x2A, 8)
        br = BitReader(bw.tobytes())
        t = read_huffman_table(br)
        assert t.lengths == list(lengths)
        assert br.get_bits(8) == 0x2A


def test_huffman_decode_stream():
    lengths = [2, 1, 3, 3]
    codes = _canonical_codes(lengths)
    bw = BitWriter()
    seq = [1, 0, 2, 3, 1, 1, 0]
    for s in seq:
        code, ln = codes[s]
        for b in range(ln - 1, -1, -1):
            bw.put_bits((code >> b) & 1, 1)
    t = HuffmanTable(lengths)
    br = BitReader(bw.tobytes())
    assert [t.decode(br) for _ in seq] == seq


def test_endpoint_codebook_roundtrip():
    rng = np.random.default_rng(5)
    n = 300
    color5 = rng.integers(0, 32, (n, 3)).astype(np.uint8)
    inten5 = rng.integers(0, 8, n).astype(np.uint8)
    blob = encode_endpoints(color5, inten5)
    c2, i2 = decode_endpoints(blob, n)
    np.testing.assert_array_equal(c2, color5)
    np.testing.assert_array_equal(i2, inten5)


def test_selector_codebook_roundtrip_raw():
    rng = np.random.default_rng(6)
    rows = rng.integers(0, 256, (64, 4)).astype(np.uint8)
    blob = encode_selectors(rows)
    np.testing.assert_array_equal(decode_selectors(blob, 64), rows)


def test_slice_decode_roundtrip_and_preds():
    """Full slice path: explicit endpoint deltas + direct selector syms,
    plus a hand-built stream exercising the left/upper/upper-left pred
    reuse paths."""
    rng = np.random.default_rng(7)
    nbx, nby, ne, ns = 6, 4, 17, 9
    eidx = rng.integers(0, ne, (nby, nbx))
    sidx = rng.integers(0, ns, (nby, nbx))
    tables = SliceTables(encode_tables(ne, ns))
    blob = encode_slice(eidx, sidx, ne, ns)
    e2, s2 = decode_slice(blob, nbx, nby, tables, ne, ns)
    np.testing.assert_array_equal(e2, eidx)
    np.testing.assert_array_equal(s2, sidx)

    # pred-reuse stream: 2x2 blocks, first block explicit (pred 3), then
    # left (0), upper (1), upper-left (2) — hand-emitted
    from vk_gltf_renderer_tpu.ops.basisu import _emit_code

    pred_codes = _canonical_codes(_flat_lengths(257))
    delta_codes = _canonical_codes(_flat_lengths(ne))
    sel_codes = _canonical_codes(_flat_lengths(ns + 1))
    bw = BitWriter()
    # group pred bits: block(0,0)=3 explicit, (1,0)=0 left, (0,1)=1 upper, (1,1)=2 upper-left
    _emit_code(bw, pred_codes, (2 << 6) | (1 << 4) | (0 << 2) | 3)
    _emit_code(bw, delta_codes, 5)  # endpoint (0,0) = 0+5
    _emit_code(bw, sel_codes, 1)
    _emit_code(bw, sel_codes, 2)  # (1,0) endpoint from left
    _emit_code(bw, sel_codes, 3)  # (0,1) endpoint from upper
    _emit_code(bw, sel_codes, 4)  # (1,1) endpoint from upper-left
    e3, s3 = decode_slice(bw.tobytes(), 2, 2, tables, ne, ns)
    np.testing.assert_array_equal(e3, [[5, 5], [5, 5]])
    np.testing.assert_array_equal(s3, [[1, 2], [3, 4]])


def test_endpoint_pred_rle_repeat():
    """ENDPOINT_PRED_REPEAT_LAST (sym 256) + vlc count repeats the previous
    2x2 pred group."""
    from vk_gltf_renderer_tpu.ops.basisu import _emit_code

    ne, ns = 4, 3
    tables = SliceTables(encode_tables(ne, ns))
    pred_codes = _canonical_codes(_flat_lengths(257))
    delta_codes = _canonical_codes(_flat_lengths(ne))
    sel_codes = _canonical_codes(_flat_lengths(ns + 1))
    bw = BitWriter()
    # 4x2 blocks = two 2x2 groups; first group all-explicit (0xFF), second
    # group via REPEAT_LAST with count vlc -> repeats 0xFF
    _emit_code(bw, pred_codes, 0xFF)
    for k in range(2):  # blocks (0,0),(1,0)
        _emit_code(bw, delta_codes, 1)
        _emit_code(bw, sel_codes, 0)
    _emit_code(bw, pred_codes, 256)
    bw.put_vlc(0, 4)  # count = 0 + 3 - 1 = 2 repeats banked
    for k in range(2):  # blocks (2,0),(3,0)
        _emit_code(bw, delta_codes, 1)
        _emit_code(bw, sel_codes, 0)
    for k in range(4):  # row 1: preds come from the saved group bits
        _emit_code(bw, delta_codes, 1)
        _emit_code(bw, sel_codes, 0)
    e, s = decode_slice(bw.tobytes(), 4, 2, tables, ne, ns)
    # every block used pred 3 (0xFF group) -> endpoints walk +1 mod 4
    np.testing.assert_array_equal(e.reshape(-1) % ne, (np.arange(8) + 1) % ne)


def test_etc1s_block_oracle():
    """Independent per-pixel oracle for the ETC1S->RGBA math."""
    color5 = np.array([[10, 20, 31]], np.uint8)
    inten5 = np.array([3], np.uint8)
    rows = np.zeros((1, 4), np.uint8)
    rows[0, 1] = 0b11100100  # row y=1: selectors 0,1,2,3
    eidx = np.zeros((1, 1), np.int32)
    sidx = np.zeros((1, 1), np.int32)
    img = etc1s_to_rgba(eidx, sidx, color5, inten5, rows, 4, 4)
    base = np.array([(10 << 3) | (10 >> 2), (20 << 3) | (20 >> 2), (31 << 3) | (31 >> 2)])
    mods = [-42, -13, 13, 42]
    for px in range(4):
        expect = np.clip(base + mods[px], 0, 255)
        np.testing.assert_array_equal(img[1, px, :3], expect)
        np.testing.assert_array_equal(img[0, px, :3], np.clip(base + mods[0], 0, 255))
    assert (img[..., 3] == 255).all()


def _build_basislz_ktx2(width, height, color5, inten5, rows, eidx, sidx, with_alpha=False):
    """Minimal valid KTX2 container with BasisLZ supercompression."""
    ne, ns = color5.shape[0], rows.shape[0]
    endpoints = encode_endpoints(color5, inten5)
    selectors = encode_selectors(rows)
    tables = encode_tables(ne, ns)
    rgb = encode_slice(eidx, sidx, ne, ns)
    slices = [rgb]
    if with_alpha:
        slices.append(encode_slice(eidx, sidx, ne, ns))
    level0 = b"".join(slices)
    a_off = len(rgb) if with_alpha else 0
    a_len = len(slices[1]) if with_alpha else 0
    desc = struct.pack("<IIIII", 0, 0, len(rgb), a_off, a_len)
    sgd = struct.pack("<HHIIII", ne, ns, len(endpoints), len(selectors), len(tables), 0)
    sgd += desc + endpoints + selectors + tables

    # DFD: totalSize + basic block header + ETC1S color model byte
    dfd_block = bytearray(24 + 16)  # header(8) + sample-less body padded
    struct.pack_into("<I", dfd_block, 0, 0)  # vendor/type
    struct.pack_into("<HH", dfd_block, 4, 2, len(dfd_block))  # version, size
    dfd_block[8] = 163  # KHR_DF_MODEL_ETC1S
    dfd = struct.pack("<I", 4 + len(dfd_block)) + bytes(dfd_block)

    header_size = 80 + 24  # header+index + 1 level entry
    dfd_off = header_size
    sgd_off = dfd_off + len(dfd)
    pad = (-sgd_off) % 8
    sgd_off += pad
    level_off = sgd_off + len(sgd)

    out = bytearray()
    out += b"\xabKTX 20\xbb\r\n\x1a\n"
    out += struct.pack("<9I", 0, 1, width, height, 0, 0, 1, 1, 1)  # vkFormat 0, scheme 1
    out += struct.pack("<4I", dfd_off, len(dfd), 0, 0)
    out += struct.pack("<2Q", sgd_off, len(sgd))
    out += struct.pack("<3Q", level_off, len(level0), len(level0))
    assert len(out) == header_size
    out += dfd + b"\0" * pad + sgd + level0
    return bytes(out)


def test_ktx2_basislz_etc1s_end_to_end():
    """Full container decode through ops/dds.decode_ktx2, vs an
    independently computed expected image."""
    from vk_gltf_renderer_tpu.ops.dds import decode_ktx2

    rng = np.random.default_rng(9)
    w = h = 8
    ne, ns = 5, 6
    color5 = rng.integers(0, 32, (ne, 3)).astype(np.uint8)
    inten5 = rng.integers(0, 8, ne).astype(np.uint8)
    rows = rng.integers(0, 256, (ns, 4)).astype(np.uint8)
    eidx = rng.integers(0, ne, (2, 2))
    sidx = rng.integers(0, ns, (2, 2))
    blob = _build_basislz_ktx2(w, h, color5, inten5, rows, eidx, sidx)
    img = decode_ktx2(blob)
    assert img.shape == (h, w, 4)
    expect = etc1s_to_rgba(eidx, sidx, color5, inten5, rows, w, h).astype(np.float32) / 255.0
    np.testing.assert_allclose(img, expect)

    # alpha slice: alpha = green channel of the alpha slice decode
    blob_a = _build_basislz_ktx2(w, h, color5, inten5, rows, eidx, sidx, with_alpha=True)
    img_a = decode_ktx2(blob_a)
    np.testing.assert_allclose(img_a[..., 3], expect[..., 1])


def test_ktx2_basisu_gltf_end_to_end(tmp_path):
    """A KHR_texture_basisu-only glTF asset loads and renders: the loader
    gap the reference covers via nv_ktx (gltf_image_loader.cpp:34)."""
    import json

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat

    rng = np.random.default_rng(10)
    color5 = np.array([[31, 0, 0]], np.uint8)  # red-ish endpoint
    inten5 = np.array([0], np.uint8)
    rows = np.full((1, 4), 0b01010101, np.uint8)  # all selector 1
    ktx = _build_basislz_ktx2(4, 4, color5, inten5, rows,
                              np.zeros((1, 1), np.int32), np.zeros((1, 1), np.int32))
    (tmp_path / "tex.ktx2").write_bytes(ktx)

    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    buf = positions.tobytes() + uvs.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}],
        "textures": [{"extensions": {"KHR_texture_basisu": {"source": 0}}}],
        "images": [{"uri": "tex.ktx2"}],
        "extensionsUsed": ["KHR_texture_basisu"],
        "extensionsRequired": ["KHR_texture_basisu"],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
        ],
        "buffers": [{"byteLength": len(buf), "uri": "geom.bin"}],
    }
    (tmp_path / "geom.bin").write_bytes(buf)
    (tmp_path / "scene.gltf").write_text(json.dumps(gltf))

    sc = Scene()
    sc.load(str(tmp_path / "scene.gltf"))
    flat = build_scene_flat(sc)
    # texture pool must contain the transcoded red-dominant texels
    base = np.array([(31 << 3) | (31 >> 2), 0, 0]) + ETC1_INTEN[0][1]
    texels = np.asarray(flat.tex_texels)
    assert texels.shape[0] > 1
    red = texels[1 : 1 + 16]  # slot 0 is the white fallback
    assert abs(red[:, 0].mean() - np.clip(base[0], 0, 255) / 255.0) < 0.02
    assert red[:, 1].mean() < 0.1

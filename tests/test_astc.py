"""ASTC LDR decoder (ops/astc.py) — the UASTC payload path.

Validation strategy (no third-party conformance vectors exist in this
image — see the module docstring): in-repo encoder round-trips with
expected images computed arithmetically in THIS file from independently
re-derived unquantized values, plus the internal-consistency properties
the spec mandates of its unquantization tables.
"""

import numpy as np
import pytest

from vk_gltf_renderer_tpu.ops import astc


# ------------------------------------------------------------ properties

def _all_color_codes(levels):
    _, b, t, q = astc._LEVELS_TO_MODE[levels]
    dmax = 3 if t else (5 if q else 1)
    return [(m, D) for D in range(dmax) for m in range(1 << b)]


@pytest.mark.parametrize("levels", [m[0] for m in astc._QUANT_MODES])
def test_color_unquant_properties(levels):
    vals = sorted(astc.unquant_color(m, D, levels)
                  for m, D in _all_color_codes(levels))
    # bijective onto `levels` distinct values covering the full range
    assert len(set(vals)) == levels
    assert vals[0] == 0 and vals[-1] == 255
    # complement symmetry (spec: flipping all code bits complements the
    # value) — holds whenever there is at least one plain bit; the 0-bit
    # ranges (3, 5 levels) are explicit spec tables {0,128,255} / {0,64,...}
    if astc._LEVELS_TO_MODE[levels][1] >= 1:
        assert all(255 - v in vals for v in vals)
    # near-uniform spacing: max gap close to the ideal step (the seam
    # where the two complement halves meet can be ~1.5x the step)
    gaps = np.diff(vals)
    assert gaps.max() <= 255 / (levels - 1) * 1.5 + 1


@pytest.mark.parametrize("levels", [2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32])
def test_weight_unquant_properties(levels):
    vals = sorted(astc.unquant_weight(m, D, levels)
                  for m, D in _all_color_codes(levels))
    assert len(set(vals)) == levels
    assert vals[0] == 0 and vals[-1] == 64
    assert all(64 - v in vals for v in vals)


@pytest.mark.parametrize("levels", [m[0] for m in astc._QUANT_MODES])
@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 11])
def test_bise_roundtrip(levels, n):
    rng = np.random.default_rng(levels * 37 + n)
    _, b, t, q = astc._LEVELS_TO_MODE[levels]
    dmax = 3 if t else (5 if q else 1)
    vals = [(int(rng.integers(0, 1 << b)) if b else 0,
             int(rng.integers(0, dmax)))
            for _ in range(n)]
    stream, nbits = astc.bise_encode(vals, levels)
    assert nbits == astc.bise_bits(n, levels)
    # place the stream at an arbitrary offset inside a noisy block
    noise = int(rng.integers(0, 1 << 16))
    block = (stream << 7) | (noise & 0x7F)
    got, end = astc.bise_decode(block, 7, n, levels)
    assert end == 7 + nbits
    assert got == vals


def test_block_mode_table_sane():
    valid = {}
    for m in range(2048):
        r = astc.decode_block_mode(m)
        if r is not None:
            valid[m] = r
    # the spec's 2D mode space: plenty of valid modes, all grids in range
    assert len(valid) > 600
    for gw, gh, levels, dual in valid.values():
        assert 2 <= gw <= 12 and 2 <= gh <= 12
        assert levels in (2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32)
    # canonical configurations reachable
    # max legal grids per the spec table: 12x5 / 5x12 / 9x9 / 6x10 / 10x6
    assert max(gw * gh for gw, gh, _, _ in valid.values()) == 81
    for cfg in [(4, 4, 8, False), (4, 4, 4, True), (2, 2, 32, False),
                (12, 5, 2, False), (6, 10, 8, False), (9, 9, 2, False)]:
        assert cfg in set(valid.values())


# ------------------------------------------------------- expected-image math
# Independent re-derivations (NOT calls into the decoder's formulas).

def _interp(e0, e1, w):
    c0 = (e0 << 8) | e0
    c1 = (e1 << 8) | e1
    return ((c0 * (64 - w) + c1 * w + 32) >> 6) >> 8


def _weight_unq_bits(m, b):
    # replicate to 6 bits then stretch >32 by one — re-derived from spec text
    v = 0
    x, fill = m, b
    while fill < 6:
        x = (x << b) | m
        fill += b
    v = x >> (fill - 6)
    return v + 1 if v > 32 else v


def _color_unq_bits(m, b):
    x, fill = m, b
    while fill < 8:
        x = (x << b) | m
        fill += b
    return x >> (fill - 8)


# --------------------------------------------------------- block roundtrips

def test_block_cem8_full_grid_exact():
    """Single-partition RGB direct, 4x4 weights, 8-bit exact endpoints."""
    e0, e1 = (10, 200, 60), (250, 30, 90)
    # CEM8 decoder order: (r0,r1,g0,g1,b0,b1); s1>=s0 keeps order iff sum(e1)>=sum(e0)
    cvals = [(v, 0) for v in (e0[0], e1[0], e0[1], e1[1], e0[2], e1[2])]
    assert astc.color_levels_for_config(4, 4, 8, 1, 6) == 256
    wm = [(i % 8, 0) for i in range(16)]  # QUANT_8 = 3 plain bits
    blk = astc.encode_block(4, 4, 8, wm, [8], cvals)
    out = astc.decode_block(blk)
    for i in range(16):
        w = _weight_unq_bits(i % 8, 3)
        exp = [_interp(e0[c], e1[c], w) for c in range(3)] + [255]
        assert out[i // 4, i % 4].tolist() == exp


def test_block_cem8_blue_contract():
    """sum(e1) < sum(e0) triggers endpoint swap + blue contraction."""
    hi, lo = (200, 180, 160), (20, 40, 10)
    # store v0=hi, v1=lo so s1 < s0
    cvals = [(v, 0) for v in (hi[0], lo[0], hi[1], lo[1], hi[2], lo[2])]
    wm = [(0, 0)] * 16 + []
    blk = astc.encode_block(4, 4, 8, [(0, 0)] * 8 + [(7, 0)] * 8, [8], cvals)
    out = astc.decode_block(blk)
    bc = lambda c: ((c[0] + c[2]) >> 1, (c[1] + c[2]) >> 1, c[2])
    e0, e1 = bc(lo), bc(hi)
    assert out[0, 0].tolist() == list(e0) + [255]       # w = 0
    assert out[3, 3].tolist() == list(e1) + [255]       # w = 64 (m=7 -> 64)


def test_block_cem12_alpha():
    e0, e1 = (16, 32, 48, 0), (128, 144, 160, 255)
    cvals = [(v, 0) for v in (e0[0], e1[0], e0[1], e1[1], e0[2], e1[2], e0[3], e1[3])]
    assert astc.color_levels_for_config(4, 4, 4, 1, 8) == 256
    wm = [(i % 4, 0) for i in range(16)]  # QUANT_4 weights
    blk = astc.encode_block(4, 4, 4, wm, [12], cvals)
    out = astc.decode_block(blk)
    for i in range(16):
        w = _weight_unq_bits(i % 4, 2)
        exp = [_interp(e0[c], e1[c], w) for c in range(4)]
        assert out[i // 4, i % 4].tolist() == exp


def test_block_dual_plane_ccs_alpha():
    """Dual plane: alpha (CCS=3) uses the second weight plane.

    QUANT_5 quint weights (spec constant table {0,16,32,48,64}) leave
    exactly QUANT_16 for colors — both independently re-derivable."""
    levels = astc.color_levels_for_config(4, 4, 5, 1, 8, dual=True)
    assert levels == 16
    # endpoints on the 4-bit replicate lattice (multiples of 17)
    e0, e1 = (0, 17, 34, 0), (221, 238, 255, 255)
    enc = []
    for lo, hi in zip(e0, e1):
        assert lo % 17 == 0 and hi % 17 == 0
        enc.append((lo // 17, 0))
        enc.append((hi // 17, 0))
    wm = []
    for i in range(16):
        wm.append((0, i % 5))            # plane 0 (rgb): quint D
        wm.append((0, 4 - i % 5))        # plane 1 (alpha)
    blk = astc.encode_block(4, 4, 5, wm, [12], enc, dual=True, ccs=3)
    out = astc.decode_block(blk)
    quint_w = (0, 16, 32, 48, 64)  # spec constant table, re-stated here
    for i in range(16):
        w0 = quint_w[i % 5]
        w1 = quint_w[4 - i % 5]
        exp = [_interp(e0[c], e1[c], w0) for c in range(3)]
        exp.append(_interp(e0[3], e1[3], w1))
        assert out[i // 4, i % 4].tolist() == exp


def test_block_two_partitions_varied_cem():
    """2 partitions with different CEM classes exercises the extra-CEM-bit
    packing below the weights; colors land on the trit QUANT_24 path."""
    levels = astc.color_levels_for_config(4, 4, 4, 2, 14, varied_cem=True)
    assert levels == 24
    rgb = [40, 220, 90, 170, 10, 130]           # CEM 8 values (part 0)
    rgba = [60, 200, 80, 190, 100, 210, 0, 255]  # CEM 12 values (part 1)
    enc, unq = [], []
    for v in rgb + rgba:
        code = astc.quantize_color(v, levels)
        enc.append(code)
        unq.append(astc.unquant_color(*code, levels))
    seed = 23
    blk = astc.encode_block(4, 4, 4, [(2, 0)] * 16, [8, 12], enc,
                            part_seed=seed)
    out = astc.decode_block(blk)
    w = _weight_unq_bits(2, 2)
    u = unq
    exp_part = []
    # CEM 8: (v0,v2,v4)->(v1,v3,v5); assert the no-contract branch applies
    assert u[1] + u[3] + u[5] >= u[0] + u[2] + u[4]
    exp_part.append([_interp(u[0], u[1], w), _interp(u[2], u[3], w),
                     _interp(u[4], u[5], w), 255])
    v = unq[6:]
    assert v[1] + v[3] + v[5] >= v[0] + v[2] + v[4]
    exp_part.append([_interp(v[0], v[1], w), _interp(v[2], v[3], w),
                     _interp(v[4], v[5], w), _interp(v[6], v[7], w)])
    seen = set()
    for y in range(4):
        for x in range(4):
            p = astc.select_partition(seed, x, y, 2, True)
            seen.add(p)
            assert out[y, x].tolist() == exp_part[p]
    assert seen == {0, 1}  # this seed splits the block


def test_partition_hash_regression_pins():
    """Pin the partition function's output shape so silent drift is caught."""
    pm = [[astc.select_partition(23, x, y, 2, True) for x in range(4)]
          for y in range(4)]
    flat = [v for row in pm for v in row]
    assert set(flat) == {0, 1}
    assert astc._hash52(0) == astc._hash52(0)  # deterministic
    # 3- and 4-partition outputs stay in range on a sample of seeds
    for seed in range(0, 1024, 37):
        for n in (2, 3, 4):
            vals = {astc.select_partition(seed, x, y, n, True)
                    for x in range(4) for y in range(4)}
            assert max(vals) < n


def test_block_decimated_grid():
    """2x2 weight grid on a 4x4 block: corners hit grid points exactly."""
    e0, e1 = (0, 0, 0), (255, 255, 255)
    cvals = [(v, 0) for v in (0, 255, 0, 255, 0, 255)]
    # 2x2 grid, QUANT_32 weights (5 bits -> 20 bits... below 24-bit floor),
    # use QUANT_32 with 2x3 grid = 30 bits >= 24
    blk = astc.encode_block(2, 3, 32, [(0, 0), (31, 0), (15, 0),
                                       (16, 0), (31, 0), (0, 0)], [8], cvals)
    out = astc.decode_block(blk)
    # corner texels coincide with corner grid points (infill weights are
    # exact there): w(0,0)=0 -> black, w(3,0)=unq(31)=64 -> white
    assert out[0, 0].tolist() == [0, 0, 0, 255]
    assert out[0, 3].tolist() == [255, 255, 255, 255]
    assert out[3, 3].tolist() == [0, 0, 0, 255]


def test_void_extent_and_errors():
    blk = astc.encode_void_extent((1, 2, 3, 254))
    out = astc.decode_block(blk)
    assert (out == np.array([1, 2, 3, 254], np.uint8)).all()
    # reserved block mode -> error color
    bad = astc.decode_block((0).to_bytes(16, "little"))
    assert (bad == astc.ERROR_COLOR).all()
    # HDR CEM (2, class 0 -> 2 values) -> error color
    hdr = astc.encode_block(4, 4, 8, [(0, 0)] * 16, [2],
                            [(0, 0)] * 2)
    assert (astc.decode_block(hdr) == astc.ERROR_COLOR).all()


def test_decode_astc_image_assembly():
    blocks = b"".join(astc.encode_void_extent((c, c, c, 255))
                      for c in (10, 20, 30, 40))
    img = astc.decode_astc(blocks, 8, 8)
    assert img.shape == (8, 8, 4)
    assert img[0, 0, 0] == 10 and img[0, 7, 0] == 20
    assert img[7, 0, 0] == 30 and img[7, 7, 0] == 40
    # non-multiple-of-4 crop
    img2 = astc.decode_astc(blocks, 6, 5)
    assert img2.shape == (5, 6, 4)
    with pytest.raises(ValueError):
        astc.decode_astc(blocks[:32], 8, 8)


def test_uastc_structural_check():
    good = astc.encode_void_extent((9, 9, 9, 255)) * 4
    astc.uastc_structural_check(good, 8, 8)
    bad = good[:16] + (0).to_bytes(16, "little") + good[32:]
    with pytest.raises(ValueError, match="reserved"):
        astc.uastc_structural_check(bad, 8, 8)


def test_cem_offset_modes():
    """CEM 1 (lum+offset) and bit_transfer_signed arithmetic."""
    # CEM 1: v0=0b10110100, v1=0b01000110 -> L0 = (v0>>2)|(v1&0xC0), L1=L0+(v1&0x3F)
    e0, e1 = astc.decode_endpoints(1, [0b10110100, 0b01000110])
    L0 = (0b10110100 >> 2) | (0b01000110 & 0xC0)
    L1 = min(255, L0 + (0b01000110 & 0x3F))
    assert e0 == (L0, L0, L0, 255) and e1 == (L1, L1, L1, 255)
    # bit_transfer_signed: a=0xFF, b=0x00 -> b gets a's bit7, a sign-extends
    a, b = astc._bts(0xFF, 0x00)
    assert b == 0x80 and a == -1
    a, b = astc._bts(0x3E, 0x81)
    assert b == 0x40 and a == 0x1F


def test_cem_scale_mode():
    e0, e1 = astc.decode_endpoints(6, [200, 100, 50, 128])
    assert e1 == (200, 100, 50, 255)
    assert e0 == (100, 50, 25, 255)


# ----------------------------------------------------- KTX2 integration

def _build_uastc_ktx2(width, height, payload, vk_format=0, color_model=166):
    import struct

    dfd_block = bytearray(24 + 16)
    struct.pack_into("<I", dfd_block, 0, 0)
    struct.pack_into("<HH", dfd_block, 4, 2, len(dfd_block))
    dfd_block[8] = color_model
    dfd = struct.pack("<I", 4 + len(dfd_block)) + bytes(dfd_block)

    header_size = 80 + 24
    dfd_off = header_size
    level_off = dfd_off + len(dfd)
    out = bytearray()
    out += b"\xabKTX 20\xbb\r\n\x1a\n"
    out += struct.pack("<9I", vk_format, 1, width, height, 0, 0, 1, 1, 0)
    out += struct.pack("<4I", dfd_off, len(dfd), 0, 0)
    out += struct.pack("<2Q", 0, 0)
    out += struct.pack("<3Q", level_off, len(payload), len(payload))
    out += dfd + payload
    return bytes(out)


def test_ktx2_uastc_end_to_end():
    from vk_gltf_renderer_tpu.ops.dds import decode_ktx2

    blocks = b"".join(astc.encode_void_extent((c, 2 * c, 3 * c, 255))
                      for c in (10, 20, 30, 40))
    img = decode_ktx2(_build_uastc_ktx2(8, 8, blocks))
    assert img.shape == (8, 8, 4)
    np.testing.assert_allclose(img[0, 0], [10 / 255, 20 / 255, 30 / 255, 1.0])
    np.testing.assert_allclose(img[7, 7], [40 / 255, 80 / 255, 120 / 255, 1.0])


def test_ktx2_plain_astc_4x4():
    from vk_gltf_renderer_tpu.ops.dds import decode_ktx2

    e0, e1 = (0, 0, 0), (255, 255, 255)
    cvals = [(v, 0) for v in (0, 255, 0, 255, 0, 255)]
    blk = astc.encode_block(4, 4, 8, [(7, 0)] * 16, [8], cvals)
    img = decode_ktx2(_build_uastc_ktx2(4, 4, blk, vk_format=157, color_model=0))
    np.testing.assert_allclose(img, 1.0)  # all weights at max -> e1 = white


def test_ktx2_uastc_gltf_end_to_end(tmp_path):
    """A KHR_texture_basisu glTF whose KTX2 carries UASTC loads end-to-end
    (reference path: gltf_image_loader.cpp:34 via nv_ktx/basisu)."""
    import json

    from vk_gltf_renderer_tpu.models import Scene
    from vk_gltf_renderer_tpu.ops.flat import build_scene_flat

    blocks = astc.encode_void_extent((200, 10, 10, 255)) * 4
    (tmp_path / "tex.ktx2").write_bytes(_build_uastc_ktx2(8, 8, blocks))

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
    texels = np.asarray(flat.tex_texels)
    assert texels.shape[0] > 1
    red = texels[1:1 + 64]
    # baseColor textures are sRGB: the pool stores linearized texels
    lin = ((200 / 255 + 0.055) / 1.055) ** 2.4
    assert abs(red[:, 0].mean() - lin) < 0.02
    assert red[:, 1].mean() < 0.1

"""Clean-room ASTC LDR 2D block decoder (pure numpy) — the UASTC path.

Why this exists: KHR_texture_basisu's high-quality half is UASTC. A UASTC
LDR 4x4 payload is, by format design, a stream of bit-valid ASTC 4x4
blocks (that is what makes its "transcode to ASTC" free), so decoding
UASTC == decoding the ASTC LDR subset it emits. The reference loads these
through nv_ktx + the basisu transcoder (gltf_image_loader.cpp:34); here we
decode the ASTC blocks directly to RGBA8.

Scope: full LDR profile for 2D blocks of any legal footprint (4x4 used by
UASTC; 4x4..12x12 accepted for plain ASTC KTX2 files):
  - block mode table (weight grid dims, weight range, dual plane)
  - BISE integer sequence coding (bits / trits / quints)
  - color endpoint unquantization (the A/B/C/D bit-swizzle formula)
  - weight unquantization + bilinear infill for decimated grids
  - partition selection hash (2..4 partitions)
  - LDR color endpoint modes 0,1,4,5,6,8,9,10,12,13 (blue-contract,
    bit-transfer-signed); HDR endpoint modes decode to the error color
  - void-extent blocks
  - sRGB vs linear handled by the caller (values returned as stored)

Error blocks (reserved modes, out-of-range configs, HDR CEMs) decode to
the spec's error color (magenta), matching hardware behavior, so a
corrupt bitstream is visible rather than fatal.

VALIDATION SCOPE (same discipline as models/draco.py, ops/basisu.py): no
third-party conformance vectors exist in this image; correctness evidence
is (a) an independent in-repo encoder with round-trip tests whose expected
images are computed arithmetically from chosen endpoints/weights, (b)
internal-consistency properties the spec mandates (complement symmetry of
unquantization tables, monotone coverage of 0..255 / 0..64), asserted in
tests, and (c) structural guards on real UASTC streams (mode field must
not be reserved, void-extent magic intact).
"""

from __future__ import annotations

import numpy as np

ERROR_COLOR = np.array([255, 0, 255, 255], np.uint8)

# --------------------------------------------------------------- bit utils


def _bits(block: int, lo: int, n: int) -> int:
    """Extract n bits starting at bit lo (LSB-first across the 128-bit block)."""
    return (block >> lo) & ((1 << n) - 1)


def _reverse128(block: int) -> int:
    """Bit-reverse a 128-bit integer (weights are stored from bit 127 down)."""
    out = 0
    for _ in range(128):
        out = (out << 1) | (block & 1)
        block >>= 1
    return out


def _replicate(val: int, src_bits: int, dst_bits: int) -> int:
    """Bit-replicate val from src_bits wide to dst_bits wide."""
    if val == 0:
        return 0
    out = 0
    shift = dst_bits - src_bits
    while shift > 0:
        out |= val << shift
        shift -= src_bits
    out |= val >> (-shift)
    return out


# ------------------------------------------------- quantization mode table
# (levels, bits, trits, quints) for every BISE range, ascending.
_QUANT_MODES = [
    (2, 1, 0, 0), (3, 0, 1, 0), (4, 2, 0, 0), (5, 0, 0, 1), (6, 1, 1, 0),
    (8, 3, 0, 0), (10, 1, 0, 1), (12, 2, 1, 0), (16, 4, 0, 0),
    (20, 2, 0, 1), (24, 3, 1, 0), (32, 5, 0, 0), (40, 3, 0, 1),
    (48, 4, 1, 0), (64, 6, 0, 0), (80, 4, 0, 1), (96, 5, 1, 0),
    (128, 7, 0, 0), (160, 5, 0, 1), (192, 6, 1, 0), (256, 8, 0, 0),
]
_LEVELS_TO_MODE = {m[0]: m for m in _QUANT_MODES}


def bise_bits(nvals: int, levels: int) -> int:
    """Exact bit count of a BISE sequence of nvals values at `levels`."""
    _, b, t, q = _LEVELS_TO_MODE[levels]
    n = nvals * b
    if t:
        n += (8 * nvals + 4) // 5
    if q:
        n += (7 * nvals + 2) // 3
    return n


# ------------------------------------------------------------ BISE decode

def _decode_trit_group(T: int):
    """8-bit packed T -> 5 trit values (spec C.2.12 inverse packing)."""
    if (T >> 2) & 0x7 == 0x7:
        C = (((T >> 5) & 0x7) << 2) | (T & 0x3)
        t4 = t3 = 2
    else:
        C = T & 0x1F
        if (T >> 5) & 0x3 == 0x3:
            t4 = 2
            t3 = (T >> 7) & 1
        else:
            t4 = (T >> 7) & 1
            t3 = (T >> 5) & 0x3
    if C & 0x3 == 0x3:
        t2 = 2
        t1 = (C >> 4) & 1
        t0 = (((C >> 3) & 1) << 1) | ((C >> 2) & 1 & ~((C >> 3) & 1))
    elif (C >> 2) & 0x3 == 0x3:
        t2 = 2
        t1 = 2
        t0 = C & 0x3
    else:
        t2 = (C >> 4) & 1
        t1 = (C >> 2) & 0x3
        t0 = (((C >> 1) & 1) << 1) | (C & 1 & ~((C >> 1) & 1))
    return t0, t1, t2, t3, t4


def _decode_quint_group(Q: int):
    """7-bit packed Q -> 3 quint values."""
    if (Q >> 1) & 0x3 == 0x3 and (Q >> 5) & 0x3 == 0x0:
        q2 = (((Q & 1) << 2)
              | ((((Q >> 4) & 1) & ~(Q & 1)) << 1)
              | (((Q >> 3) & 1) & ~(Q & 1)))
        q1 = q0 = 4
    else:
        if (Q >> 1) & 0x3 == 0x3:
            q2 = 4
            C = (((Q >> 3) & 0x3) << 3) | ((~(Q >> 5) & 0x3) << 1) | (Q & 1)
        else:
            q2 = (Q >> 5) & 0x3
            C = Q & 0x1F
        if C & 0x7 == 0x5:
            q1 = 4
            q0 = (C >> 3) & 0x3
        else:
            q1 = (C >> 3) & 0x3
            q0 = C & 0x7
    return q0, q1, q2


# trit group: value bits interleaved with T chunks (sizes 2,2,1,2,1)
_TRIT_T_CHUNKS = (2, 2, 1, 2, 1)
_QUINT_Q_CHUNKS = (3, 2, 2)


def bise_decode(block: int, start: int, nvals: int, levels: int):
    """Decode nvals BISE values at `levels` starting at bit `start`.

    Returns (list of (m_bits, D_highpart), next_bit). D is the trit/quint
    value (0 for bit-only ranges).
    """
    _, b, t, q = _LEVELS_TO_MODE[levels]
    pos = start
    out = []
    if t:
        for g0 in range(0, nvals, 5):
            n = min(5, nvals - g0)
            ms, T = [], 0
            tbit = 0
            for i in range(5):
                if i < n:
                    ms.append(_bits(block, pos, b))
                    pos += b
                else:
                    ms.append(0)
                c = _TRIT_T_CHUNKS[i]
                # partial trailing groups truncate: chunk i is stored iff
                # value i is (total bits = (8n+4)//5, matching bise_bits)
                if i < n:
                    T |= _bits(block, pos, c) << tbit
                    pos += c
                tbit += c
            trits = _decode_trit_group(T)
            for i in range(n):
                out.append((ms[i], trits[i]))
    elif q:
        for g0 in range(0, nvals, 3):
            n = min(3, nvals - g0)
            ms, Q = [], 0
            qbit = 0
            for i in range(3):
                if i < n:
                    ms.append(_bits(block, pos, b))
                    pos += b
                else:
                    ms.append(0)
                c = _QUINT_Q_CHUNKS[i]
                if i < n:
                    Q |= _bits(block, pos, c) << qbit
                    pos += c
                qbit += c
            quints = _decode_quint_group(Q)
            for i in range(n):
                out.append((ms[i], quints[i]))
    else:
        for _ in range(nvals):
            out.append((_bits(block, pos, b), 0))
            pos += b
    return out, pos


# ------------------------------------------------ unquantization formulas
# Color endpoints -> 0..255. B-swizzle tables keyed by (is_quint, bits):
# each entry lists the source-bit index (0 = LSB of m, i.e. 'a') for the 9
# result bits from MSB to LSB, or None for 0.  From spec C.2.14:
#   trits : 1:C=204 B=0      2:C=93 B=b000b0bb0  3:C=44 B=cb000cbcb
#           4:C=22 B=dcb000dcb  5:C=11 B=edcb000ed  6:C=5 B=fedcb000f
#   quints: 1:C=113 B=0      2:C=54 B=b0000bb00  3:C=26 B=cb0000cbc
#           4:C=13 B=dcb0000dc  5:C=6 B=edcb0000e
_COLOR_CBT = {
    (0, 1): (204, ""),
    (0, 2): (93, "b000b0bb0"),
    (0, 3): (44, "cb000cbcb"),
    (0, 4): (22, "dcb000dcb"),
    (0, 5): (11, "edcb000ed"),
    (0, 6): (5, "fedcb000f"),
    (1, 1): (113, ""),
    (1, 2): (54, "b0000bb00"),
    (1, 3): (26, "cb0000cbc"),
    (1, 4): (13, "dcb0000dc"),
    (1, 5): (6, "edcb0000e"),
}
# Weights -> 0..64 (7-bit intermediate).  From spec C.2.17:
_WEIGHT_CBT = {
    (0, 1): (50, ""),
    (0, 2): (23, "b000b00"),
    (0, 3): (11, "cb000cb"),
    (1, 1): (28, ""),
    (1, 2): (13, "b0000b0"),
}
_LETTER_BIT = {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4, "f": 5}


def _swizzle(m: int, pattern: str, width: int) -> int:
    out = 0
    pad = width - len(pattern)
    for i, ch in enumerate(pattern):
        out <<= 1
        if ch != "0":
            out |= (m >> _LETTER_BIT[ch]) & 1
    return out << pad if pad > 0 else out


def unquant_color(m: int, D: int, levels: int) -> int:
    """BISE value -> 0..255 endpoint component."""
    lev, b, t, q = _LEVELS_TO_MODE[levels]
    if not (t or q):
        return _replicate(m, b, 8)
    if b == 0:
        return {3: (0, 128, 255), 5: (0, 64, 128, 192, 255)}[lev][D]
    C, bp = _COLOR_CBT[(1 if q else 0, b)]
    A = 0x1FF if (m & 1) else 0
    B = _swizzle(m, bp, 9) if bp else 0
    T = (D * C + B) ^ A
    return (A & 0x80) | (T >> 2)


def unquant_weight(m: int, D: int, levels: int) -> int:
    """BISE value -> 0..64 weight."""
    lev, b, t, q = _LEVELS_TO_MODE[levels]
    if not (t or q):
        w = _replicate(m, b, 6)
    elif b == 0:
        return {3: (0, 32, 64), 5: (0, 16, 32, 48, 64)}[lev][D]
    else:
        C, bp = _WEIGHT_CBT[(1 if q else 0, b)]
        A = 0x7F if (m & 1) else 0
        B = _swizzle(m, bp, 7) if bp else 0
        T = (D * C + B) ^ A
        w = (A & 0x20) | (T >> 2)
    if w > 32:
        w += 1
    return w


# ---------------------------------------------------------- block mode


def decode_block_mode(mode: int):
    """11-bit block mode -> (gw, gh, weight_levels, dual_plane) or None.

    Spec C.2.10 2D layout. Returns None for reserved encodings.
    """
    H = (mode >> 9) & 1
    D = (mode >> 10) & 1
    A = (mode >> 5) & 0x3
    R = (mode >> 4) & 1  # R0
    if mode & 0x3 != 0:
        R |= (mode & 0x3) << 1
        B = (mode >> 7) & 0x3
        sel = (mode >> 2) & 0x3
        if sel == 0:
            gw, gh = B + 4, A + 2
        elif sel == 1:
            gw, gh = B + 8, A + 2
        elif sel == 2:
            gw, gh = A + 2, B + 8
        else:
            if mode & 0x100:
                gw, gh = (B & 1) + 2, A + 2
            else:
                gw, gh = A + 2, (B & 1) + 6
    else:
        R |= ((mode >> 2) & 0x3) << 1
        if (mode >> 2) & 0x3 == 0:
            return None  # reserved
        B = (mode >> 9) & 0x3
        sel = (mode >> 7) & 0x3
        if sel == 0:
            gw, gh = 12, A + 2
        elif sel == 1:
            gw, gh = A + 2, 12
        elif sel == 2:
            gw, gh = A + 6, B + 6
            D = 0
            H = 0
        else:
            if (mode >> 5) & 0x3 == 0:
                gw, gh = 6, 10
            elif (mode >> 5) & 0x3 == 1:
                gw, gh = 10, 6
            else:
                return None  # reserved
    if R < 2:
        return None  # reserved weight range
    levels_table = {
        (0, 2): 2, (0, 3): 3, (0, 4): 4, (0, 5): 5, (0, 6): 6, (0, 7): 8,
        (1, 2): 10, (1, 3): 12, (1, 4): 16, (1, 5): 20, (1, 6): 24, (1, 7): 32,
    }
    return gw, gh, levels_table[(H, R)], bool(D)


# ---------------------------------------------------------- partitions


def _hash52(p: int) -> int:
    M = 0xFFFFFFFF
    p &= M
    p ^= p >> 15
    p = (p * 0xEEDE0891) & M
    p ^= p >> 5
    p = (p + (p << 16)) & M
    p ^= p >> 7
    p ^= p >> 3
    p = (p ^ (p << 6)) & M
    p ^= p >> 17
    return p


def select_partition(seed: int, x: int, y: int, partitioncount: int,
                     small_block: bool) -> int:
    """Spec C.2.21 partition-selection hash (2D: z=0)."""
    if small_block:
        x <<= 1
        y <<= 1
    seed += (partitioncount - 1) * 1024
    rnum = _hash52(seed)
    s = [(rnum >> sh) & 0xF for sh in
         (0, 4, 8, 12, 16, 20, 24, 28, 18, 22, 26)]
    s.append(((rnum >> 30) | (rnum << 2)) & 0xF)
    s = [v * v for v in s]
    if seed & 1:
        sh1 = 4 if seed & 2 else 5
        sh2 = 6 if partitioncount == 3 else 5
    else:
        sh1 = 6 if partitioncount == 3 else 5
        sh2 = 4 if seed & 2 else 5
    sh3 = sh1 if seed & 0x10 else sh2
    s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11, s12 = s
    s1 >>= sh1; s2 >>= sh2; s3 >>= sh1; s4 >>= sh2
    s5 >>= sh1; s6 >>= sh2; s7 >>= sh1; s8 >>= sh2
    s9 >>= sh3; s10 >>= sh3; s11 >>= sh3; s12 >>= sh3
    a = (s1 * x + s2 * y + (rnum >> 14)) & 0x3F
    b = (s3 * x + s4 * y + (rnum >> 10)) & 0x3F
    c = (s5 * x + s6 * y + (rnum >> 6)) & 0x3F
    d = (s7 * x + s8 * y + (rnum >> 2)) & 0x3F
    if partitioncount <= 3:
        d = 0
    if partitioncount <= 2:
        c = 0
    if partitioncount <= 1:
        b = 0
    m = max(a, b, c, d)
    if a == m:
        return 0
    if b == m:
        return 1
    if c == m:
        return 2
    return 3


# ------------------------------------------------------- endpoint modes


def _blue_contract(r, g, b, a):
    return ((r + b) >> 1, (g + b) >> 1, b, a)


def _bts(a: int, b: int):
    """bit_transfer_signed(a, b): move a's LSB... spec C.2.14."""
    b = (b >> 1) | (a & 0x80)
    a = (a >> 1) & 0x3F
    if a & 0x20:
        a -= 0x40
    return a, b


def _clamp8(v):
    return max(0, min(255, v))


def decode_endpoints(cem: int, v: list):
    """LDR color endpoint modes -> ((r,g,b,a) e0, e1) or None for HDR."""
    if cem == 0:
        return (v[0], v[0], v[0], 255), (v[1], v[1], v[1], 255)
    if cem == 1:
        L0 = (v[0] >> 2) | (v[1] & 0xC0)
        L1 = min(255, L0 + (v[1] & 0x3F))
        return (L0, L0, L0, 255), (L1, L1, L1, 255)
    if cem == 4:
        return (v[0], v[0], v[0], v[2]), (v[1], v[1], v[1], v[3])
    if cem == 5:
        d0, l0 = _bts(v[1], v[0])
        d1, a0 = _bts(v[3], v[2])
        l1 = _clamp8(l0 + d0)
        a1 = _clamp8(a0 + d1)
        return (l0, l0, l0, a0), (l1, l1, l1, a1)
    if cem == 6:
        return ((v[0] * v[3]) >> 8, (v[1] * v[3]) >> 8, (v[2] * v[3]) >> 8, 255), \
               (v[0], v[1], v[2], 255)
    if cem == 8:
        if v[1] + v[3] + v[5] >= v[0] + v[2] + v[4]:
            return (v[0], v[2], v[4], 255), (v[1], v[3], v[5], 255)
        return _blue_contract(v[1], v[3], v[5], 255), _blue_contract(v[0], v[2], v[4], 255)
    if cem == 9:
        d0, r0 = _bts(v[1], v[0])
        d1, g0 = _bts(v[3], v[2])
        d2, b0 = _bts(v[5], v[4])
        if d0 + d1 + d2 >= 0:
            return ((r0, g0, b0, 255),
                    (_clamp8(r0 + d0), _clamp8(g0 + d1), _clamp8(b0 + d2), 255))
        e0 = _blue_contract(_clamp8(r0 + d0), _clamp8(g0 + d1), _clamp8(b0 + d2), 255)
        e1 = _blue_contract(r0, g0, b0, 255)
        return e0, e1
    if cem == 10:
        return ((v[0] * v[3]) >> 8, (v[1] * v[3]) >> 8, (v[2] * v[3]) >> 8, v[4]), \
               (v[0], v[1], v[2], v[5])
    if cem == 12:
        if v[1] + v[3] + v[5] >= v[0] + v[2] + v[4]:
            return (v[0], v[2], v[4], v[6]), (v[1], v[3], v[5], v[7])
        return _blue_contract(v[1], v[3], v[5], v[7]), _blue_contract(v[0], v[2], v[4], v[6])
    if cem == 13:
        d0, r0 = _bts(v[1], v[0])
        d1, g0 = _bts(v[3], v[2])
        d2, b0 = _bts(v[5], v[4])
        d3, a0 = _bts(v[7], v[6])
        if d0 + d1 + d2 >= 0:
            return ((r0, g0, b0, a0),
                    (_clamp8(r0 + d0), _clamp8(g0 + d1), _clamp8(b0 + d2), _clamp8(a0 + d3)))
        e0 = _blue_contract(_clamp8(r0 + d0), _clamp8(g0 + d1), _clamp8(b0 + d2), _clamp8(a0 + d3))
        e1 = _blue_contract(r0, g0, b0, a0)
        return e0, e1
    return None  # HDR endpoint modes (2,3,7,11,14,15): unsupported in LDR


def _color_quant_for(nvals: int, avail_bits: int):
    """Largest color quantization whose BISE size fits avail_bits (>= QUANT_6)."""
    best = None
    for levels, _, _, _ in _QUANT_MODES:
        if levels < 6:
            continue
        if bise_bits(nvals, levels) <= avail_bits:
            best = levels
    return best


# --------------------------------------------------------- block decode


def _decode_void_extent(block: int, srgb: bool) -> np.ndarray:
    if _bits(block, 9, 1):
        return np.broadcast_to(ERROR_COLOR, (1, 1, 4))  # HDR void extent
    comps = [_bits(block, 64 + 16 * i, 16) for i in range(4)]
    # LDR 16-bit UNORM components; 8-bit decode takes the high byte
    c = np.array([v >> 8 for v in comps], np.uint8)
    return c.reshape(1, 1, 4)


def decode_block(data: bytes, bw: int = 4, bh: int = 4,
                 srgb: bool = False) -> np.ndarray:
    """One 16-byte ASTC block -> uint8 [bh, bw, 4]."""
    block = int.from_bytes(data, "little")
    err = np.broadcast_to(ERROR_COLOR, (bh, bw, 4))

    if (block & 0x1FF) == 0x1FC:
        return np.broadcast_to(_decode_void_extent(block, srgb), (bh, bw, 4))

    mode = decode_block_mode(block & 0x7FF)
    if mode is None:
        return err
    gw, gh, wlevels, dual = mode
    if gw > bw or gh > bh:
        return err
    nweights = gw * gh * (2 if dual else 1)
    if nweights > 64:
        return err
    weight_bits = bise_bits(nweights, wlevels)
    if not (24 <= weight_bits <= 96):
        return err

    nparts = _bits(block, 11, 2) + 1
    if dual and nparts == 4:
        return err

    # ---- CEM field + per-partition endpoint modes
    below_weights = 128 - weight_bits  # first bit above the config data
    extra_cem_bits = 0
    if nparts == 1:
        cems = [_bits(block, 13, 4)]
        color_start = 17
        part_seed = 0
    else:
        part_seed = _bits(block, 13, 10)
        cem_field = _bits(block, 23, 6)
        color_start = 29
        if cem_field & 0x3 == 0:
            cems = [cem_field >> 2] * nparts
        else:
            extra_cem_bits = 3 * nparts - 4
            full = cem_field | (
                _bits(block, below_weights - extra_cem_bits, extra_cem_bits) << 6)
            base_class = (full & 0x3) - 1
            cbits = [(full >> (2 + i)) & 1 for i in range(nparts)]
            mbits = [(full >> (2 + nparts + 2 * i)) & 0x3 for i in range(nparts)]
            cems = [((base_class + cbits[i]) << 2) | mbits[i] for i in range(nparts)]

    ccs = 0
    ccs_bits = 2 if dual else 0
    if dual:
        ccs = _bits(block, below_weights - extra_cem_bits - 2, 2)

    # ---- color endpoint values
    nvals = sum(2 * ((cem >> 2) + 1) for cem in cems)
    if nvals > 18:
        return err
    avail = below_weights - extra_cem_bits - ccs_bits - color_start
    clevels = _color_quant_for(nvals, avail)
    if clevels is None:
        return err
    raw, _ = bise_decode(block, color_start, nvals, clevels)
    cvals = [unquant_color(m, D, clevels) for m, D in raw]

    endpoints = []
    pos = 0
    for cem in cems:
        cnt = 2 * ((cem >> 2) + 1)
        ep = decode_endpoints(cem, cvals[pos:pos + cnt])
        pos += cnt
        if ep is None:
            return err
        endpoints.append(ep)

    # ---- weights (stored bit-reversed from the top of the block)
    rev = _reverse128(block)
    wraw, _ = bise_decode(rev, 0, nweights, wlevels)
    wq = [unquant_weight(m, D, wlevels) for m, D in wraw]
    if dual:
        plane0 = wq[0::2]
        plane1 = wq[1::2]
    else:
        plane0 = wq
        plane1 = None

    # ---- weight infill (spec C.2.18)
    ds = (1024 + bw // 2) // (bw - 1)
    dt = (1024 + bh // 2) // (bh - 1)

    def infill(wgrid):
        out = np.empty((bh, bw), np.int32)
        for t in range(bh):
            for sx in range(bw):
                gs = (ds * sx * (gw - 1) + 32) >> 6
                gt = (dt * t * (gh - 1) + 32) >> 6
                js, fs = gs >> 4, gs & 0xF
                jt, ft = gt >> 4, gt & 0xF
                w11 = (fs * ft + 8) >> 4
                w10 = ft - w11
                w01 = fs - w11
                w00 = 16 - fs - ft + w11

                def g(jj, ii):
                    jj = min(jj, gh - 1)
                    ii = min(ii, gw - 1)
                    return wgrid[jj * gw + ii]

                out[t, sx] = (g(jt, js) * w00 + g(jt, js + 1) * w01
                              + g(jt + 1, js) * w10 + g(jt + 1, js + 1) * w11
                              + 8) >> 4
        return out

    w0 = infill(plane0)
    w1 = infill(plane1) if dual else None

    # ---- partition assignment
    small = (bw * bh) < 31
    if nparts == 1:
        pmap = np.zeros((bh, bw), np.int32)
    else:
        pmap = np.empty((bh, bw), np.int32)
        for t in range(bh):
            for sx in range(bw):
                pmap[t, sx] = select_partition(part_seed, sx, t, nparts, small)

    # ---- interpolate
    out = np.empty((bh, bw, 4), np.uint8)
    for t in range(bh):
        for sx in range(bw):
            e0, e1 = endpoints[pmap[t, sx]]
            px = []
            for comp in range(4):
                w = w0[t, sx]
                if dual and comp == ccs:
                    w = w1[t, sx]
                c0 = (e0[comp] << 8) | e0[comp]
                c1 = (e1[comp] << 8) | e1[comp]
                cv = (c0 * (64 - w) + c1 * w + 32) >> 6
                px.append(cv >> 8)
            out[t, sx] = px
    return out


def decode_astc(payload: bytes, width: int, height: int,
                bw: int = 4, bh: int = 4, srgb: bool = False) -> np.ndarray:
    """ASTC LDR payload -> uint8 RGBA [height, width, 4]."""
    xblocks = (width + bw - 1) // bw
    yblocks = (height + bh - 1) // bh
    need = xblocks * yblocks * 16
    if len(payload) < need:
        raise ValueError(f"ASTC payload truncated: {len(payload)} < {need}")
    img = np.empty((yblocks * bh, xblocks * bw, 4), np.uint8)
    off = 0
    for by in range(yblocks):
        for bx in range(xblocks):
            img[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = decode_block(
                payload[off:off + 16], bw, bh, srgb)
            off += 16
    return np.ascontiguousarray(img[:height, :width])


# ------------------------------------------------------ UASTC structure


def uastc_structural_check(payload: bytes, width: int, height: int) -> None:
    """Structural guard for UASTC LDR 4x4 streams (Draco-bbox-style check).

    Every UASTC block is a valid ASTC block, so a decodable stream must
    contain no reserved block modes, no HDR void extents, and no >2
    partition counts with dual-plane (all guaranteed by the UASTC mode
    set).  Raises ValueError with the offending block index.
    """
    xblocks = (width + 3) // 4
    yblocks = (height + 3) // 4
    off = 0
    for i in range(xblocks * yblocks):
        block = int.from_bytes(payload[off:off + 16], "little")
        off += 16
        if (block & 0x1FF) == 0x1FC:
            if _bits(block, 9, 1):
                raise ValueError(f"UASTC block {i}: HDR void extent")
            continue
        if decode_block_mode(block & 0x7FF) is None:
            raise ValueError(f"UASTC block {i}: reserved ASTC block mode")


# ===================================================================
# Encoder — test support (the in-repo-encoder validation strategy used
# by models/draco.py and ops/basisu.py). Packs explicitly-specified
# symbolic blocks; it is NOT a rate-distortion compressor.
# ===================================================================

_T_LOOKUP = {}
_Q_LOOKUP = {}


def _ensure_lookups():
    if not _T_LOOKUP:
        for T in range(256):
            key = _decode_trit_group(T)
            _T_LOOKUP.setdefault(key, T)
        for Q in range(128):
            key = _decode_quint_group(Q)
            _Q_LOOKUP.setdefault(key, Q)


def bise_encode(values, levels: int):
    """Inverse of bise_decode: [(m, D)] -> (int bitstream LSB-first, nbits)."""
    _ensure_lookups()
    _, b, t, q = _LEVELS_TO_MODE[levels]
    out = 0
    pos = 0

    def put(v, n):
        nonlocal out, pos
        out |= (v & ((1 << n) - 1)) << pos
        pos += n

    if t:
        for g0 in range(0, len(values), 5):
            grp = values[g0:g0 + 5]
            n = len(grp)
            trits = tuple(d for _, d in grp) + (0,) * (5 - n)
            T = _T_LOOKUP[trits]
            tbit = 0
            for i in range(5):
                if i < n:
                    put(grp[i][0], b)
                c = _TRIT_T_CHUNKS[i]
                if i < n:
                    put((T >> tbit) & ((1 << c) - 1), c)
                tbit += c
    elif q:
        for g0 in range(0, len(values), 3):
            grp = values[g0:g0 + 3]
            n = len(grp)
            quints = tuple(d for _, d in grp) + (0,) * (3 - n)
            Q = _Q_LOOKUP[quints]
            qbit = 0
            for i in range(3):
                if i < n:
                    put(grp[i][0], b)
                c = _QUINT_Q_CHUNKS[i]
                if i < n:
                    put((Q >> qbit) & ((1 << c) - 1), c)
                qbit += c
    else:
        for m, _ in values:
            put(m, b)
    return out, pos


_MODE_LOOKUP = {}


def _mode_for(gw: int, gh: int, wlevels: int, dual: bool) -> int:
    """Find an 11-bit block mode encoding this configuration."""
    if not _MODE_LOOKUP:
        for m in range(2048):
            r = decode_block_mode(m)
            if r is not None:
                _MODE_LOOKUP.setdefault(r, m)
    return _MODE_LOOKUP[(gw, gh, wlevels, dual)]


def quantize_color(target: int, levels: int):
    """Nearest encodable (m, D) for an 8-bit endpoint component."""
    _, b, t, q = _LEVELS_TO_MODE[levels]
    best, bd = None, 1 << 20
    dmax = 3 if t else (5 if q else 1)
    for D in range(dmax):
        for m in range(1 << b):
            d = abs(unquant_color(m, D, levels) - target)
            if d < bd:
                best, bd = (m, D), d
    return best


def quantize_weight(target: int, levels: int):
    """Nearest encodable (m, D) for a 0..64 weight."""
    _, b, t, q = _LEVELS_TO_MODE[levels]
    best, bd = None, 1 << 20
    dmax = 3 if t else (5 if q else 1)
    for D in range(dmax):
        for m in range(1 << b):
            d = abs(unquant_weight(m, D, levels) - target)
            if d < bd:
                best, bd = (m, D), d
    return best


def encode_block(gw, gh, wlevels, weights, cems, cvals, *, dual=False,
                 ccs=0, part_seed=0) -> bytes:
    """Pack a symbolic ASTC block.

    weights: [(m, D)] in grid raster order (plane-interleaved if dual)
    cems:    per-partition CEM list (len = partition count)
    cvals:   [(m, D)] color values at the quantization the config implies
             (use color_levels_for_config to find it)
    """
    nparts = len(cems)
    block = _mode_for(gw, gh, wlevels, dual)
    block |= (nparts - 1) << 11

    nweights = gw * gh * (2 if dual else 1)
    assert len(weights) == nweights
    weight_bits = bise_bits(nweights, wlevels)
    below_weights = 128 - weight_bits

    extra_cem_bits = 0
    if nparts == 1:
        block |= cems[0] << 13
        color_start = 17
    else:
        block |= (part_seed & 0x3FF) << 13
        color_start = 29
        if all(c == cems[0] for c in cems):
            block |= (cems[0] << 2) << 23
        else:
            classes = [c >> 2 for c in cems]
            base = min(classes)
            assert all(c - base in (0, 1) for c in classes), "CEM classes span >2"
            full = (base + 1)
            for i, c in enumerate(classes):
                full |= (c - base) << (2 + i)
            for i, c in enumerate(cems):
                full |= (c & 0x3) << (2 + nparts + 2 * i)
            extra_cem_bits = 3 * nparts - 4
            block |= (full & 0x3F) << 23
            block |= (full >> 6) << (below_weights - extra_cem_bits)
    if dual:
        block |= ccs << (below_weights - extra_cem_bits - 2)

    nvals = sum(2 * ((cem >> 2) + 1) for cem in cems)
    assert len(cvals) == nvals
    avail = below_weights - extra_cem_bits - (2 if dual else 0) - color_start
    clevels = _color_quant_for(nvals, avail)
    cbits, cn = bise_encode(cvals, clevels)
    assert cn <= avail
    block |= cbits << color_start

    wbits, wn = bise_encode(weights, wlevels)
    rev = 0
    for i in range(wn):
        rev |= ((wbits >> i) & 1) << (wn - 1 - i)
    block |= rev << (128 - wn)
    return block.to_bytes(16, "little")


def color_levels_for_config(gw, gh, wlevels, nparts, ncvals, *, dual=False,
                            varied_cem=False):
    """The color quantization the decoder will infer for this config."""
    nweights = gw * gh * (2 if dual else 1)
    below = 128 - bise_bits(nweights, wlevels)
    extra = (3 * nparts - 4) if (nparts > 1 and varied_cem) else 0
    start = 17 if nparts == 1 else 29
    return _color_quant_for(ncvals, below - extra - (2 if dual else 0) - start)


def encode_void_extent(rgba8) -> bytes:
    block = 0x1FC | (0x3 << 10)
    # all-ones void extent coordinates = "no extent information"
    block |= ((1 << 52) - 1) << 12
    for i, v in enumerate(rgba8):
        v16 = (int(v) << 8) | int(v)
        block |= v16 << (64 + 16 * i)
    return block.to_bytes(16, "little")

"""KTX2 BasisLZ / ETC1S transcoder (pure Python/numpy, clean-room).

The reference loads every KTX2 payload through nv_ktx
(gltf_image_loader.cpp:34), including KHR_texture_basisu assets, whose
payloads are BasisLZ-supercompressed ETC1S. No transcoder library exists in
this image, so this module implements the decode side of the format from
the KTX2 specification's BasisLZ/ETC1S appendix + the published Basis
Universal bitstream description:

  * canonical Huffman tables, serialized with a DEFLATE-style
    code-length-code (21 codelength symbols, order
    17,18,19,20,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15,16; runs 17/18 =
    zero-runs 3+u3 / 11+u7, 19/20 = prev-repeat 3+u2 / 7+u7),
  * the ETC1S endpoint codebook (three color5 delta models selected by the
    previous channel value, one inten delta model, grayscale flag),
  * the selector codebook (raw 4x8-bit rows or XOR-delta huffman),
  * per-slice block decode: 2-bit endpoint predictors per 2x2 block group
    with RLE (repeat symbol 256, vlc(4)+3 count), pred 0/1/2 = left /
    upper / upper-left reuse, pred 3 = explicit wrap-around delta;
    selector symbols with an approximate-move-to-front history buffer and
    an RLE symbol (runs vlc(7) past 63),
  * ETC1S block -> RGBA8 (color5 upscale (c<<3)|(c>>2), standard ETC1
    intensity modifier table, linear 2-bit selectors).

Bit order is LSB-first within bytes; huffman codes arrive canonical
MSB-first on the wire.

An encoder (encode_etc1s_ktx2_payload) exists for tests/tooling: it emits
valid streams through the same spec (raw selectors, explicit endpoint
deltas) so the decoder is exercised end-to-end without external assets.
NOTE: no ground-truth basisu binaries exist in this environment; decoding
is validated by round-trip + hand-derived structural vectors
(tests/test_basisu.py) — the same strategy as models/meshopt.py.
"""

from __future__ import annotations

import struct

import numpy as np


class BasisError(ValueError):
    pass


# --------------------------------------------------------------- bit I/O
class BitReader:
    """LSB-first bit reader (basisu bitwise_decoder)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def get_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise BasisError("basis bitstream overrun")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def decode_vlc(self, chunk_bits: int) -> int:
        """Chunked VLC: groups of chunk_bits data + 1 continuation MSB."""
        v = 0
        ofs = 0
        while True:
            s = self.get_bits(chunk_bits + 1)
            v |= (s & ((1 << chunk_bits) - 1)) << ofs
            ofs += chunk_bits
            if not (s >> chunk_bits):
                return v
            if ofs >= 32:
                raise BasisError("vlc overrun")


class BitWriter:
    def __init__(self):
        self.bits = []

    def put_bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def put_vlc(self, v: int, chunk_bits: int) -> None:
        mask = (1 << chunk_bits) - 1
        while True:
            chunk = v & mask
            v >>= chunk_bits
            cont = 1 if v else 0
            self.put_bits(chunk | (cont << chunk_bits), chunk_bits + 1)
            if not cont:
                return

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# --------------------------------------------------------------- huffman
_CLC_ORDER = (17, 18, 19, 20, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16)
MAX_SYMS_LOG2 = 14
MAX_CODE_SIZE = 16


def _canonical_codes(lengths):
    """Canonical huffman codes (DEFLATE convention): symbols sorted by
    (length, index), codes assigned sequentially. Returns {sym: (code, len)}."""
    syms = [(l, s) for s, l in enumerate(lengths) if l > 0]
    syms.sort()
    codes = {}
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= l - prev_len
        prev_len = l
        codes[s] = (code, l)
        code += 1
        if code > (1 << l):
            raise BasisError("over-subscribed huffman table")
    return codes


class HuffmanTable:
    def __init__(self, lengths):
        self.lengths = list(lengths)
        self.decode_map = {v: k for k, v in _canonical_codes(lengths).items()}

    def decode(self, br: BitReader) -> int:
        code = 0
        for length in range(1, MAX_CODE_SIZE + 1):
            code = (code << 1) | br.get_bits(1)
            sym = self.decode_map.get((code, length))
            if sym is not None:
                return sym
        raise BasisError("bad huffman code")


def read_huffman_table(br: BitReader) -> HuffmanTable | None:
    total_used_syms = br.get_bits(MAX_SYMS_LOG2)
    if not total_used_syms:
        return None
    if total_used_syms > (1 << MAX_SYMS_LOG2):
        raise BasisError("huffman table too large")
    num_clc = br.get_bits(5)
    if not (1 <= num_clc <= len(_CLC_ORDER)):
        raise BasisError("bad code-length-code count")
    clc_lengths = [0] * 21
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.get_bits(3)
    clc = HuffmanTable(clc_lengths)
    lengths = [0] * total_used_syms
    cur = 0
    prev = 0
    while cur < total_used_syms:
        c = clc.decode(br)
        if c <= 16:
            lengths[cur] = c
            cur += 1
            if c:
                prev = c
        elif c == 17:
            cur += 3 + br.get_bits(3)
        elif c == 18:
            cur += 11 + br.get_bits(7)
        else:
            if not prev:
                raise BasisError("repeat code with no previous length")
            rep = (3 + br.get_bits(2)) if c == 19 else (7 + br.get_bits(7))
            for _ in range(rep):
                if cur >= total_used_syms:
                    raise BasisError("huffman repeat overrun")
                lengths[cur] = prev
                cur += 1
    return HuffmanTable(lengths)


def write_huffman_table(bw: BitWriter, lengths) -> None:
    """Serialize code lengths (encoder side; literal lengths, no runs)."""
    bw.put_bits(len(lengths), MAX_SYMS_LOG2)
    bw.put_bits(len(_CLC_ORDER), 5)
    # code-length-code: fixed 5-bit? no — 3-bit lengths; use a flat table
    # where every value 0..16 is a 5-length code: simplest valid choice is
    # lengths 5 for syms 0..16 and 0 for run codes — but 17 syms at len 5
    # fits (2^5=32). Emit 3-bit length 5 for syms 0..16, 0 for 17..20.
    clc_lengths = [0] * 21
    for s in range(17):
        clc_lengths[s] = 5
    for i in range(len(_CLC_ORDER)):
        bw.put_bits(clc_lengths[_CLC_ORDER[i]], 3)
    clc_codes = _canonical_codes(clc_lengths)
    for l in lengths:
        code, ln = clc_codes[l]
        for b in range(ln - 1, -1, -1):  # MSB-first on the wire
            bw.put_bits((code >> b) & 1, 1)


def _emit_code(bw: BitWriter, codes, sym) -> None:
    code, ln = codes[sym]
    for b in range(ln - 1, -1, -1):
        bw.put_bits((code >> b) & 1, 1)


def _flat_lengths(n):
    """Valid huffman lengths for n symbols: ceil(log2(n)) bits each, with
    the tail shortened to keep the Kraft sum exact."""
    if n == 1:
        return [1]
    import math

    k = math.ceil(math.log2(n))
    lengths = [k] * n
    # shorten leading symbols while the Kraft inequality stays exact
    excess = (1 << k) - n
    i = 0
    while excess and i < n:
        # shortening sym i from k to k-1 consumes one extra slot of 2^-k
        if excess >= 1:
            lengths[i] = k - 1
            excess -= 1
            i += 1
        else:
            break
    return lengths


# --------------------------------------------------------------- ETC1S core
ETC1_INTEN = np.array(
    [
        (-8, -2, 2, 8), (-17, -5, 5, 17), (-29, -9, 9, 29), (-42, -13, 13, 42),
        (-60, -18, 18, 60), (-80, -24, 24, 80), (-106, -33, 33, 106), (-183, -47, 47, 183),
    ],
    np.int32,
)

COLOR5_LO = (-9, -21, -31)  # delta model ranges keyed by prev value
COLOR5_PREV_HI = (9, 21)

ENDPOINT_PRED_REPEAT_LAST = 256
ENDPOINT_PRED_COUNT_VLC_BITS = 4
ENDPOINT_PRED_MIN_REPEAT = 3
SELECTOR_RLE_THRESH = 3
SELECTOR_RLE_COUNT_BITS = 6
SELECTOR_RLE_TOTAL = 1 << SELECTOR_RLE_COUNT_BITS


def decode_endpoints(data: bytes, num_endpoints: int):
    """-> (color5 [N,3] u8, inten5 [N] u8)."""
    br = BitReader(data)
    models = [read_huffman_table(br) for _ in range(3)]
    inten_model = read_huffman_table(br)
    grayscale = br.get_bits(1)
    color5 = np.zeros((num_endpoints, 3), np.uint8)
    inten5 = np.zeros(num_endpoints, np.uint8)
    prev_c = [16, 16, 16]
    prev_i = 0
    for i in range(num_endpoints):
        di = inten_model.decode(br)
        prev_i = (di + prev_i) & 7
        inten5[i] = prev_i
        for ch in range(1 if grayscale else 3):
            p = prev_c[ch]
            m = 0 if p <= COLOR5_PREV_HI[0] else (1 if p <= COLOR5_PREV_HI[1] else 2)
            delta = models[m].decode(br) + COLOR5_LO[m]
            v = (p + delta) & 31
            color5[i, ch] = v
            prev_c[ch] = v
        if grayscale:
            color5[i, 1] = color5[i, 0]
            color5[i, 2] = color5[i, 0]
    return color5, inten5


def decode_selectors(data: bytes, num_selectors: int):
    """-> [N,4] u8 rows (row y: 4 x 2-bit selectors at bits 2x)."""
    br = BitReader(data)
    used_global = br.get_bits(1)
    used_hybrid = br.get_bits(1)
    if used_global or used_hybrid:
        raise BasisError("global/hybrid selector codebooks are a removed basis feature")
    used_raw = br.get_bits(1)
    rows = np.zeros((num_selectors, 4), np.uint8)
    if used_raw:
        for i in range(num_selectors):
            for j in range(4):
                rows[i, j] = br.get_bits(8)
    else:
        model = read_huffman_table(br)
        prev = [0, 0, 0, 0]
        for i in range(num_selectors):
            for j in range(4):
                cur = model.decode(br) ^ prev[j]
                rows[i, j] = cur
                prev[j] = cur
    return rows


class SliceTables:
    def __init__(self, data: bytes):
        br = BitReader(data)
        self.endpoint_pred_model = read_huffman_table(br)
        self.delta_endpoint_model = read_huffman_table(br)
        self.selector_model = read_huffman_table(br)
        self.selector_rle_model = read_huffman_table(br)
        self.history_size = br.get_bits(13)


class _ApproxMTF:
    """Approximate move-to-front (basis approx_move_to_front): new values
    cycle through the back half; referenced entries bubble toward index 0
    by swapping with index/2."""

    def __init__(self, n):
        self.values = [0] * n
        self.rover = n // 2

    def add(self, v):
        self.values[self.rover] = v
        self.rover += 1
        if self.rover >= len(self.values):
            self.rover = len(self.values) // 2

    def use(self, index):
        if index:
            half = index // 2
            self.values[half], self.values[index] = self.values[index], self.values[half]


def decode_slice(data: bytes, num_blocks_x: int, num_blocks_y: int,
                 tables: SliceTables, num_endpoints: int, num_selectors: int):
    """-> (endpoint_index [by,bx] i32, selector_index [by,bx] i32)."""
    br = BitReader(data)
    eidx = np.zeros((num_blocks_y, num_blocks_x), np.int32)
    sidx = np.zeros((num_blocks_y, num_blocks_x), np.int32)
    history = _ApproxMTF(tables.history_size) if tables.history_size else None
    rle_sym_index = num_selectors + tables.history_size

    # per-column saved pred bits for the odd rows (ping-pong row buffer)
    below_preds = np.zeros(num_blocks_x, np.int32)
    cur_pred_bits = 0
    prev_pred_sym = 0
    pred_repeat = 0
    prev_endpoint = 0
    sel_rle = 0
    total_blocks = num_blocks_x * num_blocks_y

    for by in range(num_blocks_y):
        for bx in range(num_blocks_x):
            # ---- endpoint predictor (2 bits per block, grouped 2x2)
            if (bx & 1) == 0:
                if (by & 1) == 0:
                    if pred_repeat:
                        pred_repeat -= 1
                        cur_pred_bits = prev_pred_sym
                    else:
                        cur_pred_bits = tables.endpoint_pred_model.decode(br)
                        if cur_pred_bits == ENDPOINT_PRED_REPEAT_LAST:
                            pred_repeat = (
                                br.decode_vlc(ENDPOINT_PRED_COUNT_VLC_BITS)
                                + ENDPOINT_PRED_MIN_REPEAT - 1
                            )
                            cur_pred_bits = prev_pred_sym
                        else:
                            prev_pred_sym = cur_pred_bits
                    below_preds[bx] = cur_pred_bits >> 4
                    pred = cur_pred_bits & 3
                else:
                    pred = below_preds[bx] & 3
            else:
                if (by & 1) == 0:
                    pred = (cur_pred_bits >> 2) & 3
                else:
                    pred = (below_preds[bx - 1] >> 2) & 3

            # ---- endpoint index
            if pred == 0:
                if bx == 0:
                    raise BasisError("left predictor on first column")
                endpoint = eidx[by, bx - 1]
            elif pred == 1:
                if by == 0:
                    raise BasisError("upper predictor on first row")
                endpoint = eidx[by - 1, bx]
            elif pred == 2:
                if bx == 0 or by == 0:
                    raise BasisError("upper-left predictor on edge")
                endpoint = eidx[by - 1, bx - 1]
            else:
                delta = tables.delta_endpoint_model.decode(br)
                endpoint = prev_endpoint + delta
                if endpoint >= num_endpoints:
                    endpoint -= num_endpoints
            prev_endpoint = int(endpoint)
            eidx[by, bx] = endpoint

            # ---- selector index
            if sel_rle > 0:
                sel_rle -= 1
                sym = num_selectors  # history slot 0
            else:
                sym = tables.selector_model.decode(br)
                if sym == rle_sym_index:
                    run = tables.selector_rle_model.decode(br)
                    if run == SELECTOR_RLE_TOTAL - 1:
                        sel_rle = SELECTOR_RLE_THRESH + br.decode_vlc(7)
                    else:
                        sel_rle = SELECTOR_RLE_THRESH + run
                    if sel_rle > total_blocks:
                        raise BasisError("selector RLE overruns slice")
                    sym = num_selectors
                    sel_rle -= 1
            if sym >= num_selectors:
                if history is None:
                    raise BasisError("history reference with no history buffer")
                hidx = sym - num_selectors
                if hidx >= tables.history_size:
                    raise BasisError("history index out of range")
                sel = history.values[hidx]
                history.use(hidx)
            else:
                sel = sym
                if history is not None:
                    history.add(sel)
            sidx[by, bx] = sel
    return eidx, sidx


def etc1s_to_rgba(eidx, sidx, color5, inten5, selector_rows, width, height):
    """Expand per-block (endpoint, selector) to an RGBA8 image."""
    by, bx = eidx.shape
    img = np.zeros((by * 4, bx * 4, 4), np.uint8)
    img[..., 3] = 255
    base = ((color5.astype(np.int32) << 3) | (color5.astype(np.int32) >> 2))  # [E,3]
    for y in range(by):
        for x in range(bx):
            e = eidx[y, x]
            rows = selector_rows[sidx[y, x]]
            mods = ETC1_INTEN[inten5[e]]
            b = base[e]
            for py in range(4):
                rbits = int(rows[py])
                for px in range(4):
                    s = (rbits >> (px * 2)) & 3
                    img[y * 4 + py, x * 4 + px, :3] = np.clip(b + mods[s], 0, 255)
    return img[:height, :width]


# --------------------------------------------------------- KTX2 integration
def parse_basis_lz_global(data: bytes, image_count: int):
    """Parse KTX2 supercompressionGlobalData for BasisLZ."""
    if len(data) < 20:
        raise BasisError("BasisLZ global data too short")
    (endpoint_count, selector_count, endpoints_len, selectors_len,
     tables_len, extended_len) = struct.unpack_from("<HHIIII", data, 0)
    off = 20
    descs = []
    for _ in range(image_count):
        descs.append(struct.unpack_from("<IIIII", data, off))  # flags, rgbOff, rgbLen, aOff, aLen
        off += 20
    endpoints = data[off : off + endpoints_len]
    off += endpoints_len
    selectors = data[off : off + selectors_len]
    off += selectors_len
    tables = data[off : off + tables_len]
    return {
        "endpoint_count": endpoint_count,
        "selector_count": selector_count,
        "endpoints": endpoints,
        "selectors": selectors,
        "tables": tables,
        "image_descs": descs,
    }


def transcode_etc1s_image(level_data: bytes, desc, codebooks, width: int, height: int):
    """Decode one BasisLZ ETC1S image (rgb [+ alpha] slices) to RGBA8."""
    color5, inten5 = codebooks["_endpoints_decoded"]
    selector_rows = codebooks["_selectors_decoded"]
    tables = codebooks["_tables_decoded"]
    nbx = (width + 3) // 4
    nby = (height + 3) // 4
    _flags, rgb_off, rgb_len, a_off, a_len = desc
    rgb = level_data[rgb_off : rgb_off + rgb_len]
    eidx, sidx = decode_slice(rgb, nbx, nby, tables,
                              codebooks["endpoint_count"], codebooks["selector_count"])
    img = etc1s_to_rgba(eidx, sidx, color5, inten5, selector_rows, width, height)
    if a_len:
        alpha = level_data[a_off : a_off + a_len]
        ae, asel = decode_slice(alpha, nbx, nby, tables,
                                codebooks["endpoint_count"], codebooks["selector_count"])
        aimg = etc1s_to_rgba(ae, asel, color5, inten5, selector_rows, width, height)
        img[..., 3] = aimg[..., 1]  # alpha rides the green channel
    return img


def prepare_codebooks(glob: dict) -> dict:
    glob = dict(glob)
    glob["_endpoints_decoded"] = decode_endpoints(glob["endpoints"], glob["endpoint_count"])
    glob["_selectors_decoded"] = decode_selectors(glob["selectors"], glob["selector_count"])
    glob["_tables_decoded"] = SliceTables(glob["tables"])
    return glob


# ------------------------------------------------------------------ encoder
def _encode_huffman_stream(bw, lengths, syms):
    codes = _canonical_codes(lengths)
    for s in syms:
        _emit_code(bw, codes, s)


def encode_endpoints(color5, inten5) -> bytes:
    """Inverse of decode_endpoints (tests/tooling)."""
    color5 = np.asarray(color5, np.int32)
    inten5 = np.asarray(inten5, np.int32)
    n = color5.shape[0]
    bw = BitWriter()
    # flat models covering each delta range
    model_lens = []
    for m in range(3):
        size = 41  # deltas lo..lo+40 cover any 5-bit transition
        model_lens.append(_flat_lengths(size))
    inten_lens = _flat_lengths(8)
    for ml in model_lens:
        write_huffman_table(bw, ml)
    write_huffman_table(bw, inten_lens)
    bw.put_bits(0, 1)  # not grayscale
    model_codes = [_canonical_codes(ml) for ml in model_lens]
    inten_codes = _canonical_codes(inten_lens)
    prev_c = [16, 16, 16]
    prev_i = 0
    for i in range(n):
        _emit_code(bw, inten_codes, (int(inten5[i]) - prev_i) & 7)
        prev_i = int(inten5[i])
        for ch in range(3):
            p = prev_c[ch]
            m = 0 if p <= COLOR5_PREV_HI[0] else (1 if p <= COLOR5_PREV_HI[1] else 2)
            v = int(color5[i, ch])
            # delta symbol: decoder computes v = (p + sym + LO) & 31, so any
            # representative (v - p - LO) mod 32 round-trips; it stays < 41
            sym = (v - p - COLOR5_LO[m]) & 31
            _emit_code(bw, model_codes[m], sym)
            prev_c[ch] = v
    return bw.tobytes()


def encode_selectors(rows) -> bytes:
    rows = np.asarray(rows, np.uint8)
    bw = BitWriter()
    bw.put_bits(0, 1)  # global cb
    bw.put_bits(0, 1)  # hybrid cb
    bw.put_bits(1, 1)  # raw
    for i in range(rows.shape[0]):
        for j in range(4):
            bw.put_bits(int(rows[i, j]), 8)
    return bw.tobytes()


def encode_tables(num_endpoints: int, num_selectors: int, history_size: int = 0) -> bytes:
    bw = BitWriter()
    write_huffman_table(bw, _flat_lengths(ENDPOINT_PRED_REPEAT_LAST + 1))
    write_huffman_table(bw, _flat_lengths(num_endpoints))
    write_huffman_table(bw, _flat_lengths(num_selectors + history_size + 1))
    write_huffman_table(bw, _flat_lengths(SELECTOR_RLE_TOTAL))
    bw.put_bits(history_size, 13)
    return bw.tobytes()


def encode_slice(eidx, sidx, num_endpoints: int, num_selectors: int,
                 history_size: int = 0) -> bytes:
    """Inverse of decode_slice using only explicit encodings (pred 3 +
    direct selector symbols); exercises the decoder's main paths."""
    eidx = np.asarray(eidx)
    sidx = np.asarray(sidx)
    nby, nbx = eidx.shape
    bw = BitWriter()
    pred_codes = _canonical_codes(_flat_lengths(ENDPOINT_PRED_REPEAT_LAST + 1))
    delta_codes = _canonical_codes(_flat_lengths(num_endpoints))
    sel_codes = _canonical_codes(_flat_lengths(num_selectors + history_size + 1))
    prev_endpoint = 0
    history = _ApproxMTF(history_size) if history_size else None
    for by in range(nby):
        for bx in range(nbx):
            if (bx & 1) == 0 and (by & 1) == 0:
                _emit_code(bw, pred_codes, 0xFF)  # pred 3 for all 4 blocks
            _emit_code(bw, delta_codes, (int(eidx[by, bx]) - prev_endpoint) % num_endpoints)
            prev_endpoint = int(eidx[by, bx])
            _emit_code(bw, sel_codes, int(sidx[by, bx]))
            if history is not None:
                history.add(int(sidx[by, bx]))
    return bw.tobytes()

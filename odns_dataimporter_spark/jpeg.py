"""Pure-Python + numpy BASELINE JPEG codec (ITU-T T.81 sequential DCT)
— no external media library, closing the one codec boundary the earlier
rounds documented as NotImplementedError (`media.decode_image`).

Decoder (`decode_jpeg`): real marker-segment parser (SOI/APP*/COM/DQT/
DHT/DRI/SOF0/SOS/RSTn/EOI), canonical Huffman table construction from
the DHT bits/values lists, a 16-bit-peek LUT entropy decoder over the
pre-unstuffed scan bytes (0xFF00 removal and RSTn DC-prediction resets
handled in a single vectorized pre-pass), generic MCU walk over
per-component (h, v) sampling factors (4:4:4 and 4:2:0 both exercised
in tests), then ONE batched dequantize + de-zigzag + separable float
IDCT + level shift + clamp over all blocks at once (numpy, bit-exact
with the scalar formulation — see `_idct_batch`), nearest-neighbor
chroma upsampling and the JFIF YCbCr→RGB transform for 3-component
scans. Width/height that are not MCU multiples are edge-padded on
encode and cropped on decode, per the spec.

Encoder (`encode_jpeg_gray`): single-component baseline stream with
the Annex K luminance quantization table and the Annex K "typical"
Huffman tables — it exists so the pipeline can synthesize REAL JPEG
payloads from deterministic testdata bytes. All blocks go through one
batched forward DCT + quantization; only the run-length/Huffman symbol
walk stays per-block Python, and the resulting (value, bitlength)
symbol stream is packed into bytes with a vectorized bit scatter
(`_pack_bits`) including byte stuffing. The encoder/decoder pair is
round-trip property-tested (tests/test_media_codecs.py): JPEG is
lossy, so the contract is determinism + bounded per-pixel error
(quant table max/2 per coefficient bounds the spatial error) + exact
golden digests, not bit equality with the source.

Bit-exactness note: the round-8 implementation computed the DCTs with
scalar Python loops. The numpy rewrite reproduces the SAME summation
and multiplication grouping (an explicit 8-step accumulate per
contraction axis, no FMA, no pairwise reduction), so every decoded
pixel and every encoded byte is bit-identical to the scalar version —
verified exhaustively in tests/test_media_codecs.py's golden digests
and in the round-9 migration by direct old-vs-new stream comparison.

Everything is plain ``bytes -> tuple`` so it batches inside
mapInPandas workers exactly like the BMP/PNG/WAV codecs (media.py).

Reference behavior note: the reference repo (/root/reference) has no
media handling at all; this is EXT surface mandated by the driver's
multimodal north star.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) -----------------------------------------

# K.1 luminance quantization table, natural (row-major) order
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# K.3.1 typical Huffman tables for 8-bit luminance
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> list[int]:
    """Natural index visited at each zigzag position (generated, not
    recalled — a constant-table typo here would silently corrupt both
    directions)."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag_order()
_ZIGZAG_NP = np.asarray(ZIGZAG, dtype=np.int64)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7

_COS_NP = np.asarray(_COS, dtype=np.float64)  # [x, u]
_C_NP = np.asarray(_C, dtype=np.float64)
# scale[v, u] = (0.25 * C[u]) * C[v] — the exact grouping of the scalar
# formulation `0.25 * _C[u] * _C[v] * s` (left-to-right association).
_FDCT_SCALE = (0.25 * _C_NP)[None, :] * _C_NP[:, None]
_QUANT_LUMA_NP = np.asarray(QUANT_LUMA, dtype=np.float64)


# --- DCT (batched, bit-exact with the scalar loops) --------------------------


def _fdct_batch(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT-II over (n, 8, 8) spatial blocks [r, x] -> (n, 8, 8)
    coefficient blocks [v, u].

    Each contraction is an explicit 8-step accumulate so the float64
    addition order matches the scalar `s += block[r,x] * COS[x][u]`
    loop term-for-term (numpy elementwise ops use no FMA and no
    pairwise reduction here), keeping the output bit-identical to the
    round-8 scalar implementation."""
    tmp = np.zeros_like(blocks)  # [r, u]
    for x in range(8):
        tmp += blocks[:, :, x, None] * _COS_NP[x][None, None, :]
    out = np.zeros_like(blocks)  # [v, u] pre-scale: sum_y tmp[y,u]*COS[y,v]
    for y in range(8):
        out += tmp[:, y, None, :] * _COS_NP[y][None, :, None]
    return _FDCT_SCALE[None, :, :] * out


def _idct_batch(coefs: np.ndarray) -> np.ndarray:
    """Inverse DCT over (n, 8, 8) coefficient blocks [v, u] -> (n, 8, 8)
    spatial blocks [y, x]; same bit-exact accumulation discipline as
    `_fdct_batch` (grouping `(C[u]*coef) * COS`, then `(C[v]*tmp) * COS`,
    0.25 applied after the sum)."""
    a = _C_NP[None, None, :] * coefs  # C[u] * coef[v, u]
    tmp = np.zeros_like(coefs)  # [v, x]
    for u in range(8):
        tmp += a[:, :, u, None] * _COS_NP[:, u][None, None, :]
    b = _C_NP[None, :, None] * tmp  # C[v] * tmp[v, x]
    out = np.zeros_like(coefs)  # [y, x]
    for v in range(8):
        out += b[:, v, None, :] * _COS_NP[:, v][None, :, None]
    return 0.25 * out


# --- Huffman -----------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman: value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# Bounded FIFO cache (round-9 ADVICE): each entry is two 65536-slot
# Python int lists (~3-4 MB), and crawled .jpg payloads can carry a
# distinct Huffman table per third-party image — unbounded growth in a
# long-lived mapInPandas worker. 16 entries covers the 4 Annex-K
# tables plus a healthy working set of custom tables (~60 MB ceiling
# per worker); eviction is insertion-order (dict preserves it).
_LUT_CACHE_MAX = 16
_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _build_decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-peek decode LUT: for every 16-bit window whose prefix is a
    valid canonical code, lut_len[window] = code length and
    lut_val[window] = decoded symbol; windows starting with no valid
    code keep length 0 (-> "invalid Huffman code"). Built once per
    distinct (bits, vals) table and cached (the Annex K tables repeat
    across every image in a batch)."""
    key = bytes(bits) + b"\x00" + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut_len = np.zeros(1 << 16, dtype=np.int64)
    lut_val = np.zeros(1 << 16, dtype=np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut_len[lo:hi] = length
            lut_val[lo:hi] = vals[k]
            code += 1
            k += 1
        code <<= 1
    entry = (lut_len.tolist(), lut_val.tolist())  # list indexing is fastest
    while len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = entry
    return entry


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


# --- bit packing (encoder) ----------------------------------------------------


def _pack_bits(vals: list[int], lens: list[int]) -> bytes:
    """Pack an MSB-first (value, bitlength) symbol stream into the
    entropy-coded byte segment: vectorized bit scatter + packbits +
    0xFF00 byte stuffing. The final partial byte is 1-filled per spec
    (and a 1-fill that completes 0xFF is stuffed, matching the scalar
    writer's behavior of stuffing during flush)."""
    if not vals:
        return b""
    va = np.asarray(vals, dtype=np.int64)
    la = np.asarray(lens, dtype=np.int64)
    total = int(la.sum())
    pad = (-total) % 8
    if pad:
        va = np.append(va, (1 << pad) - 1)
        la = np.append(la, pad)
        total += pad
    ends = np.cumsum(la)
    bits = np.zeros(total, dtype=np.uint8)
    for b in range(int(la.max())):
        sel = la > b
        bits[ends[sel] - 1 - b] = (va[sel] >> b) & 1
    data = np.packbits(bits)
    ff = np.flatnonzero(data == 0xFF)
    if ff.size:
        data = np.insert(data, ff + 1, 0)
    return data.tobytes()


# --- encoder core -------------------------------------------------------------


def _quantize_plane(plane: np.ndarray) -> np.ndarray:
    """(ph, pw) float64 plane (already level-shift-ready, multiples of 8)
    -> (n_blocks, 64) int zigzag-ordered quantized coefficients, blocks
    in raster order. Bit-exact with `int(round(fdct(block - 128)[zz] /
    quant[zz]))` (np.rint and Python round are both half-even)."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coef = _fdct_batch(blocks).reshape(-1, 64)  # natural [v*8+u] order
    q_nat = np.rint(coef / _QUANT_LUMA_NP[None, :]).astype(np.int64)
    return q_nat[:, _ZIGZAG_NP]  # zigzag position i -> natural ZIGZAG[i]


def _emit_block(
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    vals: list[int],
    lens: list[int],
) -> int:
    """Append one block's DC-diff + RLE/Huffman symbols to the packed
    stream (Huffman code and magnitude bits fused into one symbol);
    returns the new DC predictor."""
    dc = zz[0]
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    if t:
        mag = diff if diff >= 0 else diff + (1 << t) - 1
        vals.append((code << t) | mag)
        lens.append(length + t)
    else:
        vals.append(code)
        lens.append(length)
    last_nz = 0
    for i in range(1, 64):
        if zz[i]:
            last_nz = i
    run = 0
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            vals.append(code)
            lens.append(length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        mag = v if v >= 0 else v + (1 << t) - 1
        vals.append((code << t) | mag)
        lens.append(length + t)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        vals.append(code)
        lens.append(length)
    return dc


def encode_jpeg_gray(pixels: bytes, width: int) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len % width == 0) as a
    baseline JFIF stream with the Annex K luminance tables."""
    if width <= 0 or len(pixels) == 0 or len(pixels) % width:
        raise ValueError("pixels must be a positive multiple of width")
    height = len(pixels) // width
    pw = (width + 7) // 8 * 8
    ph = (height + 7) // 8 * 8

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    arr = np.pad(arr, ((0, ph - height), (0, pw - width)), mode="edge")
    qs = _quantize_plane(arr.astype(np.float64)).tolist()

    dc_codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    vals: list[int] = []
    lens: list[int] = []
    pred = 0
    for zz in qs:  # raster block order == the scalar by/bx walk
        pred = _emit_block(zz, pred, dc_codes, ac_codes, vals, lens)
    scan = _pack_bits(vals, lens)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht_dc = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
    dht_ac = bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> tuple[int, int, int, int]:
    """Decode a baseline JPEG; returns (width, height, n_components,
    pixel_sum) where pixel_sum is over all decoded samples (gray) or
    the RGB triplets (color) — the same summary contract as
    media.decode_bmp."""
    w, h, comps = _decode(blob)
    total = 0
    for plane in comps:
        total += int(np.asarray(plane).sum())
    return w, h, len(comps), total


def decode_jpeg_pixels(blob: bytes) -> tuple[int, int, bytes]:
    """Grayscale pixel access (first/luma component, full resolution)."""
    w, h, comps = _decode(blob)
    return w, h, np.asarray(comps[0], dtype=np.int64).astype(np.uint8).tobytes()


def _split_entropy(blob: bytes, pos: int) -> tuple[list[bytes], bool]:
    """Slice the entropy-coded data starting at `pos` into per-restart
    segments with 0xFF00 unstuffing applied; returns (segments,
    ended_by_marker). ended_by_marker=False means the file ran out
    before any terminating marker (truncated stream)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(blob)
    while True:
        j = blob.find(b"\xff", i)
        if j == -1:
            cur += blob[i:]
            segments.append(bytes(cur))
            return segments, False
        cur += blob[i:j]
        if j + 1 >= n:
            raise ValueError("JPEG: dangling 0xFF at stream end")
        m = blob[j + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # any other marker ends the scan
            segments.append(bytes(cur))
            return segments, True


class _SegReader:
    """MSB-first bit reader over one unstuffed entropy segment with a
    16-bit peek window (1-padded past the end; overconsumption is
    detected by comparing consumed bits against the true bit count)."""

    __slots__ = ("data", "nbytes", "bytepos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.nbytes = len(data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def _fill16(self) -> None:
        data, bp, nb = self.data, self.bytepos, self.nbytes
        acc, nbits = self.acc, self.nbits
        while nbits < 16 and bp < nb:
            acc = (acc << 8) | data[bp]
            bp += 1
            nbits += 8
        self.acc, self.nbits, self.bytepos = acc, nbits, bp

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill16()
        nbits = self.nbits
        if nbits >= 16:
            return (self.acc >> (nbits - 16)) & 0xFFFF
        # past-the-end: 1-pad (matches the spec's 1-fill and keeps
        # shorter in-range codes decodable; overrun checked by caller)
        return ((self.acc << (16 - nbits)) | ((1 << (16 - nbits)) - 1)) & 0xFFFF

    def consume(self, k: int) -> bool:
        """Consume k bits; False if the segment had fewer bits left."""
        if self.nbits < k:
            self._fill16()
            if self.nbits < k:
                return False
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return True

    def take_or_none(self, k: int):
        """Read k magnitude bits (k <= 16); None if the segment ended."""
        if self.nbits < k:
            self._fill16()
            if self.nbits < k:
                return None
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def exhausted_clean(self) -> bool:
        """True iff no unread bits remain (restart-boundary contract:
        the scalar reader only saw RSTn when its accumulator was empty
        AND the next bytes were the marker)."""
        return self.nbits == 0 and self.bytepos >= self.nbytes


def _decode(blob: bytes) -> tuple[int, int, list]:
    if blob[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple[list[int], list[int]]] = {}
    huff_ac: dict[int, tuple[list[int], list[int]]] = {}
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    scan_comp: list[tuple[int, int, int]] = []  # (comp_idx, td, ta)
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG: EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(blob):
            raise ValueError("JPEG: truncated marker segment")
        (seglen,) = struct.unpack_from(">H", blob, pos)
        if seglen < 2 or pos + seglen > len(blob):
            raise ValueError("JPEG: bad segment length")
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported (baseline)")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=o).astype(
                    np.int64
                )
                o += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG_NP] = zz
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                o += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_lut(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF0")
            ns = seg[0]
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(
                    (j for j, c in enumerate(frame[2]) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError("JPEG: scan references unknown component")
                scan_comp.append((idx, tdta >> 4, tdta & 0x0F))
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("JPEG: no SOS marker")

    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    pw = [mcux * hs * 8 for _, hs, vs, _ in comps]
    ph = [mcuy * vs * 8 for _, hs, vs, _ in comps]

    segments, ended_by_marker = _split_entropy(blob, pos)

    # --- entropy decode: walk MCUs, scatter nonzero zigzag coefficients ---
    # block bookkeeping: for each decoded block, its component and
    # top-left offset in that component's padded plane
    blk_ci: list[int] = []
    blk_oy: list[int] = []
    blk_ox: list[int] = []
    ent_bi: list[int] = []  # scatter triples (block, zigzag pos, value)
    ent_k: list[int] = []
    ent_v: list[int] = []

    seg_idx = 0
    reader = _SegReader(segments[0])
    preds = [0] * len(comps)
    mcu_count = 0
    done = False
    truncated = False
    for my in range(mcuy):
        if done:
            break
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # the scalar reader required a byte-aligned, fully
                # drained accumulator exactly at the RSTn boundary
                if not reader.exhausted_clean() or seg_idx + 1 >= len(segments):
                    raise ValueError("JPEG: missing restart marker")
                seg_idx += 1
                reader = _SegReader(segments[seg_idx])
                preds = [0] * len(comps)
            mcu_ok = True
            for ci, td, ta in scan_comp:
                _, hs, vs, tq_ = comps[ci]
                dc_len, dc_val = huff_dc[td]
                ac_len, ac_val = huff_ac[ta]
                for byi in range(vs):
                    for bxi in range(hs):
                        bi = len(blk_ci)
                        blk_start_ent = len(ent_bi)
                        # --- DC ---
                        pk = reader.peek16()
                        L = dc_len[pk]
                        if L == 0:
                            if reader.nbits < 16:
                                mcu_ok = False  # out of bits, not a bad code
                                break
                            raise ValueError("JPEG: invalid Huffman code")
                        if not reader.consume(L):
                            mcu_ok = False
                            break
                        t = dc_val[pk]
                        if t:
                            mag = reader.take_or_none(t)
                            if mag is None:
                                mcu_ok = False
                                break
                            preds[ci] += _extend(mag, t)
                        ent_bi.append(bi)
                        ent_k.append(0)
                        ent_v.append(preds[ci])
                        # --- AC ---
                        k = 1
                        while k < 64:
                            pk = reader.peek16()
                            L = ac_len[pk]
                            if L == 0:
                                if reader.nbits < 16:
                                    mcu_ok = False
                                    break
                                raise ValueError("JPEG: invalid Huffman code")
                            if not reader.consume(L):
                                mcu_ok = False
                                break
                            rs = ac_val[pk]
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC run overflows block")
                            mag = reader.take_or_none(s)
                            if mag is None:
                                mcu_ok = False
                                break
                            ent_bi.append(bi)
                            ent_k.append(k)
                            ent_v.append(_extend(mag, s))
                            k += 1
                        if not mcu_ok:
                            # scalar _decode_block only wrote a block to
                            # the plane after decoding it COMPLETELY:
                            # drop the in-progress block, keep earlier
                            # blocks of this MCU
                            del ent_bi[blk_start_ent:]
                            del ent_k[blk_start_ent:]
                            del ent_v[blk_start_ent:]
                            break
                        blk_ci.append(ci)
                        blk_oy.append((my * vs + byi) * 8)
                        blk_ox.append((mx * hs + bxi) * 8)
                    if not mcu_ok:
                        break
                if not mcu_ok:
                    break
            if not mcu_ok:
                # ran out of bits mid-scan: a terminating marker means
                # scan end (stop, keep completed blocks — the scalar
                # _ScanEnd path); plain EOF is a truncated-stream error
                if not ended_by_marker:
                    truncated = True
                done = True
                break
            mcu_count += 1
    if truncated:
        raise ValueError("JPEG: entropy stream truncated")

    # --- batched dequantize + de-zigzag + IDCT over all decoded blocks ---
    nb = len(blk_ci)
    planes = [np.zeros((ph[ci], pw[ci]), dtype=np.int64) for ci in range(len(comps))]
    if nb:
        zz = np.zeros((nb, 64), dtype=np.int64)
        zz[ent_bi, ent_k] = ent_v
        nat = np.zeros((nb, 64), dtype=np.float64)
        quant_per_block = np.stack([qt[comps[ci][3]] for ci in blk_ci])
        nat[:, _ZIGZAG_NP] = (zz * quant_per_block[:, _ZIGZAG_NP]).astype(np.float64)
        px = _idct_batch(nat.reshape(nb, 8, 8))
        px = np.clip(np.rint(px + 128.0), 0, 255).astype(np.int64)
        for i in range(nb):
            oy, ox = blk_oy[i], blk_ox[i]
            planes[blk_ci[i]][oy : oy + 8, ox : ox + 8] = px[i]

    # --- crop + upsample to full resolution (exact integer ops) ---
    out_planes: list[np.ndarray] = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        sx = hmax // hs
        sy = vmax // vs
        up = planes[ci]
        if sy > 1:
            up = np.repeat(up, sy, axis=0)
        if sx > 1:
            up = np.repeat(up, sx, axis=1)
        out_planes.append(up[:h, :w].reshape(-1))

    if len(out_planes) == 3:  # JFIF YCbCr -> RGB
        yy = out_planes[0].astype(np.float64)
        b_ = out_planes[1].astype(np.float64) - 128.0
        r_ = out_planes[2].astype(np.float64) - 128.0
        rr = np.clip(np.rint(yy + 1.402 * r_), 0, 255).astype(np.int64)
        gg = np.clip(
            np.rint(yy - 0.344136 * b_ - 0.714136 * r_), 0, 255
        ).astype(np.int64)
        bb = np.clip(np.rint(yy + 1.772 * b_), 0, 255).astype(np.int64)
        out_planes = [rr, gg, bb]
    return w, h, out_planes


def _clamp8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


# --- color encoder (4:4:4 / 4:2:0, shared Annex K tables) ----------------------


def encode_jpeg_color(
    rgb: bytes, width: int, subsample: tuple[int, int] = (2, 2)
) -> bytes:
    """Encode interleaved RGB bytes as baseline YCbCr JPEG. subsample
    (1,1) = 4:4:4, (2,2) = 4:2:0 (chroma box-averaged). All three
    components reuse the Annex K luminance tables (legal, simpler) —
    this encoder exists to exercise the decoder's generic sampling-
    factor MCU walk with real interleaved scans."""
    if width <= 0 or len(rgb) % (3 * width):
        raise ValueError("rgb must be positive multiple of 3*width")
    height = len(rgb) // (3 * width)
    hs, vs = subsample
    if (hs, vs) not in ((1, 1), (2, 2)):
        raise ValueError("subsample must be (1,1) or (2,2)")

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    # same left-to-right grouping as the scalar transform
    ny = 0.299 * r + 0.587 * g + 0.114 * b
    ncb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    ncr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    cw = (width + hs - 1) // hs
    ch = (height + vs - 1) // vs
    if (hs, vs) == (1, 1):
        pcb, pcr = ncb, ncr
    else:
        # edge-replicate to chroma multiples, then box-average with the
        # scalar accumulation order ((p00 + p01) + p10) + p11
        cbp = np.pad(ncb, ((0, ch * vs - height), (0, cw * hs - width)), mode="edge")
        crp = np.pad(ncr, ((0, ch * vs - height), (0, cw * hs - width)), mode="edge")

        def box(p: np.ndarray) -> np.ndarray:
            cells = p.reshape(ch, vs, cw, hs)
            acc = cells[:, 0, :, 0].copy()
            acc += cells[:, 0, :, 1]
            acc += cells[:, 1, :, 0]
            acc += cells[:, 1, :, 1]
            return acc / 4.0

        pcb, pcr = box(cbp), box(crp)

    def padded(plane: np.ndarray, bw_: int, bh_: int) -> np.ndarray:
        h_, w_ = plane.shape
        return np.pad(plane, ((0, bh_ - h_), (0, bw_ - w_)), mode="edge")

    mcux = (width + 8 * hs - 1) // (8 * hs)
    mcuy = (height + 8 * vs - 1) // (8 * vs)
    qy = _quantize_plane(padded(ny, mcux * hs * 8, mcuy * vs * 8)).tolist()
    qcb = _quantize_plane(padded(pcb, mcux * 8, mcuy * 8)).tolist()
    qcr = _quantize_plane(padded(pcr, mcux * 8, mcuy * 8)).tolist()
    ybw = mcux * hs  # luma blocks per row

    dc_codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    vals: list[int] = []
    lens: list[int] = []
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for byi in range(vs):
                for bxi in range(hs):
                    zz = qy[(my * vs + byi) * ybw + (mx * hs + bxi)]
                    preds[0] = _emit_block(zz, preds[0], dc_codes, ac_codes, vals, lens)
            preds[1] = _emit_block(
                qcb[my * mcux + mx], preds[1], dc_codes, ac_codes, vals, lens
            )
            preds[2] = _emit_block(
                qcr[my * mcux + mx], preds[2], dc_codes, ac_codes, vals, lens
            )
    scan = _pack_bits(vals, lens)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht_dc = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
    dht_ac = bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)

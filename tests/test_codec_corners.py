"""Round-5 codec corners: 12-bit JPEG (extended sequential, 16-bit DQT)
and sub-byte (1/4-bit) indexed BMP — the last open multimodal variants —
plus message pins for the PERMANENT non-goals frozen in COVERAGE.md
(arithmetic/hierarchical JPEG, sub-byte PNG depths) so the error surface
can't drift silently."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hfsa_spark.operators.jpeg import decode_jpeg, encode_jpeg12
from hfsa_spark.operators.multimodal import decode_bmp, decode_png


# ------------------------------------------------------------ 12-bit JPEG --


def test_jpeg12_gray_roundtrip_solid_blocks():
    # solid 8x8-aligned blocks + a gradient; decoder returns the high 8
    # bits, so expectation is (sample >> 4) within quantization error
    a = np.zeros((16, 24), dtype=np.uint16)
    a[:8, :8] = 1000
    a[:8, 8:16] = 3000
    a[:8, 16:] = 4095
    a[8:, :] = (np.arange(24, dtype=np.uint16) * 170)[None, :]
    dec = decode_jpeg(encode_jpeg12(a, quality=95))
    assert dec.shape == (16, 24, 1) and dec.dtype == np.uint8
    err = np.abs(dec[:, :, 0].astype(np.int64) - (a >> 4).astype(np.int64))
    assert err[:8].max() <= 1          # solid blocks quantize ~exactly
    assert err.max() <= 4              # gradient rows stay within DCT ripple


def test_jpeg12_rgb_roundtrip():
    rgb = np.zeros((8, 8, 3), dtype=np.uint16)
    rgb[:, :] = (3200, 1600, 400)
    dec = decode_jpeg(encode_jpeg12(rgb, quality=95))
    assert dec.shape == (8, 8, 3)
    exp = (rgb >> 4).astype(np.int64)
    assert np.abs(dec.astype(np.int64) - exp).max() <= 2


def test_jpeg12_rejects_out_of_range():
    with pytest.raises(ValueError):
        encode_jpeg12(np.full((8, 8), 5000, dtype=np.uint16))


def test_jpeg12_baseline_marker_still_8bit_only():
    # SOF0 (baseline) must stay 8-bit per T.81: flip the 12-bit stream's
    # SOF1 marker to SOF0 and the precision check must fire
    data = bytearray(encode_jpeg12(np.zeros((8, 8), dtype=np.uint16)))
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="precision 12"):
        decode_jpeg(bytes(data))


# --------------------------------------------------------- sub-byte BMP --


def _bmp(w: int, h: int, bpp: int, palette: list[tuple[int, int, int]],
         rows: list[list[int]]) -> bytes:
    """Hand-assemble an uncompressed indexed BMP (bottom-up rows)."""
    row_bytes = ((w * bpp + 31) // 32) * 4
    pix = bytearray()
    for row in reversed(rows):          # bottom-up storage
        packed = bytearray(row_bytes)
        for x, v in enumerate(row):
            if bpp == 8:
                packed[x] = v
            elif bpp == 4:
                packed[x // 2] |= v << (4 if x % 2 == 0 else 0)
            else:
                packed[x // 8] |= v << (7 - x % 8)
        pix += packed
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    pix_off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(pix), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix),
                       2835, 2835, len(palette), 0)
    return hdr + info + pal + bytes(pix)


def test_bmp_1bit_decode():
    # 10px wide (crosses the byte boundary), 3 rows, b/w palette
    rows = [[0, 1] * 5, [1] * 10, [0] * 10]
    data = _bmp(10, 3, 1, [(0, 0, 0), (255, 255, 255)], rows)
    arr = decode_bmp(data)
    assert arr.shape == (3, 10, 1)      # grayscale palette collapses to 1ch
    assert arr[0, :, 0].tolist() == [0, 255] * 5
    assert (arr[1] == 255).all() and (arr[2] == 0).all()


def test_bmp_4bit_decode_color():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    rows = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]]  # odd width: nibble padding
    arr = decode_bmp(_bmp(5, 2, 4, pal, rows))
    assert arr.shape == (2, 5, 3)
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 4].tolist() == [17, 34, 51]


def test_bmp_bad_index_returns_none():
    # index 3 with a 2-entry palette must be rejected, not wrap
    data = _bmp(4, 1, 4, [(0, 0, 0), (255, 255, 255)], [[0, 1, 3, 0]])
    assert decode_bmp(data) is None


# ------------------------------------------- frozen non-goal message pins --


def test_arithmetic_jpeg_message_pinned():
    data = bytearray(encode_jpeg12(np.zeros((8, 8), dtype=np.uint16)))
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC9                  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="non-huffman/hierarchical"):
        decode_jpeg(bytes(data))


def test_subbyte_png_message_pinned():
    # minimal 1-bit-depth PNG IHDR; decode must name the frozen non-goal
    import zlib as _z

    def chunk(t: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", _z.crc32(t + body)))

    ihdr = struct.pack(">IIBBBBB", 4, 1, 1, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", _z.compress(b"\x00\xf0"))
           + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="bit depth 1"):
        decode_png(png)

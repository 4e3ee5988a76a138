"""Adam7-interlaced + palette PNG decode (operators/media.py:png_decode_one).

Like tests/test_png_decode.py, this file builds PNGs with its OWN
independent encoder — its Adam7 pass extraction, scanline filtering, and
palette handling share no code with the decoder (only the public PNG
spec, ISO/IEC 15948 §8.2) — so the roundtrips are format checks, not
self-agreement. Covers interlaced streams across all supported color
types and filters, pass-empty tiny geometries, palette images (both
sequential and interlaced), and the honest-None contract for malformed
palette/interlace streams, plus the Spark mapInPandas path."""

import struct
import zlib

import numpy as np
import pytest

from mediacrawler_spark.operators.media import (
    MEDIA_SCHEMA,
    _stdlib_decode,
    decode_media,
    png_decode_one,
)

_SIG = b"\x89PNG\r\n\x1a\n"

# spec §8.2 starting offsets/steps, written down independently here
_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _filter_rows(px: np.ndarray, filters) -> bytearray:
    """Forward-filter an (h, w, c) pass image into filter-prefixed
    scanlines. Independent of the decoder: straight from the spec's
    filter definitions, row by row."""
    h, w, c = px.shape
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        if f == 0:
            enc = line % 256
        elif f == 1:  # Sub
            enc = np.array(
                [(line[x] - (line[x - c] if x >= c else 0)) % 256 for x in range(w * c)]
            )
        elif f == 2:  # Up
            enc = (line - prev) % 256
        elif f == 3:  # Average
            enc = np.array(
                [
                    (line[x] - ((line[x - c] if x >= c else 0) + prev[x]) // 2) % 256
                    for x in range(w * c)
                ]
            )
        else:  # Paeth
            enc = np.zeros(w * c, dtype=np.int32)
            for x in range(w * c):
                a = line[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (line[x] - pred) % 256
        out.append(f)
        out.extend(int(v) for v in enc)
        prev = line
    return out


def _encode_interlaced(px: np.ndarray, color_type: int, filters=(0,), plte=None) -> bytes:
    """Independent Adam7 encoder: extract the seven reduced images by
    slicing, filter each pass on its own (previous row resets to zero),
    concatenate, deflate into one IDAT."""
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    raw = bytearray()
    for (x0, y0, dx, dy) in _PASSES:
        sub = px[y0::dy, x0::dx, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _filter_rows(sub, filters)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _chunk(b"PLTE", plte)
    return chunks + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _encode_sequential(px: np.ndarray, color_type: int, filters=(0,), plte=None) -> bytes:
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _chunk(b"PLTE", plte)
    raw = _filter_rows(px, filters)
    return chunks + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _rng_px(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


def _want_gray(px: np.ndarray, color_type: int) -> np.ndarray:
    if color_type in (0, 4):
        return px[:, :, 0].astype(np.float32) / 255.0
    return (
        px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    ).astype(np.float32) / 255.0


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_interlaced_roundtrip_all_color_types(color_type, channels):
    px = _rng_px(13, 11, channels, seed=10 + color_type)
    dec = png_decode_one(_encode_interlaced(px, color_type, filters=(0, 1, 2, 3, 4)))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (11, 13)
    np.testing.assert_allclose(gray, _want_gray(px, color_type), atol=1e-6)


def test_interlaced_equals_sequential_decode():
    px = _rng_px(16, 16, 3, seed=77)
    seq = png_decode_one(_encode_sequential(px, 2, filters=(4,)))
    inter = png_decode_one(_encode_interlaced(px, 2, filters=(4,)))
    assert seq is not None and inter is not None
    np.testing.assert_array_equal(seq[2], inter[2])


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (5, 7), (7, 5), (8, 1), (1, 8), (9, 9)])
def test_interlaced_tiny_geometries_with_empty_passes(h, w):
    # below 8x8 some Adam7 passes are empty and must contribute no bytes
    px = _rng_px(h, w, 3, seed=h * 16 + w)
    dec = png_decode_one(_encode_interlaced(px, 2, filters=(2, 4)))
    assert dec is not None, (h, w)
    assert (dec[0], dec[1]) == (w, h)
    np.testing.assert_allclose(dec[2], _want_gray(px, 2), atol=1e-6)


@pytest.mark.parametrize("interlaced", [False, True])
def test_palette_roundtrip(interlaced):
    rs = np.random.RandomState(5)
    n_colors = 17
    plte = rs.randint(0, 256, n_colors * 3, dtype=np.uint8).tobytes()
    idx = rs.randint(0, n_colors, (9, 12, 1), dtype=np.uint8)
    enc = _encode_interlaced if interlaced else _encode_sequential
    dec = png_decode_one(enc(idx, 3, filters=(0, 1), plte=plte))
    assert dec is not None
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3).astype(np.float32)
    rgb = pal[idx[:, :, 0]]
    want = (rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114) / 255.0
    np.testing.assert_allclose(dec[2], want, atol=1e-6)


def test_malformed_palette_and_interlace_return_none():
    rs = np.random.RandomState(6)
    plte = rs.randint(0, 256, 8 * 3, dtype=np.uint8).tobytes()
    idx = rs.randint(0, 8, (4, 4, 1), dtype=np.uint8)
    good = _encode_sequential(idx, 3, plte=plte)
    assert png_decode_one(good) is not None
    # palette image without PLTE
    assert png_decode_one(_encode_sequential(idx, 3)) is None
    # index beyond the palette
    oob = idx.copy()
    oob[0, 0, 0] = 200
    assert png_decode_one(_encode_sequential(oob, 3, plte=plte)) is None
    # PLTE length not a multiple of 3
    assert png_decode_one(_encode_sequential(idx, 3, plte=plte[:-1])) is None
    # interlaced stream with a missing pass (truncated deflate payload)
    px = _rng_px(12, 12, 3, seed=8)
    whole = _encode_interlaced(px, 2)
    raw = bytearray()
    for (x0, y0, dx, dy) in _PASSES[:-1]:  # drop the last pass
        sub = px[y0::dy, x0::dx, :]
        if sub.shape[0] and sub.shape[1]:
            raw += _filter_rows(sub, (0,))
    ihdr = struct.pack(">IIBBBBB", 12, 12, 8, 2, 0, 0, 1)
    short = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert png_decode_one(whole) is not None
    assert png_decode_one(short) is None


def test_interlaced_through_spark(spark):
    px = _rng_px(10, 6, 3, seed=21)
    rows = [
        ("png:adam7", "image", _encode_interlaced(px, 2, filters=(3,))),
        ("junk", "image", b"\x89PNGfake0"),
    ]
    got = {
        r["media_ref"]: r
        for r in decode_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA), decoder=_stdlib_decode
        ).collect()
    }
    assert got["png:adam7"]["width"] == 6 and got["png:adam7"]["height"] == 10
    assert len(got["png:adam7"]["feature"]) == 16
    assert got["junk"]["width"] is None

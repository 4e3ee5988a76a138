"""Real PNG decode path (operators/media.py:png_decode_one).

The test builds PNGs with its OWN minimal encoder (zlib + struct — no
shared code with the decoder beyond the format spec), exercising every
color type in the supported subset and every scanline filter, then
asserts pixel-exact recovery. Error inputs (non-PNG, truncated,
malformed-stream) must return None, and the Spark-side _stdlib_decode
must yield real metadata for PNGs next to NULL rows for junk. (Valid
Adam7-interlaced and palette streams are covered separately in
tests/test_png_interlaced.py.)"""

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


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _encode_png(px: np.ndarray, color_type: int, filters=None) -> bytes:
    """Minimal independent PNG encoder: px is HxWxC uint8; one filter
    byte per row (default all 0 = None), applying the chosen filter's
    FORWARD transform so the decoder must invert it."""
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = (filters or [0] * h)[y]
        if f == 0:
            enc = line % 256
        elif f == 1:  # Sub
            enc = np.array([
                (line[x] - (line[x - c] if x >= c else 0)) % 256
                for x in range(w * c)
            ])
        elif f == 2:  # Up
            enc = (line - prev) % 256
        elif f == 3:  # Average
            enc = np.array([
                (line[x] - ((line[x - c] if x >= c else 0) + prev[x]) // 2) % 256
                for x in range(w * c)
            ])
        elif f == 4:  # Paeth
            enc = np.zeros(w * c, dtype=np.int32)
            for x in range(w * c):
                a = line[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (line[x] - pred) % 256
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prev = line
    idat = zlib.compress(bytes(raw))
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _rng_px(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_all_color_types(color_type, channels):
    px = _rng_px(5, 7, channels, seed=color_type)
    dec = png_decode_one(_encode_png(px, color_type))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (7, 5) and gray.shape == (5, 7)
    if color_type in (0, 4):
        want = px[:, :, 0].astype(np.float32) / 255.0
    else:
        want = (
            px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
        ).astype(np.float32) / 255.0
    np.testing.assert_allclose(gray, want, atol=1e-6)


def test_roundtrip_every_filter_type():
    px = _rng_px(5, 6, 3, seed=99)
    for filters in ([1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        dec = png_decode_one(_encode_png(px, 2, filters=filters))
        assert dec is not None, filters
        _w, _h, gray = dec
        want = (
            px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
        ).astype(np.float32) / 255.0
        np.testing.assert_allclose(gray, want, atol=1e-6, err_msg=str(filters))


def test_unsupported_and_corrupt_inputs_return_none():
    px = _rng_px(3, 3, 3, seed=1)
    good = _encode_png(px, 2)
    assert png_decode_one(good) is not None
    assert png_decode_one(b"") is None
    assert png_decode_one(b"\x89PNGfake0") is None  # fixture fake magic
    assert png_decode_one(good[:30]) is None  # truncated
    # interlaced flag set on a sequential stream -> Adam7 layout mismatch
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    assert png_decode_one(bytes(bad)) is None
    # palette color type without PLTE (and wrong stride) -> malformed
    bad2 = bytearray(good)
    bad2[8 + 8 + 9] = 3  # IHDR color_type byte
    assert png_decode_one(bytes(bad2)) is None


def test_stdlib_decode_through_spark(spark):
    px = _rng_px(8, 4, 3, seed=7)
    rows = [
        ("png:real", "image", _encode_png(px, 2)),
        ("junk", "image", b"\x89PNGfake0"),
        ("null", "image", None),
    ]
    got = {
        r["media_ref"]: r
        for r in decode_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA), decoder=_stdlib_decode
        ).collect()
    }
    assert got["png:real"]["width"] == 4 and got["png:real"]["height"] == 8
    assert got["png:real"]["n_frames"] == 1
    assert len(got["png:real"]["feature"]) == 16
    assert all(0.0 <= v <= 1.0 for v in got["png:real"]["feature"])
    assert got["junk"]["width"] is None and got["junk"]["feature"] is None
    assert got["null"]["width"] is None

"""Media resize operator (operators/media.py:resize_media).

The resize path is REAL end-to-end in this container: stdlib PNG decode
→ vectorized bilinear resample → stdlib PNG re-encode, all inside one
mapInPandas. Reference math for the resample is a naive per-pixel loop
written here independently; input PNGs come from the independent
test-side encoder in test_png_decode.py.
"""

import numpy as np
import pytest

from mediacrawler_spark.operators.media import (
    MEDIA_SCHEMA,
    bilinear_resize,
    png_decode_one,
    png_encode_gray,
    resize_media,
)
from test_png_decode import _encode_png


def _naive_bilinear(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Per-pixel loop reference: half-pixel centers, clamped edges."""
    h, w = gray.shape
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for oy in range(out_h):
        sy = min(max((oy + 0.5) * h / out_h - 0.5, 0), h - 1)
        y0 = int(np.floor(sy))
        y1 = min(y0 + 1, h - 1)
        fy = sy - y0
        for ox in range(out_w):
            sx = min(max((ox + 0.5) * w / out_w - 0.5, 0), w - 1)
            x0 = int(np.floor(sx))
            x1 = min(x0 + 1, w - 1)
            fx = sx - x0
            top = gray[y0, x0] * (1 - fx) + gray[y0, x1] * fx
            bot = gray[y1, x0] * (1 - fx) + gray[y1, x1] * fx
            out[oy, ox] = top * (1 - fy) + bot * fy
    return out


@pytest.mark.parametrize("shape", [(7, 11, 4, 6), (5, 5, 12, 9), (6, 4, 6, 4)])
def test_bilinear_matches_naive_reference(shape):
    h, w, out_h, out_w = shape
    rng = np.random.RandomState(h * 100 + w)
    gray = rng.rand(h, w)
    got = bilinear_resize(gray, out_w, out_h)
    want = _naive_bilinear(gray, out_w, out_h)
    assert got.shape == (out_h, out_w)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bilinear_identity_is_exact_copy():
    # scale 1 → sample positions land exactly on source pixels
    rng = np.random.RandomState(3)
    gray = rng.rand(9, 13)
    np.testing.assert_array_equal(bilinear_resize(gray, 13, 9), gray)


def test_resize_media_round_trip(spark):
    """Spark path: real PNG in → resized real PNG out; decoding the
    output reproduces the reference resample exactly (after the same
    uint8 quantization), and junk/NULL blobs yield NULL rows."""
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
    gray8 = rng.randint(0, 256, size=(9, 9, 1), dtype=np.uint8)
    rows = [
        ("png:rgb", "image", bytearray(_encode_png(rgb, 2))),
        ("png:gray", "image", bytearray(_encode_png(gray8, 0))),
        ("junk", "image", bytearray(b"not a png")),
        ("null", "image", None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in resize_media(df, width=6, height=5).collect()}

    assert out["junk"]["data"] is None and out["junk"]["width"] is None
    assert out["null"]["data"] is None

    for ref, src_bytes in [("png:rgb", _encode_png(rgb, 2)), ("png:gray", _encode_png(gray8, 0))]:
        row = out[ref]
        assert (row["width"], row["height"]) == (6, 5)
        dec = png_decode_one(bytes(row["data"]))
        assert dec is not None and (dec[0], dec[1]) == (6, 5)
        # reference: decode source the same way, naive-resample, quantize
        src_gray = png_decode_one(src_bytes)[2]
        want = np.clip(np.rint(_naive_bilinear(src_gray, 6, 5) * 255.0), 0, 255)
        got = np.rint(dec[2] * 255.0)
        np.testing.assert_array_equal(got, want)


def test_resize_media_accepts_jpeg(spark):
    """The resize path dispatches through the PIL-free codec pair: a
    baseline JPEG blob resizes like a PNG one does."""
    from test_jpeg_decode import encode_jpeg

    img = np.full((16, 16), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [("jpg", "image", bytearray(encode_jpeg(img)))], MEDIA_SCHEMA
    )
    row = resize_media(df, width=4, height=4).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    dec = png_decode_one(bytes(row["data"]))
    assert dec is not None and dec[:2] == (4, 4)
    # flat image: resample of a constant is the constant (±1 quantization)
    np.testing.assert_allclose(dec[2] * 255.0, np.full((4, 4), 200.0), atol=1.5)


def test_png_encode_gray_round_trips_through_decoder():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(8, 14), dtype=np.uint8)
    dec = png_decode_one(png_encode_gray(px))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (14, 8)
    np.testing.assert_array_equal(np.rint(gray * 255.0).astype(np.uint8), px)

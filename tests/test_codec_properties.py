"""Property-based tests (hypothesis) for the pure codec/resample
functions behind S7: random images through encode→decode round-trips and
the resample's structural invariants. No Spark — these pin the numpy
kernels the mapInPandas operators batch over."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mediacrawler_spark.operators.jpeg import jpeg_decode_one
from mediacrawler_spark.operators.media import (
    bilinear_resize,
    png_decode_one,
    png_encode_gray,
)


@st.composite
def gray_images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, size=(h, w), dtype=np.uint8)


@given(gray_images())
@settings(max_examples=60, deadline=None)
def test_png_round_trip_pixel_exact(px):
    dec = png_decode_one(png_encode_gray(px))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (px.shape[1], px.shape[0])
    np.testing.assert_array_equal(np.rint(gray * 255.0).astype(np.uint8), px)


@given(gray_images())
@settings(max_examples=30, deadline=None)
def test_jpeg_all_ones_quant_bounded_error(px):
    from test_jpeg_decode import encode_jpeg

    dec = jpeg_decode_one(encode_jpeg(px))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (px.shape[1], px.shape[0])
    # all-ones quant: only DCT rounding — error stays within ~2 levels
    assert np.abs(gray * 255.0 - px).max() <= 2.0


@given(
    gray_images(max_side=16),
    st.integers(1, 20),
    st.integers(1, 20),
)
@settings(max_examples=80, deadline=None)
def test_bilinear_resize_invariants(px, out_w, out_h):
    gray = px.astype(np.float64) / 255.0
    out = bilinear_resize(gray, out_w, out_h)
    assert out.shape == (out_h, out_w)
    # interpolation never leaves the convex hull of the input values
    assert out.min() >= gray.min() - 1e-12
    assert out.max() <= gray.max() + 1e-12
    # a constant image resamples to the same constant
    const = np.full_like(gray, gray.flat[0])
    np.testing.assert_allclose(
        bilinear_resize(const, out_w, out_h), gray.flat[0], atol=1e-12
    )


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_decoders_never_raise_on_garbage(blob):
    assert png_decode_one(blob) is None or blob[:8] == b"\x89PNG\r\n\x1a\n"
    # jpeg: any return at all is fine; must simply not raise
    jpeg_decode_one(blob)

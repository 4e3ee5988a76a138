"""Baseline JPEG decode path (operators/jpeg.py:jpeg_decode_one).

The test builds JPEGs with its OWN minimal baseline encoder (forward
DCT + quantization + canonical Huffman + byte stuffing — no shared code
with the decoder beyond the T.81 spec; the zigzag table is hardcoded
here from the published spec figure while the decoder generates it from
the traversal rule). Covers grayscale, YCbCr 4:4:4 and 4:2:0, restart
markers, 16-bit quant tables, and the honest-None contract for
malformed / truncated / non-JPEG input. (Valid progressive streams are
covered separately in tests/test_jpeg_progressive.py.)
"""

import struct

import numpy as np
import pytest

from mediacrawler_spark.operators.jpeg import jpeg_decode_one

# Published zigzag table (T.81 Figure A.6), raster index per zigzag index.
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else 0.5) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct(block):  # forward orthonormal 2-D DCT
    return _C @ (block - 128.0) @ _C.T


# ----- fixed-length canonical Huffman tables (valid JPEG, trivially so) ----
DC_SYMS = list(range(12))  # categories 0..11, all length 4
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, and every run/size — all length 8


def _huff_spec(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    return counts, codes


DC_COUNTS, DC_CODES = _huff_spec(DC_SYMS, 4)
AC_COUNTS, AC_CODES = _huff_spec(AC_SYMS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_to_byte(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _category(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def _put_coeff(bw, codes, sym, v, t):
    length, code = codes[sym]
    bw.put(code, length)
    if t:
        bw.put(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(bw, coeff_zz, pred):
    """coeff_zz: 64 quantized ints in zigzag order. Returns new DC pred."""
    diff = coeff_zz[0] - pred
    t = _category(diff)
    _put_coeff(bw, DC_CODES, t, diff, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coeff_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = coeff_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            _put_coeff(bw, AC_CODES, 0xF0, 0, 0)
            run -= 16
        t = _category(v)
        _put_coeff(bw, AC_CODES, (run << 4) | t, v, t)
        run = 0
    if last_nz < 63:
        _put_coeff(bw, AC_CODES, 0x00, 0, 0)  # EOB
    return coeff_zz[0]


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(cls, tid, counts, symbols):
    return bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)


def encode_jpeg(img, quant=None, subsample=False, restart=0, q16=False):
    """Minimal baseline encoder. img: HxW (grayscale) or HxWx3 (RGB)
    uint8. quant: 64 ints zigzag order (default all-ones = near-lossless).
    subsample: 4:2:0 chroma when color. restart: DRI interval in MCUs.
    q16: emit the quant table with 16-bit precision."""
    q = np.array(quant if quant is not None else [1] * 64, dtype=np.int32)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for p, (sh, sv) in zip(planes, samp):
        pw, ph = -(-w * sh // hmax), -(-h * sv // vmax)
        if (sh, sv) != (hmax, vmax):  # subsampled: box-mean then pad
            fy, fx = vmax // sv, hmax // sh
            ytr = p[: (p.shape[0] // fy) * fy, : (p.shape[1] // fx) * fx]
            small = ytr.reshape(ytr.shape[0] // fy, fy, ytr.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
            # edge-pad to cover ceil dims
            small = np.pad(
                small,
                ((0, max(0, ph - small.shape[0])), (0, max(0, pw - small.shape[1]))),
                mode="edge",
            )[:ph, :pw]
            p = small
        tw, th = mcux * sh * 8, mcuy * sv * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(p)

    out = bytearray(b"\xff\xd8")
    if q16:
        out += _seg(0xDB, bytes([0x10]) + b"".join(struct.pack(">H", int(v)) for v in q))
    else:
        out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_COUNTS, DC_SYMS))
    out += _seg(0xC4, _dht_body(1, 0, AC_COUNTS, AC_SYMS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart and mcu_i and mcu_i % restart == 0:
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                pred = [0] * ncomp
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        coeff = _fdct(blk).reshape(-1)
                        zz = np.array(
                            [int(np.round(coeff[ZZ[k]] / q[k])) for k in range(64)]
                        )
                        pred[ci] = _encode_block(bw, zz, pred[ci])
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- tests ----


def test_flat_gray_exact():
    img = np.full((16, 24), 100, dtype=np.uint8)
    dec = jpeg_decode_one(encode_jpeg(img))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (24, 16)
    np.testing.assert_allclose(gray * 255.0, img, atol=0.75)


def test_smooth_gradient_near_lossless():
    yy, xx = np.mgrid[0:24, 0:17]
    img = ((yy * 5 + xx * 3) % 200 + 20).astype(np.uint8)
    dec = jpeg_decode_one(encode_jpeg(img))  # all-ones quant
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (17, 24)  # non-multiple-of-8 dims: edge blocks cropped
    np.testing.assert_allclose(gray * 255.0, img, atol=1.5)


def test_noise_with_real_quant_table():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    # Annex K luminance table (published example table)
    q50 = [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
    dec = jpeg_decode_one(encode_jpeg(img, quant=q50))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (32, 32)
    # lossy but bounded: mean error small, everything finite in range
    err = np.abs(gray * 255.0 - img)
    assert err.mean() < 20
    assert gray.min() >= 0 and gray.max() <= 1


def test_color_444_luma_matches_reference():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    want_y = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    )
    dec = jpeg_decode_one(encode_jpeg(rgb))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (16, 16)
    np.testing.assert_allclose(gray * 255.0, want_y, atol=1.5)


def test_color_420_subsampled_luma():
    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 256, size=(24, 20, 3), dtype=np.uint8)
    want_y = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    )
    dec = jpeg_decode_one(encode_jpeg(rgb, subsample=True))
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (20, 24)
    # luma is full-resolution even in 4:2:0 — only chroma is subsampled
    np.testing.assert_allclose(gray * 255.0, want_y, atol=1.5)


def test_restart_markers():
    yy, xx = np.mgrid[0:40, 0:40]
    img = ((yy * 3 + xx * 7) % 230 + 10).astype(np.uint8)
    plain = jpeg_decode_one(encode_jpeg(img))
    rst = jpeg_decode_one(encode_jpeg(img, restart=3))
    assert plain is not None and rst is not None
    np.testing.assert_array_equal(plain[2], rst[2])


def test_16bit_quant_table():
    img = np.full((8, 8), 77, dtype=np.uint8)
    dec = jpeg_decode_one(encode_jpeg(img, q16=True))
    assert dec is not None
    np.testing.assert_allclose(dec[2] * 255.0, img, atol=0.75)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"not a jpeg at all",
        b"\xff\xd8\xff\xd9",  # SOI+EOI, no frame
        None,
    ],
)
def test_rejects_non_jpeg(blob):
    assert jpeg_decode_one(blob) is None


def test_rejects_malformed_and_truncated():
    img = np.full((16, 16), 90, dtype=np.uint8)
    good = encode_jpeg(img)
    # flip SOF0 -> SOF2: the baseline-style full-band scan header (Ss=0,
    # Se=63) is malformed inside a progressive frame — DC scans must
    # carry the DC coefficient alone
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert jpeg_decode_one(bytes(prog)) is None
    # truncate mid-entropy-data
    assert jpeg_decode_one(good[: len(good) // 2]) is None
    # 12-bit precision SOF
    deep = bytearray(good)
    deep[idx + 4] = 12
    assert jpeg_decode_one(bytes(deep)) is None


def test_spark_stdlib_decode_accepts_jpeg(spark):
    """The S7 decode path handles PNG and JPEG blobs side by side with
    NULL rows for junk — through the real mapInPandas plumbing."""
    from mediacrawler_spark.operators.media import MEDIA_SCHEMA, decode_media, _stdlib_decode

    img = np.full((12, 9), 150, dtype=np.uint8)
    rows = [
        ("jpg:flat", "image", bytearray(encode_jpeg(img))),
        ("junk", "image", bytearray(b"zzzz")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in decode_media(df, decoder=_stdlib_decode).collect()}
    assert (out["jpg:flat"]["width"], out["jpg:flat"]["height"]) == (9, 12)
    assert out["jpg:flat"]["n_frames"] == 1
    assert len(out["jpg:flat"]["feature"]) == 16
    assert out["junk"]["width"] is None

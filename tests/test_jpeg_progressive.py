"""Progressive JPEG decode path (operators/jpeg.py, SOF2 branch).

The test builds progressive JPEGs with its OWN minimal encoder — it
reuses the INDEPENDENT baseline building blocks from
tests/test_jpeg_decode.py (hardcoded published zigzag table, own forward
DCT, own canonical-Huffman construction; no shared code with the
decoder) and adds the progressive scan emitters on top: DC first /
refinement scans with the arithmetic-shift point transform, AC first
scans with end-of-band (EOBn) run coding, and AC refinement scans with
newly-significant ±1 insertion, buffered correction bits, and the
ZRL-vs-EOB folding rule (T.81 Annex G). Equality against the baseline
decode of the SAME quantized coefficients is the oracle: spectral
selection and successive approximation are lossless re-orderings of the
entropy data, so the progressive decode must reproduce the baseline
pixels bit-for-bit up to float summation order.
"""

import struct

import numpy as np

from mediacrawler_spark.operators.jpeg import jpeg_decode_one

from test_jpeg_decode import (
    ZZ,
    _fdct,
    _BitWriter,
    _category,
    _put_coeff,
    _seg,
    _dht_body,
    DC_COUNTS,
    DC_SYMS,
    DC_CODES,
    encode_jpeg,
)

# AC table with the full progressive symbol set: EOBn for n=0..14, ZRL,
# and every run/size — all fixed length 8 (176 codes < 255, valid).
ACP_SYMS = [(r << 4) for r in range(16)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
ACP_COUNTS = [0] * 16
ACP_COUNTS[7] = len(ACP_SYMS)
ACP_CODES = {sym: (8, i) for i, sym in enumerate(ACP_SYMS)}


def _coeff_grids(img, q, subsample):
    """Quantized zigzag coefficient grids per component at the
    interleaved-MCU-padded size (same color/pad pipeline as the baseline
    test encoder)."""
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
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids = []
    for p, (sh, sv) in zip(planes, samp):
        pw, ph = -(-w * sh // hmax), -(-h * sv // vmax)
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            ytr = p[: (p.shape[0] // fy) * fy, : (p.shape[1] // fx) * fx]
            small = ytr.reshape(
                ytr.shape[0] // fy, fy, ytr.shape[1] // fx, fx
            ).mean(axis=(1, 3))
            small = np.pad(
                small,
                (
                    (0, max(0, ph - small.shape[0])),
                    (0, max(0, pw - small.shape[1])),
                ),
                mode="edge",
            )[:ph, :pw]
            p = small
        tw, th = mcux * sh * 8, mcuy * sv * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        nby, nbx = th // 8, tw // 8
        g = np.zeros((nby, nbx, 64), dtype=np.int64)
        for byi in range(nby):
            for bxi in range(nbx):
                blk = p[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8]
                coeff = _fdct(blk).reshape(-1)
                g[byi, bxi] = [
                    int(np.round(coeff[ZZ[k]] / q[k])) for k in range(64)
                ]
        grids.append(g)
    return grids, samp, mcux, mcuy, hmax, vmax


class _ScanState:
    """Bit writer + pending end-of-band run and its buffered correction
    bits (refinement bits of already-nonzero coefficients belonging to
    blocks inside the pending EOB run)."""

    def __init__(self):
        self.bw = _BitWriter()
        self.eobrun = 0
        self.corr = []

    def flush(self):
        if self.eobrun:
            n = self.eobrun
            r = n.bit_length() - 1
            _put_coeff(self.bw, ACP_CODES, r << 4, 0, 0)
            if r:
                self.bw.put(n - (1 << r), r)
            self.eobrun = 0
        for b in self.corr:
            self.bw.put(b, 1)
        self.corr = []


def _pt_toward_zero(v, al):
    return (v >> al) if v >= 0 else -((-v) >> al)


def _ac_first_block(st, coef, ss, se, al):
    band = [_pt_toward_zero(int(coef[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(band) if v]
    if not nz:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()
        return
    st.flush()
    r = 0
    for i in range(nz[-1] + 1):
        v = band[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            _put_coeff(st.bw, ACP_CODES, 0xF0, 0, 0)
            r -= 16
        t = _category(v)
        _put_coeff(st.bw, ACP_CODES, (r << 4) | t, v, t)
        r = 0
    if nz[-1] < len(band) - 1:
        st.eobrun += 1


def _ac_refine_block(st, coef, ss, se, al):
    absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
    negs = [int(coef[k]) < 0 for k in range(ss, se + 1)]
    eob_idx = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    r = 0
    br_bits = []  # correction bits since the last emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # ZRLs only where a newly-significant coefficient still follows;
        # trailing zeros fold into the EOB run instead
        while r > 15 and i <= eob_idx:
            st.flush()
            _put_coeff(st.bw, ACP_CODES, 0xF0, 0, 0)
            r -= 16
            for b in br_bits:
                st.bw.put(b, 1)
            br_bits = []
        if t > 1:  # already significant: one correction bit, not in run
            br_bits.append(t & 1)
            continue
        st.flush()
        _put_coeff(st.bw, ACP_CODES, (r << 4) | 1, 0, 0)
        st.bw.put(0 if negs[i] else 1, 1)
        for b in br_bits:
            st.bw.put(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st.eobrun += 1
        st.corr.extend(br_bits)
        if st.eobrun == 0x7FFF:
            st.flush()


def _scan_entropy(
    grids, samp, comp_idxs, ss, se, ah, al, w, h, mcux, mcuy, hmax, vmax,
    restart,
):
    st = _ScanState()
    pred = {ci: 0 for ci in comp_idxs}
    if len(comp_idxs) == 1:
        # non-interleaved: MCU = one block over the component's own
        # ceil(dim/8) grid (the MCU-padding blocks are never coded)
        ci = comp_idxs[0]
        sh, sv = samp[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        units = [
            ((ci, b // nbx, b % nbx),) for b in range(nbx * nby)
        ]
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                u = []
                for ci in comp_idxs:
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            u.append((ci, my * sv + by, mx * sh + bx))
                units.append(tuple(u))
    n_rst = 0
    for i, u in enumerate(units):
        if restart and i and i % restart == 0:
            st.flush()
            st.bw.pad_to_byte()
            st.bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = {ci: 0 for ci in comp_idxs}
        for ci, by, bx in u:
            coef = grids[ci][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: arithmetic-shift point transform
                    v = int(coef[0]) >> al
                    diff = v - pred[ci]
                    t = _category(diff)
                    _put_coeff(st.bw, DC_CODES, t, diff, t)
                    pred[ci] = v
                else:  # DC refinement: one bit
                    st.bw.put((int(coef[0]) >> al) & 1, 1)
            elif ah == 0:
                _ac_first_block(st, coef, ss, se, al)
            else:
                _ac_refine_block(st, coef, ss, se, al)
    st.flush()
    st.bw.pad_to_byte()
    return bytes(st.bw.out)


def encode_progressive(img, quant=None, scans=None, restart=0, subsample=False):
    """Minimal progressive (SOF2) encoder. scans: list of
    (component_index_list, Ss, Se, Ah, Al); default = spectral selection
    only (one interleaved DC scan, one full-band AC scan per comp)."""
    q = np.array(quant if quant is not None else [1] * 64, dtype=np.int64)
    grids, samp, mcux, mcuy, hmax, vmax = _coeff_grids(img, q, subsample)
    ncomp = len(grids)
    h, w = img.shape[:2]
    if scans is None:
        scans = [(list(range(ncomp)), 0, 0, 0, 0)] + [
            ([ci], 1, 63, 0, 0) for ci in range(ncomp)
        ]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_COUNTS, DC_SYMS))
    out += _seg(0xC4, _dht_body(1, 0, ACP_COUNTS, ACP_SYMS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    for comp_idxs, ss, se, ah, al in scans:
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += _scan_entropy(
            grids, samp, comp_idxs, ss, se, ah, al, w, h, mcux, mcuy,
            hmax, vmax, restart,
        )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- tests ----

# Annex K luminance table (published example) — sparsifies coefficients
# so EOB runs, ZRLs, and late-significance refinement paths all occur.
Q50 = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]

SA_SCANS = [  # full successive-approximation script, grayscale
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 0, 0, 1, 0),
    ([0], 1, 5, 2, 1),
    ([0], 6, 63, 2, 1),
    ([0], 1, 5, 1, 0),
    ([0], 6, 63, 1, 0),
]


def _assert_matches_baseline(img, quant=None, **kw):
    base = jpeg_decode_one(encode_jpeg(img, quant=quant))
    prog = jpeg_decode_one(encode_progressive(img, quant=quant, **kw))
    assert base is not None and prog is not None
    assert (prog[0], prog[1]) == (base[0], base[1])
    np.testing.assert_allclose(prog[2], base[2], atol=2e-5)


def test_spectral_selection_equals_baseline():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 17), dtype=np.uint8)
    _assert_matches_baseline(img)


def test_successive_approximation_exact_gradient():
    yy, xx = np.mgrid[0:24, 0:17]
    img = ((yy * 5 + xx * 3) % 200 + 20).astype(np.uint8)
    _assert_matches_baseline(img, scans=SA_SCANS)


def test_successive_approximation_exact_noise_quant():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(40, 33), dtype=np.uint8)
    _assert_matches_baseline(img, quant=Q50, scans=SA_SCANS)


def test_eob_runs_with_extension_bits():
    # mostly-flat image: long cross-block EOB runs (EOBn, n > 16) with
    # a few impulse blocks breaking them
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[5, 5] = 255
    img[40, 60] = 0
    img[63, 1] = 200
    _assert_matches_baseline(img)
    _assert_matches_baseline(img, scans=SA_SCANS)


def test_color_420_progressive_luma():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(24, 20, 3), dtype=np.uint8)
    want_y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    scans = [  # interleaved DC scan, then per-component AC scans
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    dec = jpeg_decode_one(
        encode_progressive(rgb, subsample=True, scans=scans)
    )
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (20, 24)
    np.testing.assert_allclose(gray * 255.0, want_y, atol=1.5)


def test_progressive_restart_markers():
    yy, xx = np.mgrid[0:40, 0:40]
    img = ((yy * 3 + xx * 7) % 230 + 10).astype(np.uint8)
    plain = jpeg_decode_one(encode_progressive(img, scans=SA_SCANS))
    rst = jpeg_decode_one(encode_progressive(img, scans=SA_SCANS, restart=3))
    assert plain is not None and rst is not None
    np.testing.assert_array_equal(plain[2], rst[2])


def test_truncated_or_unterminated_returns_none():
    img = np.full((16, 16), 90, dtype=np.uint8)
    good = encode_progressive(img)
    assert jpeg_decode_one(good) is not None
    assert jpeg_decode_one(good[: len(good) // 2]) is None
    assert jpeg_decode_one(good[:-2]) is None  # scans fine, EOI missing


def test_malformed_progressive_scan_header_rejected():
    img = np.full((16, 16), 90, dtype=np.uint8)
    # DC scan claiming a non-zero Se (baseline-style 0..63 band): invalid
    bad = encode_progressive(img, scans=[([0], 0, 63, 0, 0)])
    assert jpeg_decode_one(bad) is None


def test_spark_stdlib_decode_accepts_progressive(spark):
    from mediacrawler_spark.operators.media import (
        MEDIA_SCHEMA,
        _stdlib_decode,
        decode_media,
    )

    img = np.full((12, 9), 150, dtype=np.uint8)
    rows = [
        ("jpg:prog", "image", bytearray(encode_progressive(img))),
        ("junk", "image", bytearray(b"zzzz")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_ref"]: r
        for r in decode_media(df, decoder=_stdlib_decode).collect()
    }
    assert (out["jpg:prog"]["width"], out["jpg:prog"]["height"]) == (9, 12)
    assert out["jpg:prog"]["n_frames"] == 1
    assert out["junk"]["width"] is None

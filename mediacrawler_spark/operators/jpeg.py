"""Pure stdlib+numpy baseline + progressive JPEG decoder.

Companion to the PNG path (``operators/media.py:png_decode_one``): makes
the S7 codec step REAL for the dominant crawl image format in
environments without PIL (this container). Scope: baseline sequential
DCT (SOF0) AND progressive DCT (SOF2 — spectral selection and
successive approximation, DC/AC first and refinement scans, EOB runs),
8-bit samples, Huffman entropy coding (tables read from the stream's
DHT segments — arbitrary valid tables, not just Annex K), grayscale or
YCbCr with any sampling factors ≤ 4 (4:4:4, 4:2:2, 4:2:0, …),
interleaved and non-interleaved scans, restart markers (DRI / RSTn),
byte stuffing. Returns the LUMA plane as float32 in [0,1] — the same
grayscale contract as the PNG decoder — or ``None`` for anything
outside the subset (arithmetic coding, hierarchical, 12-bit, lossless,
truncated streams): honest NULL, never a guess.

Everything here derives from the public JPEG spec (ITU-T T.81); the
zigzag order and the IDCT basis are generated from their defining
formulas rather than hardcoded, so the independent test-side encoder
(tests/test_jpeg_decode.py, which hardcodes the published zigzag table)
is a real cross-check.
"""

from __future__ import annotations

import numpy as np

__all__ = ["jpeg_decode_one"]


def _zigzag_order() -> np.ndarray:
    """(64,) array: zigzag index -> raster index, from the traversal rule
    (anti-diagonals, alternating direction, starting right-then-down)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            ij = ij[::-1]  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with JPEG byte
    stuffing (FF 00 -> FF); stops at any real marker (FF xx, xx != 0)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos  # byte position in buf
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None  # marker byte hit, if any

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.buf):
            return False
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                return False
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: bitstream exhausted")
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Discard pad bits, consume the expected RSTn marker."""
        self.nbits = 0
        self.bits = 0
        if self.marker is None:
            # marker not yet seen: scan forward over the raw bytes
            while self.pos + 1 < len(self.buf) and not (
                self.buf[self.pos] == 0xFF and self.buf[self.pos + 1] != 0x00
            ):
                self.pos += 1
            if self.pos + 1 >= len(self.buf):
                raise ValueError("jpeg: missing restart marker")
            self.marker = self.buf[self.pos + 1]
        self.pos += 2  # step past the FF Dx pair (_fill never advances it)
        m = self.marker
        self.marker = None
        if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != n % 8:
            raise ValueError("jpeg: bad restart marker")


class _Huffman:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude value (spec F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode_one(data: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode a baseline JPEG. Returns (width, height, HxW float32 luma
    in [0,1]) or None when the blob is not a JPEG this subset covers."""
    try:
        buf = bytes(data or b"")
        if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
            return None
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], _Huffman] = {}  # (class, id) -> table
        frame = None  # (w, h, components)
        progressive = False
        prog_coefs = None  # comp id -> (blocks_y, blocks_x, 64) int32, zigzag
        scans_done = 0
        restart_interval = 0
        pos = 2
        while pos + 2 <= len(buf):
            if buf[pos] != 0xFF:
                return None
            marker = buf[pos + 1]
            if marker == 0xD9:  # EOI
                if progressive and scans_done and prog_coefs is not None:
                    w, h, comps = frame
                    return _reconstruct_progressive(w, h, comps, qt, prog_coefs)
                return None  # baseline: EOI before SOS
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2  # stray RSTn / TEM: parameterless, skip
                continue
            if pos + 4 > len(buf):
                return None
            ln = int.from_bytes(buf[pos + 2 : pos + 4], "big")
            seg = buf[pos + 4 : pos + 2 + ln]
            if len(seg) != ln - 2:
                return None
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    prec, tid = seg[p] >> 4, seg[p] & 0x0F
                    p += 1
                    if prec == 0:
                        tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                            np.float64
                        )
                        p += 64
                    else:
                        tbl = (
                            np.frombuffer(seg[p : p + 128], dtype=">u2")
                            .astype(np.float64)
                        )
                        p += 128
                    if len(tbl) != 64:
                        return None
                    qt[tid] = tbl
            elif marker == 0xC4:  # DHT
                p = 0
                while p + 17 <= len(seg):
                    cls, tid = seg[p] >> 4, seg[p] & 0x0F
                    counts = list(seg[p + 1 : p + 17])
                    n = sum(counts)
                    syms = seg[p + 17 : p + 17 + n]
                    if len(syms) != n:
                        return None
                    huff[(cls, tid)] = _Huffman(counts, syms)
                    p += 17 + n
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                if seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                comps = []
                for i in range(nc):
                    cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
                if w == 0 or h == 0 or nc not in (1, 3):
                    return None
                if any(
                    not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) for c in comps
                ):
                    return None
                frame = (w, h, comps)
                progressive = marker == 0xC2
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/arithmetic/lossless frame types
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS — entropy-coded data follows
                if frame is None:
                    return None
                w, h, comps = frame
                ns = seg[0]
                sel = {}  # insertion order = scan component order
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    sel[cs] = (tt >> 4, tt & 0x0F)
                if not progressive:
                    if ns != len(comps):
                        return None
                    for c in comps:
                        if c["id"] not in sel:
                            return None
                        c["dc"], c["ac"] = sel[c["id"]]
                    return _decode_scan(
                        buf, pos + 2 + ln, w, h, comps, qt, huff,
                        restart_interval,
                    )
                # progressive: one of possibly many scans
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if ss == 0:
                    if se != 0:
                        return None  # DC scan must be the DC coeff alone
                else:
                    if ns != 1 or se < ss or se > 63:
                        return None  # AC scans are single-component
                if ah > 13 or al > 13:
                    return None
                by_id = {c["id"]: c for c in comps}
                scan_comps = []
                for cs, (dc_id, ac_id) in sel.items():
                    c = by_id.get(cs)
                    if c is None:
                        return None
                    c["dc"], c["ac"] = dc_id, ac_id
                    if ss == 0 and ah == 0 and (0, dc_id) not in huff:
                        return None
                    if ss > 0 and (1, ac_id) not in huff:
                        return None
                    scan_comps.append(c)
                if prog_coefs is None:
                    prog_coefs = _alloc_prog_coefs(w, h, comps)
                pos = _progressive_scan(
                    buf, pos + 2 + ln, w, h, comps, scan_comps,
                    ss, se, ah, al, huff, prog_coefs, restart_interval,
                )
                scans_done += 1
                continue
            # APPn / COM / anything else: skip
            pos += 2 + ln
        return None
    except Exception:
        return None


def _decode_scan(buf, start, w, h, comps, qt, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        if c["tq"] not in qt:
            raise ValueError("jpeg: missing quant table")
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise ValueError("jpeg: missing huffman table")
    br = _BitReader(buf, start)
    pred = {c["id"]: 0 for c in comps}
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.align_and_expect_rst(n_rst)
                n_rst += 1
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tbl = huff[(0, c["dc"])]
                ac_tbl = huff[(1, c["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = dc_tbl.decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tbl.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[_ZIGZAG] = zz * q
                        blk = _DCT.T @ coeff.reshape(8, 8) @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk
    # luma = first component; upsample to full res if subsampled
    c0 = comps[0]
    luma = planes[c0["id"]]
    if c0["h"] != hmax or c0["v"] != vmax:
        luma = np.repeat(
            np.repeat(luma, vmax // c0["v"], axis=0), hmax // c0["h"], axis=1
        )
    luma = np.clip(luma[:h, :w], 0, 255).astype(np.float32)
    return w, h, luma / 255.0


# ---------------------------------------------------- progressive (SOF2) ----
# T.81 Annex G: each SOS covers one spectral band [Ss, Se] at one
# successive-approximation level (Ah = previous Al, Al = this scan's bit
# position). Coefficients accumulate across scans in zigzag order and are
# dequantized + IDCT'd once at EOI.


def _alloc_prog_coefs(w, h, comps):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _ac_first(br, tbl, coef, ss, se, al, eobrun):
    """Decode one block of an AC first scan (Ah=0): run/size coding with
    end-of-band runs (EOBn symbols: run of 2^r + r extension bits blocks
    whose band is entirely zero from here on). Returns the new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = tbl.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("jpeg: AC band overflow")
        coef[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, tbl, coef, ss, se, al, eobrun):
    """Decode one block of an AC refinement scan (Ah=Al+1): newly
    significant coefficients arrive as run/1 symbols with a sign bit;
    already-nonzero coefficients consume one correction bit each as the
    run advances past them (they do not count toward the run length)."""
    p1 = 1 << al

    def correct(k_):
        if br.read_bit() and (coef[k_] & p1) == 0:
            coef[k_] += p1 if coef[k_] >= 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = tbl.decode(br)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: refinement size != 1")
                newval = p1 if br.read_bit() else -p1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("jpeg: AC band overflow")
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # rest of the band: correction bits only
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    buf, start, w, h, comps, scan_comps, ss, se, ah, al, huff, coefs,
    restart_interval,
):
    """Decode one progressive scan's entropy data into ``coefs``; returns
    the byte offset of the next marker after the scan."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(scan_comps) == 1:
        # non-interleaved: MCU = one block, over the component's own
        # ceil(dim/8) grid (interleaved-grid padding blocks stay uncoded)
        c = scan_comps[0]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        total = nbx * nby

        def mcu_blocks(i):
            return ((c, i // nbx, i % nbx),)

    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        total = mcux * mcuy

        def mcu_blocks(i):
            my, mx = divmod(i, mcux)
            return tuple(
                (c, my * c["v"] + by, mx * c["h"] + bx)
                for c in scan_comps
                for by in range(c["v"])
                for bx in range(c["h"])
            )

    br = _BitReader(buf, start)
    pred = {c["id"]: 0 for c in scan_comps}
    eobrun = 0
    n_rst = 0
    for i in range(total):
        if restart_interval and i and i % restart_interval == 0:
            br.align_and_expect_rst(n_rst)
            n_rst += 1
            pred = {c["id"]: 0 for c in scan_comps}
            eobrun = 0
        for c, by, bx in mcu_blocks(i):
            coef = coefs[c["id"]][by, bx]
            if ss == 0:
                if ah == 0:  # DC first: diff-coded, point transform << Al
                    t = huff[(0, c["dc"])].decode(br)
                    pred[c["id"]] += _extend(br.receive(t), t)
                    coef[0] = pred[c["id"]] << al
                elif br.read_bit():  # DC refinement: one bit per block
                    coef[0] |= 1 << al
            else:
                tbl = huff[(1, c["ac"])]
                if ah == 0:
                    eobrun = _ac_first(br, tbl, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, tbl, coef, ss, se, al, eobrun)
    if br.marker is not None:
        return br.pos  # _fill stopped ON the marker's FF byte
    p = br.pos
    while p + 1 < len(buf):
        if buf[p] == 0xFF and buf[p + 1] != 0x00:
            return p
        p += 1
    return len(buf)


def _reconstruct_progressive(w, h, comps, qt, coefs):
    """Dequantize + IDCT the accumulated luma coefficients (vectorized
    over all blocks at once) and crop to the frame size."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    c0 = comps[0]
    if c0["tq"] not in qt:
        raise ValueError("jpeg: missing quant table")
    zz = coefs[c0["id"]].astype(np.float64) * qt[c0["tq"]]
    raster = np.zeros_like(zz)
    raster[..., _ZIGZAG] = zz
    nby, nbx = raster.shape[:2]
    blocks = raster.reshape(nby, nbx, 8, 8)
    spat = np.einsum("ka,ijkl,lb->ijab", _DCT, blocks, _DCT) + 128.0
    plane = spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    if c0["h"] != hmax or c0["v"] != vmax:
        plane = np.repeat(
            np.repeat(plane, vmax // c0["v"], axis=0), hmax // c0["h"], axis=1
        )
    luma = np.clip(plane[:h, :w], 0, 255).astype(np.float32)
    return w, h, luma / 255.0

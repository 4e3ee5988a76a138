"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media columns.

The Spark-side plumbing is real and tested — schema, partitioning,
``mapInPandas`` batch shape, Arrow transfer. The codec step: PIL is used
automatically if importable (general formats); without it, pure
stdlib+numpy decoders handle the two dominant crawl image formats for
REAL — PNG (``png_decode_one``: zlib inflate + scanline unfiltering,
8-bit gray/RGB/palette/GA/RGBA, sequential or Adam7) and baseline +
progressive JPEG
(``operators/jpeg.py``: Huffman + dequant + IDCT, grayscale/YCbCr, any
sampling, restart markers) — and anything else decodes to NULL
metadata. ``_fake_decode`` (deterministic byte-math stand-in) remains
for the SQL-reproducible driver oracle. Uncompressed RIFF WAV audio
decodes for real too (``wav_decode_one``: PCM/float subtypes → mono +
RMS-envelope feature); compressed audio/video codecs stay out of scope
for this container (no ffmpeg) — frame-sampling plans operate on
metadata only.

Media rows mirror SURVEY S7/K4: the crawl engine stores ``media_ref``
spans; a downstream pipeline joins refs to fetched blobs in this table.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mediacrawler_spark.operators.fanout import pin_parallelism

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image | video | audio
        T.StructField("data", T.BinaryType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_FEATURE_DIM = 16


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a real codec: metadata + feature vector
    derived from the blob bytes. Replaced wholesale in production."""
    out = []
    for ref, mtype, data in zip(pdf["media_ref"], pdf["media_type"], pdf["data"]):
        b = np.frombuffer(data or b"\x00", dtype=np.uint8)
        h = int(b[: min(len(b), 64)].sum())
        feat = (
            np.resize(b.astype(np.float32), _FEATURE_DIM) / 255.0
            if len(b)
            else np.zeros(_FEATURE_DIM, dtype=np.float32)
        )
        out.append(
            {
                "media_ref": ref,
                "media_type": mtype,
                "width": 16 + h % 1024,
                "height": 16 + (h // 7) % 1024,
                "n_frames": 1 if mtype == "image" else 1 + h % 300,
                "feature": feat.tolist(),
            }
        )
    return pd.DataFrame(out)


def _pil_decode(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
    from io import BytesIO

    from PIL import Image

    out = []
    for ref, mtype, data in zip(pdf["media_ref"], pdf["media_type"], pdf["data"]):
        try:
            img = Image.open(BytesIO(data))
            arr = np.asarray(img.convert("L").resize((4, 4)), dtype=np.float32)
            out.append(
                {
                    "media_ref": ref,
                    "media_type": mtype,
                    "width": img.width,
                    "height": img.height,
                    "n_frames": getattr(img, "n_frames", 1),
                    "feature": (arr.flatten() / 255.0).tolist(),
                }
            )
        except Exception:
            out.append(
                {
                    "media_ref": ref,
                    "media_type": mtype,
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "feature": None,
                }
            )
    return pd.DataFrame(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type (8-bit; type 3 = palette indices)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, ch: int):
    """Reverse the five PNG scanline filters over ``h`` rows of ``stride``
    bytes starting at ``raw[off]`` (each row prefixed by its filter byte).
    Returns ``(rows as (h, stride) uint8, offset after the last row)``;
    raises on an unknown filter type. Shared by the sequential path and
    each Adam7 pass (a pass restarts with a zero previous row)."""
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[off : off + stride + 1]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev) % 256
            line = line.astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError("png: unknown filter type")
        img[y] = line
        prev = line
        off += stride + 1
    return img, off


def png_decode_one(data: bytes) -> tuple[int, int, np.ndarray] | None:
    """Pure-stdlib PNG decoder (zlib + numpy): 8-bit depth, color types
    gray/RGB/palette/gray-alpha/RGBA, sequential AND Adam7-interlaced,
    all five scanline filters.

    Exists so the 'codec step' is REAL for the most common crawl image
    format even in environments without PIL (this container) — the
    import-gated PIL path remains the general codec. Returns
    (width, height, HxW float32 grayscale in [0,1]) or None when the
    blob is not a PNG this subset covers (sub-8/16-bit depths,
    truncated)."""
    import zlib

    if not data or not bytes(data).startswith(_PNG_SIG):
        return None
    buf = bytes(data)
    pos, idat, ihdr, plte = len(_PNG_SIG), [], None, None
    try:
        while pos + 8 <= len(buf):
            ln = int.from_bytes(buf[pos : pos + 4], "big")
            typ = buf[pos + 4 : pos + 8]
            body = buf[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                return None
            if typ == b"IHDR":
                ihdr = body
            elif typ == b"PLTE":
                plte = body
            elif typ == b"IDAT":
                idat.append(body)
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + body + crc
        if ihdr is None or not idat:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
        if bit_depth != 8 or interlace not in (0, 1) or color_type not in _PNG_CHANNELS:
            return None
        ch = _PNG_CHANNELS[color_type]
        raw = zlib.decompress(b"".join(idat))
        if interlace == 0:
            stride = w * ch
            if len(raw) != h * (stride + 1):
                return None
            img, _ = _png_unfilter(raw, 0, h, stride, ch)
            px = img.reshape(h, w, ch)
        else:
            # Adam7: seven independently-filtered reduced images, scanline
            # streams concatenated in pass order; empty passes emit nothing
            dims = [
                ((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
                for (x0, y0, dx, dy) in _ADAM7
            ]
            expect = sum(ph * (pw * ch + 1) for pw, ph in dims if pw > 0 and ph > 0)
            if len(raw) != expect:
                return None
            px = np.zeros((h, w, ch), dtype=np.uint8)
            off = 0
            for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
                if pw <= 0 or ph <= 0:
                    continue
                sub, off = _png_unfilter(raw, off, ph, pw * ch, ch)
                px[y0::dy, x0::dx, :] = sub.reshape(ph, pw, ch)
        if color_type == 3:  # palette indices -> RGB triples
            if plte is None or len(plte) % 3 != 0:
                return None
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            idx = px[:, :, 0]
            if int(idx.max(initial=0)) >= pal.shape[0]:
                return None
            px = pal[idx]
        px = px.astype(np.float32)
        if color_type in (0, 4):
            gray = px[:, :, 0]  # luminance channel; alpha ignored
        else:  # RGB / palette-RGB / RGBA: ITU-R 601-2 luma
            gray = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
        return w, h, gray / 255.0
    except Exception:
        return None


def png_encode_gray(gray: np.ndarray) -> bytes:
    """Encode an HxW uint8 grayscale array as an 8-bit grayscale PNG
    (filter-0 rows, single IDAT) — the inverse of ``png_decode_one`` for
    color type 0. Shared by the resize operator and the word-cloud sink."""
    import struct
    import zlib

    h, w = gray.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def bilinear_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample of an HxW float array to
    (out_h, out_w). Half-pixel-center sampling (the OpenCV/PIL
    convention: src = (dst + 0.5) * scale - 0.5), edges clamped."""
    h, w = gray.shape
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = gray[y0][:, x0] * (1 - wx) + gray[y0][:, x1] * wx
    bot = gray[y1][:, x0] * (1 - wx) + gray[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image blobs to ``width`` × ``height`` via ``mapInPandas``:
    decode (stdlib PNG/baseline-JPEG — or PIL when present for general
    formats), bilinear resample, re-encode as grayscale PNG. Undecodable
    blobs come back with NULL dims/data (honest, same contract as decode).

    Same skew treatment as ``decode_media``: repartition by media_ref
    hash first, because cost follows bytes, not rows."""
    try:  # pragma: no cover - PIL absent in this container
        from io import BytesIO

        from PIL import Image

        def _load(data: bytes) -> np.ndarray | None:
            try:
                img = Image.open(BytesIO(data)).convert("L")
                return np.asarray(img, dtype=np.float32) / 255.0
            except Exception:
                return None

    except ImportError:

        def _load(data: bytes) -> np.ndarray | None:
            dec = _decode_any(data)
            return None if dec is None else dec[2]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for ref, mtype, data in zip(
                pdf["media_ref"], pdf["media_type"], pdf["data"]
            ):
                gray = _load(data) if data is not None else None
                if gray is None:
                    out.append(
                        {"media_ref": ref, "media_type": mtype, "width": None,
                         "height": None, "data": None}
                    )
                else:
                    small = bilinear_resize(gray, width, height)
                    px = np.clip(np.rint(small * 255.0), 0, 255).astype(np.uint8)
                    out.append(
                        {"media_ref": ref, "media_type": mtype, "width": width,
                         "height": height, "data": png_encode_gray(px)}
                    )
            yield pd.DataFrame(out)

    src = media.repartition(F.xxhash64("media_ref"))
    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


def _gray_feature(gray: np.ndarray, grid: int = 4) -> list[float]:
    """grid×grid block-mean pooling of a grayscale image → flat feature."""
    h, w = gray.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros((grid, grid), dtype=np.float32)
    for i in range(grid):
        for j in range(grid):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = float(block.mean()) if block.size else 0.0
    return out.flatten().tolist()


def average_hash(decoded: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """Perceptual average-hash (aHash) over the decoded ``feature`` grid —
    the hash production image-dedup pipelines group on (each bit says
    "this block is brighter than the image mean"; identical/near-identical
    images collide, so a plain hash-equality groupBy replaces any pairwise
    image comparison at scale).

    The reference stores every fetched image unconditionally (SURVEY S7 /
    K4); this is the downstream keep-one step a training pipeline adds.

    Exactness contract: features are byte-derived (b/255 per channel
    block), and ``round(feature*255)`` recovers the integer exactly, so
    the bit rule is carried out in pure integer arithmetic
    (``dim*v_i > sum(v)`` — strictly-greater, ties fall to 0) and any SQL
    engine reproduces the hash bit-for-bit. Pure column expressions
    (whole-stage codegen): no UDF, no shuffle — the groupBy its caller
    adds is the only exchange.
    """
    ints = F.transform(
        F.col("feature"), lambda x: F.round(x * F.lit(255.0)).cast("long")
    )
    df = decoded.withColumn("_ah_ints", ints).withColumn(
        "_ah_total",
        F.aggregate("_ah_ints", F.lit(0).cast("long"), lambda a, x: a + x),
    )
    bits = [
        F.when(
            F.try_element_at("_ah_ints", F.lit(i + 1)) * dim > F.col("_ah_total"),
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(dim)
    ]
    ahash = bits[0]
    for b in bits[1:]:
        ahash = ahash + b
    return df.withColumn(
        "ahash", F.when(F.col("feature").isNotNull(), ahash)
    ).drop("_ah_ints", "_ah_total")


def ahash_near_pairs(
    hashed: DataFrame, max_hamming: int = 2, dim: int = _FEATURE_DIM
) -> DataFrame:
    """Near-duplicate image groups: hamming-≤k pairs between DISTINCT
    aHash values (the pHash near-match step production photo dedup runs
    on top of exact-hash grouping).

    Scale shape: exact-equal images already collapsed to one group per
    hash (``average_hash`` + groupBy), so near-dup merging only needs
    the distinct hash VALUES — at most 2^dim rows and in practice the
    group count — and the corpus never re-enters the join. Candidates
    come from the pigeonhole split into max_hamming+1 bit chunks (any
    pair within hamming ≤ k leaves at least one chunk untouched, so an
    equi-join on (chunk_id, chunk_value) finds every true pair — same
    guarantee as the simhash splits, operators/text_dedup.py); exact
    ``bit_count(xor)`` verifies. Returns (hash_a, hash_b, hamming) with
    hash_a < hash_b.
    """
    n_chunks = max_hamming + 1
    width = (dim + n_chunks - 1) // n_chunks
    mask = (1 << width) - 1
    hs = hashed.select("ahash").where(F.col("ahash").isNotNull()).distinct()
    parts = [
        hs.select(
            "ahash",
            F.lit(c).alias("chunk_id"),
            F.shiftright("ahash", c * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
        )
        for c in range(n_chunks)
    ]
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    # fan-out join: pin the probe side's parallelism (see fanout.py)
    a = pin_parallelism(cand, "chunk_id", "chunk_val").alias("a")
    b = cand.alias("b")
    pairs = (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("a.ahash") < F.col("b.ahash"))
        .select(F.col("a.ahash").alias("hash_a"), F.col("b.ahash").alias("hash_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("hash_a").bitwiseXOR(F.col("hash_b"))).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
    )


def wav_decode_one(data: bytes) -> tuple[int, np.ndarray] | None:
    """Pure-stdlib WAV (RIFF) decoder: PCM 8/16/24/32-bit and IEEE
    float32, any channel count (averaged to mono). Returns
    (sample_rate, mono float32 in [-1, 1]) or None when the blob is not
    a WAV this subset covers — the audio analog of the PNG/JPEG paths,
    so the S7 audio branch is REAL too (compressed audio stays out of
    scope for this container: no codecs)."""
    import struct

    try:
        buf = bytes(data or b"")
        if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
            return None
        pos, fmt, raw = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            ln = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                return None
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                raw = body
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if fmt is None or raw is None:
            return None
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if n_ch < 1 or rate < 1:
            return None
        if audio_fmt == 1 and bits == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif audio_fmt == 1 and bits == 16:
            x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.float32)
            x /= 32768.0
        elif audio_fmt == 1 and bits == 24:
            b3 = np.frombuffer(raw[: len(raw) // 3 * 3], dtype=np.uint8).reshape(-1, 3)
            x = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif audio_fmt == 1 and bits == 32:
            x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4").astype(np.float32)
            x /= float(1 << 31)
        elif audio_fmt == 3 and bits == 32:
            x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<f4").astype(np.float32)
        else:
            return None
        n = (len(x) // n_ch) * n_ch
        if n == 0:
            return None
        mono = x[:n].reshape(-1, n_ch).mean(axis=1)
        return rate, np.clip(mono, -1.0, 1.0)
    except Exception:
        return None


def _audio_feature(mono: np.ndarray, bins: int = _FEATURE_DIM) -> list[float]:
    """bins-segment RMS envelope of a mono signal — the audio analog of
    the image block-mean feature (same dimensionality, so decoded rows
    share one feature space downstream)."""
    edges = np.linspace(0, len(mono), bins + 1).astype(int)
    out = []
    for i in range(bins):
        seg = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    return out


def _decode_any(data: bytes) -> tuple[int, int, np.ndarray] | None:
    """PIL-free codec dispatch: PNG subset, then baseline + progressive JPEG — the two
    dominant crawl image formats, both decoded for REAL."""
    from mediacrawler_spark.operators.jpeg import jpeg_decode_one

    dec = png_decode_one(data)
    if dec is None:
        dec = jpeg_decode_one(data)
    return dec


def _stdlib_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """PIL-free decoder: REAL decode for the supported PNG subset,
    baseline + progressive JPEG, and RIFF WAV audio; NULL metadata for anything else
    (honest 'undecodable', same contract as _pil_decode's failure
    branch). Audio rows carry NULL width/height, n_frames = sample
    count, and the RMS-envelope feature."""
    out = []
    for ref, mtype, data in zip(pdf["media_ref"], pdf["media_type"], pdf["data"]):
        dec = _decode_any(data) if data is not None else None
        if dec is not None:
            w, h, gray = dec
            out.append(
                {"media_ref": ref, "media_type": mtype, "width": w,
                 "height": h, "n_frames": 1, "feature": _gray_feature(gray)}
            )
            continue
        wav = wav_decode_one(data) if data is not None else None
        if wav is not None:
            _rate, mono = wav
            out.append(
                {"media_ref": ref, "media_type": mtype, "width": None,
                 "height": None,
                 "n_frames": int(min(len(mono), 2**31 - 1)),
                 "feature": _audio_feature(mono)}
            )
        else:
            out.append(
                {"media_ref": ref, "media_type": mtype, "width": None,
                 "height": None, "n_frames": None, "feature": None}
            )
    return pd.DataFrame(out)


def default_decoder() -> Callable[[pd.DataFrame], pd.DataFrame]:
    try:  # general codec if available; stdlib PNG subset otherwise
        import PIL  # noqa: F401

        return _pil_decode
    except ImportError:
        return _stdlib_decode


def decode_media(
    media: DataFrame,
    decoder: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media blobs via ``mapInPandas``.

    Repartitions by media_ref hash first so huge blobs spread evenly
    (decode cost ∝ bytes, not rows — the usual skew source for media)."""
    decoder = decoder or default_decoder()
    src = media.repartition(
        *([partitions] if partitions else []), F.xxhash64("media_ref")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decoder(pdf)

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index.
    The decode of the actual frame bytes is the stubbed codec step; the
    explode/plumbing (what Spark schedules at scale) is real."""
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("media_ref", "frame_idx", "width", "height")
    )


def audio_energy(
    decoded: DataFrame,
    samples_col: str = "samples",
    silence_abs: int = 10,
    clip_abs: int = 60,
) -> DataFrame:
    """Integer-exact audio quality stats over a PCM sample array column
    — the audio filter pass a training pipeline runs before keeping a
    clip (trim/drop silence, flag clipping), the audio analog of the
    image aHash/quality stages.

    Input: ``samples_col`` is ``array<int>`` integer PCM (any bit depth
    whose values fit an int; ``wav_decode_one``'s float mono converts
    back exactly via round(mono·2^15) for 16-bit sources — pinned in
    tests). All stats are EXACT integer arithmetic, so any engine
    reproduces them bit-for-bit; the one ratio divides once at the end:

    - ``n_samples``     — sample count (bigint)
    - ``energy``        — Σ s² (bigint; 16-bit samples overflow only
      past ~8·10^9 samples ≈ 54 h at 44.1 kHz per clip)
    - ``peak_abs``      — max |s| (bigint; 0 for empty)
    - ``silence_n``     — #{ |s| < silence_abs }
    - ``clip_n``        — #{ |s| >= clip_abs }
    - ``silence_ratio`` — silence_n / n_samples, rounded 6dp (0.0 when
      empty)

    Scale shape: every stat is a per-row higher-order-function column
    expression (codegen) — no shuffle, no UDF, no per-row Python; the
    sample arrays never leave their scan partition.
    """
    s = F.col(samples_col)
    big = lambda c: c.cast("bigint")  # noqa: E731
    n = big(F.size(s))
    energy = F.aggregate(
        s, F.lit(0).cast("bigint"), lambda acc, x: acc + big(x) * big(x)
    )
    peak = F.coalesce(big(F.array_max(F.transform(s, F.abs))), F.lit(0).cast("bigint"))
    silence_n = big(F.size(F.filter(s, lambda x: F.abs(x) < F.lit(silence_abs))))
    clip_n = big(F.size(F.filter(s, lambda x: F.abs(x) >= F.lit(clip_abs))))
    ratio = F.when(
        n > 0, F.round(silence_n.cast("double") / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return decoded.select(
        "*",
        n.alias("n_samples"),
        energy.alias("energy"),
        peak.alias("peak_abs"),
        silence_n.alias("silence_n"),
        clip_n.alias("clip_n"),
        ratio.alias("silence_ratio"),
    )


def scene_changes(
    frames: DataFrame,
    video_col: str = "media_ref",
    idx_col: str = "frame_idx",
    hash_col: str = "frame_hash",
    max_same_scene_hamming: int = 2,
) -> DataFrame:
    """Scene-boundary detection over per-frame perceptual hashes — the
    shot-segmentation pass a video training pipeline runs after frame
    sampling (keyframe selection, per-scene captioning, dedup of static
    shots). A frame starts a new scene when its hash differs from the
    previous sampled frame's by MORE than ``max_same_scene_hamming``
    bits (aHash-style hashes move a few bits under noise/compression
    within a shot and many bits across a cut).

    Input: one row per (video, sampled frame) with an integer
    perceptual hash — in production the aHash of the decoded frame
    (``block_features`` → the exact-integer bit rule, same as image
    dedup); any bigint hash column works. The first sampled frame of a
    video always opens scene 1. Output: every frame row plus
    ``hamming`` (vs previous frame, NULL on the first), ``is_cut``
    (int 0/1), and ``scene_id`` (1-based running cut count — an exact
    integer prefix sum). All arithmetic is ``bit_count(xor)`` and a
    running sum of 0/1 — bit-identical on any engine.

    Scale shape: ONE exchange on the video key; both windows (lag +
    running sum) share the per-video sort; no joins, no UDF. Frame
    counts per video are bounded by duration/sample-rate, so per-key
    groups stay small at any corpus size.
    """
    w = Window.partitionBy(video_col).orderBy(F.col(idx_col).asc())
    prev = F.lag(hash_col).over(w)
    ham = F.when(
        prev.isNotNull(),
        F.bit_count(F.col(hash_col).bitwiseXOR(prev)),
    ).cast("int")
    cut = F.when(
        ham.isNotNull() & (ham > int(max_same_scene_hamming)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(video_col).orderBy(F.col(idx_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return frames.select(
        video_col,
        idx_col,
        hash_col,
        ham.alias("hamming"),
        cut.cast("int").alias("is_cut"),
        (F.sum(cut).over(run) + F.lit(1)).cast("bigint").alias("scene_id"),
    )

"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` media columns.

The Spark-side plumbing is real and tested — schema, partitioning,
``mapInPandas`` batch shape, Arrow transfer. The *codec* step is stubbed:
this container has no image/audio libraries, so the default decoder is a
deterministic fake (derives metadata/features from the bytes themselves);
a real deployment passes ``decoder=`` backed by PIL/ffmpeg. Import-gated:
if PIL is present it is used automatically for images.

Media rows mirror SURVEY S7/K4: the crawl engine stores ``media_ref``
spans; a downstream pipeline joins refs to fetched blobs in this table.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def default_decoder() -> Callable[[pd.DataFrame], pd.DataFrame]:
    try:  # real codec if available; deterministic fake otherwise
        import PIL  # noqa: F401

        return _pil_decode
    except ImportError:
        return _fake_decode


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

"""Streaming equivalents of the frontier operators (SURVEY §2.11).

Mapping table (engine epoch concept → Structured Streaming):
- frontier epochs        → micro-batches
- URL-seen dedup         → ``dropDuplicatesWithinWatermark`` on url_hash
                           (bounded state; the batch engine's bloom+anti-join
                           is the unbounded-history version)
- politeness budget      → windowed per-host counts (enforcement hook:
                           ``maxOffsetsPerTrigger`` / per-batch budget)
- retry backoff          → event-time windows on ``not_before`` timestamps

These are genuine ``readStream``-composable transforms, smoke-tested with
the memory sink in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.functions.urls import canonicalize_urls, host_of


def streaming_candidates(urls: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Canonicalize + key a stream of (ts, url) rows — the admission head
    of the pipeline, streaming-safe (stateless projections only)."""
    return (
        urls.withColumn("url", canonicalize_urls(F.col("url")))
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", host_of(F.col("url")))
    )


def streaming_dedup(candidates: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes") -> DataFrame:
    """URL-seen dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; the Iceberg/bloom layer remains the
    unbounded ground truth downstream (exactly the reference's
    query-before-insert contract, stream-shaped)."""
    return candidates.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )


def streaming_host_rate(candidates: DataFrame, ts_col: str = "ts",
                        window: str = "1 minute") -> DataFrame:
    """Per-host fetch-rate accounting — the politeness budget's streaming
    face: window counts feed a rate limiter (or alerting on quota burn)."""
    return (
        candidates.withWatermark(ts_col, "10 minutes")
        .groupBy(F.window(ts_col, window).alias("w"), F.col("host"))
        .agg(F.count("*").alias("n_urls"))
        .select(F.col("w.start").alias("w_start"), "host", "n_urls")
    )

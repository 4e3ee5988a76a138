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


def streaming_budget_limiter(
    candidates: DataFrame, budget_per_host: int = 5
) -> DataFrame:
    """Custom stateful operator: per-host cumulative fetch budget across
    the whole stream — the politeness cap as ``applyInPandasWithState``.
    State = rows already admitted for the host; rows beyond the budget are
    dropped. (The reference's semaphore+sleep envelope, stream-shaped.)
    """
    import pandas as pd

    def limit(key, pdfs, state):
        (host,) = key
        used = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "seq", "url_hash"], kind="mergesort")
            room = budget_per_host - used
            if room > 0:
                take = pdf.head(room)
                used += len(take)
                out.append(take[["host", "url", "url_hash", "priority", "seq"]])
        state.update((used,))
        if out:
            yield pd.concat(out)

    return (
        candidates.select("host", "url", "url_hash", "priority", "seq")
        .groupBy("host")
        .applyInPandasWithState(
            limit,
            outputStructType="host string, url string, url_hash long, priority int, seq long",
            stateStructType="used int",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
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

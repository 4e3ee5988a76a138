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


def streaming_incremental_admission(
    source: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket: int = 1 << 20,
    query_name: str = "incremental_admission",
):
    """The ADMISSION PIPELINE as a stream: every micro-batch of fetched
    documents is classified against the ACCUMULATED accepted corpus
    (``text_dedup.dedup_incremental``: exact fingerprint / near
    shingle-Jaccard / unique), its decisions are appended to
    ``<state_dir>/decisions`` (with the micro-batch id), and only the
    unique docs join ``<state_dir>/corpus`` — the foreachBatch face of
    the engine's per-epoch seen-dedup loop, with document-level
    semantics instead of URL-level.

    foreachBatch is the right tool (not a stateful operator): the
    per-batch work is a full batch dataflow (cross-frame LSH + joins)
    over an out-of-band corpus table, exactly the Iceberg-append
    pattern a production ingestion stream runs. Batches run
    SEQUENTIALLY, so the decisions are a deterministic function of the
    batch arrival order — the caller pins that order (file mtimes) and
    the entry-harness oracle replays the same sequential process in
    SQL.

    Returns the started StreamingQuery (availableNow); caller awaits.
    """
    import os

    from mediacrawler_spark.operators.text_dedup import dedup_incremental

    corpus_dir = os.path.join(state_dir, "corpus")
    dec_dir = os.path.join(state_dir, "decisions")
    ckpt = os.path.join(state_dir, "checkpoint")

    def _admit(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        inc = batch.select(F.col(id_col), F.col(text_col))
        has_base = os.path.isdir(corpus_dir) and any(
            f.endswith(".parquet") for f in os.listdir(corpus_dir)
        )
        if has_base:
            base = spark.read.parquet(corpus_dir)
            res = dedup_incremental(
                base,
                inc,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
                max_bucket=max_bucket,
            )
        else:
            res = inc.select(
                F.col(id_col),
                F.lit("unique").alias("status"),
                F.lit(-1).cast("bigint").alias("match_id"),
            )
        res = res.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("bigint")
        ).persist()
        res.write.mode("append").parquet(dec_dir)
        (
            inc.join(
                res.filter(F.col("status") == "unique").select(id_col), id_col
            )
            .write.mode("append")
            .parquet(corpus_dir)
        )
        res.unpersist()

    return (
        source.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", ckpt)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )

"""Benchmark workloads.

``frontier_bench`` is the BASELINE.json metric job: URLs scheduled+deduped
per second on a synthetic seed list with the reference politeness shape.
The seed list is generated *inside Spark* (``spark.range`` + column
expressions — no driver-side data, no I/O floor), with the FIXTURES.md
skew: one hot host holds ~50% of URLs, a warm tier shares the rest.

One measured iteration =
    canonicalize (vectorized pandas UDF)
  → xxhash64 keys
  → intra-batch dedup (hash agg, deterministic winner)
  → Bloom-shard build over the seen set + broadcast probe
  → exact anti-join confirmation
  → two-phase salted politeness/priority top-k selection
i.e. the admission+selection half of an epoch — the part whose throughput
bounds the whole engine (fetching is I/O-bound and politeness-capped by
design; scheduling is what must scale to 10^10).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediacrawler_spark.functions.urls import host_of, with_canonical_url
from mediacrawler_spark.operators.dedup import (
    BloomParams,
    build_bloom_table,
    dedup_against_seen_bloom,
    dedup_within_batch,
)
from mediacrawler_spark.operators.politeness import select_fetch_set


def synthetic_seed_urls(spark: SparkSession, n_urls: int, n_hosts: int = 100,
                        dup_frac: float = 0.2, rank: int = 0, n_exec: int = 1) -> DataFrame:
    """n_urls candidate rows, ~dup_frac of which are repeats of earlier
    URLs (intra-batch dups), hot-host skew ~50%.

    With (rank, n_exec) the generator emits only that executor's input
    split (ids ≡ rank mod n_exec) — the union over ranks is identical to
    the single-executor output, and duplicate pairs (i, i+base) stay in
    one shard because base is kept divisible by n_exec ≤ 4."""
    base = int(n_urls * (1 - dup_frac)) or 1
    base -= base % 4  # keep URL→shard mapping consistent for n_exec ∈ {1,2,4}
    base = base or 4
    df = spark.range(rank, n_urls, n_exec)
    note = (F.col("id") % base).cast("long")  # repeats beyond `base` → dups
    h = F.xxhash64(note)
    host = F.when(F.pmod(h, F.lit(2)) == 0, F.lit("h0.example.test")).otherwise(
        F.concat(F.lit("h"), (F.pmod(h, F.lit(n_hosts)) + 1).cast("string"),
                 F.lit(".example.test"))
    )
    return df.select(
        F.concat(
            F.lit("https://"), host, F.lit("/note/"),
            F.lpad(F.conv(note.cast("string"), 10, 16), 16, "0"),
            # un-canonical noise the canonicalizer must strip:
            F.lit("?utm_source=bench&b=2&a=1"),
        ).alias("url"),
        F.when(F.pmod(h, F.lit(4)) == 0, 1).otherwise(0).alias("priority"),
        (F.col("id") % 1000).cast("long").alias("seq"),
    )


def synthetic_seen(spark: SparkSession, seeds_hashed: DataFrame, frac: float = 0.3) -> DataFrame:
    """A seen set covering ~frac of the distinct candidate URLs."""
    return (
        seeds_hashed.select("url_hash", "url")
        .filter(F.pmod(F.col("url_hash"), F.lit(int(1 / frac))) == 0)
        .dropDuplicates(["url_hash"])
    )


def assembly_bench(spark: SparkSession, n_docs: int = 100_000, spans_per_doc: int = 30) -> dict:
    """Span-row → documents assembly throughput (the per-row-invariant
    operator): one hash agg + per-row array sort, generated Spark-side."""
    n = n_docs * spans_per_doc
    rows = spark.range(n).select(
        F.concat(F.lit("xhs:note:"), (F.col("id") % n_docs).cast("string")).alias("doc_id"),
        F.lit(4).alias("s_sec"),
        (F.col("id") % 7).cast("long").alias("s_page"),
        F.lit(0).alias("s_phase"),
        (F.col("id") % 70).cast("long").alias("s_parent"),
        F.lit(0).cast("long").alias("s_subpage"),
        (F.col("id") % 10).cast("long").alias("s_idx"),
        F.lit("comment").alias("kind"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("").alias("media_ref"),
    )
    from mediacrawler_spark.operators.extract import assemble_documents

    t0 = time.perf_counter()
    n_out = assemble_documents(rows).count()
    dt = time.perf_counter() - t0
    return {
        "span_rows": n,
        "docs": n_out,
        "seconds": round(dt, 3),
        "spans_per_sec": round(n / dt, 1),
    }


def frontier_bench(
    spark: SparkSession,
    n_urls: int = 2_000_000,
    n_hosts: int = 100,
    budget: int = 5_000,
    bloom_shards: int = 32,
    warmup: bool = True,
) -> dict:
    """Returns {'urls': n, 'seconds': s, 'urls_per_sec': r, ...}.

    ``budget`` is per-host per-epoch (realistic: selection extracts a
    budget-prefix, it does not sort the whole hot host — that's what the
    two-phase top-k is for)."""
    raw = synthetic_seed_urls(spark, n_urls, n_hosts)
    politeness = spark.createDataFrame(
        [("h0.example.test", budget, 0)]
        + [(f"h{i}.example.test", budget, 0) for i in range(1, n_hosts + 1)],
        "host string, budget_per_epoch int, quarantined_until int",
    ).persist()
    politeness.count()

    def admit_and_select() -> tuple[int, int, int]:
        cand = (
            with_canonical_url(raw)
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("host", host_of(F.col("url")))
            .withColumn("platform", F.lit("xhs"))
            .withColumn("kind", F.lit("detail"))
            .withColumn("parent_id", F.lit(None).cast("string"))
            .withColumn("cursor", F.lit(""))
            .withColumn("parent_seq", F.lit(-1).cast("long"))
            .withColumn("empty_streak", F.lit(0))
            .withColumn("attempt", F.lit(0))
            .withColumn("not_before_epoch", F.lit(0))
            .withColumn("epoch", F.lit(0))
        )
        # persist mirrors the engine, which materializes each stage to the
        # snapshot; without it the canonicalize UDF would run 3×.
        unique = dedup_within_batch(cand).persist()
        seen = synthetic_seen(spark, unique).persist()
        params = BloomParams.size(max(1024, n_urls), fpp=0.01, n_shards=bloom_shards)
        table = build_bloom_table(seen, params)
        admitted = dedup_against_seen_bloom(unique, seen, table, params).persist()
        selected, _deferred = select_fetch_set(admitted, politeness, epoch=0,
                                               default_budget=budget)
        n_sel = selected.count()
        n_adm = admitted.count()
        for df in (unique, seen, admitted):
            df.unpersist()
        return n_sel, n_adm, n_urls

    if warmup:
        # full-pipeline JIT/codegen warmup: every stage compiles its
        # FULL-SIZE warmup pass: a small (n/20) warmup compiles every
        # codegen stage but C2 and the shuffle/memory paths only reach
        # steady state at full size — measured in one session, best-of-2
        # after a 100k warmup read 10.0-12.8s where continued full-size
        # iterations settled at 7.1-9.2s. The warmup must be the same
        # work the measured iterations do (CLAUDE.md: "warm the JIT with
        # a full pipeline pass").
        admit_and_select()

    iterations = 3
    best = None
    for _ in range(iterations):
        t0 = time.perf_counter()
        n_sel, n_adm, n_in = admit_and_select()
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, n_sel, n_adm, n_in)
    dt, n_sel, n_adm, n_in = best
    return {
        "urls": n_in,
        "admitted": n_adm,
        "selected": n_sel,
        "deduped": n_in - n_adm,
        "seconds": round(dt, 3),
        "urls_per_sec": round(n_in / dt, 1),
    }

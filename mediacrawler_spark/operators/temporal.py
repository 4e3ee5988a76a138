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

Reference scope: the reference crawler has no temporal join; this is a
SURVEY §2 "beyond the reference" pipeline operator over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    strict: bool = False,
    tiebreak_col: str | None = None,
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
    """
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

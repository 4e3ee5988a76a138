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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: list[str] | None = None,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start_col <= point_ts <= end_col`` (closed on both ends — ANSI
    BETWEEN), optionally also matching on equality ``keys``.

    Spark has no native range join — the naive encoding is a broadcast
    nested-loop or a cartesian product, both O(n·m). This is the
    standard bucketization: time is cut into ``bucket_width``-second
    buckets, each interval is EXPLODED to every bucket it overlaps, each
    point carries its single containing bucket, and the match becomes a
    plain equi-join on (keys…, bucket) followed by the exact BETWEEN
    filter. Because a point has exactly one bucket, each qualifying pair
    is produced exactly once — no post-dedup. At 100 TB the equi-join
    shuffle is keyed by (keys…, bucket), so one hot hour spreads over
    keys and AQE skew-split handles a hot (key, bucket); the replication
    factor is interval_length / bucket_width + 1, which the caller tunes
    toward ~1-2 by picking a width near the typical interval length.

    Guards: intervals with ``end < start`` match nothing (dropped, as
    BETWEEN would); an interval spanning more than
    ``max_buckets_per_interval`` buckets raises at runtime rather than
    silently exploding the build side (raise the cap or the width for
    genuinely long intervals). Output columns are points' then
    intervals' — the two schemas must be disjoint; ``_bkt``/``_bkts``
    are reserved internals.

    Reference scope: the reference crawler has no range join; this is a
    SURVEY §2 "beyond the reference" temporal primitive (events-table
    enrichment: points inside alert/session/outage windows).
    """
    keys = list(keys or [])
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    bad = ({"_bkt", "_bkts"} & set(points.columns)) | (
        {"_bkt", "_bkts"} & set(intervals.columns)
    )
    if clash or bad:
        raise ValueError(
            f"range_join: overlapping non-key columns {sorted(clash)} / "
            f"reserved columns {sorted(bad)} on the inputs"
        )
    w = float(bucket_width)

    def _bkt_of(df: DataFrame, c: str):
        # ANSI forbids timestamp->double; bucket timestamps on exact
        # integer microseconds instead (any consistent monotone mapping
        # works — the exact BETWEEN runs on the original columns).
        if dict(df.dtypes)[c].startswith("timestamp"):
            return F.floor(
                F.unix_micros(F.col(c).cast("timestamp")) / F.lit(w * 1e6)
            ).cast("long")
        return F.floor(F.col(c).cast("double") / F.lit(w)).cast("long")

    p_bkt = _bkt_of(points, point_ts)
    s_bkt = _bkt_of(intervals, start_col)
    e_bkt = _bkt_of(intervals, end_col)
    n_bkt = e_bkt - s_bkt + F.lit(1).cast("long")
    pb = points.withColumn("_bkt", p_bkt)
    ib = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "_bkts",
            F.when(
                n_bkt <= F.lit(int(max_buckets_per_interval)),
                F.sequence(s_bkt, e_bkt),
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "range_join: interval spans %d buckets (cap "
                        + str(int(max_buckets_per_interval))
                        + ") — raise bucket_width or the cap",
                        n_bkt,
                    )
                )
            ),
        )
        .withColumn("_bkt", F.explode("_bkts"))
        .drop("_bkts")
    )
    return (
        pb.join(ib, on=[*keys, "_bkt"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bkt")
    )


def gapfill_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Dense per-key time-bucket rollup with last-observation-carried-
    forward — the TimescaleDB ``time_bucket_gapfill + locf`` primitive a
    metrics/monitoring pipeline runs over an irregular event stream to
    get a regular series (dashboard joins, drift baselines, training
    labels at fixed cadence).

    Per (key, bucket): ``n_events`` and the value of the LAST event in
    the bucket (latest ``ts_col``, ties broken by ``tiebreak_col`` —
    fully deterministic). Buckets with no events are materialized
    densely between each key's first and last active bucket and carry
    the previous bucket's value (``filled = 1``). The carried value is
    copied verbatim — no float arithmetic anywhere, so any engine
    reproduces the output bit-for-bit. ``bucket`` is the integer bucket
    index ``unix_micros(ts) div (bucket_seconds * 10^6)`` (exact bigint
    division; multiply back for the wall-clock edge).

    Scale shape: one (key, bucket) hash-agg with map-side combine; one
    tiny per-key min/max agg; the dense spine is generated DISTRIBUTED
    (sequence-explode per key, never on the driver); one left join back
    on (key, bucket); one per-key ordered window for the carry. The
    window shares every keyed window's mega-group caveat — a key whose
    dense bucket range exceeds a partition serializes that key only
    (the spine is bounded by time range / bucket_seconds, not by event
    count, so even a hot key's group is small at any event volume).
    """
    w = F.lit(int(bucket_seconds) * 1_000_000)
    ev = events.select(
        F.col(key_col).alias("k"),
        # parquet timestamps load as TIMESTAMP_NTZ; the session TZ is UTC
        # (session.py) so the cast is the identity instant mapping and
        # unix_micros matches DuckDB's epoch_us exactly.
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("_us"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn("bucket", F.expr(f"_us div {int(bucket_seconds) * 1_000_000}"))
    per_bucket = (
        ev.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("k", "bucket").orderBy(
                    F.col("_us").desc(), F.col("_tb").desc()
                )
            ),
        )
        .groupBy("k", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max(F.when(F.col("_rn") == 1, F.col("v"))).alias("last_v"),
        )
    )
    spine = (
        ev.groupBy("k")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select("k", F.explode(F.sequence("b0", "b1")).alias("bucket"))
    )
    carry = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(per_bucket, ["k", "bucket"], "left")
        .select(
            F.col("k").alias(key_col),
            F.col("bucket").cast("bigint").alias("bucket"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("last_v", ignorenulls=True).over(carry).alias("value_locf"),
            F.when(F.col("n_events").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("filled"),
        )
    )


def rolling_zscore_flags(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 20,
    k: int = 3,
    scale: int = 100,
    min_periods: int = 3,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags, INTEGER-EXACT — the spike
    detector a metrics pipeline runs over an event stream (fraud blips,
    scraper bursts, sensor faults) without ever trusting float-sum
    ordering.

    Each event is scored against the PRECEDING ``window_rows`` events of
    the same key (itself excluded — a spike inside its own baseline
    inflates the variance and caps z² at n-1, which makes k ≥ √(n-1)
    unreachable; ordering is ``ts_col`` then ``id_col`` — fully
    deterministic). The classic test |x - mean| > k·stddev is
    algebraically cleared of divisions and square roots:

        flag  iff  (n·x - S)²  >  k² · (n·SS - S²)

    with x the value in integer ``scale``-ths (cents by default,
    ``floor(v·scale + 0.5)`` — the same round-half-up rule the int8
    quantizer pins), S = Σx, SS = Σx² over the preceding window — every
    term an exact bigint, so the flag is bit-identical on any engine
    and any partitioning. (Population variance; n·Var = n·SS - S² ≥ 0
    always.) Events with fewer than ``min_periods`` preceding rows are
    warmup: flag 0, z2 NULL. The reported ``z2`` =
    (n·x - S)² / (n·(n·SS - S²)) — z² itself — is ONE IEEE double
    division of two exact bigints, rounded 6dp; NULL when the baseline
    variance is 0 (the flag is still exact there: any nonzero deviation
    from a zero-variance baseline flags).

    Scale shape: ONE exchange on the key, one per-key sort shared by
    both window sums (same frame) — the same minimal keyed-window plan
    as asof_join, with the same mega-key caveat. No joins, no UDF.
    """
    xc = F.floor(F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
        "long"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window_rows, -1)
    )
    base = events.select(
        F.col(id_col), F.col(key_col), F.col(ts_col), xc.alias("_x")
    )
    stats = base.select(
        id_col,
        key_col,
        "_x",
        F.count("*").over(w).cast("long").alias("_n"),
        F.sum("_x").over(w).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).over(w).alias("_ss"),
    )
    num = (F.col("_n") * F.col("_x") - F.col("_s")) * (
        F.col("_n") * F.col("_x") - F.col("_s")
    )
    nvar = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    warm = F.col("_n") >= int(min_periods)
    return stats.select(
        id_col,
        key_col,
        F.col("_n").alias("n_window"),
        F.when(warm, (num > F.lit(int(k) * int(k)) * nvar).cast("int"))
        .otherwise(F.lit(0))
        .alias("is_outlier"),
        F.when(
            warm & (nvar > 0),
            F.round(num.cast("double") / (F.col("_n") * nvar).cast("double"), 6),
        ).alias("z2"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 3600,
    scale: int = 100,
) -> DataFrame:
    """Per-key, per-bucket TIME-WEIGHTED average of the LOCF step
    function, INTEGER-EXACT — TimescaleDB's ``time_weight('LOCF', ...)``
    primitive. A plain AVG over-weights chatty periods; the
    time-weighted mean is what monitoring/billing pipelines actually
    want from an irregular stream.

    Semantics: each event's value holds from its timestamp until the
    next same-key event (ordered by ``ts_col``, then ``id_col``); the
    final event holds to the END of its own bucket (no extrapolation
    past it). Each holding segment is split at bucket boundaries and
    contributes ``value × micros`` to every bucket it covers.

    Exactness: values become integer ``scale``-ths (round-half-up, the
    quantizer's rule), durations are exact micros bigints, so the two
    aggregates Σ(v·w) and Σw are exact integers at any corpus size
    (v ≤ 10^6 scaled, w ≤ 3.6·10^9 µs/bucket ⇒ product ≤ 3.6·10^15,
    and a bucket's total ≤ 3.6·10^15 ≪ 2^63); ``twa_value`` is ONE
    double division of two exact bigints (descaled), rounded 6dp.
    ``covered_us`` is the bucket's observed micros (< bucket width for
    a key's first bucket — coverage starts at the first event).

    Scale shape: one keyed window (lead) sharing the exchange shape of
    the other temporal ops, a segment-to-bucket explode bounded by
    time-range/bucket (not event count), ONE (key, bucket) hash-agg
    with map-side combine. No joins, no UDF.
    """
    W = int(bucket_seconds) * 1_000_000
    ev = events.select(
        F.col(key_col).alias("k"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("_us"),
        F.floor(F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5))
        .cast("long")
        .alias("_v"),
        F.col(id_col).alias("_tb"),
    )
    nxt = Window.partitionBy("k").orderBy(F.col("_us").asc(), F.col("_tb").asc())
    seg = ev.select(
        "k",
        "_v",
        F.col("_us").alias("_s"),
        F.coalesce(
            F.lead("_us").over(nxt),
            (F.col("_us") - F.col("_us") % W) + F.lit(W),  # end of own bucket
        ).alias("_e"),
    ).filter(F.col("_e") > F.col("_s"))
    expl = seg.select(
        "k",
        "_v",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.expr(f"_s div {W}"), F.expr(f"(_e - 1) div {W}")
            )
        ).alias("bucket"),
    )
    clamped = expl.select(
        "k",
        "bucket",
        "_v",
        (
            F.least(F.col("_e"), (F.col("bucket") + 1) * W)
            - F.greatest(F.col("_s"), F.col("bucket") * W)
        ).alias("_w"),
    )
    return (
        clamped.groupBy("k", "bucket")
        .agg(
            F.sum(F.col("_v") * F.col("_w")).alias("_num"),
            F.sum("_w").alias("_den"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("bucket").cast("bigint").alias("bucket"),
            F.round(
                F.col("_num").cast("double")
                / F.col("_den").cast("double")
                / F.lit(float(scale)),
                6,
            ).alias("twa_value"),
            F.col("_den").cast("bigint").alias("covered_us"),
        )
    )


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel progression per key — the conversion query every
    event-analytics engine ships (view → click → purchase): for each
    key, the earliest time each step completes given that every prior
    step completed STRICTLY earlier.

    Rule: ``t(1)`` = min event micros of ``steps[0]``; ``t(i)`` = min
    micros of a ``steps[i]`` event with micros strictly greater than
    ``t(i-1)``. Strict means strictly later MICROSECOND — two steps in
    the same microsecond do not chain (the tie has no defensible order;
    excluding it keeps every value a plain bigint ``min`` and therefore
    bit-identical on any engine with no tiebreak machinery).
    ``max_stage`` counts completed steps (0 = key never did step 1).
    Every distinct key in the input gets a row.

    Scale shape: stage 1 folds into ONE conditional hash-agg over all
    events (map-side combine); each later stage is one equi-join of the
    events of that step's type against the (key → t) table — all keyed
    by ``key_col``, so AQE coalesces them onto one partitioning; no
    window, no sort, no UDF. Funnel depth is len(steps) joins — a
    constant. Hot keys fan out in the aggs, never into a window.
    """
    if len(steps) < 1:
        raise ValueError("funnel_stages needs at least one step")
    us = F.expr(f"unix_micros(cast({ts_col} as timestamp))")
    ev = events.select(
        F.col(key_col).alias("k"), F.col(type_col).alias("t"), us.alias("us")
    )
    cur = ev.groupBy("k").agg(
        F.min(F.when(F.col("t") == steps[0], F.col("us"))).alias("t1")
    )
    stage_cols = ["t1"]
    for i, step in enumerate(steps[1:], start=2):
        prev = stage_cols[-1]
        nxt = (
            ev.filter(F.col("t") == step)
            .join(cur.select("k", *stage_cols), "k")
            .filter(F.col("us") > F.col(prev))
            .groupBy("k")
            .agg(F.min("us").alias(f"t{i}"))
            .select("k", f"t{i}")
        )
        cur = cur.join(nxt, "k", "left")
        stage_cols.append(f"t{i}")
    max_stage = F.lit(0)
    for i, c in enumerate(stage_cols, start=1):
        max_stage = F.when(F.col(c).isNotNull(), F.lit(i)).otherwise(max_stage)
    return cur.select(
        F.col("k").alias(key_col),
        *[F.col(c).cast("bigint").alias(f"{c}_us") for c in stage_cols],
        max_stage.cast("int").alias("max_stage"),
    )


def retention_cohorts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle — the product-analytics staple: users
    grouped by the period of their FIRST activity (the cohort), counted
    in every later period they return.

    Periods are absolute ``period_days`` windows of epoch days
    (``day = micros div 86.4e9``, ``period = day div period_days``) —
    pure integer division, no calendar/timezone arithmetic to diverge
    between engines. Output: (cohort_period, period_offset, n_users)
    where offset 0 row counts the cohort's size and every count is an
    exact bigint distinct-user count.

    Scale shape: one distinct (key, period) agg (map-side partial),
    one per-key min agg, one equi-join on the key, one final
    (cohort, offset) count-distinct agg — all hash-aggs keyed small;
    no window, no UDF. At 10^10 users the distinct pre-agg is the only
    big shuffle and it is the minimal one.
    """
    P = int(period_days)
    act = events.select(
        F.col(key_col).alias("k"),
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp)) div 86400000000) div {P}"
        ).cast("long").alias("p"),
    ).distinct()
    first = act.groupBy("k").agg(F.min("p").alias("p0"))
    return (
        act.join(first, "k")
        .groupBy(
            F.col("p0").alias("cohort_period"),
            (F.col("p") - F.col("p0")).alias("period_offset"),
        )
        .agg(F.countDistinct("k").cast("bigint").alias("n_users"))
        .select(
            F.col("cohort_period").cast("bigint"),
            F.col("period_offset").cast("bigint"),
            "n_users",
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization — the clickstream primitive every event
    warehouse ships (Snowplow/GA sessions, TimescaleDB ``session``): per
    key, events sorted by (micros, id) belong to one session until the
    gap to the PREVIOUS event exceeds ``gap_seconds`` (strictly greater —
    a gap of exactly the timeout stays inside the session, matching the
    half-open ``(prev, prev+gap]`` containment rule), then a new session
    starts. Returns one row per SESSION: (key, session_seq 1-based in
    time order, n_events, start_us, end_us, duration_us) — every value
    an exact bigint (micros arithmetic only), so any engine reproduces
    it bit-for-bit.

    Scale shape: ONE exchange on the key; the lag window and the
    running new-session prefix sum share the same (key) partitioning +
    (us, id) sort; the per-(key, session) agg then needs NO second
    exchange (hashpartitioning(key) already clusters (key, session) —
    plan-asserted in tests). No join, no UDF. Hot keys share the keyed
    window's usual single-partition-per-group bound — the same caveat
    as any sessionization; at 10^10 events the one exchange moves only
    the narrow (key, us, id) projection.
    """
    gap_us = int(gap_seconds) * 1_000_000
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("i"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("us"),
    )
    w = Window.partitionBy("k").orderBy("us", "i")
    run = Window.partitionBy("k").orderBy("us", "i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > F.lit(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("sess", F.sum("new_s").over(run))
    return (
        flagged.groupBy("k", "sess")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("sess").cast("bigint").alias("session_seq"),
            F.col("n_events").cast("bigint"),
            F.col("start_us").cast("bigint"),
            F.col("end_us").cast("bigint"),
            (F.col("end_us") - F.col("start_us")).cast("bigint").alias("duration_us"),
        )
    )

"""asof_join (operators/temporal.py): hand fixtures vs a brute-force
reference, <= vs strict semantics, tiebreak determinism, plan shape
(single exchange on the keys — never a range join)."""

from datetime import datetime

from pyspark.sql import functions as F


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _brute_asof(left, right, strict):
    """Reference: latest right at-or-before (strictly before) per key."""
    out = {}
    for lid, key, lts in left:
        best = None
        for key_r, rts, rid, rv in right:
            if key_r != key:
                continue
            ok = rts < lts if strict else rts <= lts
            if ok and (best is None or (rts, rid) > (best[0], best[1])):
                best = (rts, rid, rv)
        out[lid] = (best[1], best[2]) if best else None
    return out


L = [
    (1, "a", datetime(2024, 1, 1, 10, 0, 0)),
    (2, "a", datetime(2024, 1, 1, 10, 5, 0)),
    (3, "b", datetime(2024, 1, 1, 10, 0, 0)),
    (4, "c", datetime(2024, 1, 1, 9, 0, 0)),  # no right row at all
]
R = [
    ("a", datetime(2024, 1, 1, 9, 59, 0), 100, 1.0),
    ("a", datetime(2024, 1, 1, 10, 0, 0), 101, 2.0),  # equal-ts to left 1
    ("a", datetime(2024, 1, 1, 10, 4, 0), 102, 3.0),
    ("b", datetime(2024, 1, 1, 8, 0, 0), 200, 4.0),
]


def _run(spark, strict):
    from mediacrawler_spark.operators.temporal import asof_join

    left = _mk(spark, L, ["lid", "key", "ts"])
    right = _mk(spark, R, ["key", "ts", "rid", "rv"])
    out = asof_join(left, right, ["key"], "ts", ["rid", "rv"], strict=strict)
    return {
        r["lid"]: (None if r["asof"] is None else (r["asof"]["rid"], r["asof"]["rv"]))
        for r in out.collect()
    }


def test_asof_at_or_before(spark):
    got = _run(spark, strict=False)
    want = _brute_asof([(l[0], l[1], l[2]) for l in L], R, strict=False)
    assert got == want
    assert got[1] == (101, 2.0)  # equal-ts right row IS eligible
    assert got[4] is None


def test_asof_strict(spark):
    got = _run(spark, strict=True)
    want = _brute_asof([(l[0], l[1], l[2]) for l in L], R, strict=True)
    assert got == want
    assert got[1] == (100, 1.0)  # equal-ts right row is NOT eligible


def test_asof_tiebreak_deterministic(spark):
    from mediacrawler_spark.operators.temporal import asof_join

    ts = datetime(2024, 1, 1, 10, 0, 0)
    left = _mk(spark, [(1, "a", datetime(2024, 1, 1, 11, 0, 0))], ["lid", "key", "ts"])
    right = _mk(
        spark,
        [("a", ts, 7, 1.0), ("a", ts, 9, 2.0), ("a", ts, 8, 3.0)],
        ["key", "ts", "rid", "rv"],
    )
    out = asof_join(left, right, ["key"], "ts", ["rid", "rv"], tiebreak_col="rid")
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["asof"]["rid"], rows[0]["asof"]["rv"]) == (9, 2.0)


def test_asof_left_columns_preserved(spark):
    from mediacrawler_spark.operators.temporal import asof_join

    left = _mk(spark, [(1, "a", datetime(2024, 1, 1), "extra")], ["lid", "key", "ts", "note"])
    right = _mk(spark, [("a", datetime(2023, 12, 31), 1, 0.5)], ["key", "ts", "rid", "rv"])
    out = asof_join(left, right, ["key"], "ts", ["rid", "rv"])
    assert set(out.columns) == {"lid", "key", "ts", "note", "asof"}
    r = out.collect()[0]
    assert r["note"] == "extra" and r["asof"]["rid"] == 1


def test_asof_randomized_vs_brute_force(spark):
    """Seeded pseudo-random case: 400 left / 300 right rows over 12 keys
    with deliberate ts collisions (ts granularity 16) so the <= boundary
    and multi-right-per-ts dedup both get exercised at volume."""
    from datetime import timedelta

    from mediacrawler_spark.operators.temporal import asof_join

    def rng(i):
        return (i * 2654435761 + 40503) % (2**32)

    base = datetime(2024, 1, 1)
    left = [
        (i, f"k{rng(i) % 12}", base + timedelta(seconds=int(rng(i * 3 + 1) % 16) * 60))
        for i in range(400)
    ]
    right = [
        (f"k{rng(i * 5 + 2) % 12}", base + timedelta(seconds=int(rng(i * 7 + 3) % 16) * 60),
         1000 + i, float(rng(i) % 97))
        for i in range(300)
    ]
    # dedup right per (key, ts) keeping max rid — mirrors tiebreak_col="rid"
    best = {}
    for k, ts, rid, rv in right:
        if (k, ts) not in best or rid > best[(k, ts)][0]:
            best[(k, ts)] = (rid, rv)
    right_dedup = [(k, ts, rid, rv) for (k, ts), (rid, rv) in best.items()]

    ldf = _mk(spark, left, ["lid", "key", "ts"])
    rdf = _mk(spark, right, ["key", "ts", "rid", "rv"])
    out = asof_join(ldf, rdf, ["key"], "ts", ["rid", "rv"], tiebreak_col="rid")
    got = {
        r["lid"]: (None if r["asof"] is None else (r["asof"]["rid"], r["asof"]["rv"]))
        for r in out.collect()
    }
    want = _brute_asof(left, right_dedup, strict=False)
    assert got == want
    assert len(got) == 400
    # sanity: the case actually exercises matched rows at volume
    assert sum(v is not None for v in got.values()) > 300


def test_asof_single_exchange(spark):
    """The executed plan must hash-partition on the key once and contain
    no join operator at all (the union+window form) — a range/cartesian
    join here would be the 100 TB killer."""
    from mediacrawler_spark.operators.temporal import asof_join

    left = _mk(spark, L, ["lid", "key", "ts"])
    right = _mk(spark, R, ["key", "ts", "rid", "rv"])
    plan = (
        asof_join(left, right, ["key"], "ts", ["rid", "rv"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_reserved_names_rejected(spark):
    """Inputs carrying the output name 'asof' or an internal working
    column must be rejected up front (ADVICE r04: previously produced
    duplicate/ambiguous output columns silently)."""
    import pytest

    from mediacrawler_spark.operators.temporal import asof_join

    left_bad = _mk(spark, [(1, "a", datetime(2024, 1, 1), 9)], ["lid", "key", "ts", "asof"])
    right = _mk(spark, [("a", datetime(2023, 12, 31), 1, 0.5)], ["key", "ts", "rid", "rv"])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left_bad, right, ["key"], "ts", ["rid", "rv"])

    left = _mk(spark, [(1, "a", datetime(2024, 1, 1))], ["lid", "key", "ts"])
    right_bad = _mk(spark, [("a", datetime(2023, 12, 31), 1)], ["key", "ts", "_rpay"])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right_bad, ["key"], "ts", ["_rpay"])


def test_asof_bucketed_matches_unbucketed(spark):
    """The mega-key guard (bucket_width) must return byte-identical
    results to the single-window form on the randomized collision-heavy
    case — including strict mode and matches that cross bucket
    boundaries (tiny width forces many crossings)."""
    from datetime import timedelta

    from mediacrawler_spark.operators.temporal import asof_join

    def rng(i):
        return (i * 2654435761 + 40503) % (2**32)

    base = datetime(2024, 1, 1)
    left = [
        (i, f"k{rng(i) % 12}", base + timedelta(seconds=int(rng(i * 3 + 1) % 16) * 60))
        for i in range(400)
    ]
    right = [
        (f"k{rng(i * 5 + 2) % 12}", base + timedelta(seconds=int(rng(i * 7 + 3) % 16) * 60),
         1000 + i, float(rng(i) % 97))
        for i in range(300)
    ]
    ldf = _mk(spark, left, ["lid", "key", "ts"])
    rdf = _mk(spark, right, ["key", "ts", "rid", "rv"])
    for strict in (False, True):
        base_out = {
            r["lid"]: (None if r["asof"] is None else (r["asof"]["rid"], r["asof"]["rv"]))
            for r in asof_join(
                ldf, rdf, ["key"], "ts", ["rid", "rv"], strict=strict, tiebreak_col="rid"
            ).collect()
        }
        # 130s buckets: not aligned to the 60s ts grid -> boundary crossings
        bkt_out = {
            r["lid"]: (None if r["asof"] is None else (r["asof"]["rid"], r["asof"]["rv"]))
            for r in asof_join(
                ldf, rdf, ["key"], "ts", ["rid", "rv"], strict=strict,
                tiebreak_col="rid", bucket_width=130,
            ).collect()
        }
        assert bkt_out == base_out


def test_asof_mega_key_bucketed(spark):
    """One key holding 10^6 left rows (VERDICT r04 #7): the bucketed
    form must produce the analytically-known answer with the hot group
    split across many parallel bucket windows, the carry join broadcast,
    and no sort-merge/cartesian join anywhere."""
    from mediacrawler_spark.operators.temporal import asof_join

    n = 1_000_000
    left = spark.range(n).select(
        F.col("id").alias("lid"), F.lit("hot").alias("key"), F.col("id").alias("ts")
    )
    right = spark.range(n // 1000).select(
        (F.col("id") * 1000).alias("rid_ts"), F.lit("hot").alias("key")
    ).select("key", F.col("rid_ts").alias("ts"), F.col("rid_ts").alias("rid"))
    out = asof_join(left, right, ["key"], "ts", ["rid"], bucket_width=977)
    # ground truth: asof.rid == floor(ts/1000)*1000 for every left row
    mism = out.filter(
        F.col("asof").isNull() | (F.col("asof.rid") != (F.floor(F.col("ts") / 1000) * 1000))
    ).count()
    assert mism == 0
    assert out.count() == n

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# range_join (bucketized point-in-interval join)
# ---------------------------------------------------------------------------


def _rj_brute(points, intervals, keys=()):
    """Brute-force closed-interval containment on driver-side rows."""
    out = set()
    for p in points:
        for i in intervals:
            if all(p[k] == i[k] for k in keys) and i["s"] <= p["ts"] <= i["e"]:
                out.add((p["pid"], i["iid"]))
    return out


def test_range_join_brute_parity_keyless(spark):
    import random

    from mediacrawler_spark.operators.temporal import range_join

    rng = random.Random(7)
    pts = [{"pid": n, "ts": rng.uniform(0, 1000)} for n in range(300)]
    ivs = [
        {"iid": n, "s": (s := rng.uniform(0, 1000)), "e": s + rng.uniform(0, 50)}
        for n in range(120)
    ]
    p = spark.createDataFrame(pts, "pid long, ts double")
    i = spark.createDataFrame(ivs, "iid long, s double, e double")
    for width in (7.0, 33.0, 500.0):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(p, i, "ts", "s", "e", bucket_width=width).collect()
        }
        assert got == _rj_brute(pts, ivs), f"width={width}"


def test_range_join_brute_parity_keyed_and_unique(spark):
    import random

    from mediacrawler_spark.operators.temporal import range_join

    rng = random.Random(11)
    pts = [
        {"pid": n, "k": rng.randrange(3), "ts": rng.uniform(0, 200)}
        for n in range(200)
    ]
    ivs = [
        {"iid": n, "k": rng.randrange(3), "s": (s := rng.uniform(0, 200)),
         "e": s + rng.uniform(0, 40)}
        for n in range(80)
    ]
    p = spark.createDataFrame(pts, "pid long, k int, ts double")
    i = spark.createDataFrame(ivs, "iid long, k int, s double, e double")
    rows = range_join(p, i, "ts", "s", "e", bucket_width=13.0, keys=["k"]).collect()
    got = [(r["pid"], r["iid"]) for r in rows]
    # exactly once per qualifying pair: a point has ONE bucket
    assert len(got) == len(set(got))
    assert set(got) == _rj_brute(pts, ivs, keys=("k",))


def test_range_join_edges(spark):
    import pytest

    from mediacrawler_spark.operators.temporal import range_join

    p = spark.createDataFrame([(0, 10.0), (1, 20.0)], "pid long, ts double")
    # closed on both ends; reversed interval matches nothing
    i = spark.createDataFrame(
        [(0, 10.0, 20.0), (1, 30.0, 25.0)], "iid long, s double, e double"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, i, "ts", "s", "e", bucket_width=5.0).collect()
    }
    assert got == {(0, 0), (1, 0)}
    # an interval spanning more buckets than the cap raises (ANSI
    # raise_error) instead of silently exploding the build side
    wide = spark.createDataFrame([(9, 0.0, 1e9)], "iid long, s double, e double")
    with pytest.raises(Exception, match="range_join"):
        range_join(p, wide, "ts", "s", "e", bucket_width=1.0).collect()
    # overlapping non-key columns rejected up front
    bad = spark.createDataFrame([(0, 1.0, 2.0)], "pid long, s double, e double")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(p, bad, "ts", "s", "e", bucket_width=1.0)


def test_range_join_plan_no_nested_loop(spark):
    from mediacrawler_spark.operators.temporal import range_join

    p = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 1.0).alias("ts"))
    i = spark.range(20).select(
        F.col("id").alias("iid"), (F.col("id") * 5.0).alias("s"),
        (F.col("id") * 5.0 + 10.0).alias("e"),
    )
    out = range_join(p, i, "ts", "s", "e", bucket_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


# ----------------------------------------------------- gap-fill + LOCF ----
def _gapfill_reference(rows, bucket_us):
    """Independent pure-Python reference for gapfill_locf: own bucketing,
    own last-event rule, own dense spine + carry."""
    from collections import defaultdict

    per = defaultdict(list)  # key -> [(us, tb, v)]
    for k, us, v, tb in rows:
        per[k].append((us, tb, v))
    out = []
    for k, evs in per.items():
        by_bucket = defaultdict(list)
        for us, tb, v in evs:
            by_bucket[us // bucket_us].append((us, tb, v))
        b0, b1 = min(by_bucket), max(by_bucket)
        last_v = None
        for b in range(b0, b1 + 1):
            if b in by_bucket:
                n = len(by_bucket[b])
                last_v = max(by_bucket[b])[2]  # max (us, tb) tuple
                out.append((k, b, n, last_v, 0))
            else:
                out.append((k, b, 0, last_v, 1))
    return sorted(out)


def test_gapfill_locf_matches_reference(spark):
    """Dense spine per key, bucket-last value with (ts, tiebreak) rule,
    carry through arbitrary-length gaps, per-key independent ranges —
    all equal to the independent reference exactly (values are carried
    verbatim: no float arithmetic to diverge)."""
    from mediacrawler_spark.operators.temporal import gapfill_locf

    B = 3_600_000_000  # 1h in micros
    rows = [
        # key 1: two events in bucket 0 (tiebreak decides), gap of 2, one more
        (1, 100, 5.5, 1),
        (1, 100, 7.25, 2),        # same us -> higher event_id wins
        (1, 3 * B + 5, 9.0, 3),
        # key 2: single event (spine is one bucket, no fill)
        (2, 10 * B, 1.125, 4),
        # key 3: later-ts beats higher event_id inside a bucket
        (3, 2 * B + 50, 4.0, 9),
        (3, 2 * B + 60, 6.0, 5),
        (3, 4 * B, 8.0, 6),
    ]
    want = _gapfill_reference(rows, B)
    df = spark.createDataFrame(
        [
            (tb, k, v, __import__("datetime").datetime(1970, 1, 1)
             + __import__("datetime").timedelta(microseconds=us))
            for k, us, v, tb in rows
        ],
        "event_id long, user_id long, value double, ts timestamp",
    )
    got = sorted(
        (r["user_id"], r["bucket"], r["n_events"], r["value_locf"], r["filled"])
        for r in gapfill_locf(df).collect()
    )
    assert got == want
    # gap buckets are filled with the carried value and flagged
    filled = [r for r in got if r[4] == 1]
    assert len(filled) == 3  # key1: buckets 1,2; key3: bucket 3
    assert all(r[2] == 0 and r[3] is not None for r in filled)


def test_gapfill_locf_plan_no_python_and_single_agg_exchange(spark):
    """Row-number window and the (key, bucket) agg share one exchange;
    no Python eval node anywhere."""
    from mediacrawler_spark.operators.temporal import gapfill_locf

    df = spark.createDataFrame(
        [(1, 1, 1.0, datetime(2024, 1, 1))],
        "event_id long, user_id long, value double, ts timestamp",
    )
    plan = gapfill_locf(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


# --------------------------------------------- rolling z-score flags ----
def _zscore_reference(rows, window_rows, k, scale, min_periods):
    """Independent pure-Python reference: own cents rule, own PRECEDING
    window, own integer flag algebra (exact Python ints throughout)."""
    import math
    from collections import defaultdict

    per = defaultdict(list)
    for eid, key, us, v in rows:
        per[key].append((us, eid, v))
    out = {}
    for key, evs in per.items():
        evs.sort()
        xs = [int(math.floor(v * scale + 0.5)) for _, _, v in evs]
        for i, (us, eid, _) in enumerate(evs):
            lo = max(0, i - window_rows)
            win = xs[lo:i]  # preceding rows only, current excluded
            n, s, ss, x = len(win), sum(win), sum(t * t for t in win), xs[i]
            if n < min_periods:
                out[eid] = (key, n, 0, None)
                continue
            num = (n * x - s) ** 2
            nvar = n * ss - s * s
            flag = 1 if num > k * k * nvar else 0
            z2 = round(num / (n * nvar), 6) if nvar > 0 else None
            out[eid] = (key, n, flag, z2)
    return out


def test_rolling_zscore_matches_reference_and_flags_spike(spark):
    """A planted 100x spike flags against its preceding baseline; steady
    traffic does not; warmup events (fewer than min_periods preceding)
    never flag; zero-variance baselines yield NULL z2 but an exact flag.
    Full row set equals the independent integer reference."""
    from mediacrawler_spark.operators.temporal import rolling_zscore_flags
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = []  # (event_id, user_id, us, value)
    # user 1: steady alternating 5.00/5.01 then a 500.00 spike then steady
    for i in range(12):
        v = 500.0 if i == 8 else 5.0 + (i % 2) * 0.01
        rows.append((i, 1, i * 1_000_000, v))
    # user 2: constant values -> zero variance, never flags, z2 NULL
    for i in range(6):
        rows.append((100 + i, 2, i * 1_000_000, 7.25))
    want = _zscore_reference(rows, window_rows=5, k=2, scale=100, min_periods=3)
    df = spark.createDataFrame(
        [
            (eid, key, base + timedelta(microseconds=us), v)
            for eid, key, us, v in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["user_id"], r["n_window"], r["is_outlier"], r["z2"])
        for r in rolling_zscore_flags(df, window_rows=5, k=2).collect()
    }
    assert got == want
    assert got[8][2] == 1                      # the spike flags
    assert all(got[i][2] == 0 for i in range(8))   # steady prefix doesn't
    # constant-value user: zero-variance baseline, never flags, NULL z2
    assert all(got[100 + i] == (2, min(i, 5), 0, None) for i in range(6))


def test_rolling_zscore_single_exchange_no_python(spark):
    """One exchange on the key, both window sums share the sort, no
    Python eval node."""
    from mediacrawler_spark.operators.temporal import rolling_zscore_flags
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    plan = (
        rolling_zscore_flags(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------- time-weighted average ----
def _twa_reference(rows, bucket_us, scale):
    """Independent pure-Python reference for time_weighted_avg: own
    segment construction, own bucket splitting, exact int arithmetic."""
    import math
    from collections import defaultdict

    per = defaultdict(list)
    for eid, key, us, v in rows:
        per[key].append((us, eid, int(math.floor(v * scale + 0.5))))
    agg = defaultdict(lambda: [0, 0])  # (key, bucket) -> [num, den]
    for key, evs in per.items():
        evs.sort()
        for i, (us, _, vc) in enumerate(evs):
            end = (
                evs[i + 1][0]
                if i + 1 < len(evs)
                else (us // bucket_us + 1) * bucket_us
            )
            t = us
            while t < end:
                b = t // bucket_us
                e = min(end, (b + 1) * bucket_us)
                agg[(key, b)][0] += vc * (e - t)
                agg[(key, b)][1] += e - t
                t = e
    return sorted(
        (k, b, round(num / den / scale, 6), den)
        for (k, b), (num, den) in agg.items()
        if den > 0
    )


def test_time_weighted_avg_matches_reference(spark):
    """Mid-bucket starts, multi-bucket holds, same-micro duplicate events
    (zero-length segments vanish), single-event keys holding to their
    bucket end — all equal the independent exact-integer reference."""
    from mediacrawler_spark.operators.temporal import time_weighted_avg
    from datetime import datetime, timedelta

    H = 3_600_000_000
    base = datetime(2024, 1, 1)
    rows = [  # (event_id, key, us, value)
        (1, 1, H // 2, 2.0),          # holds 0.5h..0.75h in bucket 0
        (2, 1, 3 * H // 4, 4.0),      # holds 0.75h..2.25h across buckets 0-2
        (3, 1, 2 * H + H // 4, 6.0),  # holds 2.25h..3h (end of bucket 2)
        (4, 2, 10 * H + 1, 7.77),     # single event: holds to bucket end
        (5, 3, H, 1.0),               # duplicate micros: zero-length segment
        (6, 3, H, 3.0),               # (id 6 wins ordering) holds the bucket
    ]
    want = _twa_reference(rows, H, 100)
    df = spark.createDataFrame(
        [
            (eid, k, base + timedelta(microseconds=us), v)
            for eid, k, us, v in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = sorted(
        (r["user_id"], r["bucket"], r["twa_value"], r["covered_us"])
        for r in time_weighted_avg(df).collect()
    )
    # buckets are epoch-hour indexed: shift reference (base is epoch-aligned
    # to 2024-01-01, itself a whole number of hours since 1970)
    offset = int(
        (datetime(2024, 1, 1) - datetime(1970, 1, 1)).total_seconds() * 1e6
    ) // H
    want = sorted((k, b + offset, v, d) for k, b, v, d in want)
    assert got == want
    by_kb = {(k, b - offset): (v, d) for k, b, v, d in got}
    assert by_kb[(1, 0)] == (3.0, H // 2)       # (200*.25 + 400*.25)/.5h
    assert by_kb[(1, 1)] == (4.0, H)            # full bucket at 4.00
    assert by_kb[(1, 2)] == (5.5, H)            # 400*.25 + 600*.75
    assert by_kb[(2, 10)][1] == H - 1           # holds to its bucket end
    assert by_kb[(3, 1)] == (3.0, H)            # duplicate-micro loser vanished


def test_time_weighted_avg_plan_no_python(spark):
    from mediacrawler_spark.operators.temporal import time_weighted_avg
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    plan = time_weighted_avg(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


# ----------------------------------------------------- funnel stages ----
def _funnel_reference(rows, steps):
    """Independent reference: per key, t1 = min us of step1; t_i = min us
    of step_i strictly after t_{i-1}."""
    from collections import defaultdict

    per = defaultdict(list)
    for key, typ, us in rows:
        per[key].append((typ, us))
    out = {}
    for key, evs in per.items():
        ts = []
        prev = None
        for i, step in enumerate(steps):
            cand = [
                us
                for typ, us in evs
                if typ == step and (i == 0 or (prev is not None and us > prev))
            ]
            cur = min(cand) if cand else None
            ts.append(cur)
            prev = cur
            if cur is None:
                ts.extend([None] * (len(steps) - i - 1))
                break
        stage = 0
        for i, t in enumerate(ts, 1):
            if t is not None:
                stage = i
        out[key] = tuple(ts) + (stage,)
    return out


def test_funnel_stages_matches_reference(spark):
    """Full conversion, out-of-order steps, same-microsecond non-chains,
    repeat events (earliest qualifying wins), keys missing step 1 —
    all equal to the independent reference."""
    from mediacrawler_spark.operators.temporal import funnel_stages
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [  # (key, type, us)
        # key 1: clean full funnel with a later repeat of each step
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (1, "view", 150), (1, "click", 250),
        # key 2: click BEFORE view -> click never counts, stage stops at 1
        (2, "click", 50), (2, "view", 100), (2, "purchase", 200),
        # key 3: same-microsecond view+click -> strictness breaks the chain
        (3, "view", 500), (3, "click", 500), (3, "purchase", 700),
        # key 4: no view at all -> stage 0, all NULL
        (4, "click", 10), (4, "purchase", 20),
        # key 5: view then click, no purchase -> stage 2
        (5, "view", 1), (5, "click", 2), (5, "error", 3),
    ]
    steps = ["view", "click", "purchase"]
    want = _funnel_reference(rows, steps)
    df = spark.createDataFrame(
        [
            (k, t, base + timedelta(microseconds=us))
            for k, t, us in rows
        ],
        "user_id long, event_type string, ts timestamp",
    )
    off = int((base - datetime(1970, 1, 1)).total_seconds() * 1e6)
    got = {
        r["user_id"]: (
            None if r["t1_us"] is None else r["t1_us"] - off,
            None if r["t2_us"] is None else r["t2_us"] - off,
            None if r["t3_us"] is None else r["t3_us"] - off,
            r["max_stage"],
        )
        for r in funnel_stages(df, steps).collect()
    }
    assert got == want
    assert got[1] == (100, 200, 300, 3)
    assert got[2] == (100, None, None, 1)   # pre-view click ignored
    assert got[3] == (500, None, None, 1)   # same-micro does not chain
    assert got[4] == (None, None, None, 0)
    assert got[5] == (1, 2, None, 2)


def test_funnel_stages_plan_no_window_no_python(spark):
    from mediacrawler_spark.operators.temporal import funnel_stages
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, "view", datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp",
    )
    plan = (
        funnel_stages(df, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan and "Cartesian" not in plan


# -------------------------------------------------- retention cohorts ----
def test_retention_cohorts_matches_reference(spark):
    """Cohorts by first-activity period, offsets by pure integer day/period
    division; offset-0 equals cohort size; distinct-user counting (repeat
    events in one period count once)."""
    from mediacrawler_spark.operators.temporal import retention_cohorts
    from datetime import datetime, timedelta

    D = 86_400_000_000
    base = datetime(1970, 1, 1)
    rows = [  # (user, day)
        # cohort period 0 (days 0-6): users 1,2
        (1, 0), (1, 1), (1, 8), (1, 8), (1, 15),   # offsets 0,0,1,1(dup),2
        (2, 3), (2, 20),                            # offsets 0, 2
        # cohort period 1 (days 7-13): user 3
        (3, 9), (3, 10), (3, 16),                   # offsets 0,0,1
    ]
    df = spark.createDataFrame(
        [
            (u, base + timedelta(microseconds=d * D + 123))
            for u, d in rows
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, period_days=7).collect()
    }
    want = {
        (0, 0): 2,  # users 1,2
        (0, 1): 1,  # user 1 (day 8)
        (0, 2): 2,  # user 1 (day 15), user 2 (day 20)
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3 (day 16)
    }
    assert got == want

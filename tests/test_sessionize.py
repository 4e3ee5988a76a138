"""sessionize (operators/temporal.py): gap-based clickstream sessions
vs an independent pure-Python reference (own sort / own gap rule / own
running counter), boundary-gap inclusion, tiebreak determinism, and the
plan shape (ONE exchange on the key — the session agg must reuse the
window's hashpartitioning, no second exchange, no Python eval)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from mediacrawler_spark.operators.temporal import sessionize

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _ref_sessions(rows, gap_seconds):
    """Independent reference: dict (key, seq) -> (n, start_us, end_us).

    Own microsecond math and own gap rule — never imports the operator.
    """
    ep = datetime(1970, 1, 1)
    by_key = {}
    for eid, key, ts in rows:
        us = int((ts - ep).total_seconds() * 1_000_000)
        by_key.setdefault(key, []).append((us, eid))
    out = {}
    gap_us = gap_seconds * 1_000_000
    for key, evs in by_key.items():
        evs.sort()
        seq = 0
        prev = None
        cur = []
        for us, eid in evs:
            if prev is None or us - prev > gap_us:
                if cur:
                    out[(key, seq)] = (len(cur), cur[0], cur[-1])
                seq += 1
                cur = []
            cur.append(us)
            prev = us
        if cur:
            out[(key, seq)] = (len(cur), cur[0], cur[-1])
    return out


def _collect(df):
    return {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def test_sessionize_matches_reference(spark):
    # user 1: 3 sessions (gaps of 40 min and exactly-30-min stays in);
    # user 2: single burst; user 3: one event.
    rows = [
        (1, 1, T0),
        (2, 1, T0 + timedelta(minutes=10)),
        (3, 1, T0 + timedelta(minutes=40)),  # exactly 30 min gap: SAME session
        (4, 1, T0 + timedelta(minutes=81)),  # 41 min gap: new session
        (5, 1, T0 + timedelta(minutes=82)),
        (6, 2, T0),
        (7, 2, T0 + timedelta(seconds=1)),
        (8, 3, T0 + timedelta(hours=5)),
    ]
    got = _collect(sessionize(_mk(spark, rows), gap_seconds=1800))
    assert got == _ref_sessions(rows, 1800)
    # the exactly-at-timeout gap is pinned explicitly: user 1 events 1-3
    # are one session of 3
    assert got[(1, 1)][0] == 3
    assert got[(1, 2)][0] == 2


def test_sessionize_equal_timestamp_ties(spark):
    # equal-microsecond events have gap 0 -> always same session,
    # regardless of id order in the input
    rows = [
        (10, 7, T0),
        (9, 7, T0),
        (11, 7, T0 + timedelta(hours=2)),
    ]
    got = _collect(sessionize(_mk(spark, rows), gap_seconds=60))
    assert got == _ref_sessions(rows, 60)
    assert got[(7, 1)] == (2, got[(7, 1)][1], got[(7, 1)][1])


def test_sessionize_repartition_deterministic(spark):
    rows = [
        (i, i % 5, T0 + timedelta(minutes=7 * i + (i % 3) * 29))
        for i in range(200)
    ]
    df = _mk(spark, rows)
    a = _collect(sessionize(df, gap_seconds=1200))
    b = _collect(sessionize(df.repartition(13), gap_seconds=1200))
    assert a == b == _ref_sessions(rows, 1200)


def test_sessionize_plan_one_exchange_no_python(spark):
    rows = [(i, i % 3, T0 + timedelta(minutes=i)) for i in range(30)]
    df = sessionize(_mk(spark, rows), gap_seconds=600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the (key, session) agg must reuse the window's hashpartitioning:
    # exactly one shuffle in the whole plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_gap_boundary_batch_and_session_window_agree(spark):
    """Pins the boundary semantics the stream_session_counts oracle
    depends on: Spark's native session_window MERGES an event landing
    exactly gap seconds after its predecessor (touching windows
    coalesce), i.e. the same strict-> new-session rule as batch
    sessionize — and one microsecond past the gap splits in both."""
    exact = [
        (1, 1, T0),
        (2, 1, T0 + timedelta(seconds=3600)),  # exactly the gap: merges
        (3, 1, T0 + timedelta(seconds=3601)),
    ]
    past = [
        (1, 1, T0),
        (2, 1, T0 + timedelta(seconds=3600, microseconds=1)),  # splits
    ]

    def _sw_counts(rows):
        return sorted(
            r["n"]
            for r in _mk(spark, rows)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    batch = _collect(sessionize(_mk(spark, exact), gap_seconds=3600))
    assert {k: v[0] for k, v in batch.items()} == {(1, 1): 3}
    assert _sw_counts(exact) == [3]
    batch2 = _collect(sessionize(_mk(spark, past), gap_seconds=3600))
    assert {k: v[0] for k, v in batch2.items()} == {(1, 1): 1, (1, 2): 1}
    assert _sw_counts(past) == [1, 1]

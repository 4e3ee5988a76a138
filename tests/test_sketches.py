"""approx_distinct_hll (operators/sketches.py) vs an INDEPENDENT
pure-Python HyperLogLog: own hashlib md5, own bit-level leading-zero
count (int.bit_length, not string ops), own float estimate — agreeing
byte-for-byte with the DataFrame implementation is therefore a real
format check, not self-agreement."""

import hashlib
import math

import pytest

from mediacrawler_spark.operators.sketches import M, RHO_CAP, approx_distinct_hll


def _hll_ref(keys):
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:2], 16)
        field = int(h[2:15], 16)  # 13 hex chars = 52 bits
        lz = 52 - field.bit_length()  # leading zero bits of the field
        rho = min(lz + 1, RHO_CAP)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    zeros = M - len(regs)
    s = zeros + sum(2.0 ** -r for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / M)
    raw = alpha * M * M / s
    if raw <= 2.5 * M and zeros > 0:
        return M * math.log(M / zeros)
    return raw


def _est(spark, keys, **kw):
    df = spark.createDataFrame([(1, k) for k in keys], ["g", "k"])
    return approx_distinct_hll(df, ["g"], "k", **kw).collect()[0]["est_distinct"]


def test_registers_match_reference_linear_counting(spark):
    keys = [f"url-{i}" for i in range(120)]
    assert _est(spark, keys) == pytest.approx(_hll_ref(keys), abs=1e-9)


def test_registers_match_reference_hll_regime(spark):
    keys = [f"page/{i * 37}" for i in range(5000)]
    got, want = _est(spark, keys), _hll_ref(keys)
    assert got == pytest.approx(want, abs=1e-9)
    assert abs(got - 5000) / 5000 < 0.2  # within ~3 sigma of 1.04/sqrt(256)


def test_duplicates_do_not_move_the_estimate(spark):
    keys = [f"k{i}" for i in range(300)]
    assert _est(spark, keys * 5) == _est(spark, keys)


def test_deterministic_under_repartition(spark):
    keys = [f"doc:{i}" for i in range(2000)]
    df = spark.createDataFrame([(i % 3, k) for i, k in enumerate(keys)], ["g", "k"])
    a = {r["g"]: r["est_distinct"] for r in approx_distinct_hll(df, ["g"], "k").collect()}
    b = {
        r["g"]: r["est_distinct"]
        for r in approx_distinct_hll(df.repartition(13), ["g"], "k").collect()
    }
    assert a == b


def test_register_shuffle_is_bounded(spark):
    """The only data-proportional exchange is the (group, bucket) hash-agg
    with map-side partial combine; no explode, no row-at-a-time Python."""
    df = spark.createDataFrame([(1, "a"), (1, "b")], ["g", "k"])
    plan = (
        approx_distinct_hll(df, ["g"], "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # (g,bucket) agg + (g) agg


# ---------------------------------------------------------------------------
# count-min sketch — independent reference: own md5, own int() hex decode
# (not strpos arithmetic), own min-over-rows; agreement is a format check.
# ---------------------------------------------------------------------------

from mediacrawler_spark.operators.sketches import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
)


def _cms_ref(stream, queries):
    table = [[0] * CMS_W for _ in range(CMS_D)]
    for k in stream:
        for j in range(CMS_D):
            h = hashlib.md5(f"cms{j}:{k}".encode()).hexdigest()
            table[j][int(h[:4], 16) % CMS_W] += 1
    out = {}
    for q in queries:
        est = None
        for j in range(CMS_D):
            h = hashlib.md5(f"cms{j}:{q}".encode()).hexdigest()
            c = table[j][int(h[:4], 16) % CMS_W]
            est = c if est is None else min(est, c)
        out[q] = est
    return out


def _cms_est(spark, stream, queries):
    items = spark.createDataFrame([(k,) for k in stream], ["k"])
    qdf = spark.createDataFrame([(q,) for q in queries], ["k"])
    cms = cms_build(items, "k")
    return {r["k"]: r["est"] for r in cms_estimate(cms, qdf, "k").collect()}


def test_cms_matches_reference_exactly(spark):
    stream = [f"t{i % 97}" for i in range(3000)] + ["hot"] * 500
    queries = ["t0", "t13", "t96", "hot", "absent"]
    assert _cms_est(spark, stream, queries) == _cms_ref(stream, queries)


def test_cms_overcounts_only_and_absent_keys(spark):
    import collections

    stream = [f"term-{i % 41}" for i in range(2050)]
    true = collections.Counter(stream)
    queries = sorted(true) + ["never-seen"]
    est = _cms_est(spark, stream, queries)
    for q in queries:
        assert est[q] >= true.get(q, 0)  # CMS never undercounts
    # 41 distinct keys in 1024 buckets: collisions vanishingly unlikely
    assert est == {q: true.get(q, 0) for q in queries}


def test_cms_sketch_is_bounded_and_broadcast(spark):
    stream = [f"k{i}" for i in range(500)]
    items = spark.createDataFrame([(k,) for k in stream], ["k"])
    cms = cms_build(items, "k")
    assert cms.count() <= CMS_D * CMS_W
    qdf = spark.createDataFrame([("k1",), ("k2",)], ["k"])
    plan = (
        cms_estimate(cms, qdf, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# sampled quantiles — accuracy vs exact, determinism, scan-side filter
# ---------------------------------------------------------------------------

from mediacrawler_spark.operators.sketches import sampled_quantiles  # noqa: E402


def _skewed_rows(n):
    # deterministic long-tailed values: most small, a heavy tail
    return [(i, "g", (i * 7919) % 97 + (10_000 if i % 50 == 0 else 0)) for i in range(n)]


def test_sampled_quantiles_tracks_exact(spark):
    rows = _skewed_rows(20_000)
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    got = sampled_quantiles(df, ["g"], "v", "id", {"p50": 0.5, "p90": 0.9}).collect()[0]
    exact = sorted(v for _, _, v in rows)
    p50, p90 = exact[len(exact) // 2], exact[int(len(exact) * 0.9)]
    # 1/16 sample of 20k rows: ~1250 points; order-statistic error is
    # small relative to the value spread (values 0..96 + tail)
    assert abs(got["p50"] - p50) <= 5
    assert abs(got["p90"] - p90) <= 8
    assert 1000 <= got["n_sampled"] <= 1550  # ~binomial(20k, 1/16)


def test_sampled_quantiles_deterministic_under_repartition(spark):
    rows = _skewed_rows(5_000)
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    a = sampled_quantiles(df, ["g"], "v", "id", {"p50": 0.5}).collect()
    b = sampled_quantiles(df.repartition(17), ["g"], "v", "id", {"p50": 0.5}).collect()
    assert a == b


def test_sampled_quantiles_corpus_never_shuffles(spark):
    """The Bernoulli filter must run BEFORE the one group-by exchange so
    only the sample is shuffled; no Generate, no Python."""
    df = spark.createDataFrame(_skewed_rows(100), ["id", "g", "v"])
    plan = (
        sampled_quantiles(df, ["g"], "v", "id", {"p50": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1
    assert "Generate" not in plan and "BatchEvalPython" not in plan
    # filter sits below the aggregate (appears after it in the plan dump)
    assert plan.index("Filter") > plan.index("HashAggregate")

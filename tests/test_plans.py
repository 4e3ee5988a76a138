"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — broadcast joins for dims/robots, parquet
filter pushdown, column pruning, whole-stage codegen."""

from pyspark.sql import functions as F

from mediacrawler_spark.operators.politeness import apply_robots
from mediacrawler_spark.schemas import FRONTIER_SCHEMA

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_robots_gate_broadcasts(spark):
    frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    robots = spark.createDataFrame(
        [("a", "/", True, 1.0, 4_000_000_000)],
        "host string, path_prefix string, allow boolean, crawl_delay double, expires_at long",
    )
    plan = _plan(apply_robots(frontier, robots, 0))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dim_join_broadcasts(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["j2_broadcast_dim_join"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_parquet_filter_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_orderkey") == 42)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    # column pruning: ReadSchema carries only the 2 projected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_wordcount_plan_shape(spark):
    """Top-k word count must be: pruned scan → partial agg (map-side
    combine) → single exchange → final agg → TakeOrderedAndProject (top-k
    without a global sort)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["a1_wordcount_top20"](spark, SF))
    assert "ReadSchema: struct<text:string>" in plan  # column pruning
    assert "partial_count" in plan  # map-side combine
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE reads)


def test_cosine_topk_broadcasts_queries(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["sim_cosine_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

"""Crawl-ordering match at ~10^4 URLs (SURVEY §5.2.3 step-up toward the
10^7 bench scale). Budgets are raised so the frontier drains in ~10
epochs; the invariants are the same three as the small e2e:
ordering match rate 1.0, exact seen set, fetch-count equality."""

import pytest

from mediacrawler_spark.fixtures import UniverseParams, build_universe
from mediacrawler_spark.oracle import CrawlOracle
from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
from mediacrawler_spark.schemas import (
    PAGES_SCHEMA,
    POLITENESS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
)
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

pytestmark = pytest.mark.slow

CFG = EngineConfig(max_comments_per_note=25, max_epochs=60, default_budget=300)


@pytest.fixture(scope="module")
def big_universe():
    return build_universe(
        UniverseParams(
            n_notes=2500,
            n_hosts=40,
            n_keywords=6,
            n_creators=6,
            search_pages_per_keyword=3,
            max_comments_per_note=25,
            budget_hot=800,
            budget_warm=300,
        )
    )


def test_seedlist_ordering_oracle_vectorized(spark):
    """The 10^7 metric's oracle (BENCH/run_ordering_10m.py) at 10^5 —
    analytic canonical URLs + numpy dedup/selection must match the engine
    on every check. The full 10^7 run is recorded in BENCH/BASELINE.md
    (match rate 1.0)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "BENCH"))
    from run_ordering_10m import run

    r = run(100_000, spark=spark)
    assert r["canon_match"] and r["seen_match"] and r["admitted_match"]
    assert r["selection_match"] and r["match_rate"] == 1.0, r


def test_ordering_match_at_scale(spark, big_universe, tmp_path_factory):
    u = big_universe
    n_urls = len(u.pages)
    assert n_urls >= 7000, f"universe too small for the scale test: {n_urls}"

    oracle = CrawlOracle(
        u.pages, u.robots, u.politeness,
        default_budget=CFG.default_budget,
        comments_per_page=CFG.comments_per_page,
        max_comments_per_note=CFG.max_comments_per_note,
        epoch_ts=CFG.epoch_ts,
    ).run(u.seeds)

    cat = SnapshotCatalog(spark, str(tmp_path_factory.mktemp("snap_scale")))
    eng = CrawlEngine(
        spark,
        cat,
        spark.createDataFrame(u.pages, PAGES_SCHEMA),
        spark.createDataFrame(u.robots, ROBOTS_SCHEMA),
        spark.createDataFrame(u.politeness, POLITENESS_SCHEMA),
        CFG,
    )
    res = eng.run(spark.createDataFrame(u.seeds, SEEDS_SCHEMA))

    assert res.total_fetched == oracle.total_fetched
    got_seen = {r["url"] for r in cat.read("seen").collect()}
    assert got_seen == oracle.seen

    log = (
        eng.fetch_log()
        .orderBy("host", "epoch", "host_rank")
        .select("host", "url", "epoch", "kind")
        .collect()
    )
    got: dict[str, list] = {}
    for r in log:
        got.setdefault(r["host"], []).append((r["url"], r["epoch"], r["kind"]))
    assert set(got) == set(oracle.fetch_order)
    n_hosts = len(got)
    matched = sum(1 for h in got if got[h] == oracle.fetch_order[h])
    assert matched == n_hosts, f"ordering match {matched}/{n_hosts}"

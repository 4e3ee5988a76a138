"""End-to-end: Spark engine vs the single-threaded Python oracle.

The three BASELINE.json correctness criteria:
1. crawl-ordering match rate == 1.0 (per-host fetch sequences),
2. final URL-seen set exactly equal,
3. span-sequence equality per document (the per-row invariant).
Plus: resume-from-snapshot equivalence (kill after epoch k).
"""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.oracle import CrawlOracle
from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

CFG = EngineConfig(max_comments_per_note=25, max_epochs=80)


@pytest.fixture(scope="module")
def engine_result(spark, universe, udfs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap_e2e"))
    cat = SnapshotCatalog(spark, root)
    eng = CrawlEngine(
        spark, cat, udfs["pages"], udfs["robots"], udfs["politeness"], CFG
    )
    res = eng.run(udfs["seeds"])
    return eng, res


@pytest.fixture(scope="module")
def oracle_result(universe):
    o = CrawlOracle(
        universe.pages,
        universe.robots,
        universe.politeness,
        default_budget=CFG.default_budget,
        comments_per_page=CFG.comments_per_page,
        max_comments_per_note=CFG.max_comments_per_note,
        epoch_ts=CFG.epoch_ts,
    )
    return o.run(universe.seeds)


def test_seen_set_exact_equality(engine_result, oracle_result):
    eng, _ = engine_result
    got = {r["url"] for r in eng.catalog.read("seen").collect()}
    assert got == oracle_result.seen


def test_crawl_ordering_match(engine_result, oracle_result):
    eng, _ = engine_result
    log = (
        eng.fetch_log()
        .orderBy("host", "epoch", "host_rank")
        .select("host", "url", "epoch", "kind")
        .collect()
    )
    got: dict[str, list] = {}
    for r in log:
        got.setdefault(r["host"], []).append((r["url"], r["epoch"], r["kind"]))
    assert set(got) == set(oracle_result.fetch_order)
    mismatches = {
        h: (got[h], oracle_result.fetch_order[h])
        for h in got
        if got[h] != oracle_result.fetch_order[h]
    }
    assert not mismatches, f"ordering mismatch on {len(mismatches)} hosts: " + str(
        dict(list(mismatches.items())[:1])
    )


def test_span_sequence_equality(engine_result, oracle_result):
    eng, _ = engine_result
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in eng.documents().collect()
    }
    assert set(got) == set(oracle_result.documents)
    for doc_id, want in oracle_result.documents.items():
        assert got[doc_id] == want, f"span mismatch in {doc_id}"


def test_fetch_counts_match(engine_result, oracle_result):
    _, res = engine_result
    assert res.total_fetched == oracle_result.total_fetched


def test_mandatory_cases_exercised(oracle_result, universe):
    """The universe actually contains the FIXTURES.md mandatory cases."""
    all_fetches = [u for fs in oracle_result.fetch_order.values() for (u, _, _) in fs]
    assert any("/comments/" in u for u in all_fetches)
    assert any("/subcomments/" in u for u in all_fetches)
    assert any("/search?" in u for u in all_fetches)
    # two-strike rule: the extra empty page (page=3 of last keyword) never fetched
    assert any(u.endswith("page=2") for u in all_fetches)
    assert not any(u.endswith("page=3") for u in all_fetches)
    # robots-denied private seed never fetched, never seen
    assert not any("/private/" in u for u in all_fetches)
    assert not any("/private/" in u for u in oracle_result.seen)
    # denied comments host: comment pages never fetched there
    from mediacrawler_spark.fixtures import DENIED_COMMENTS_HOST
    assert not any(
        "/comments/" in u
        for (u, _, _) in oracle_result.fetch_order.get(DENIED_COMMENTS_HOST, [])
    )


def test_resume_equivalence(spark, udfs, universe, tmp_path):
    root = str(tmp_path / "snap_resume")
    cat = SnapshotCatalog(spark, root)
    eng1 = CrawlEngine(spark, cat, udfs["pages"], udfs["robots"], udfs["politeness"], CFG)
    eng1.run(udfs["seeds"], max_epochs=2)
    assert cat.committed_epoch() == 1
    # fresh engine + catalog objects — only the on-disk snapshot carries over
    eng2 = CrawlEngine(
        spark, SnapshotCatalog(spark, root), udfs["pages"], udfs["robots"], udfs["politeness"], CFG
    )
    eng2.run(None)

    oracle = CrawlOracle(
        universe.pages, universe.robots, universe.politeness,
        default_budget=CFG.default_budget,
        comments_per_page=CFG.comments_per_page,
        max_comments_per_note=CFG.max_comments_per_note,
        epoch_ts=CFG.epoch_ts,
    ).run(universe.seeds)
    got_seen = {r["url"] for r in eng2.catalog.read("seen").collect()}
    assert got_seen == oracle.seen
    got_docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in eng2.documents().collect()
    }
    assert got_docs == oracle.documents


def test_quarantine_on_host_without_politeness_row(spark, tmp_path):
    """Regression (ADVICE r01, medium): a 471 on a host absent from the
    politeness table must still quarantine that host. The left-join pol
    build dropped such quarantine rows, so the engine kept fetching while
    the oracle deferred — breaking fetch-order/seen equality."""
    from mediacrawler_spark.fixtures import UniverseParams, build_universe
    from mediacrawler_spark.schemas import (
        PAGES_SCHEMA,
        POLITENESS_SCHEMA,
        ROBOTS_SCHEMA,
        SEEDS_SCHEMA,
    )

    # n_notes > 101 so the i%101==100 blocked-471 page exists
    u = build_universe(
        UniverseParams(
            n_notes=102, n_hosts=6, n_keywords=2,
            search_pages_per_keyword=1, max_comments_per_note=10,
        )
    )
    blocked_urls = list(u.pages[u.pages["status"] == 471]["url"])
    blocked_hosts = {url.split("/")[2] for url in blocked_urls}
    assert blocked_hosts, "fixture must contain a 471 page"
    pol_pruned = u.politeness[~u.politeness["host"].isin(blocked_hosts)]
    assert len(pol_pruned) < len(u.politeness)
    # The 471 note is beyond the 1-page search listings — seed it directly
    # (S2 specified-URL seed) so the quarantine actually fires.
    import pandas as pd

    seeds = pd.concat(
        [
            u.seeds,
            pd.DataFrame(
                [
                    {"url": url, "platform": "xhs", "kind": "detail",
                     "keyword": None, "priority": 0, "seq": 0}
                    for url in blocked_urls
                ]
            ),
        ],
        ignore_index=True,
    )

    cfg = EngineConfig(max_comments_per_note=10, max_epochs=80)
    cat = SnapshotCatalog(spark, str(tmp_path / "snap_quar"))
    eng = CrawlEngine(
        spark,
        cat,
        spark.createDataFrame(u.pages, PAGES_SCHEMA),
        spark.createDataFrame(u.robots, ROBOTS_SCHEMA),
        spark.createDataFrame(pol_pruned, POLITENESS_SCHEMA),
        cfg,
    )
    res = eng.run(spark.createDataFrame(seeds, SEEDS_SCHEMA))
    oracle = CrawlOracle(
        u.pages, u.robots, pol_pruned,
        default_budget=cfg.default_budget,
        comments_per_page=cfg.comments_per_page,
        max_comments_per_note=cfg.max_comments_per_note,
        epoch_ts=cfg.epoch_ts,
    ).run(seeds)
    # the blocked URL must actually have been fetched (quarantine fired)
    blocked_fetch_epochs = [
        ep
        for fs in oracle.fetch_order.values()
        for (url, ep, _k) in fs
        if url in set(blocked_urls)
    ]
    assert blocked_fetch_epochs, "471 page must be exercised for this test to bite"

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
    assert got == oracle.fetch_order
    assert res.total_fetched == oracle.total_fetched


def test_max_pages_per_chain_boundary(spark, tmp_path):
    """Regression (ADVICE r01): the cursor-chain safety valve must exist on
    BOTH engine and oracle sides, or a chain reaching the cap diverges.
    Pins the boundary with a tiny cap against a deep search chain: pages
    up to seq == cap fetch, seq == cap+1 never does, and the full
    fetch-order/seen invariants still hold."""
    from mediacrawler_spark.fixtures import UniverseParams, build_universe
    from mediacrawler_spark.schemas import (
        PAGES_SCHEMA,
        POLITENESS_SCHEMA,
        ROBOTS_SCHEMA,
        SEEDS_SCHEMA,
    )

    cap = 2
    u = build_universe(
        UniverseParams(
            n_notes=30, n_hosts=3, n_keywords=2,
            search_pages_per_keyword=6, max_comments_per_note=10,
        )
    )
    cfg = EngineConfig(max_comments_per_note=10, max_pages_per_chain=cap, max_epochs=60)
    cat = SnapshotCatalog(spark, str(tmp_path / "snap_cap"))
    eng = CrawlEngine(
        spark, cat,
        spark.createDataFrame(u.pages, PAGES_SCHEMA),
        spark.createDataFrame(u.robots, ROBOTS_SCHEMA),
        spark.createDataFrame(u.politeness, POLITENESS_SCHEMA),
        cfg,
    )
    res = eng.run(spark.createDataFrame(u.seeds, SEEDS_SCHEMA))
    oracle = CrawlOracle(
        u.pages, u.robots, u.politeness,
        default_budget=cfg.default_budget,
        comments_per_page=cfg.comments_per_page,
        max_comments_per_note=cfg.max_comments_per_note,
        max_pages_per_chain=cap,
        epoch_ts=cfg.epoch_ts,
    ).run(u.seeds)

    got_seen = {r["url"] for r in cat.read("seen").collect()}
    assert got_seen == oracle.seen
    assert res.total_fetched == oracle.total_fetched
    # the cap actually bit: a search page at seq == cap fetched, none past it
    search_pages = [u for u in got_seen if "/search?" in u]
    pages_fetched = {int(u.rsplit("page=", 1)[1]) for u in search_pages}
    assert cap in pages_fetched, "fixture must reach the cap boundary"
    assert max(pages_fetched) == cap, f"chain ran past the cap: {pages_fetched}"


def test_lineage_written(engine_result):
    eng, res = engine_result
    lin = eng.catalog.read("lineage")
    assert lin is not None
    total = lin.agg(F.sum("fetch_count").alias("s")).collect()[0]["s"]
    assert total == res.total_fetched


def test_lineage_per_partition_attribution(engine_result):
    """VERDICT r03 #7: fetch_count sums are meaningful per partition;
    dedup/emitted are epoch-level facts on exactly one partition_id=-1
    summary row per epoch, matching the engine's own EpochStats."""
    eng, res = engine_result
    lin = eng.catalog.read("lineage")
    per_epoch = {
        r["frontier_epoch"]: r
        for r in lin.filter("partition_id >= 0")
        .groupBy("frontier_epoch")
        .agg(F.sum("fetch_count").alias("fetched"))
        .collect()
    }
    summaries = lin.filter("partition_id = -1").collect()
    by_epoch = {}
    for r in summaries:
        by_epoch.setdefault(r["frontier_epoch"], []).append(r)
    for st in res.epochs:
        got = per_epoch.get(st.epoch)
        assert (got["fetched"] if got else 0) == st.fetched, st
        srows = by_epoch.get(st.epoch, [])
        assert len(srows) == 1, (st.epoch, srows)
        assert srows[0]["dedup_count"] == st.deduped
        assert srows[0]["emitted_count"] == st.emitted
        assert srows[0]["fetch_count"] is None
    # per-partition rows never carry epoch-level counts
    assert (
        lin.filter(
            "partition_id >= 0 and "
            "(dedup_count is not null or emitted_count is not null)"
        ).count()
        == 0
    )
    assert eng.catalog.fsck() == []

def test_quarantine_table_pruned_to_active(spark, tmp_path):
    """VERDICT r03 #2: the committed quarantine table holds only ACTIVE
    rows (until > last epoch) — hosts quarantined early in the crawl must
    not be carried and rewritten forever after expiry. The 471 page only
    exists at note index 100 (fixtures.py) and sits beyond the search
    listings, so it is seeded directly (same setup as the
    no-politeness-row quarantine test above)."""
    import pandas as pd

    from mediacrawler_spark.fixtures import UniverseParams, build_universe
    from mediacrawler_spark.schemas import (
        PAGES_SCHEMA, POLITENESS_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA,
    )

    u = build_universe(
        UniverseParams(
            n_notes=102, n_hosts=6, n_keywords=2,
            search_pages_per_keyword=1, max_comments_per_note=10,
        )
    )
    blocked_urls = list(u.pages[u.pages["status"] == 471]["url"])
    assert blocked_urls, "fixture must contain a 471 page"
    seeds = pd.concat(
        [
            u.seeds,
            pd.DataFrame(
                [
                    {"url": url, "platform": "xhs", "kind": "detail",
                     "keyword": None, "priority": 0, "seq": 0}
                    for url in blocked_urls
                ]
            ),
        ],
        ignore_index=True,
    )
    cfg = EngineConfig(max_comments_per_note=10, max_epochs=80)
    cat = SnapshotCatalog(spark, str(tmp_path / "snap_quar_prune"))
    eng = CrawlEngine(
        spark, cat,
        spark.createDataFrame(u.pages, PAGES_SCHEMA),
        spark.createDataFrame(u.robots, ROBOTS_SCHEMA),
        spark.createDataFrame(u.politeness, POLITENESS_SCHEMA),
        cfg,
    )
    res = eng.run(spark.createDataFrame(seeds, SEEDS_SCHEMA))
    blocked = {
        r["host"] for r in eng.fetch_log().filter("status in (471, 461)").collect()
    }
    assert blocked, "universe must exercise the quarantine path"
    last_epoch = res.epochs[-1].epoch
    q = cat.read("quarantine")
    rows = q.collect() if q is not None else []
    # every committed row is ACTIVE (expired ones were dropped at commit)
    assert all(r["quarantined_until"] > last_epoch for r in rows)
    # drive a few empty epochs past the last quarantine's expiry: the
    # blocked host's row must disappear from the committed table
    for _ in range(3):
        eng.run(None, max_epochs=1)
    final = cat.read("quarantine")
    final_hosts = {r["host"] for r in final.collect()} if final is not None else set()
    assert not final_hosts & blocked  # expired entries dropped
    # prune is mirrored on both sides: seen set still matches the oracle
    oracle = CrawlOracle(
        u.pages, u.robots, u.politeness,
        default_budget=cfg.default_budget,
        comments_per_page=cfg.comments_per_page,
        max_comments_per_note=cfg.max_comments_per_note,
        epoch_ts=cfg.epoch_ts,
    ).run(seeds)
    assert {r["url"] for r in cat.read("seen").collect()} == oracle.seen

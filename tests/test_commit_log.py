"""Commit-log scalability (VERDICT r03 #1): committed_epoch is cached —
never a steady-state log re-parse — and roll_log bounds the jsonl so
startup / maintenance parses are O(max_lines), not O(epochs)."""

import json
import os

from mediacrawler_spark.oracle import CrawlOracle
from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

CFG = EngineConfig(max_comments_per_note=25, max_epochs=80)


def test_committed_epoch_is_cached_not_reparsed(spark, tmp_path):
    root = str(tmp_path / "snap_cached")
    cat = SnapshotCatalog(spark, root)
    assert cat.committed_epoch() == -1
    cat.commit(0)
    cat.commit(1)
    # remove the log out from under the catalog: the cached value must
    # still answer (proves no per-call file read)
    os.rename(os.path.join(root, "_commits.jsonl"), os.path.join(root, "_gone"))
    assert cat.committed_epoch() == 1


def test_roll_log_checkpoints_and_resumes(spark, tmp_path):
    root = str(tmp_path / "snap_roll")
    cat = SnapshotCatalog(spark, root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    cat.stage(df, "t")
    cat.commit(0, meta={"x": 7})
    for e in range(1, 70):
        cat.commit(e)  # pure metadata commits
    log = os.path.join(root, "_commits.jsonl")
    assert sum(1 for _ in open(log)) == 70
    assert cat.roll_log(keep=2, max_lines=64) is True
    lines = [json.loads(x) for x in open(log)]
    assert len(lines) == 2 and lines[-1]["epoch"] == 69
    # below threshold: no-op
    assert cat.roll_log(keep=2, max_lines=64) is False
    # resume from the rolled log: full pin state survives (checkpoint)
    cat2 = SnapshotCatalog(spark, root)
    assert cat2.committed_epoch() == 69
    assert cat2.meta() == {"x": 7}
    assert sorted(r["k"] for r in cat2.read("t").collect()) == [1, 2]
    assert cat2.fsck() == []


def test_engine_resume_across_roll_matches_oracle(spark, udfs, universe, tmp_path):
    """Kill after epoch k, roll the log to its checkpoint tail, resume —
    final seen set and documents still match the oracle (VERDICT r03 #1
    'done' criterion)."""
    root = str(tmp_path / "snap_roll_e2e")
    eng1 = CrawlEngine(
        spark, SnapshotCatalog(spark, root), udfs["pages"], udfs["robots"],
        udfs["politeness"], CFG,
    )
    eng1.run(udfs["seeds"], max_epochs=2)
    assert eng1.catalog.roll_log(keep=2, max_lines=0) is True

    cat2 = SnapshotCatalog(spark, root)
    eng2 = CrawlEngine(
        spark, cat2, udfs["pages"], udfs["robots"], udfs["politeness"], CFG
    )
    eng2.run(None)
    oracle = CrawlOracle(
        universe.pages, universe.robots, universe.politeness,
        default_budget=CFG.default_budget,
        comments_per_page=CFG.comments_per_page,
        max_comments_per_note=CFG.max_comments_per_note,
        epoch_ts=CFG.epoch_ts,
    ).run(universe.seeds)
    assert {r["url"] for r in cat2.read("seen").collect()} == oracle.seen
    got_docs = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in eng2.documents().collect()
    }
    assert got_docs == oracle.documents

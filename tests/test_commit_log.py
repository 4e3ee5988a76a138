"""Commit-log scalability (VERDICT r03 #1): committed_epoch is cached —
never a steady-state log re-parse — and roll_log bounds the jsonl so
startup / maintenance parses are O(max_lines), not O(epochs)."""

import json
import os

from mediacrawler_spark.plans.epoch import CrawlEngine
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog


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


def test_engine_resume_across_roll_matches_reference(
    spark, udfs, crawl_cfg, partial_crawl, mid_crawl_ref, snapshot_state, tmp_path
):
    """Kill after epoch k, roll the log to its checkpoint tail, resume —
    the next epochs must land in the byte-identical state an UNROLLED
    resume reaches (VERDICT r03 #1 'done' criterion). State equality at
    epoch 3 (seen set, docs, per-host fetch order, pending frontier)
    pins full-run equality because the engine is deterministic; the
    unperturbed arm of this comparison is itself oracle-matched to
    completion by the e2e suite (conftest full_crawl)."""
    import shutil

    root = str(tmp_path / "snap_roll_e2e")
    shutil.copytree(partial_crawl["root"], root)
    assert SnapshotCatalog(spark, root).roll_log(keep=2, max_lines=0) is True

    eng2 = CrawlEngine(
        spark, SnapshotCatalog(spark, root), udfs["pages"], udfs["robots"],
        udfs["politeness"], crawl_cfg,
    )
    eng2.run(None, max_epochs=2)
    assert snapshot_state(eng2) == mid_crawl_ref


def test_torn_tail_then_new_commits_survive(spark, tmp_path):
    """Crash-recovery (round-4 fix): a torn newline-less tail must not
    swallow the NEXT commit (blind append used to concatenate onto the
    garbage line), and commits after a torn line must stay visible
    (the reader used to stop at the first bad line)."""
    root = str(tmp_path / "snap_torn")
    log = os.path.join(root, "_commits.jsonl")
    cat = SnapshotCatalog(spark, root)
    df = spark.createDataFrame([(1,)], "k int")
    cat.stage(df, "t")
    cat.commit(0)
    cat.commit(1)
    # simulate a crash mid-append: partial JSON, no trailing newline
    with open(log, "a") as f:
        f.write('{"epoch": 2, "tab')

    cat2 = SnapshotCatalog(spark, root)
    assert cat2.committed_epoch() == 1  # torn record is uncommitted
    cat2.commit(2)
    # the new record must be a clean line, visible to a fresh reader
    cat3 = SnapshotCatalog(spark, root)
    assert cat3.committed_epoch() == 2
    assert sorted(r["k"] for r in cat3.read("t").collect()) == [1]
    assert cat3.fsck() == []

    # a torn line in the MIDDLE (newline-terminated garbage) must not
    # hide the commits that follow it
    lines = open(log).read().splitlines()
    with open(log, "w") as f:
        f.write(lines[0] + "\n")
        f.write('{"epoch": 99, "half\n')
        for ln in lines[1:]:
            f.write(ln + "\n")
    cat4 = SnapshotCatalog(spark, root)
    assert cat4.committed_epoch() == 2
    assert cat4.fsck() == []


def test_roll_log_overwrites_stale_tmp(spark, tmp_path):
    """A crash between writing the roll temp file and the rename leaves
    a stale .tmp; the next roll must simply overwrite it."""
    root = str(tmp_path / "snap_tmp")
    cat = SnapshotCatalog(spark, root)
    for e in range(5):
        cat.commit(e)
    with open(os.path.join(root, "_commits.jsonl.tmp"), "w") as f:
        f.write("stale garbage from a crashed roll\n")
    assert cat.roll_log(keep=2, max_lines=0) is True
    cat2 = SnapshotCatalog(spark, root)
    assert cat2.committed_epoch() == 4

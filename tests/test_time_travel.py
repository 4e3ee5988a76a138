"""Time-travel reads on the snapshot catalog (sinks/snapshot.py
read_at / commit_history — the Iceberg VERSION AS OF analog): each
commit line is the full pin state, so any retained epoch reconstructs
from a log lookup; retention (roll_log / expire_versions) bounds the
window with a loud TimeTravelError, never a silently-newer pin."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.sinks.snapshot import SnapshotCatalog, TimeTravelError


def _cat(spark, tmp_path, name="tt"):
    return SnapshotCatalog(spark, str(tmp_path / name))


def test_read_at_replace_and_append_epochs(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in (0, 2, 5):  # gaps: commits need not be consecutive
        cat.stage(spark.createDataFrame([(ep, "state")], ["ep", "x"]), "state")
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    # exact epochs
    assert cat.read_at("state", 0).collect()[0]["ep"] == 0
    assert cat.read_at("state", 5).collect()[0]["ep"] == 5
    # between commits: newest commit <= epoch wins
    assert cat.read_at("state", 4).collect()[0]["ep"] == 2
    # append tables accumulate
    assert cat.read_at("log", 0).count() == 1
    assert cat.read_at("log", 4).count() == 2
    assert cat.read_at("log", 5).count() == 3
    # as-of the committed head == current read
    cur = {r["ep"] for r in cat.read("log").collect()}
    at = {r["ep"] for r in cat.read_at("log", cat.committed_epoch()).collect()}
    assert cur == at
    # a table that never existed at that epoch
    assert cat.read_at("nope", 5) is None
    # before history
    with pytest.raises(TimeTravelError):
        cat.read_at("state", -1)


def test_read_at_table_appears_mid_history(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage(spark.createDataFrame([(1,)], ["a"]), "early")
    cat.commit(0)
    cat.stage(spark.createDataFrame([(2,)], ["b"]), "late")
    cat.commit(1)
    assert cat.read_at("late", 0) is None  # didn't exist yet
    assert cat.read_at("late", 1).count() == 1


def test_read_at_ptable_partition_pins(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    base = spark.range(8).select(
        F.col("id"), F.lit("v0").alias("tag"), F.pmod("id", F.lit(2)).alias("_part")
    )
    cat.stage_parts(base, "pt", 2, dirty=[0, 1])
    cat.commit(0)
    # epoch 1 rewrites ONLY partition 0; partition 1 keeps its old pin
    newer = spark.range(8).filter(F.pmod("id", F.lit(2)) == 0).select(
        F.col("id"), F.lit("v1").alias("tag"), F.pmod("id", F.lit(2)).alias("_part")
    )
    cat.stage_parts(newer, "pt", 2, dirty=[0])
    cat.commit(1)
    tags0 = {r["tag"] for r in cat.read_at("pt", 0).collect()}
    tags1 = {r["tag"] for r in cat.read_at("pt", 1).collect()}
    assert tags0 == {"v0"}
    assert tags1 == {"v0", "v1"}  # mixed pins: clean part kept v0
    assert cat.read_at("pt", 1).count() == 8


def test_expired_version_raises_not_substitutes(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(4):
        cat.stage(spark.createDataFrame([(ep,)], ["ep"]), "state")
        cat.commit(ep)
    removed = cat.expire_versions(keep_last=1)
    assert removed > 0
    assert cat.read_at("state", 3).collect()[0]["ep"] == 3  # head still fine
    with pytest.raises(TimeTravelError, match="expired"):
        cat.read_at("state", 0)


def test_rolled_log_raises(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(6):
        cat.stage(spark.createDataFrame([(ep,)], ["ep"]), "state")
        cat.commit(ep)
    assert cat.roll_log(keep=2, max_lines=4)
    with pytest.raises(TimeTravelError, match="retained"):
        cat.read_at("state", 1)
    assert cat.read_at("state", 5).collect()[0]["ep"] == 5


def test_commit_history_is_ordered_and_self_contained(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(3):
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    hist = cat.commit_history()
    assert [int(r["epoch"]) for r in hist] == [0, 1, 2]
    # every record carries the full pin state (self-contained checkpoint)
    assert all("tables" in r and "appends" in r for r in hist)
    assert [len(r["appends"]["log"]) for r in hist] == [1, 2, 3]


def test_read_appends_since_is_the_delta(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(4):
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    assert {r["ep"] for r in cat.read_appends_since("log", 1).collect()} == {2, 3}
    assert {r["ep"] for r in cat.read_appends_since("log", -1).collect()} == {0, 1, 2, 3}
    assert {r["ep"] for r in cat.read_appends_since("log", 0, to_epoch=2).collect()} == {1, 2}
    assert cat.read_appends_since("log", 3) is None  # nothing after head
    assert cat.read_appends_since("nope", 0) is None
    # replace tables have no O(delta) increment
    cat.stage(spark.createDataFrame([(1,)], ["a"]), "state")
    cat.commit(4)
    with pytest.raises(TimeTravelError, match="replace"):
        cat.read_appends_since("state", 0)


def test_read_appends_since_refuses_compaction_crossing(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(6):
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    assert cat.compact_appends("log", max_dirs=2)
    # old increment dirs were merged: the O(delta) answer no longer exists
    with pytest.raises(TimeTravelError, match="compacted"):
        cat.read_appends_since("log", 1)
    # but a window entirely after the compaction still works
    cat.stage_append(spark.createDataFrame([(6,)], ["ep"]), "log", 6)
    cat.commit(6)
    assert {r["ep"] for r in cat.read_appends_since("log", 5).collect()} == {6}
    # and the row-level changelog answers the compaction-crossed window
    # (dirs not yet expired): inserts only, exactly epochs 2..5
    ch = cat.changelog("log", 1, 5)
    assert {(r["ep"], r["_change_type"]) for r in ch.collect()} == {
        (e, "insert") for e in (2, 3, 4, 5)
    }


def test_changelog_replace_and_none_when_unchanged(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "x"]), "state")
    cat.commit(0)
    cat.commit(1)  # empty commit: pins unchanged
    cat.stage(spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], ["id", "x"]), "state")
    cat.commit(2)
    assert cat.changelog("state", 0, 1) is None  # identical pins, no scan
    got = {
        (r["id"], r["x"], r["_change_type"])
        for r in cat.changelog("state", 0, 2).collect()
    }
    assert got == {(2, "B", "insert"), (3, "c", "insert"), (2, "b", "delete")}
    # from_epoch=-1 diffs against empty: everything is an insert
    base = cat.changelog("state", -1, 0)
    assert {r["_change_type"] for r in base.collect()} == {"insert"}
    assert base.count() == 2


def test_changelog_ptable_prunes_clean_partitions(spark, tmp_path):
    from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

    cat = _cat(spark, tmp_path)
    base = spark.range(8).select(
        F.col("id"), F.lit("v0").alias("tag"), F.pmod("id", F.lit(4)).alias("_part")
    )
    cat.stage_parts(base, "pt", 4, dirty=[0, 1, 2, 3])
    cat.commit(0)
    newer = spark.range(8).filter(F.pmod("id", F.lit(4)) == 1).select(
        F.col("id"), F.lit("v1").alias("tag"), F.pmod("id", F.lit(4)).alias("_part")
    )
    cat.stage_parts(newer, "pt", 4, dirty=[1])
    cat.commit(1)
    # pin-map pruning: only the rewritten partition is a diff candidate
    hist = cat.commit_history()
    lo_parts = hist[0]["ptables"]["pt"]["parts"]
    hi_parts = hist[1]["ptables"]["pt"]["parts"]
    assert SnapshotCatalog._changed_part_keys(lo_parts, hi_parts) == ["1"]
    ch = cat.changelog("pt", 0, 1).collect()
    got = {(r["id"], r["tag"], r["_change_type"]) for r in ch}
    # ids 1 and 5 live in partition 1 (pmod 4); nothing else appears
    assert got == {
        (1, "v1", "insert"), (5, "v1", "insert"),
        (1, "v0", "delete"), (5, "v0", "delete"),
    }


def test_changelog_table_appears_and_drains(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.stage(spark.createDataFrame([(0,)], ["a"]), "other")
    cat.commit(0)
    cat.stage(spark.createDataFrame([(7,)], ["a"]), "late")
    cat.commit(1)
    ins = cat.changelog("late", 0, 1)
    assert [(r["a"], r["_change_type"]) for r in ins.collect()] == [(7, "insert")]
    assert cat.changelog("absent", 0, 1) is None


def test_rollback_restores_pins_and_rewrites_history(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(4):
        cat.stage(spark.createDataFrame([(ep,)], ["ep"]), "state")
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    assert cat.read("log").count() == 4
    rec = cat.rollback_to(1)
    assert int(rec["epoch"]) == 1
    assert cat.committed_epoch() == 1
    assert cat.read("state").collect()[0]["ep"] == 1
    assert cat.read("log").count() == 2
    assert [int(r["epoch"]) for r in cat.commit_history()] == [0, 1]
    # history is rewritten: a new epoch 2 takes the rolled-away slot
    cat.stage(spark.createDataFrame([(99,)], ["ep"]), "state")
    cat.stage_append(spark.createDataFrame([(99,)], ["ep"]), "log", 2)
    cat.commit(2)
    assert cat.read_at("state", 2).collect()[0]["ep"] == 99
    assert {r["ep"] for r in cat.read_at("log", 3).collect()} == {0, 1, 99}
    # a reopened catalog sees the rolled-back head, not the old tail
    reopened = SnapshotCatalog(spark, cat.root)
    assert reopened.committed_epoch() == 2
    assert reopened.read("log").count() == 3


def test_rollback_refusals(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in (0, 2):
        cat.stage(spark.createDataFrame([(ep,)], ["ep"]), "state")
        cat.commit(ep)
    with pytest.raises(TimeTravelError, match="retained"):
        cat.rollback_to(1)  # never a committed epoch
    cat.stage(spark.createDataFrame([(9,)], ["ep"]), "state")
    with pytest.raises(RuntimeError, match="staged"):
        cat.rollback_to(0)  # pending stage would be published half-done
    cat.commit(3)
    # expired pins: the target head must be fully readable or refused
    removed = cat.expire_versions(keep_last=1)
    assert removed > 0
    with pytest.raises(TimeTravelError, match="expired"):
        cat.rollback_to(0)
    assert cat.committed_epoch() == 3  # refusal left the head untouched
    assert [int(r["epoch"]) for r in cat.commit_history()] == [0, 2, 3]


def test_rollback_orphans_collected_by_expiry(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for ep in range(3):
        cat.stage_append(spark.createDataFrame([(ep,)], ["ep"]), "log", ep)
        cat.commit(ep)
    cat.rollback_to(0)
    import os

    orphans = [
        e for e in os.listdir(str(tmp_path / "tt" / "log")) if e.startswith("e=")
    ]
    assert sorted(orphans) == ["e=0", "e=1", "e=2"]  # rolled-away dirs remain
    assert cat.expire_versions() == 2  # ...until expiry collects them
    assert cat.read("log").count() == 1
    assert cat.fsck() == []


def test_rollback_and_recrawl_reconverges(
    spark, udfs, crawl_cfg, partial_crawl, full_crawl, snapshot_state,
    tmp_path_factory,
):
    """Engine-surface check: roll a real crawl back an epoch and resume —
    the deterministic epoch loop must reconverge to the exact
    uninterrupted end state (seen set, span sequences, per-host fetch
    order, frontier). Uses the pre-maintenance 2-epoch prefix (fully
    retained, so rollback is in reach) and compares against the canonical
    completed crawl; works on copies, never mutates shared catalogs."""
    import shutil

    from mediacrawler_spark.plans.epoch import CrawlEngine
    from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

    root = str(tmp_path_factory.mktemp("snap_rollback") / "cat")
    shutil.copytree(partial_crawl["root"], root)
    expected = snapshot_state(full_crawl["eng"])

    cat = SnapshotCatalog(spark, root)
    assert cat.committed_epoch() == 1
    seen_at_1 = cat.read("seen").count()
    rec = cat.rollback_to(0)
    assert int(rec["epoch"]) == 0
    assert cat.committed_epoch() == 0
    assert cat.read("seen").count() < seen_at_1
    assert [int(r["epoch"]) for r in cat.commit_history()] == [0]

    eng = CrawlEngine(
        spark, SnapshotCatalog(spark, root),
        udfs["pages"], udfs["robots"], udfs["politeness"], crawl_cfg,
    )
    eng.run(None)  # re-runs epoch 1 over its orphan dirs, then completes
    assert snapshot_state(eng) == expected


def test_rollback_reach_is_bounded_by_maintenance(
    spark, full_crawl, tmp_path_factory
):
    """On a COMPLETED crawl whose maintenance (prune_appends /
    expire_versions, every 8 epochs) has expired old pins, rollback to a
    record with expired pins refuses loudly and leaves the head intact —
    the Iceberg can't-roll-back-past-expire_snapshots bound. Restorable
    epochs (committed after the last expiry) still restore."""
    import shutil

    from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

    root = str(tmp_path_factory.mktemp("snap_rollbound") / "cat")
    shutil.copytree(full_crawl["eng"].catalog.root, root)
    cat = SnapshotCatalog(spark, root)
    head = cat.committed_epoch()
    epochs = sorted({int(r["epoch"]) for r in cat.commit_history()})
    if head < 7:  # maintenance fires at epoch % 8 == 7
        pytest.skip("canonical crawl ended before the first maintenance pass")
    # the oldest retained record predates the last maintenance: its
    # admitted/fetched pins were pruned and its version pins expired
    with pytest.raises(TimeTravelError, match="expired|compacted"):
        cat.rollback_to(epochs[0])
    assert cat.committed_epoch() == head  # refusal never half-restores


def test_read_at_head_matches_read_on_real_crawl(full_crawl):
    """Engine-surface check: as-of the committed head, time travel and
    the normal read see identical tables (incl. compacted append labels
    and the grown/pruned ptable layout of a real multi-epoch crawl)."""
    cat = full_crawl["eng"].catalog
    head = cat.committed_epoch()
    for table in ("seen", "documents"):
        if not cat.has(table):
            continue
        a = cat.read(table)
        b = cat.read_at(table, head)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        # changelog vs empty == the full table as inserts; head-to-head
        # is a no-op answered from the pin maps without any scan
        ch = cat.changelog(table, -1, head)
        assert ch.count() == a.count()
        assert ch.filter(ch._change_type != "insert").count() == 0
        assert cat.changelog(table, head, head) is None

"""Partitioned delta-commits (VERDICT r02 item 1): replace-style state
tables must rewrite only the partitions an epoch touched, never the full
table. Covers the SnapshotCatalog ptable mechanism directly, then the
engine-level 'done' criterion — bytes/partitions written per epoch are
O(delta), with unchanged e2e results (the oracle-equality suite runs the
same engine elsewhere)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.fixtures import UniverseParams, build_universe
from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
from mediacrawler_spark.oracle import CrawlOracle
from mediacrawler_spark.schemas import (
    PAGES_SCHEMA,
    POLITENESS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
)
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog


def _pdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("val"),
        F.pmod(F.col("id"), F.lit(8)).cast("int").alias("_part"),
    )


def test_stage_parts_roundtrip_partial_rewrite_and_drop(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "snap_pt"))
    cat.stage_parts(_pdf(spark, 0, 100), "t", 8, list(range(8)))
    cat.commit(0)
    assert cat.has("t")
    assert cat.read("t").count() == 100
    assert cat.ptable_rows("t") == 100

    # partial rewrite: new content for parts {2,3} only — doubled vals
    delta = _pdf(spark, 0, 100).where(F.col("_part").isin([2, 3])).withColumn(
        "val", F.col("val") * 2
    )
    cat.stage_parts(delta, "t", 8, [2, 3])
    cat.commit(1)
    rows = {r["k"]: r["val"] for r in cat.read("t").collect()}
    assert len(rows) == 100
    for k, v in rows.items():
        assert v == (k * 20 if k % 8 in (2, 3) else k * 10), k

    # a dirty partition with no rows drops out of the pin map entirely
    cat.stage_parts(
        _pdf(spark, 0, 0), "t", 8, [5]
    )
    cat.commit(2)
    rows2 = {r["k"] for r in cat.read("t").collect()}
    assert rows2 == {k for k in range(100) if k % 8 != 5}
    meta = cat.ptable_meta("t")
    assert meta["n"] == 8 and "5" not in meta["parts"]
    # pins span multiple versions — old clean partitions were never rewritten
    assert len({int(v) for v in meta["parts"].values()}) >= 2
    assert cat.fsck() == []


def test_stage_parts_pending_view_and_resume(spark, tmp_path):
    root = str(tmp_path / "snap_pt2")
    cat = SnapshotCatalog(spark, root)
    cat.stage_parts(_pdf(spark, 0, 40), "t", 8, list(range(8)))
    cat.commit(0)
    # staged-but-uncommitted delta is visible via read_staged_parts only
    delta = _pdf(spark, 100, 110)
    cat.stage_parts(delta, "t", 8, sorted({r["_part"] for r in delta.collect()}))
    staged_keys = {r["k"] for r in cat.read_staged_parts("t").collect()}
    assert set(range(100, 110)) <= staged_keys
    # crash before commit: a reopened catalog sees only the committed state
    cat2 = SnapshotCatalog(spark, root)
    assert {r["k"] for r in cat2.read("t").collect()} == set(range(40))
    assert cat2.fsck() == []


def test_expire_keeps_pinned_leaves_across_versions(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "snap_pt3"))
    cat.stage_parts(_pdf(spark, 0, 80), "t", 8, list(range(8)))
    cat.commit(0)
    # five successive partial rewrites of the same two partitions
    for e in range(1, 6):
        delta = (
            _pdf(spark, 0, 80)
            .where(F.col("_part").isin([0, 1]))
            .withColumn("val", F.col("val") + e)
        )
        cat.stage_parts(delta, "t", 8, [0, 1])
        cat.commit(e)
    removed = cat.expire_versions(keep_last=2)
    assert removed > 0  # stale leaves of parts 0/1 from old versions
    # the table still reads in full: parts 2..7 keep their v=0 leaves
    # (pinned since the first commit — leaf-level expiry must not drop them)
    rows = {r["k"]: r["val"] for r in cat.read("t").collect()}
    assert len(rows) == 80
    for k, v in rows.items():
        assert v == (k * 10 + 5 if k % 8 in (0, 1) else k * 10), k
    assert cat.fsck() == []


@pytest.mark.parametrize("seen_filter", ["bloom", "cuckoo"])
def test_epoch_writes_are_delta_not_full_state(spark, tmp_path, seen_filter):
    """The 'done' criterion: per-epoch frontier/filter writes touch only
    dirty partitions/shards. Build a frontier much wider than any epoch's
    fetch set, then assert later commits repin a small fraction of
    partitions while the table keeps spanning many."""
    uni = build_universe(
        UniverseParams(
            n_notes=240,
            n_hosts=3,
            n_singleton_hosts=0,
            n_keywords=1,
            search_pages_per_keyword=1,
            max_comments_per_note=10,
            budget_hot=2,
            budget_warm=2,
        )
    )
    cfg = EngineConfig(
        default_budget=2,
        max_comments_per_note=10,
        max_epochs=6,
        frontier_partitions=64,
        seen_filter=seen_filter,
    )
    root = str(tmp_path / f"snap_delta_{seen_filter}")
    cat = SnapshotCatalog(spark, root)
    pages = spark.createDataFrame(uni.pages, PAGES_SCHEMA)
    robots = spark.createDataFrame(uni.robots, ROBOTS_SCHEMA)
    politeness = spark.createDataFrame(uni.politeness, POLITENESS_SCHEMA)
    seeds = spark.createDataFrame(uni.seeds, SEEDS_SCHEMA)
    eng = CrawlEngine(spark, cat, pages, robots, politeness, cfg)
    res = eng.run(seeds, max_epochs=6)
    assert len(res.epochs) == 6

    commits = []
    with open(os.path.join(root, "_commits.jsonl")) as f:
        for line in f:
            commits.append(json.loads(line))
    pins = [c.get("ptables", {}).get("frontier", {}).get("parts", {}) for c in commits]

    def changed(a, b):
        keys = set(a) | set(b)
        return sum(1 for k in keys if a.get(k) != b.get(k))

    total_parts = len(pins[-1])
    assert total_parts >= 32, f"frontier should span many partitions: {total_parts}"
    for e in range(2, 6):
        st = res.epochs[e]
        delta_rows = st.fetched + st.admitted
        ch = changed(pins[e - 1], pins[e])
        # each delta row dirties at most one partition (+slack for drops)
        assert ch <= max(2 * delta_rows, 4), (e, ch, delta_rows)
        assert ch < total_parts / 2, (e, ch, total_parts)
    # pins must span several distinct versions — old partitions not rewritten
    assert len({int(v) for v in pins[-1].values()}) >= 3

    # BYTES criterion: a later epoch's frontier version dir must be a small
    # fraction of the table's total footprint (the old full-rewrite wrote
    # ~all of it every epoch)
    def _du(path):
        total = 0
        for dirpath, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    fdir = os.path.join(root, "frontier")
    per_version = {
        int(e.split("=", 1)[1]): _du(os.path.join(fdir, e))
        for e in os.listdir(fdir)
        if e.startswith("v=")
    }
    table_bytes = sum(per_version.values())
    late_versions = sorted(per_version)[-3:]
    for v in late_versions:
        assert per_version[v] < table_bytes / 2, (v, per_version, table_bytes)

    # e2e equivalence on this universe: same seen set as the oracle
    o = CrawlOracle(
        uni.pages,
        uni.robots,
        uni.politeness,
        default_budget=cfg.default_budget,
        comments_per_page=cfg.comments_per_page,
        max_comments_per_note=cfg.max_comments_per_note,
        epoch_ts=cfg.epoch_ts,
    )
    ores = o.run(uni.seeds, max_epochs=6)
    got = {r["url"] for r in cat.read("seen").collect()}
    assert got == ores.seen


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _ops(draw):
    """A short random life of a ptable: partial rewrites over 4 partitions
    with occasional commits/reopens/expiries."""
    n_steps = draw(st.integers(min_value=3, max_value=7))
    steps = []
    for _ in range(n_steps):
        kind = draw(st.sampled_from(["stage", "stage", "stage", "commit", "reopen", "expire"]))
        if kind == "stage":
            dirty = sorted(draw(st.sets(st.integers(0, 3), min_size=1, max_size=4)))
            rows = {
                k: draw(st.lists(st.integers(0, 99), max_size=4, unique=True))
                for k in dirty
            }
            steps.append(("stage", dirty, rows))
        else:
            steps.append((kind,))
    return steps


def test_ptable_staged_empty_partition_drops_rows(spark, tmp_path_factory):
    """Pinned regression (VERDICT r05 #1 falsifying example): stage a row
    into partition 0, commit, stage partition 0 EMPTY, commit — the
    engine's own semantics ('a dirty partition with no rows drops out of
    the pin map') delete the row. The Hypothesis model used to mispredict
    this via dict-truthiness staging tracking."""
    root = str(tmp_path_factory.mktemp("snap_empty_stage"))
    cat = SnapshotCatalog(spark, root)
    cat.stage_parts(
        spark.createDataFrame([(0, 0)], "val long, _part int"), "t", 4, [0]
    )
    cat.commit(cat.committed_epoch() + 1)
    empty = spark.createDataFrame([], "val long, _part int")
    cat.stage_parts(empty, "t", 4, [0])
    cat.commit(cat.committed_epoch() + 1)
    df = cat.read("t")
    got = [] if df is None else df.collect()
    assert got == []
    assert cat.fsck() == []


@settings(max_examples=12, deadline=None, derandomize=True)
@given(_ops())
def test_ptable_state_machine_matches_dict_model(spark, tmp_path_factory, ops):
    """Model check: an arbitrary interleaving of partial stage_parts,
    commits, crash-reopens and expiries must always read back exactly what
    a python dict-of-partitions model predicts (committed view = model at
    last commit; reopen discards pending)."""
    root = str(tmp_path_factory.mktemp("snap_hyp"))
    cat = SnapshotCatalog(spark, root)
    model: dict[int, list[int]] = {}     # committed
    pending: dict[int, list[int]] = {}   # staged-on-top view
    # Explicit staged flag, NOT dict truthiness: a stage sequence that
    # legitimately empties the staged view (stage rows, commit, stage the
    # partition empty) must still commit as "staged" — the empty dict IS
    # the prediction (VERDICT r05 "What's wrong" #1).
    staged = False

    def make_df(rows_by_part):
        data = [
            (int(v * 7 + k), int(k))
            for k, vals in rows_by_part.items()
            for v in vals
        ]
        return spark.createDataFrame(data or [], "val long, _part int")

    for step in ops:
        if step[0] == "stage":
            _, dirty, rows = step
            cat.stage_parts(make_df(rows), "t", 4, dirty)
            if not staged:
                pending = dict(model)
                staged = True
            for k in dirty:
                vals = [v * 7 + k for v in rows.get(k, [])]
                if vals:
                    pending[k] = vals
                else:
                    pending.pop(k, None)
        elif step[0] == "commit":
            cat.commit(cat.committed_epoch() + 1)
            if staged:
                model = pending
            pending = {}
            staged = False
        elif step[0] == "reopen":
            cat = SnapshotCatalog(spark, root)
            pending = {}
            staged = False
        elif step[0] == "expire":
            if not (cat._pending or cat._pending_appends or cat._pending_parts):
                cat.expire_versions(keep_last=2)

    # committed view == model
    df = cat.read("t")
    got = sorted(r["val"] for r in df.collect()) if df is not None else []
    want = sorted(v for vals in model.values() for v in vals)
    assert got == want, (got, want, ops)
    assert cat.fsck() == []


def test_frontier_grows_partition_count_mid_crawl(spark, tmp_path):
    """VERDICT r03 #4: a P=32 catalog doubles to P=64 mid-crawl via the
    maintenance grow op. After the same number of epochs, the grown run's
    seen set, fetch log, and frontier are IDENTICAL to a control run that
    never re-partitioned (growth is pure layout), and at least one
    post-growth epoch is a partial (O(dirty)) rewrite under the new
    layout. Wide-frontier universe (240 notes, budget 2) so the frontier
    outlives the cut."""
    from dataclasses import replace as dc_replace

    uni = build_universe(
        UniverseParams(
            n_notes=240,
            n_hosts=3,
            n_singleton_hosts=0,
            n_keywords=1,
            search_pages_per_keyword=1,
            max_comments_per_note=10,
            budget_hot=2,
            budget_warm=2,
        )
    )
    cfg = EngineConfig(
        default_budget=2,
        max_comments_per_note=10,
        max_epochs=200,
        frontier_partitions=32,
        frontier_max_part_bytes=1,  # any non-empty partition triggers growth
    )
    pages = spark.createDataFrame(uni.pages, PAGES_SCHEMA)
    robots = spark.createDataFrame(uni.robots, ROBOTS_SCHEMA)
    politeness = spark.createDataFrame(uni.politeness, POLITENESS_SCHEMA)
    seeds = spark.createDataFrame(uni.seeds, SEEDS_SCHEMA)

    root = str(tmp_path / "snap_grow")
    cat = SnapshotCatalog(spark, root)
    eng = CrawlEngine(spark, cat, pages, robots, politeness, cfg)
    eng.run(seeds, max_epochs=3)
    assert cat.ptable_meta("frontier")["n"] == 32
    assert cat.ptable_rows("frontier") > 0, "frontier must outlive the cut"
    assert eng._maybe_grow_frontier() is True
    ent = cat.ptable_meta("frontier")
    assert ent["n"] == 64
    assert len(set(ent["parts"].values())) == 1  # full-dirty rewrite

    # resume on the grown layout with fresh objects and a sane threshold
    # (no further growth), stepping epochs and watching the pin map: at
    # least one post-growth epoch must keep some leaves' old pins while
    # repinning others — the O(dirty) partial rewrite under the new P
    cfg2 = dc_replace(cfg, frontier_max_part_bytes=256 << 20)
    cat2 = SnapshotCatalog(spark, root)
    eng2 = CrawlEngine(spark, cat2, pages, robots, politeness, cfg2)
    prev = dict(cat2.ptable_meta("frontier")["parts"])
    saw_partial = False
    extra_epochs = 6
    for _ in range(extra_epochs):
        eng2.run(None, max_epochs=1)
        cur = dict(cat2.ptable_meta("frontier")["parts"])
        kept = [k for k, v in cur.items() if prev.get(k) == v]
        changed = [k for k, v in cur.items() if prev.get(k) != v]
        if kept and changed:
            saw_partial = True
        prev = cur
    assert saw_partial, "no post-growth epoch did a partial rewrite"

    # control: identical crawl, P=32 throughout, same total epoch count —
    # growth must be invisible in every piece of crawl state
    root_c = str(tmp_path / "snap_grow_ctl")
    cat_c = SnapshotCatalog(spark, root_c)
    eng_c = CrawlEngine(spark, cat_c, pages, robots, politeness, cfg2)
    eng_c.run(seeds, max_epochs=3 + extra_epochs)
    assert cat_c.ptable_meta("frontier")["n"] == 32

    def state(cat_x, eng_x):
        seen = frozenset(r["url"] for r in cat_x.read("seen").collect())
        log = tuple(
            (r["host"], r["url"], r["epoch"], r["host_rank"])
            for r in eng_x.fetch_log()
            .orderBy("host", "epoch", "host_rank")
            .collect()
        )
        fr = frozenset(
            (r["url_hash"], r["not_before_epoch"])
            for r in (cat_x.read("frontier") or spark.range(0).selectExpr(
                "id as url_hash", "id as not_before_epoch")).collect()
        )
        return seen, log, fr

    assert state(cat2, eng2) == state(cat_c, eng_c)
    assert cat2.fsck() == []

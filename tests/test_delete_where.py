"""SnapshotCatalog.delete_where (sinks/snapshot.py): the Iceberg
copy-on-write DELETE analog — matching rows vanish from the head,
untouched increments keep their pins, NULL-condition rows are kept
(SQL DELETE semantics), pre-delete epochs stay time-travelable until
retention expires them, fully-deleted increments disappear, and the
operation is refused with pending staged state."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.sinks.snapshot import SnapshotCatalog, TimeTravelError


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "user_id", "text"])


@pytest.fixture()
def cat(spark, tmp_path):
    c = SnapshotCatalog(spark, str(tmp_path / "snap"))
    # three committed epochs; user 7 appears only in epochs 1 and 3
    _b = [
        [(1, 7, "a"), (2, 3, "b")],
        [(3, 4, "c"), (4, 5, "d")],
        [(5, 7, "e"), (6, 7, "f"), (7, None, "g")],
    ]
    for ep, rows in enumerate(_b, start=1):
        c.stage_append(
            _mk(spark, rows).withColumn(
                "user_id", F.col("user_id").cast("bigint")
            ),
            "docs",
            ep,
        )
        c.commit(ep)
    return c


def test_delete_where_removes_rows_and_skips_clean_dirs(cat):
    labels_before = sorted(cat._appends["docs"])
    n = cat.delete_where("docs", "user_id = 7")
    assert n == 3
    left = {r["doc_id"] for r in cat.read("docs").collect()}
    # NULL-condition row (user_id NULL) is KEPT — SQL DELETE semantics
    assert left == {2, 3, 4, 7}
    labels_after = sorted(cat._appends["docs"])
    # the clean epoch-2 increment keeps its original pin; dirty ones
    # were rewritten to c-labels
    assert "2" in labels_after
    assert "1" not in labels_after and "3" not in labels_after
    assert any(lab.startswith("c") for lab in labels_after)
    assert labels_before != labels_after
    assert cat.fsck() == []


def test_delete_where_time_travel_until_expiry(cat, spark):
    cat.delete_where("docs", "user_id = 7")
    # the delete is a NEW snapshot (epoch 4); the pre-delete epoch 3
    # still shows the deleted rows (pins retained until expiry)
    assert cat.committed_epoch() == 4
    old = {r["doc_id"] for r in cat.read_at("docs", 3).collect()}
    assert {1, 5, 6} <= old
    # after expiry sweeps the orphaned dirs, the old read must refuse
    # loudly rather than silently return the post-delete state
    cat.expire_versions(keep_last=1)
    with pytest.raises(TimeTravelError):
        df = cat.read_at("docs", 1)
        # some layouts only fail at scan: force it
        if df is not None:
            df.collect()
    # the head is unaffected by expiry
    assert {r["doc_id"] for r in cat.read("docs").collect()} == {2, 3, 4, 7}


def test_delete_where_column_condition_and_full_dir_delete(cat):
    n = cat.delete_where("docs", F.col("doc_id").isin(3, 4))
    assert n == 2
    # epoch-2's increment was entirely matching rows: its label vanishes
    assert all(lab != "2" for lab in cat._appends["docs"])
    assert {r["doc_id"] for r in cat.read("docs").collect()} == {1, 2, 5, 6, 7}


def test_delete_where_refusals(cat, spark):
    cat.stage_append(_mk(spark, [(9, 1, "h")]), "docs", 9)
    with pytest.raises(RuntimeError):
        cat.delete_where("docs", "user_id = 1")
    cat.commit(9)
    with pytest.raises(ValueError):
        cat.stage(_mk(spark, [(9, 1, "h")]), "rep")
        cat.commit(10)
        cat.delete_where("rep", "user_id = 1")
    with pytest.raises(TypeError):
        cat.delete_where("docs", 42)


def test_delete_where_nothing_matches_is_metadata_only(cat):
    labels_before = sorted(cat._appends["docs"])
    n = cat.delete_where("docs", "user_id = 999")
    assert n == 0
    assert sorted(cat._appends["docs"]) == labels_before

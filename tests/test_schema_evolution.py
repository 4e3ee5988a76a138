"""Schema evolution on snapshot append tables (sinks/snapshot.py
stage_append / _read_append_dirs — the Iceberg add/drop-column
schema-evolution analog): every increment records its schema as
``_schema.json`` beside the data (metadata, not footer scans); reads
over increments that disagree align by name with nulls for missing
columns, so a column added mid-crawl surfaces as NULL on pre-evolution
rows, exactly like Iceberg. Renames/type changes are unsupported and
fail loudly. Replace tables need no machinery: each version is a full
rewrite, so read_at on an old version naturally returns its own schema.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.sinks.snapshot import SnapshotCatalog, TimeTravelError


def _cat(spark, tmp_path, name="se"):
    return SnapshotCatalog(spark, str(tmp_path / name))


def _commit_epochs(cat, spark):
    """Epochs 0-1 write (id), epoch 2 adds a `lang` column."""
    for ep in (0, 1):
        cat.stage_append(spark.createDataFrame([(ep,)], ["id"]), "log", ep)
        cat.commit(ep)
    cat.stage_append(
        spark.createDataFrame([(2, "en")], ["id", "lang"]), "log", 2
    )
    cat.commit(2)


def test_added_column_reads_null_on_old_rows(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    _commit_epochs(cat, spark)
    df = cat.read("log")
    assert sorted(df.columns) == ["id", "lang"]
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert rows == {0: None, 1: None, 2: "en"}
    # dropped-column increments align the same way (epoch 3 drops lang)
    cat.stage_append(spark.createDataFrame([(3,)], ["id"]), "log", 3)
    cat.commit(3)
    rows = {r["id"]: r["lang"] for r in cat.read("log").collect()}
    assert rows == {0: None, 1: None, 2: "en", 3: None}
    # a reopened catalog (fresh pin cache) sees the same union schema
    rows2 = {
        r["id"]: r["lang"]
        for r in SnapshotCatalog(spark, cat.root).read("log").collect()
    }
    assert rows2 == rows


def test_uniform_schema_stays_plain_read(spark, tmp_path):
    """The fast path: agreeing increments produce the exact plain
    multi-dir scan (one Scan parquet node, no Union in the plan)."""
    cat = _cat(spark, tmp_path)
    for ep in range(3):
        cat.stage_append(spark.createDataFrame([(ep,)], ["id"]), "log", ep)
        cat.commit(ep)
    plan = cat.read("log")._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert cat.read("log").count() == 3


def test_time_travel_sees_epoch_local_schema(spark, tmp_path):
    """read_at before the evolution returns the OLD schema (its pins
    only cover agreeing increments); at/after it, the union schema."""
    cat = _cat(spark, tmp_path)
    _commit_epochs(cat, spark)
    assert cat.read_at("log", 1).columns == ["id"]
    assert sorted(cat.read_at("log", 2).columns) == ["id", "lang"]
    # incremental scan of just the evolved window reads the new schema
    inc = cat.read_appends_since("log", 1)
    assert sorted(inc.columns) == ["id", "lang"]
    assert inc.collect()[0]["id"] == 2


def test_changelog_aligns_evolved_replace_schemas(spark, tmp_path):
    """Generic changelog path: a replace table whose schema gained a
    column between the two epochs diffs on the name-union with typed
    nulls (pre-evolution rows read NULL for the added column)."""
    cat = _cat(spark, tmp_path)
    cat.stage(spark.createDataFrame([(1,), (2,)], ["id"]), "state")
    cat.commit(0)
    cat.stage(
        spark.createDataFrame([(2, None), (3, "en")], "id long, lang string"),
        "state",
    )
    cat.commit(1)
    ch = cat.changelog("state", 0, 1)
    got = {(r["id"], r["lang"], r["_change_type"]) for r in ch.collect()}
    assert got == {
        (1, None, "delete"),
        (3, "en", "insert"),
        # id=2 changed representation: (2) -> (2, NULL) is identical
        # after alignment, so it must NOT appear in the diff
    }


def test_compaction_preserves_union_schema(spark, tmp_path):
    """Size-tiered compaction over evolved increments writes the merged
    dir with the union schema (and its own _schema.json), so evolution
    survives rewrite_data_files."""
    cat = _cat(spark, tmp_path)
    for ep in range(5):
        cat.stage_append(spark.createDataFrame([(ep,)], ["id"]), "log", ep)
        cat.commit(ep)
    cat.stage_append(
        spark.createDataFrame([(5, "en")], ["id", "lang"]), "log", 5
    )
    cat.commit(5)
    assert cat.compact_appends("log", max_dirs=2)
    merged = [
        lab for lab in cat._appends["log"] if str(lab).startswith("c")
    ]
    assert merged
    schema_file = os.path.join(cat.root, "log", f"e={merged[0]}", "_schema.json")
    names = [f["name"] for f in json.load(open(schema_file))["fields"]]
    assert sorted(names) == ["id", "lang"]
    rows = {r["id"]: r["lang"] for r in cat.read("log").collect()}
    assert rows == {0: None, 1: None, 2: None, 3: None, 4: None, 5: "en"}
    assert cat.fsck() == []


def test_legacy_dirs_without_schema_file_keep_plain_read(spark, tmp_path):
    """Increments written before this feature have no _schema.json;
    reads over them behave exactly as before (plain multi-dir scan)."""
    cat = _cat(spark, tmp_path)
    for ep in range(2):
        cat.stage_append(spark.createDataFrame([(ep,)], ["id"]), "log", ep)
        cat.commit(ep)
        os.remove(os.path.join(cat.root, "log", f"e={ep}", "_schema.json"))
    df = cat.read("log")
    assert df.columns == ["id"] and df.count() == 2


def test_type_conflict_fails_loudly(spark, tmp_path):
    """Same-name type change is NOT silent: the union raises instead of
    guessing a cast (rename/retype evolution is out of scope)."""
    cat = _cat(spark, tmp_path)
    cat.stage_append(spark.createDataFrame([(1, 7)], ["id", "v"]), "log", 0)
    cat.commit(0)
    cat.stage_append(spark.createDataFrame([(2, "x")], ["id", "v"]), "log", 1)
    cat.commit(1)
    with pytest.raises(Exception, match="[Uu]nion|[Cc]ast|incompatible|INCOMPATIBLE"):
        cat.read("log").collect()

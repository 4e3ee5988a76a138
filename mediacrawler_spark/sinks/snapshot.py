"""Snapshot catalog: atomic per-epoch commits with resume (SURVEY §4, K3).

Production design is Apache Iceberg: each epoch commits frontier + seen +
span/document + lineage changes as ONE Iceberg snapshot; resume reads the
latest snapshot. The sandbox image has no Iceberg jars (no network), so
this module implements the same contract over parquet:

- every table version is written to ``<root>/<table>/v=<n>/`` (immutable),
- a commit appends one JSON line to ``<root>/_commits.jsonl`` naming the
  epoch and every table version it pins — the append IS the atomic commit
  point (torn writes of uncommitted parquet dirs are simply never
  referenced, exactly like Iceberg's metadata-pointer swap),
- resume = read the last complete commit line.

``merge_upsert`` reproduces the reference's SELECT-then-INSERT-or-UPDATE
sink (store/xhs/xhs_store_impl.py:114-172): ``when matched update``
preserves insert-only columns (``add_ts`` — xhs_store_impl.py:130-131),
``when not matched insert``. Implemented as anti-join + union (the
MERGE INTO emulation for a parquet-backed table).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._log = os.path.join(root, "_commits.jsonl")
        self._pending: dict[str, int] = {}
        self._pending_appends: dict[str, list[int]] = {}
        self._versions: dict[str, int] = {}
        self._appends: dict[str, list[int]] = {}
        self._meta: dict = {}
        last = self.last_commit()
        if last:
            self._versions = dict(last["tables"])
            self._appends = {k: list(v) for k, v in last.get("appends", {}).items()}
            self._meta = dict(last.get("meta", {}))

    # -- commit log ---------------------------------------------------------
    def last_commit(self) -> dict | None:
        if not os.path.exists(self._log):
            return None
        last = None
        with open(self._log) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    last = json.loads(line)
                except json.JSONDecodeError:
                    break  # torn tail line = uncommitted
        return last

    def committed_epoch(self) -> int:
        last = self.last_commit()
        return -1 if last is None else int(last["epoch"])

    # -- table io ------------------------------------------------------------
    def _path(self, table: str, version: int) -> str:
        return os.path.join(self.root, table, f"v={version}")

    def stage(self, df: DataFrame, table: str) -> None:
        """Write the next full version of ``table`` (not yet visible).
        For replace-style tables (frontier churn, quarantine). Staging the
        same table twice before a commit writes a second version — never
        overwrites the first (a lazy plan may still be reading it)."""
        v = max(self._versions.get(table, -1), self._pending.get(table, -1)) + 1
        df.write.mode("overwrite").parquet(self._path(table, v))
        self._pending[table] = v

    def stage_append(self, df: DataFrame, table: str, epoch: int) -> None:
        """Write one epoch's increment of an append-only table (seen,
        span_rows, fetch_log, lineage) — the Iceberg append-snapshot
        analog; never rewrites history (but see compact_appends)."""
        df.write.mode("overwrite").parquet(
            os.path.join(self.root, table, f"e={epoch}")
        )
        self._pending_appends.setdefault(table, []).append(str(epoch))

    def commit(self, epoch: int, meta: dict | None = None) -> None:
        """Make all staged versions visible atomically. ``meta`` carries
        small JSON state pinned to the snapshot (e.g. bloom filter sizing +
        fill count — the Iceberg snapshot-properties analog); it replaces
        the previous commit's meta wholesale for the keys given."""
        tables = {**self._versions, **self._pending}
        appends = {
            t: sorted(
                {str(x) for x in self._appends.get(t, [])}
                | {str(x) for x in self._pending_appends.get(t, [])}
            )
            for t in set(self._appends) | set(self._pending_appends)
        }
        new_meta = {**self._meta, **(meta or {})}
        rec = {
            "epoch": epoch,
            "tables": tables,
            "appends": appends,
            "meta": new_meta,
            "committed_at": int(time.time()),
        }
        with open(self._log, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._versions = tables
        self._appends = appends
        self._meta = new_meta
        self._pending = {}
        self._pending_appends = {}

    def meta(self) -> dict:
        """Snapshot properties of the last commit (empty dict if none)."""
        return dict(self._meta)

    def read_staged_version(self, table: str) -> DataFrame:
        """Read the staged (pending) full version of a replace table."""
        return self.spark.read.parquet(self._path(table, self._pending[table]))

    def read_staged(self, table: str, epoch: int) -> DataFrame:
        """Read one staged (not yet committed) epoch increment back — used
        to materialize a stage mid-epoch so downstream consumers don't
        recompute its plan."""
        return self.spark.read.parquet(os.path.join(self.root, table, f"e={epoch}"))

    def read(self, table: str) -> DataFrame | None:
        if table in self._versions:
            return self.spark.read.parquet(self._path(table, self._versions[table]))
        epochs = self._appends.get(table)
        if not epochs:
            return None
        paths = [os.path.join(self.root, table, f"e={e}") for e in epochs]
        return self.spark.read.parquet(*paths)

    def has(self, table: str) -> bool:
        return table in self._versions or bool(self._appends.get(table))

    def fsck(self) -> list[str]:
        """Consistency check of the committed snapshot state: every pinned
        version/append dir must exist and be readable; lineage fetch
        totals must equal the fetch_log row count. Returns problems
        (empty list = healthy); cheap enough to run on resume."""
        problems: list[str] = []
        for table, v in self._versions.items():
            p = self._path(table, v)
            if not os.path.isdir(p):
                problems.append(f"missing version dir: {p}")
        for table, epochs in self._appends.items():
            for e in epochs:
                p = os.path.join(self.root, table, f"e={e}")
                if not os.path.isdir(p):
                    problems.append(f"missing append dir: {p}")
        if not problems and self.has("lineage") and self.has("fetch_log"):
            from pyspark.sql import functions as F

            lin = self.read("lineage").agg(F.sum("fetch_count").alias("s")).collect()[0]["s"]
            logn = self.read("fetch_log").count()
            if (lin or 0) != logn:
                problems.append(f"lineage fetch_count {lin} != fetch_log rows {logn}")
        return problems

    def compact_appends(self, table: str, max_dirs: int = 32) -> bool:
        """Iceberg ``rewrite_data_files`` analog: when an append-only table
        has accumulated more than ``max_dirs`` per-epoch directories,
        rewrite them into ONE compacted dir and commit the swap atomically.

        At 10^4+ epochs the per-epoch layout means 10^4 small parquet dirs
        per table — listing and tiny-file overhead dominate reads. The
        rewrite preserves content exactly (row order is not part of any
        table's contract); uncommitted (pending) increments are untouched
        and remain pending. Returns True if a compaction ran."""
        labels = [str(x) for x in self._appends.get(table, [])]
        if len(labels) <= max_dirs:
            return False
        df = self.spark.read.parquet(
            *[os.path.join(self.root, table, f"e={lab}") for lab in labels]
        )
        label = f"c{self.committed_epoch()}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, table, f"e={label}"))
        self._appends[table] = [label]
        self.commit(self.committed_epoch())  # same epoch: pure metadata swap
        return True

    def expire_versions(self, keep_last: int = 2) -> int:
        """Snapshot expiry (SURVEY §7.4 risk 5: state growth across
        epochs). Replace-style tables rewrite fully each epoch; old
        version dirs are dead weight once a newer commit exists — the
        Iceberg expire_snapshots analog. Append dirs that a compaction
        swapped out of the current commit are collected too (pending
        increments are preserved). Returns the number of dirs removed."""
        import shutil

        removed = 0
        for table, current in self._versions.items():
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for entry in os.listdir(tdir):
                if not entry.startswith("v="):
                    continue
                v = int(entry.split("=", 1)[1])
                if v <= current - keep_last:
                    shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
                    removed += 1
        for table in set(self._appends) | set(self._pending_appends):
            live = {str(x) for x in self._appends.get(table, [])} | {
                str(x) for x in self._pending_appends.get(table, [])
            }
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for entry in os.listdir(tdir):
                if entry.startswith("e=") and entry[2:] not in live:
                    shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
                    removed += 1
        return removed


def merge_upsert(existing: DataFrame | None, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO emulation: rows of ``updates`` win on key collision;
    unmatched existing rows are kept. Insert-only column semantics are the
    caller's job (pass updates that already carry the preserved values)."""
    if existing is None:
        return updates
    kept = existing.join(updates.select(key).distinct(), on=key, how="left_anti")
    return kept.unionByName(updates)

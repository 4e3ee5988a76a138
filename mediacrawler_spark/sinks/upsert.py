"""Upsert semantics for re-crawls (SURVEY K3, risk §7.4.7).

The reference's DB sink SELECTs by business key then INSERTs or UPDATEs
(store/xhs/xhs_store_impl.py:114-172): ``add_ts`` is set only on first
insert (:130-131) while ``last_modify_ts`` updates every time
(store/xhs/__init__.py:107). In production this is one Iceberg
``MERGE INTO ... WHEN MATCHED UPDATE (preserving add_ts) WHEN NOT MATCHED
INSERT``; here the same clauses are composed from a join + union so
re-crawl runs never flap timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_with_insert_only_cols(
    existing: DataFrame | None,
    updates: DataFrame,
    key: str,
    insert_only_cols: tuple[str, ...] = ("add_ts",),
) -> DataFrame:
    """MERGE: updates win on key collision, but ``insert_only_cols`` keep
    their existing value for matched rows (the add_ts contract)."""
    if existing is None:
        return updates
    upd_cols = updates.columns
    e = existing.select(
        F.col(key).alias("_e_key"),
        *[F.col(c).alias(f"_e_{c}") for c in insert_only_cols],
    )
    merged_updates = updates.join(e, updates[key] == F.col("_e_key"), "left").select(
        *[
            F.coalesce(F.col(f"_e_{c}"), F.col(c)).alias(c)
            if c in insert_only_cols
            else F.col(c)
            for c in upd_cols
        ]
    )
    untouched = existing.join(updates.select(key), on=key, how="left_anti")
    return untouched.unionByName(merged_updates)

"""Debug sinks + factory dispatch (SURVEY K1/K2/K5).

The reference writes CSV with header-on-first-write and numbered run files
(store/xhs/xhs_store_impl.py:46-111) and read-modify-write JSON arrays
under a lock (:175-257). Distributed equivalents are plain ``df.write``
calls — run-numbered directories instead of numbered files, partitioned
writers instead of a lock. The primary sink remains the snapshot catalog
(Iceberg in production); these exist for parity + debugging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _next_run_dir(base: str, prefix: str) -> str:
    """Numbered run dirs mirroring calculate_number_of_files
    (store/xhs/xhs_store_impl.py:31-43)."""
    os.makedirs(base, exist_ok=True)
    existing = [
        int(d.split("_")[0])
        for d in os.listdir(base)
        if d.split("_")[0].isdigit() and d.endswith(f"_{prefix}")
    ]
    n = max(existing, default=0) + 1
    return os.path.join(base, f"{n}_{prefix}")


def write_csv(df: DataFrame, base_dir: str, name: str) -> str:
    path = _next_run_dir(base_dir, name)
    df.write.option("header", True).csv(path)
    return path


def write_json(df: DataFrame, base_dir: str, name: str) -> str:
    path = _next_run_dir(base_dir, name)
    df.write.json(path)
    return path


def write_parquet(df: DataFrame, base_dir: str, name: str) -> str:
    path = _next_run_dir(base_dir, name)
    df.write.parquet(path)
    return path


_WRITERS = {"csv": write_csv, "json": write_json, "parquet": write_parquet}


def save(df: DataFrame, option: str, base_dir: str, name: str) -> str:
    """Factory dispatch on SAVE_DATA_OPTION (store/xhs/__init__.py:26-38)."""
    try:
        writer = _WRITERS[option]
    except KeyError:
        raise ValueError(f"unknown sink option {option!r}; one of {sorted(_WRITERS)}")
    return writer(df, base_dir, name)

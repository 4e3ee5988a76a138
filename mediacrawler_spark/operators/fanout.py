"""Parallelism pin for fan-out (bucket / wedge) self-joins.

A bucket-keyed self-join's cost is its OUTPUT — quadratic in bucket
size (LSH bands, pigeonhole chunks, hyperplane buckets) or the wedge
fan-out (triangles) — but every input-size-based planner decision (AQE
partition coalescing, the broadcast-join threshold) only sees the
few-MB index frame feeding the join, and collapses it to one task.
Measured on the Ed-Join gram join at 100k values: 43.5s single-task
under AQE vs 2.9s with the shuffle parallelism kept (sf0.1 bench
session). The failure mode is scale-invariant: partitions are sized on
input bytes, so they under-provision by the fan-out factor at ANY
corpus size.

A user-specified repartition count is exempt from AQE coalescing, so
pinning the probe side of the join to the session's configured shuffle
parallelism restores scale-out without disabling AQE anywhere else;
the other side co-shuffles to the same partitioning, and the few-MB
extra exchange is noise next to the join it protects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-partition ``df`` on ``cols`` at the session's configured
    ``spark.sql.shuffle.partitions`` — an explicit user count, which AQE
    will not coalesce away. Use on the probe side of a fan-out join."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols)

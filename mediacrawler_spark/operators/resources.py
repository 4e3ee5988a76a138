"""Proxy / account resource assignment (SURVEY J4, W5, R4).

The reference rotates proxies by random choice + removal
(proxy/proxy_ip_pool.py:75-88), assigns tasks round-robin ``i % len(pool)``
(sdk/task_scheduler.py:76-77,116-117,155-157), and picks accounts by
least-recently-used sort (sdk/account_manager.py:53-71). Distributed
equivalents:

- **assignment** is a pure column expression — ``pmod(xxhash64(url,
  attempt), n)`` — joined against the broadcast resource table. Including
  ``attempt`` reproduces R4: a retry deterministically rotates to a
  different proxy (tieba/client.py:103-112).
- **LRU account pick** is a window: rank accounts per platform by
  (last_used, task_count, id) and take rank 1 (W5).

Both are deterministic, so crawl replays assign identical resources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

RESOURCES_DDL = (
    "resource_id int, resource_kind string, platform string, value string,"
    " last_used long, task_count long, healthy boolean"
)


def assign_resources(
    tasks: DataFrame,
    resources: DataFrame,
    kind: str = "proxy",
    url_col: str = "url",
) -> DataFrame:
    """Attach one healthy resource of ``kind`` per task row.

    Deterministic pmod assignment over the *healthy* pool, broadcast-joined
    (the pool is tiny). A retry row (attempt+1) hashes to a different slot
    — proxy rotation without state.
    """
    pool = (
        resources.filter((F.col("resource_kind") == kind) & F.col("healthy"))
        .withColumn(
            "slot",
            F.row_number().over(
                W.partitionBy("platform").orderBy("resource_id")
            )
            - 1,
        )
        .withColumn(
            "n_slots", F.count("*").over(W.partitionBy("platform"))
        )
        .select(
            F.col("platform").alias("_r_platform"),
            "slot",
            "n_slots",
            F.col("resource_id").alias(f"{kind}_id"),
            F.col("value").alias(f"{kind}_value"),
        )
    )
    joined = tasks.join(
        F.broadcast(pool),
        (tasks["platform"] == F.col("_r_platform"))
        & (
            F.pmod(F.xxhash64(F.col(url_col), F.col("attempt")), F.col("n_slots"))
            == F.col("slot")
        ),
        "left",
    )
    return joined.drop("_r_platform", "slot", "n_slots")


def pick_lru_account(accounts: DataFrame) -> DataFrame:
    """One account per platform: least (last_used, task_count), id tiebreak
    (reference sorts by exactly these — sdk/account_manager.py:66-70)."""
    w = W.partitionBy("platform").orderBy(
        F.col("last_used").asc(), F.col("task_count").asc(), F.col("resource_id").asc()
    )
    return (
        accounts.filter((F.col("resource_kind") == "account") & F.col("healthy"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def mark_used(resources: DataFrame, used: DataFrame, now_ts: int) -> DataFrame:
    """Post-epoch bookkeeping: bump last_used/task_count for resources that
    served fetches this epoch (used: resource_id + n_tasks)."""
    u = used.select(
        F.col("resource_id").alias("_u_id"), F.col("n_tasks").alias("_u_n")
    )
    joined = resources.join(u, resources["resource_id"] == F.col("_u_id"), "left")
    return joined.select(
        "resource_id",
        "resource_kind",
        "platform",
        "value",
        F.when(F.col("_u_id").isNotNull(), F.lit(now_ts))
        .otherwise(F.col("last_used"))
        .alias("last_used"),
        (F.col("task_count") + F.coalesce(F.col("_u_n"), F.lit(0))).alias("task_count"),
        "healthy",
    )

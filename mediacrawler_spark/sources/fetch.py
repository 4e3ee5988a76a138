"""The fetch stage (SURVEY S4-S7).

Two interchangeable implementations of the same stage contract
(frontier rows in → frontier rows + response columns out):

- ``fetch_via_corpus``: joins the selected frontier rows against a
  synthetic ``pages`` corpus — the test/bench responder (no live HTTP in
  this sandbox). The join replaces the network; everything else (status
  handling, retry classification) is identical to production.
- ``fetch_live``: the production shape — ``repartition(salted_host)`` then
  ``mapInPandas`` with a pluggable batch fetcher (one HTTP session per
  partition-task, strictly better than the reference's
  client-per-request — media_platform/xhs/client.py:99-100). Politeness
  pacing inside a partition is the fetcher's job; *which* rows may fetch
  this epoch was already decided by ``select_fetch_set``.

Status classification mirrors the reference:
- 200 → success,
- 471/461 (captcha/verify — media_platform/xhs/client.py:102-117) →
  retryable AND quarantines the host (R3),
- 5xx/timeouts → retryable (tenacity 3× — xhs/client.py:84),
- 403/404 → permanent failure, row dropped,
- absent from the corpus → 404.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRYABLE = (503, 500, 429, 471, 461)
BLOCKING = (471, 461)
PERMANENT = (403, 404)

RESPONSE_COLS = ("status", "body_kind", "note_id", "has_more", "next_cursor", "items", "comments")


def _fetch_exprs() -> dict:
    """Static Column trees of :func:`fetch_via_corpus`, built once per
    session (functions/exprcache.py). All references are unambiguous by
    construction: the pages side renames its url/status to ``_p_*``
    before the join, so ``url``/``attempt`` resolve to the selected
    side only."""
    status = (
        F.when(F.col("_p_url").isNull(), F.lit(404))
        # attempt-dependent transient failure (retry fixture)
        .when(F.col("attempt") < F.col("fail_times"), F.lit(503))
        .otherwise(F.col("_p_status"))
    )
    return {
        "resp_sel": [
            F.col("url").alias("_p_url"),
            F.col("status").alias("_p_status"),
            *[F.col(c) for c in ("body_kind", "note_id", "has_more", "next_cursor", "items", "comments")],
            F.col("fail_times"),
        ],
        "join_cond": F.col("url") == F.col("_p_url"),
        "fill": {
            "status": status,
            "body_kind": F.coalesce(F.col("body_kind"), F.lit("")),
            "note_id": F.coalesce(F.col("note_id"), F.lit("")),
            "has_more": F.coalesce(F.col("has_more"), F.lit(False)),
            "next_cursor": F.coalesce(F.col("next_cursor"), F.lit("")),
            "items": F.coalesce(F.col("items"), F.array()),
            "comments": F.coalesce(F.col("comments"), F.array()),
        },
    }


def fetch_via_corpus(selected: DataFrame, pages: DataFrame) -> DataFrame:
    """Attach synthetic responses. ``selected`` is one epoch's fetch set
    (small); ``pages`` is the web corpus (large). Catalyst/AQE picks the
    broadcast side; the join key is the exact URL."""
    from mediacrawler_spark.functions.exprcache import cached_exprs

    d = cached_exprs(_fetch_exprs)
    resp = pages.select(*d["resp_sel"])
    joined = selected.join(resp, d["join_cond"], "left")
    return joined.withColumns(d["fill"]).drop("_p_url", "_p_status", "fail_times")


def fetch_live(
    selected: DataFrame,
    fetcher: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema,
    n_partitions: int | None = None,
) -> DataFrame:
    """Production fetch: co-locate rows of one salted host split in one
    partition-task, hand the whole batch to ``fetcher`` (Arrow in/out).

    ``fetcher`` receives the frontier columns sorted by (priority, seq,
    url_hash) and must return them plus RESPONSE_COLS. It owns connection
    reuse and intra-batch pacing (the crawl_delay part of politeness).
    """
    parts = selected.repartition(
        *( [n_partitions] if n_partitions else [] ), F.col("salted_host")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["priority", "seq", "url_hash"], kind="mergesort")
            yield fetcher(pdf)

    return parts.mapInPandas(run, schema=output_schema)

"""mediacrawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (``TyGu888/MediaCrawler``, a single-process asyncio crawler for 7
social platforms) as idiomatic Spark DataFrame dataflow:

- the crawl frontier is a DataFrame/table, not a Python loop;
- URL-seen dedup is a partitioned Bloom-filter prefilter + exact
  ``left_anti`` join (the reference does a SELECT-by-key before INSERT,
  store/xhs/xhs_store_impl.py:127-133);
- politeness / priority is a window over (host, priority, seq) with salted
  skew-splitting of hot hosts (the reference sleeps + semaphore(5),
  media_platform/xhs/core.py:157,289-293);
- fetching is a vectorized ``applyInPandas`` stage per host partition
  (synthetic responder in tests — no live HTTP);
- each fetched document is decomposed into ordered
  ``(kind, text, media_ref, offset)`` spans — the per-row invariant;
- every epoch commits an atomic snapshot with per-partition lineage
  (Iceberg in production; a parquet snapshot log in this sandbox — see
  ``mediacrawler_spark.sinks.snapshot``).

No RDD API anywhere; no per-row Python UDFs — pandas/Arrow only.
"""

__version__ = "0.1.0"

from mediacrawler_spark.session import get_spark  # noqa: F401

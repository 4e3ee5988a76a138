#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine (north_rule: runs are
launched via ``spark-submit --py-files`` on a multi-executor cluster).

    spark-submit --master <cluster> \
        --py-files mediacrawler_spark.zip \
        scripts/run_crawl.py --catalog /path/to/catalog [--resume] ...

The package arrives via ``--py-files`` (driver + executors); nothing is
imported from the working directory. This demo drives the synthetic
fixture responder — a production deployment swaps ``fetch_via_corpus``
for the ``fetch_live`` mapInPandas HTTP fetcher and reads real seed
lists, robots, and politeness tables instead of ``build_universe``.

Prints ONE JSON line of run stats and exits non-zero on fsck problems.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="snapshot catalog dir")
    ap.add_argument("--notes", type=int, default=30)
    ap.add_argument("--hosts", type=int, default=4)
    ap.add_argument("--keywords", type=int, default=2)
    ap.add_argument("--max-epochs", type=int, default=100)
    ap.add_argument("--max-comments", type=int, default=25)
    ap.add_argument("--seen-filter", choices=("bloom", "cuckoo"), default="bloom")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the catalog's last commit (no seeds)")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the zip
    from pyspark.sql import SparkSession

    from mediacrawler_spark.fixtures import UniverseParams, build_universe
    from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
    from mediacrawler_spark.schemas import (
        PAGES_SCHEMA,
        POLITENESS_SCHEMA,
        ROBOTS_SCHEMA,
        SEEDS_SCHEMA,
    )
    from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

    # master/memory come from spark-submit; only analysis confs here
    spark = (
        SparkSession.builder.appName("mediacrawler_spark_crawl")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    u = build_universe(
        UniverseParams(
            n_notes=args.notes, n_hosts=args.hosts, n_keywords=args.keywords,
            search_pages_per_keyword=1, max_comments_per_note=args.max_comments,
        )
    )
    cat = SnapshotCatalog(spark, args.catalog)
    eng = CrawlEngine(
        spark, cat,
        spark.createDataFrame(u.pages, PAGES_SCHEMA),
        spark.createDataFrame(u.robots, ROBOTS_SCHEMA),
        spark.createDataFrame(u.politeness, POLITENESS_SCHEMA),
        EngineConfig(
            max_comments_per_note=args.max_comments,
            max_epochs=args.max_epochs,
            seen_filter=args.seen_filter,
        ),
    )
    seeds = None if args.resume else spark.createDataFrame(u.seeds, SEEDS_SCHEMA)
    res = eng.run(seeds)
    problems = cat.fsck()
    stats = {
        "epochs": len(res.epochs),
        "fetched": res.total_fetched,
        "admitted": res.total_admitted,
        "deduped": res.total_deduped,
        "documents": eng.documents().count(),
        "committed_epoch": cat.committed_epoch(),
        "seen_filter": args.seen_filter,
        "fsck_problems": problems,
    }
    print(json.dumps(stats))
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

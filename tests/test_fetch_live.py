"""Live-fetch contract (VERDICT r02 item 5): drive the production
``fetch_live`` shape (repartition by salted_host → mapInPandas with a
batch fetcher) through FULL engine runs with a stub session, and assert

1. inside every partition batch, rows of one host arrive in host_rank
   order (the politeness order the fetcher must honor for pacing), and
2. the whole crawl — seen set, per-host fetch log, assembled documents —
   equals the corpus-join fetch path on the same universe.

The stub fetcher serves from the same synthetic corpus dict a live
session would wrap, including the attempt-dependent transient-failure
(fail_times) and missing-URL→404 semantics of fetch_via_corpus
(sources/fetch.py docstring; reference status map
media_platform/xhs/client.py:84,102-117)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from mediacrawler_spark.fixtures import UniverseParams, build_universe
from mediacrawler_spark.plans.epoch import CrawlEngine, EngineConfig
from mediacrawler_spark.schemas import (
    PAGE_COMMENT_TYPE,
    PAGE_ITEM_TYPE,
    PAGES_SCHEMA,
    POLITENESS_SCHEMA,
    ROBOTS_SCHEMA,
    SEEDS_SCHEMA,
)
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog
from mediacrawler_spark.sources.fetch import fetch_live

CFG = EngineConfig(max_comments_per_note=25, max_epochs=80)

_RESPONSE_FIELDS = [
    T.StructField("status", T.IntegerType(), False),
    T.StructField("body_kind", T.StringType(), False),
    T.StructField("note_id", T.StringType(), False),
    T.StructField("has_more", T.BooleanType(), False),
    T.StructField("next_cursor", T.StringType(), False),
    T.StructField("items", T.ArrayType(PAGE_ITEM_TYPE, False), False),
    T.StructField("comments", T.ArrayType(PAGE_COMMENT_TYPE, False), False),
]

_EMPTY = {
    "body_kind": "",
    "note_id": "",
    "has_more": False,
    "next_cursor": "",
    "items": [],
    "comments": [],
}


def make_live_fetch_fn(pages_pdf: pd.DataFrame):
    """A (selected, pages)->DataFrame stage backed by fetch_live and a
    stub per-task 'session' closing over the corpus dict — the shape a
    real HTTP client plugs into."""
    lookup = {
        r["url"]: r for r in pages_pdf.to_dict("records")
    }

    def fetch_fn(selected, _pages_df):
        out_schema = T.StructType(list(selected.schema.fields) + _RESPONSE_FIELDS)
        cols = [f.name for f in out_schema.fields]

        def fetcher(pdf: pd.DataFrame) -> pd.DataFrame:
            # contract: fetch_live hands the batch sorted by
            # (priority, seq, url_hash); per host that must mean
            # ascending host_rank — the order select_fetch_set promised
            for host, g in pdf.groupby("host", sort=False):
                hr = g["host_rank"].tolist()
                if hr != sorted(hr):
                    raise AssertionError(
                        f"host {host}: batch order violates host_rank: {hr}"
                    )
            rows = []
            for rec in pdf.to_dict("records"):
                page = lookup.get(rec["url"])
                if page is None:
                    rec.update(status=404, **_EMPTY)
                else:
                    rec.update(
                        status=(
                            503
                            if rec["attempt"] < page["fail_times"]
                            else int(page["status"])
                        ),
                        body_kind=page["body_kind"],
                        note_id=page["note_id"],
                        has_more=bool(page["has_more"]),
                        next_cursor=page["next_cursor"],
                        items=list(page["items"]),
                        comments=list(page["comments"]),
                    )
                rows.append(rec)
            return pd.DataFrame(rows, columns=cols)

        return fetch_live(selected, fetcher, out_schema)

    return fetch_fn


@pytest.fixture(scope="module")
def both_runs(spark, tmp_path_factory):
    # a dedicated SMALL universe: the contract needs retries, comment
    # chains and multi-host politeness, not the big shared corpus — two
    # full crawls on the 60-note universe tripled this module's runtime
    uni = build_universe(
        UniverseParams(
            n_notes=20,
            n_hosts=4,
            n_keywords=2,
            search_pages_per_keyword=1,
            max_comments_per_note=25,
        )
    )
    frames = dict(
        pages=spark.createDataFrame(uni.pages, PAGES_SCHEMA),
        robots=spark.createDataFrame(uni.robots, ROBOTS_SCHEMA),
        politeness=spark.createDataFrame(uni.politeness, POLITENESS_SCHEMA),
    )
    seeds = spark.createDataFrame(uni.seeds, SEEDS_SCHEMA)
    runs = {}
    for mode in ("corpus", "live"):
        root = str(tmp_path_factory.mktemp(f"snap_fetch_{mode}"))
        fetch_fn = make_live_fetch_fn(uni.pages) if mode == "live" else None
        eng = CrawlEngine(
            spark,
            SnapshotCatalog(spark, root),
            frames["pages"],
            frames["robots"],
            frames["politeness"],
            CFG,
            fetch_fn=fetch_fn,
        )
        eng.run(seeds)
        runs[mode] = eng
    return runs


def test_live_fetch_seen_set_equal(both_runs):
    a = {r["url"] for r in both_runs["corpus"].catalog.read("seen").collect()}
    b = {r["url"] for r in both_runs["live"].catalog.read("seen").collect()}
    assert a == b and len(a) > 0


def test_live_fetch_ordering_equal(both_runs):
    def log(eng):
        return [
            (r["host"], r["epoch"], r["host_rank"], r["url"], r["status"])
            for r in eng.fetch_log()
            .orderBy("host", "epoch", "host_rank")
            .collect()
        ]

    assert log(both_runs["corpus"]) == log(both_runs["live"])


def test_live_fetch_documents_equal(both_runs):
    def docs(eng):
        return {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            ]
            for r in eng.documents().collect()
        }

    da, db = docs(both_runs["corpus"]), docs(both_runs["live"])
    assert da == db and len(da) > 0

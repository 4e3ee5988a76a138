#!/usr/bin/env python
"""Per-round benchmark. Prints ONE JSON line:

  {"metric": "frontier_urls_per_sec", "value": N, "unit": "urls/sec",
   "queries": {...per-query seconds...}, "sf": 0.1, ...}

Components:
- ``frontier``: the BASELINE.json headline — URLs scheduled+deduped/sec on
  a synthetic seed list (canonicalize → hash → dedup → bloom+anti-join →
  politeness top-k), all generated Spark-side.
- ``queries``: wall seconds for the heavyweight analytics/corpus operators
  from __spark_entry__.py at $SPARK_GRAFT_SF_DIR (default sf0.1).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_FRONTIER_URLS,
BENCH_SKIP_QUERIES=1 (frontier-only, used by the scaling runner).
"""

from __future__ import annotations

import json
import os
import sys
import time


def calib_probe_once() -> float:
    """One iteration of the fixed CPU probe (see ``host_calibration``).
    Exposed separately so the gated pair samplers can run a lightweight
    concurrent monitor DURING a measurement arm (a co-tenant patch fully
    contained inside one arm's execution is invisible to probes taken at
    the arm boundaries — observed 2026-08-19 12:31 UTC, pair_samples)."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    t0 = time.perf_counter()
    m = a
    for _ in range(8):
        m = m @ a
        m /= np.abs(m).max()
    acc = 0
    for i in range(200_000):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return time.perf_counter() - t0


def host_calibration() -> float:
    """Fixed CPU probe (seconds, best-of-3): a 512x512 float64 BLAS
    matmul chain plus a pure-Python hash loop. Emitted as
    ``host_calib_sec`` so cross-round per-query comparisons can be
    de-noised by the host's speed that day (this VM's co-tenancy windows
    spread same-binary numbers up to ~2.5x; BENCH/BASELINE.md round-4
    notes). Lower is faster; the number has no meaning on its own."""
    return round(min(calib_probe_once() for _ in range(3)), 4)


def _mc_burn(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return acc


def host_calibration_mc(procs: int = 8, n: int = 3_000_000) -> float:
    """Multi-core probe (wall seconds, best-of-2): the pure-Python hash
    loop in ``procs`` simultaneous processes. Round-5 A/B runs showed the
    single-threaded ``host_calib_sec`` can read healthy (0.044-0.053)
    while 32-thread Spark throughput swings 2x minute-to-minute — the
    co-tenant load lands on the OTHER cores. This probe exercises
    multi-core capacity directly; compare rounds at similar values.
    Lower is faster; meaningless on its own."""
    import multiprocessing as mp

    best = float("inf")
    with mp.Pool(procs) as pool:
        for _ in range(2):
            t0 = time.perf_counter()
            pool.map(_mc_burn, [n] * procs)
            best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def wait_for_healthy_window(
    max_wait_sec: float = 300.0, calib_ok: float = 0.08, calib_mc_ok: float = 0.42
) -> dict:
    """Bounded wait for a healthy host window before measuring.

    This VM's co-tenant windows inflate same-binary numbers up to ~2.5x
    (BENCH/BASELINE.md round-4/5 notes); the round-4 official artifact
    landed in one. Waiting a bounded time for BOTH calibration probes to
    return to the healthy band rescues artifacts from transient spikes.
    The final probe values are recorded in the artifact either way, so a
    still-sick artifact stays labeled as such. ``BENCH_NO_WAIT=1`` skips;
    ``BENCH_WAIT_SEC`` overrides the cap. Bands: single-core <= 0.08
    (healthy 0.044-0.053, sick windows 0.10-1.14), 8-proc <= 0.42
    (healthy 0.29-0.41, sick 0.45-0.61+)."""
    first = {"calib": host_calibration(), "calib_mc": host_calibration_mc()}
    probes, waited = 1, 0.0
    cur = dict(first)
    while (cur["calib"] > calib_ok or cur["calib_mc"] > calib_mc_ok) and waited < max_wait_sec:
        time.sleep(20)
        waited += 20
        cur = {"calib": host_calibration(), "calib_mc": host_calibration_mc()}
        probes += 1
    return {
        "calib_first": first["calib"],
        "calib_mc_first": first["calib_mc"],
        "waited_sec": round(waited, 1),
        "probes": probes,
        "healthy": cur["calib"] <= calib_ok and cur["calib_mc"] <= calib_mc_ok,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = int(os.environ.get("BENCH_FRONTIER_URLS", "2000000"))
    skip_queries = os.environ.get("BENCH_SKIP_QUERIES", "") == "1"

    from mediacrawler_spark.bench_workloads import assembly_bench, frontier_bench
    from mediacrawler_spark.session import get_spark

    window = None
    if os.environ.get("BENCH_NO_WAIT", "") != "1":
        window = wait_for_healthy_window(
            max_wait_sec=float(os.environ.get("BENCH_WAIT_SEC", "300"))
        )
        print(f"# window: {window}", file=sys.stderr)

    spark = get_spark(app_name="mediacrawler_spark_bench", cpus=cpus)

    fr = frontier_bench(spark, n_urls=n_urls)
    # The start gate can pass and a multi-minute co-tenant patch still
    # open DURING the measurement (round-5 evidence: gated run read
    # 13.4s best-of-3; the same binary measured 6.7s minutes later). If
    # the post-measure multicore probe says the window was contended,
    # wait it out (bounded) and re-measure once, keeping the best.
    if os.environ.get("BENCH_NO_WAIT", "") != "1" and host_calibration_mc() > 0.45:
        print("# frontier measured in a contended patch; re-sampling",
              file=sys.stderr)
        wait_for_healthy_window(max_wait_sec=180.0)
        fr2 = frontier_bench(spark, n_urls=n_urls, warmup=False)
        if fr2["seconds"] < fr["seconds"]:
            fr = fr2

    queries: dict[str, float] = {"frontier_admit_select": fr["seconds"]}
    asm = None
    if not skip_queries:
        asm = assembly_bench(spark)
        queries["doc_assembly_3m_spans"] = asm["seconds"]
    if not skip_queries:
        import __spark_entry__ as entry_mod

        qmap = entry_mod.queries()
        bench_queries = [
            "a1_wordcount_top20",
            "a1_wordcount_cjk",
            "j2_broadcast_dim_join",
            "w1_priority_topk",
            "w4_running_truncation",
            "sessionize",
            "window_5min",
            "dedup_exact_count",
            "dedup_minhash_lsh",
            "dedup_simhash",
            "dedup_embedding",
            "sim_cosine_topk",
            "sim_ann_lsh",
            "sim_ann_ivf",
            "txt_langid",
            "media_decode",
            "dedup_simhash_h3",
            "txt_repetition",
            "dedup_span_shared",
            "decontaminate_ngram",
            "dedup_clusters",
            "asof_join",
            "dedup_keep_canonical",
            "range_join",
            "tfidf_topterms",
            "agg_percentiles",
            "dedup_ngram_jaccard",
            "txt_line_dedup",
            "pack_sequences",
            "media_frame_sample",
            "sim_quantized_topk",
            "txt_lm_score",
            "graph_pagerank",
            "search_bm25",
            "approx_distinct_hll",
            "cms_term_counts",
            "agg_quantile_sampled",
            "txt_token_counts",
            "corpus_pipeline",
            "sample_token_budget",
            "semantic_dedup",
            "media_dedup",
            "media_dedup_near",
            "shard_assign",
            "dedup_containment",
            "term_drift",
            "media_audio_energy",
            "frontier_host_skew",
            "embedding_outliers",
            "dedup_span_remove",
            "ts_gapfill_locf",
            "ts_zscore_flags",
            "ts_time_weighted_avg",
            "funnel_conversion",
            "graph_triangles",
            "retention_cohorts",
            "pmi_collocations",
            "dedup_edit_distance",
            "media_scene_changes",
            "olap_topk_revenue",
            "dedup_incremental",
            "session_stats",
            "skipgram_cooc",
            "olap_rollup_stats",
            "graph_transitions",
            "graph_copageview",
            "trend_wow",
            "embedding_incremental",
            "rolling_dau_7d",
            "search_postings",
            "olap_pricing_summary",
            "scd2_intervals",
            "value_histogram",
            "zorder_layout",
            "pivot_user_events",
            "split_assign",
            "hll_merge_rollup",
            "rfm_segments",
            "topk_terms_by_lang",
            "trending_decay",
        ]
        for name in bench_queries:
            t0 = time.perf_counter()
            n = qmap[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            # best-of-2 for non-trivial queries: a co-tenant burst during
            # one query's single measurement otherwise lands in the
            # artifact as a fake regression (r4→r5 evidence: plan-
            # untouched queries read 1.2-2.3x slower in one gated run and
            # fastest-ever in the next). Sub-0.8s queries are dominated
            # by fixed job overhead and stay single-shot.
            if dt >= 0.8:
                t0 = time.perf_counter()
                qmap[name](spark, sf_dir).count()
                dt = min(dt, time.perf_counter() - t0)
            queries[name] = round(dt, 3)
            print(f"# {name}: {queries[name]}s ({n} rows)", file=sys.stderr)
        # End-of-run frontier re-sample (temporal diversity): the
        # queries take ~5-10 min, so this best-merge catches the case
        # where the start-of-run patch was slow and has since closed.
        fr2 = frontier_bench(spark, n_urls=n_urls, warmup=False)
        if fr2["seconds"] < fr["seconds"]:
            fr = fr2
        queries["frontier_admit_select"] = fr["seconds"]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "frontier_urls_per_sec",
        "value": fr["urls_per_sec"],
        "unit": "urls/sec",
        "queries": queries,
        "sf": sf_val,
        "frontier": fr,
        "cpus": cpus,
        # bumped whenever a query's DEFINITION changes (verify-then-report
        # rewrites etc.), so cross-round per-query comparison is only valid
        # at equal query_rev (VERDICT r02 "What's wrong" #3: the r01→r02
        # dedup_simhash/sim_ann_lsh row-count shift was a silent rewrite).
        # rev history: 1 = r01 originals; 2 = r02 verify-then-report
        # rewrites; 3 = r03 (adds dedup_simhash_h3; others unchanged);
        # 4 = r04 (adds sim_ann_ivf; others unchanged); 5 = r04 (adds
        # txt_repetition/dedup_span_shared/decontaminate_ngram corpus
        # ops; others unchanged); 6 = r04 (adds dedup_clusters/asof_join;
        # others unchanged); 7 = r05 (adds dedup_keep_canonical/range_join/
        # tfidf_topterms/agg_percentiles/dedup_ngram_jaccard/txt_line_dedup/
        # pack_sequences; others unchanged); 8 = r05 (adds
        # media_frame_sample; others unchanged); 9 = r05 (adds
        # sim_quantized_topk; others unchanged); 10 = r05 (adds
        # txt_lm_score; others unchanged); 11 = r05 (adds graph_pagerank/
        # search_bm25/approx_distinct_hll/cms_term_counts; others
        # unchanged); 12 = r05 (adds agg_quantile_sampled; others
        # unchanged); 13 = r05 (adds txt_token_counts/corpus_pipeline;
        # others unchanged); 14 = r05 (adds sample_token_budget; others
        # unchanged); 15 = r05 (adds semantic_dedup; others unchanged);
        # 16 = r05 (adds media_dedup; others unchanged); 17 = r05 (adds
        # shard_assign; others unchanged); 18 = r05 (adds
        # media_dedup_near; others unchanged); 19 = r05 (adds
        # dedup_containment, term_drift, media_audio_energy); 20 = r05
        # (adds frontier_host_skew; others unchanged); 21 = r05 (adds
        # embedding_outliers; others unchanged); 22 = r05 (adds
        # dedup_span_remove; others unchanged); 23 = r05 (adds
        # ts_gapfill_locf; others unchanged); 24 = r05 (adds
        # ts_zscore_flags; others unchanged); 25 = r05 (adds
        # ts_time_weighted_avg; others unchanged); 26 = r05 (adds
        # funnel_conversion; others unchanged); 27 = r05 (adds
        # graph_triangles, retention_cohorts; others unchanged); 28 =
        # r05 (adds pmi_collocations; others unchanged); 29 = r05 (adds
        # dedup_edit_distance; others unchanged); 30 = r05 (adds
        # media_scene_changes; others unchanged); 31 = r05 (adds
        # olap_topk_revenue; others unchanged); 32 = r05 (adds
        # dedup_incremental; others unchanged); 33 = r05 (adds
        # session_stats, skipgram_cooc, olap_rollup_stats,
        # graph_transitions, graph_copageview, trend_wow,
        # embedding_incremental, rolling_dau_7d, search_postings + the
        # non-benched stream_session_counts oracle row; others
        # unchanged); 34 = r05 (adds olap_pricing_summary,
        # scd2_intervals, value_histogram, zorder_layout,
        # pivot_user_events, split_assign, hll_merge_rollup,
        # rfm_segments + the non-benched stream_join_views_purchases
        # and stream_admission oracle rows; ALSO
        # changes trend_wow's warmup rows from NULLs to 0/0/0.0
        # sentinels (NULL-bearing bigint renders float64 in DuckDB's
        # pandas path — driver-hash dtype hazard); others unchanged);
        # 35 = r05 (adds topk_terms_by_lang, trending_decay; others
        # unchanged).
        "query_rev": 35,
        "host_calib_sec": host_calibration(),
        "host_calib_mc_sec": host_calibration_mc(),
    }
    if window is not None:
        out["window"] = window
    if asm is not None:
        out["doc_assembly"] = asm
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

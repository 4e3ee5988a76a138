"""The epoch-based crawl driver loop (SURVEY §3, §4).

One epoch = one Spark job DAG:

    candidates ── robots gate ── intra-batch dedup ── bloom+anti-join vs
    seen ──► admitted to frontier (+ seen append)
    frontier ── due filter ── politeness/priority two-phase top-k ──►
    fetch set ── fetch (corpus join / mapInPandas) ──► outcomes
    successes ──► span rows + successor candidates
    failures  ──► retry rows (backoff) / host quarantine
    everything ──► ONE snapshot commit (frontier, seen, spans, fetch_log,
    lineage) — resume re-reads the last commit (north_rule).

The reference's equivalent is its nested asyncio loops (SURVEY §3.1); the
epoch loop linearizes them: each platform page-loop iteration becomes a
frontier row fetched in some epoch, with cursor chains serialized across
epochs (risk §7.4.2 — throughput comes from breadth).

Snapshot writes double as iterative-loop lineage truncation: each epoch's
state is re-read from parquet, so the logical plan never grows with epoch
count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediacrawler_spark.operators.cuckoo import (
    CUCKOO_OVER_CAPACITY,
    CuckooParams,
    build_cuckoo_table,
    dedup_against_seen_cuckoo,
    insert_into_cuckoo,
)
from mediacrawler_spark.operators.dedup import (
    BloomParams,
    build_bloom_table,
    dedup_against_seen_bloom,
    dedup_within_batch,
    or_merge_bloom,
)
from mediacrawler_spark.operators.extract import (
    SPAN_ROWS_SCHEMA,
    assemble_documents,
    extract_span_rows,
)
from mediacrawler_spark.operators.frontier import (
    FRONTIER_COLS,
    classify_outcomes,
    emit_successors,
    seeds_to_candidates,
)
from mediacrawler_spark.functions.urls import host_of, with_canonical_url
from mediacrawler_spark.operators.politeness import (
    apply_robots,
    merge_quarantine,
    select_fetch_set,
)
from mediacrawler_spark.schemas import FRONTIER_SCHEMA, SEEN_SCHEMA
from mediacrawler_spark.sinks.snapshot import SnapshotCatalog
from mediacrawler_spark.sources.fetch import fetch_via_corpus


@dataclass
class EngineConfig:
    default_budget: int = 8
    salt_splits: int = 8
    comments_per_page: int = 10
    max_comments_per_note: int = 500
    max_pages_per_chain: int = 1000  # cursor-chain safety valve (oracle-mirrored)
    max_epochs: int = 200
    # append-table compaction threshold (Iceberg rewrite_data_files analog):
    # rewrite per-epoch dirs into one once a table exceeds this many
    compact_appends_after: int = 32
    # commit-log roll threshold (Iceberg metadata-file roll analog): once
    # the jsonl exceeds this many records, rewrite it to the last 2
    # checkpoint records so startup/maintenance parses stay O(1) in epochs
    commit_log_max_lines: int = 64
    # snapshot-expiry depth (Iceberg expire_snapshots analog): maintenance
    # keeps version/ptable-leaf dirs pinned by this many recent commits.
    # This is also the catalog.rollback_to reach knob — rollback refuses
    # records whose pins expiry removed, so deepen this (and the prune /
    # compaction thresholds) when operational rewind matters more than
    # storage.
    expire_keep_last: int = 2
    # frontier hash-partition count (pmod(url_hash, P) directory layout):
    # a commit rewrites only partitions the epoch touched, so bytes written
    # per epoch is O(delta/P share), not O(|frontier|). Size so one
    # partition ≈ a few hundred MB at the design point (10^10 rows → P in
    # the thousands); the sandbox default keeps partitions non-trivial at
    # test scale while still exercising partial rewrites.
    frontier_partitions: int = 32
    # adaptive repartitioning: when the largest committed frontier
    # partition exceeds this many bytes, maintenance doubles P via a
    # full-dirty rewrite (VERDICT r03 #4 — P is otherwise pinned at
    # catalog creation, and the 10^10 design point needs thousands of
    # partitions a fresh catalog wouldn't start with). Default sized so a
    # partition stays comfortably inside one executor task's memory.
    frontier_max_part_bytes: int = 256 << 20
    # URL-seen prefilter kind (north_rule "bloom/cuckoo"): bloom is the
    # smaller append-only default; cuckoo supports DELETE for TTL/eviction
    # re-crawl scenarios (operators/cuckoo.py)
    seen_filter: str = "bloom"
    bloom_fpp: float = 0.01
    # FLOOR for the filter shard count; rebuilds raise it adaptively so
    # one shard's serialized state stays under filter_shard_target_bytes
    # (see _filter_shards_for) — 16 fixed shards at the 10^10-key design
    # point would mean ~750 MB bloom rewrites per dirty shard.
    bloom_shards: int = 16
    filter_shard_target_bytes: int = 32 << 20
    # above this total bitmap size the probe switches from broadcast-dict
    # to shard-wise cogroup (one shard per task, never the whole filter)
    bloom_broadcast_max_bytes: int = 32 << 20
    epoch_ts: int = 1_700_000_000  # deterministic "now" for robots TTL


@dataclass
class EpochStats:
    epoch: int
    admitted: int
    deduped: int
    fetched: int
    emitted: int


@dataclass
class RunResult:
    epochs: list[EpochStats] = field(default_factory=list)

    @property
    def total_fetched(self) -> int:
        return sum(e.fetched for e in self.epochs)

    @property
    def total_admitted(self) -> int:
        return sum(e.admitted for e in self.epochs)

    @property
    def total_deduped(self) -> int:
        return sum(e.deduped for e in self.epochs)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        pages: DataFrame,
        robots: DataFrame,
        politeness: DataFrame,
        config: EngineConfig | None = None,
        fetch_fn=None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.pages = pages
        self.robots = robots
        self.politeness = politeness
        self.cfg = config or EngineConfig()
        # pluggable fetch stage (selected, pages) -> fetched DataFrame:
        # default is the corpus-join responder; production passes a
        # fetch_live wrapper (sources/fetch.py) — same stage contract
        self.fetch_fn = fetch_fn or fetch_via_corpus
        # engine-owned winner-set cache slot: interleaved engines in one
        # process must not unpersist each other's live winner DataFrame
        self._winner_cache: dict = {}
        # static admission expressions built once — re-building them per
        # epoch was pure py4j chatter (round-5 profile). Canonicalization
        # itself is DataFrame-level (with_canonical_url: codegen for
        # eligible rows, Arrow UDF only on the complement).
        self._url_hash = F.xxhash64("url")
        self._host_col = host_of(F.col("url"))

    # -- state accessors (resume-aware) --------------------------------------
    def _frontier(self) -> DataFrame:
        df = self.catalog.read("frontier")
        return df if df is not None else self.spark.createDataFrame([], FRONTIER_SCHEMA)

    def _frontier_nparts(self) -> int:
        """Partition count of the frontier ptable — pinned in the snapshot
        (a resumed crawl must keep the layout it committed with), config
        only seeds a fresh catalog."""
        ent = self.catalog.ptable_meta("frontier")
        return int(ent["n"]) if ent else self.cfg.frontier_partitions

    def _seen(self) -> DataFrame:
        df = self.catalog.read("seen")
        return df if df is not None else self.spark.createDataFrame([], SEEN_SCHEMA)

    def _candidates(self) -> DataFrame:
        df = self.catalog.read("candidates")
        return df if df is not None else self.spark.createDataFrame([], FRONTIER_SCHEMA)

    def _quarantine(self) -> DataFrame:
        df = self.catalog.read("quarantine")
        if df is not None:
            return df
        return self.spark.createDataFrame(
            [], "host string, quarantined_until int"
        )

    # -- persistent bloom state (incremental URL-seen prefilter) -------------
    def _load_bloom(self) -> dict | None:
        """Resume the seen-prefilter from the snapshot (table + sizing
        meta). Returns None on a fresh catalog, one predating filter
        persistence, or a filter-kind switch — the first epoch then
        rebuilds from ``seen``."""
        m = self.catalog.meta().get("bloom")
        if m and self.catalog.has("bloom") and m.get("kind", "bloom") == self.cfg.seen_filter:
            if m.get("kind", "bloom") == "cuckoo":
                params = CuckooParams(
                    n_shards=int(m["n_shards"]), n_buckets=int(m["n_buckets"])
                )
            else:
                params = BloomParams(
                    n_shards=int(m["n_shards"]), m_bits=int(m["m_bits"]), k=int(m["k"])
                )
            return {
                "kind": m.get("kind", "bloom"),
                "params": params,
                "capacity": int(m["capacity"]),
                "n_inserted": int(m["n_inserted"]),
                "df": self._filter_df(self.catalog.read("bloom")),
            }
        return None

    def _filter_shards_for(self, capacity: int) -> int:
        """Shard count for a filter sized to ``capacity`` keys: the
        smallest power of two (≥ the ``bloom_shards`` floor) that keeps
        one shard's serialized state under ``filter_shard_target_bytes``.

        Chosen at (re)build time only — every rebuild is already a
        full-shard rewrite, so growing the shard count there is free,
        and the commit meta pins it for resume. Bounds both the
        per-epoch dirty-shard write (O(target) per touched shard, not
        O(|filter|/16)) and the unit of work of the shard-wise cogroup
        probe — the same geometric discipline as _maybe_grow_frontier."""
        import math

        if self.cfg.seen_filter == "cuckoo":
            # 4 slots × 2 B per bucket at ~0.84 target load → ~2.4 B/key
            bytes_per_key = 8.0 / (4 * 0.84)
        else:
            bytes_per_key = -math.log(self.cfg.bloom_fpp) / (math.log(2) ** 2) / 8.0
        total = capacity * bytes_per_key
        need = max(1.0, total / self.cfg.filter_shard_target_bytes)
        return max(self.cfg.bloom_shards, 1 << math.ceil(math.log2(need)))

    def _ensure_bloom(self, bloom: dict | None, seen: DataFrame, n_batch: int) -> dict:
        """(Re)build the filter only when absent or about to exceed capacity.

        Sizing is by the CUMULATIVE seen-set cardinality (not the current
        batch — VERDICT r01 item 2: batch-sized filters saturate after a
        few epochs and silently degrade to a full anti-join). Capacity
        doubles on each rebuild, so total rebuild work over a whole crawl
        is O(|seen|) amortized; every other epoch pays only the O(delta)
        OR-merge in :meth:`_advance_bloom`.

        The headroom check includes the INCOMING batch (ADVICE r02 medium:
        ``n_batch`` bounds this epoch's admitted delta — checking only
        ``n_inserted`` let a cuckoo table overflow mid-insert and abort the
        epoch; the bloom path merely degraded fpp for one epoch). The new
        capacity ``2·max(n_seen, 4·n_batch)`` always covers
        ``n_seen + n_batch``.
        """
        if bloom is not None and bloom["n_inserted"] + n_batch <= bloom["capacity"]:
            return bloom
        n_seen = bloom["n_inserted"] if bloom is not None else seen.count()
        capacity = max(1024, 2 * max(n_seen, n_batch * 4))
        n_shards = self._filter_shards_for(capacity)
        if self.cfg.seen_filter == "cuckoo":
            params = CuckooParams.size(capacity, n_shards)
            table = build_cuckoo_table(seen.select("url_hash"), params)
        else:
            params = BloomParams.size(capacity, self.cfg.bloom_fpp, n_shards)
            table = build_bloom_table(seen.select("url_hash"), params)
        self._stage_bloom(table, params.n_shards, list(range(params.n_shards)))
        return {
            "kind": self.cfg.seen_filter,
            "params": params,
            "capacity": capacity,
            "n_inserted": n_seen,
            "df": self._filter_df(self.catalog.read_staged_parts("bloom")),
        }

    def _stage_bloom(self, table: DataFrame, n_shards: int, dirty: list[int]) -> None:
        """Stage filter shards as a partitioned replace table — a rebuild
        rewrites every shard; the per-epoch delta rewrites ONLY shards the
        admitted keys touched (VERDICT r02 item 1: at the ~12 GB design
        point a full state rewrite per epoch is pure write amplification)."""
        self.catalog.stage_parts(
            table.withColumn("_part", F.col("shard")), "bloom", n_shards, dirty
        )

    def _filter_df(self, staged: DataFrame | None) -> DataFrame:
        """Filter-table handle; empty shards have no row (an all-empty
        filter — fresh crawl — has no partitions at all)."""
        if staged is not None:
            return staged
        payload = "state" if self.cfg.seen_filter == "cuckoo" else "bitmap"
        return self.spark.createDataFrame([], f"shard int, {payload} binary")

    def _advance_bloom(
        self,
        bloom: dict,
        admitted: DataFrame,
        n_admitted: int,
        seen: DataFrame,
        dirty_shards: list[int] | None = None,
    ) -> dict:
        """Fold the epoch's admitted delta into the persisted filter —
        O(delta) work and an O(dirty shards) state write per epoch,
        independent of |seen| (VERDICT r01 item 3: never rebuild from the
        full seen set; VERDICT r02 item 1: never rewrite untouched
        shards). Zero-admission epochs (backoff/drain tail — common) skip
        the build+merge+stage entirely.

        ``dirty_shards`` = pmod(url_hash, n_shards) over the admitted keys
        (the caller usually knows it from the shared dirty-partition job);
        None computes it here.

        Cuckoo inserts can fail probabilistically even under nominal
        capacity (kick-chain exhaustion near the 0.84 load target); the
        proactive headroom check in :meth:`_ensure_bloom` makes this rare,
        but on overflow the epoch must not abort — rebuild at doubled
        capacity from seen ∪ delta instead (ADVICE r02 medium)."""
        if n_admitted == 0:
            return bloom
        params = bloom["params"]
        keys = admitted.select("url_hash")
        if dirty_shards is None:
            dirty_shards = [
                int(r["s"])
                for r in keys.select(
                    F.pmod(F.col("url_hash"), F.lit(params.n_shards)).alias("s")
                )
                .distinct()
                .collect()
            ]
        old_dirty = bloom["df"].where(
            F.col("shard").isin([int(s) for s in dirty_shards])
        )
        if bloom["kind"] == "cuckoo":
            merged = insert_into_cuckoo(old_dirty, keys, params)
            try:
                self._stage_bloom(merged, params.n_shards, dirty_shards)
            except Exception as e:  # Py4J wraps the executor RuntimeError
                if CUCKOO_OVER_CAPACITY not in str(e):
                    raise
                capacity = 2 * max(
                    bloom["capacity"], bloom["n_inserted"] + n_admitted
                )
                params = CuckooParams.size(capacity, self._filter_shards_for(capacity))
                all_keys = seen.select("url_hash").unionByName(keys)
                self._stage_bloom(
                    build_cuckoo_table(all_keys, params),
                    params.n_shards,
                    list(range(params.n_shards)),
                )
                return {
                    "kind": "cuckoo",
                    "params": params,
                    "capacity": capacity,
                    "n_inserted": bloom["n_inserted"] + n_admitted,
                    "df": self._filter_df(self.catalog.read_staged_parts("bloom")),
                }
        else:
            delta = build_bloom_table(keys, params)
            merged = or_merge_bloom(old_dirty, delta, params.m_bits // 8)
            self._stage_bloom(merged, params.n_shards, dirty_shards)
        return {
            **bloom,
            "n_inserted": bloom["n_inserted"] + n_admitted,
            "df": self._filter_df(self.catalog.read_staged_parts("bloom")),
        }

    def _bloom_meta(self, bloom: dict) -> dict:
        p = bloom["params"]
        meta = {
            "kind": bloom["kind"],
            "n_shards": p.n_shards,
            "capacity": bloom["capacity"],
            "n_inserted": bloom["n_inserted"],
        }
        if bloom["kind"] == "cuckoo":
            meta["n_buckets"] = p.n_buckets
        else:
            meta.update({"m_bits": p.m_bits, "k": p.k})
        return meta

    def documents(self) -> DataFrame:
        span_rows = self.catalog.read("span_rows")
        if span_rows is None:
            span_rows = self.spark.createDataFrame([], SPAN_ROWS_SCHEMA)
        return assemble_documents(span_rows)

    def fetch_log(self) -> DataFrame:
        df = self.catalog.read("fetch_log")
        if df is None:
            return self.spark.createDataFrame(
                [], "epoch int, host string, host_rank int, url string, kind string, status int"
            )
        return df

    def _maybe_grow_frontier(self) -> bool:
        """Double the frontier partition count when the largest committed
        partition leaf exceeds ``frontier_max_part_bytes``.

        One full-dirty rewrite commit under the new ``pmod(url_hash, 2P)``
        layout; the next epoch picks the new P up from the snapshot pin
        (``_frontier_nparts``) and goes back to O(dirty)-partition
        rewrites. Doubling keeps total re-layout work O(|frontier|·log P)
        over a whole crawl — the geometric-growth argument of the bloom
        capacity policy. Runs between epochs only (maintenance), so no
        pending stages and no live lazy readers of the old layout."""
        ent = self.catalog.ptable_meta("frontier")
        if not ent or not ent["parts"]:
            return False
        sizes = self.catalog.ptable_part_bytes("frontier")
        if not sizes or max(sizes.values()) <= self.cfg.frontier_max_part_bytes:
            return False
        new_n = int(ent["n"]) * 2
        part = F.pmod(F.col("url_hash"), F.lit(new_n)).cast("int")
        self.catalog.stage_parts(
            self.catalog.read("frontier")
            .withColumn("_part", part)
            .repartition(new_n, "_part"),
            "frontier",
            new_n,
            list(range(new_n)),
        )
        self.catalog.commit(self.catalog.committed_epoch())
        return True

    def _migrate_legacy_state(self) -> None:
        """Fold a pre-ptable snapshot (frontier/bloom committed as FULL
        replace tables, rounds ≤2) into the partitioned layout with one
        full-dirty migration commit before the first resumed epoch.

        Without this, resuming an old-format snapshot silently corrupts
        state (ADVICE r03 medium): ``read_parts('frontier', dirty)``
        returns None — the epoch's touched set collapses to the admitted
        delta, losing every committed deferred frontier row — and
        ``stage_parts('bloom', base=None)`` keeps only dirty pins, so
        clean shards vanish and the definitely-new fast path (which skips
        the left_anti confirm) re-admits already-seen URLs."""
        needs = [
            t
            for t in ("frontier", "bloom")
            if self.catalog.legacy_version(t) is not None
        ]
        if not needs:
            return
        if "frontier" in needs:
            n = self.cfg.frontier_partitions
            df = self.catalog.read("frontier")
            self.catalog.stage_parts(
                df.withColumn(
                    "_part", F.pmod(F.col("url_hash"), F.lit(n)).cast("int")
                ),
                "frontier",
                n,
                list(range(n)),
            )
            self.catalog.drop_table("frontier")
        if "bloom" in needs:
            m = self.catalog.meta().get("bloom") or {}
            n_shards = int(m.get("n_shards", self.cfg.bloom_shards))
            self._stage_bloom(self.catalog.read("bloom"), n_shards, list(range(n_shards)))
            self.catalog.drop_table("bloom")
        self.catalog.commit(self.catalog.committed_epoch())

    # -- the loop -------------------------------------------------------------
    def run(self, seeds: DataFrame | None, max_epochs: int | None = None) -> RunResult:
        """Run (or resume) the crawl until the frontier drains.

        ``seeds`` is only consumed on a fresh catalog; on resume the
        candidate/frontier state comes from the last commit.
        """
        cfg = self.cfg
        result = RunResult()
        self._migrate_legacy_state()
        start_epoch = self.catalog.committed_epoch() + 1
        if start_epoch == 0:
            if seeds is None:
                raise ValueError("fresh run needs seeds")
            candidates = seeds_to_candidates(seeds, epoch=0)
        else:
            candidates = self._candidates()

        frontier = self._frontier()
        seen = self._seen()
        quarantine = self._quarantine()
        bloom = self._load_bloom()

        for epoch in range(start_epoch, start_epoch + (max_epochs or cfg.max_epochs)):
            # Every stage below is computed ONCE and materialized (staged to
            # the snapshot), then downstream reads the materialized result —
            # no chain is re-executed for counts or secondary consumers.

            # 1. admission: canonicalize → robots → intra-batch dedup →
            #    bloom+anti-join (successor URLs from live pages may be
            #    non-canonical; fixture URLs already are — no-op there)
            candidates = (
                with_canonical_url(candidates)
                .withColumn("url_hash", self._url_hash)
                .withColumn("host", self._host_col)
            )
            gated = apply_robots(candidates, self.robots, cfg.epoch_ts)
            # persist: the admission chain (canonicalize UDF → robots →
            # dedup shuffle) is consumed by the count, the bloom probe,
            # and the anti-join — without it the chain would execute 3×
            unique_batch = dedup_within_batch(gated).persist()
            n_batch = unique_batch.count()
            bloom = self._ensure_bloom(bloom, seen, n_batch)
            if bloom["n_inserted"] == 0:
                # empty seen set (first epoch): everything is new — skip
                # the filter collect/probe/anti-join jobs outright
                deduped = unique_batch
            elif bloom["kind"] == "cuckoo":
                deduped = dedup_against_seen_cuckoo(
                    unique_batch, seen, bloom["df"], bloom["params"]
                )
            else:
                deduped = dedup_against_seen_bloom(
                    unique_batch,
                    seen,
                    bloom["df"],
                    bloom["params"],
                    cfg.bloom_broadcast_max_bytes,
                )
            admitted = (
                deduped.withColumn("epoch", F.lit(epoch))
                .withColumn(
                    "not_before_epoch", F.greatest("not_before_epoch", F.lit(epoch))
                )
                .select(*FRONTIER_COLS)
            )
            self.catalog.stage_append(admitted, "admitted", epoch)
            unique_batch.unpersist()
            admitted = self.catalog.read_staged("admitted", epoch)
            # seen delta derives from the already-materialized parquet
            self.catalog.stage_append(
                admitted.select("url_hash", "url"), "seen", epoch
            )
            # footer-metadata count — zero Spark jobs (VERDICT r02 item 9)
            n_admitted = self.catalog.staged_append_rows("admitted", epoch)
            n_dedup = n_batch - n_admitted
            frontier = frontier.unionByName(admitted)

            # 2. selection: politeness budgets + dynamic quarantine
            # (full-outer merge — quarantine must survive for hosts that
            # have no politeness row; see merge_quarantine docstring)
            pol = merge_quarantine(self.politeness, quarantine)
            selected, _ = select_fetch_set(
                frontier, pol, epoch, cfg.default_budget, cfg.salt_splits,
                cache=self._winner_cache,
            )

            # 3. fetch — materialized once; everything downstream reads it
            fetched = self.fetch_fn(selected, self.pages)
            self.catalog.stage_append(fetched, "fetched", epoch)
            fetched = self.catalog.read_staged("fetched", epoch)
            n_fetched = self.catalog.staged_append_rows("fetched", epoch)

            # dirty-partition discovery: the epoch's frontier mutations are
            # exactly +admitted −fetched +retries (retries ⊆ fetched), so
            # the touched frontier partitions — and the filter shards the
            # admitted keys land in — come from ONE tiny aggregate over the
            # two already-materialized delta tables.
            n_parts = self._frontier_nparts()
            part = F.pmod(F.col("url_hash"), F.lit(n_parts)).cast("int")
            if n_admitted or n_fetched:
                shard = F.pmod(
                    F.col("url_hash"), F.lit(bloom["params"].n_shards)
                ).cast("int")
                drow = (
                    admitted.select(part.alias("fp"), shard.alias("sh"))
                    .unionByName(
                        fetched.select(
                            part.alias("fp"), F.lit(None).cast("int").alias("sh")
                        )
                    )
                    .agg(
                        F.collect_set("fp").alias("fp"),
                        F.collect_set("sh").alias("sh"),
                    )
                    .collect()[0]
                )
                dirty_parts = sorted(int(x) for x in drow["fp"])
                dirty_shards = sorted(int(x) for x in drow["sh"])
            else:
                dirty_parts, dirty_shards = [], []
            bloom = self._advance_bloom(bloom, admitted, n_admitted, seen, dirty_shards)

            out = classify_outcomes(fetched, epoch)
            successes = out["successes"]

            # 4. extraction + successors
            spans_e = extract_span_rows(
                successes, cfg.comments_per_page, cfg.max_comments_per_note
            )
            successors = emit_successors(
                successes,
                epoch,
                cfg.comments_per_page,
                cfg.max_comments_per_note,
                cfg.max_pages_per_chain,
            )
            fetch_log_e = fetched.select(
                F.lit(epoch).alias("epoch"),
                F.col("host"),
                F.col("host_rank").cast("int"),
                F.col("url"),
                F.col("kind"),
                F.col("status").cast("int"),
            )

            # 5. state transition — the frontier is a hash-partitioned
            # ptable: ONLY dirty partitions are rewritten (their full new
            # content = kept rows minus fetched plus retries; admitted rows
            # are in dirty partitions by construction). Clean partitions
            # keep their committed pins — bytes written per epoch is
            # O(dirty partitions), not O(|frontier|) (VERDICT r02 item 1).
            if dirty_parts:
                # read ONLY the dirty leaf dirs of the committed frontier
                # (directory-level pruning — clean partitions are never
                # scanned) and the admitted delta (all in dirty partitions
                # by construction), instead of filtering the full frontier
                committed_touched = self.catalog.read_parts("frontier", dirty_parts)
                touched = (
                    admitted
                    if committed_touched is None
                    else committed_touched.unionByName(admitted)
                )
                deferred_dirty = touched.join(
                    fetched.select("url_hash"), on="url_hash", how="left_anti"
                )
                frontier_next_dirty = deferred_dirty.select(
                    *FRONTIER_COLS
                ).unionByName(out["retries"].select(*FRONTIER_COLS))
                self.catalog.stage_parts(
                    frontier_next_dirty.withColumn("_part", part).repartition(
                        len(dirty_parts), "_part"
                    ),
                    "frontier",
                    n_parts,
                    dirty_parts,
                )
            # expired rows (quarantined_until ≤ this epoch) can never block
            # again — selection at epoch E' > epoch needs until > E'. Drop
            # them here so the committed table is O(active quarantines),
            # not O(every host ever quarantined) rewritten per epoch
            # (VERDICT r03 #2; oracle.py mirrors the prune — CLAUDE.md
            # invariant: both sides).
            quarantine = (
                quarantine.unionByName(out["quarantined_hosts"])
                .groupBy("host")
                .agg(F.max("quarantined_until").alias("quarantined_until"))
                .filter(F.col("quarantined_until") > F.lit(epoch))
            )

            # 6. snapshot commit (atomic; also truncates plan lineage)
            self.catalog.stage(successors, "candidates")
            self.catalog.stage(quarantine, "quarantine")
            self.catalog.stage_append(spans_e, "span_rows", epoch)
            self.catalog.stage_append(fetch_log_e, "fetch_log", epoch)
            n_emitted = self.catalog.staged_rows("candidates")
            # Lineage (north_rule: frontier epoch, partition id, fetch
            # counts): fetch_count is attributed PER PARTITION; dedup and
            # emitted counts are epoch-level facts (they have no
            # per-fetch-partition meaning — dropped candidates never
            # reach a salted host) and live on ONE summary row with
            # partition_id = -1, so per-partition sums stay meaningful
            # (VERDICT r03 #7; fsck checks the shape).
            per_part = fetched.groupBy(
                F.lit(epoch).alias("frontier_epoch"),
                F.pmod(F.xxhash64("salted_host"), F.lit(1024))
                .cast("int")
                .alias("partition_id"),
            ).agg(
                F.count("*").alias("fetch_count"),
                F.lit(None).cast("long").alias("dedup_count"),
                F.lit(None).cast("long").alias("emitted_count"),
            )
            epoch_row = self.spark.createDataFrame(
                [(epoch, -1, None, n_dedup, n_emitted)],
                "frontier_epoch int, partition_id int, fetch_count bigint, "
                "dedup_count bigint, emitted_count bigint",
            )
            lineage_e = per_part.unionByName(epoch_row).withColumn(
                "committed_at", F.lit(cfg.epoch_ts + epoch).cast("long")
            )
            self.catalog.stage_append(lineage_e, "lineage", epoch)
            self.catalog.commit(epoch, meta={"bloom": self._bloom_meta(bloom)})

            if epoch % 8 == 7:
                # Iceberg maintenance analog: compact accumulated append
                # dirs (rewrite_data_files), then drop dead versions +
                # swapped-out append dirs (expire_snapshots, risk §7.4.5)
                for t in ("seen", "span_rows", "fetch_log", "lineage"):
                    self.catalog.compact_appends(t, cfg.compact_appends_after)
                # admitted/fetched are single-epoch materialization
                # artifacts, never read after their commit — drop instead
                # of compacting (VERDICT r03 #3: retained forever they
                # duplicate seen/fetch_log, ~2× long-run snapshot bytes)
                for t in ("admitted", "fetched"):
                    self.catalog.prune_appends(t, min_epoch=epoch - 1)
                self._maybe_grow_frontier()
                self.catalog.expire_versions(keep_last=cfg.expire_keep_last)
                self.catalog.roll_log(keep=2, max_lines=cfg.commit_log_max_lines)

            # re-read state: bounds DAG depth across epochs (quarantine
            # included — its lazy union chain would otherwise reference
            # every past epoch's fetched dir, growing the plan per epoch
            # and dangling once maintenance expires those dirs)
            frontier = self._frontier()
            seen = self._seen()
            candidates = self._candidates()
            quarantine = self._quarantine()

            result.epochs.append(
                EpochStats(epoch, n_admitted, n_dedup, n_fetched, n_emitted)
            )
            if n_fetched == 0 and n_emitted == 0 and n_admitted == 0:
                # frontier may still hold backoff rows; drained otherwise
                # (footer-metadata count of the committed ptable — no job)
                if self.catalog.ptable_rows("frontier") == 0:
                    break
        return result

"""Single-threaded Python crawl oracle (SURVEY §5.2.3).

Independently reimplements the engine's crawl semantics — the reference's
loop semantics made deterministic (pages in order, notes before comment
pages, per-host budgets, exact dedup, retry/backoff/quarantine, robots) —
with plain dicts and lists, no Spark. The Spark engine must match it on:

- per-host fetch order (the crawl-ordering match rate of BASELINE.json),
- the final URL-seen set (exact equality),
- every document's span sequence (the per-row invariant).

It shares ONLY two pure functions with the engine (canonicalization and
xxhash64 — key parity is the point, and both are tested against Spark
directly); all control flow is written from scratch here.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import pandas as pd

from mediacrawler_spark.functions.urls import canonicalize_one
from mediacrawler_spark.functions.xxhash import spark_xxhash64_str

RETRYABLE = (503, 500, 429, 471, 461)
BLOCKING = (471, 461)
MAX_ATTEMPTS = 3
BACKOFF_CAP = 8
QUARANTINE_EPOCHS = 2


@dataclass(frozen=True)
class Task:
    url: str
    url_hash: int
    host: str
    platform: str
    kind: str
    priority: int
    seq: int
    parent_id: str | None = None
    cursor: str = ""
    parent_seq: int = -1
    empty_streak: int = 0
    attempt: int = 0
    not_before_epoch: int = 0


def _task(url: str, **kw) -> Task:
    url = canonicalize_one(url)
    host = url.split("/")[2].lower()
    return Task(url=url, url_hash=spark_xxhash64_str(url), host=host, **kw)


@dataclass
class OracleResult:
    fetch_order: dict[str, list[tuple[str, int, str]]] = field(default_factory=dict)
    # host -> [(url, epoch, kind)] in fetch order
    seen: set[str] = field(default_factory=set)  # canonical urls admitted
    documents: dict[str, list[tuple[str, str, str, int]]] = field(default_factory=dict)
    # doc_id -> [(kind, text, media_ref, offset)]
    total_fetched: int = 0
    epochs: int = 0


class CrawlOracle:
    def __init__(
        self,
        pages: pd.DataFrame,
        robots: pd.DataFrame,
        politeness: pd.DataFrame,
        default_budget: int = 8,
        comments_per_page: int = 10,
        max_comments_per_note: int = 500,
        max_pages_per_chain: int = 1000,
        epoch_ts: int = 1_700_000_000,
    ):
        self.pages = {r["url"]: r for r in pages.to_dict("records")}
        self.rules: dict[str, list[tuple[str, bool]]] = {}
        for r in robots.to_dict("records"):
            if r["expires_at"] > epoch_ts:
                self.rules.setdefault(r["host"], []).append(
                    (r["path_prefix"], bool(r["allow"]))
                )
        for v in self.rules.values():
            v.sort(key=lambda t: -len(t[0]))  # longest prefix first
        self.budgets = {
            r["host"]: int(r["budget_per_epoch"]) for r in politeness.to_dict("records")
        }
        self.base_quarantine = {
            r["host"]: int(r["quarantined_until"]) for r in politeness.to_dict("records")
        }
        self.default_budget = default_budget
        self.cpp = comments_per_page
        self.max_comments = max_comments_per_note
        # safety valve mirroring emit_successors' max_pages_per_chain: a
        # cursor chain emits no successor past this seq (both sides MUST
        # share the cap — CLAUDE.md invariant)
        self.max_chain = max_pages_per_chain

    # -- robots ---------------------------------------------------------------
    def _allowed(self, task: Task) -> bool:
        path = "/" + task.url.split("/", 3)[3] if task.url.count("/") >= 3 else "/"
        path = path.split("?")[0]
        for prefix, allow in self.rules.get(task.host, []):
            if path.startswith(prefix):
                return allow
        return True

    # -- main loop --------------------------------------------------------------
    def run(self, seeds: pd.DataFrame, max_epochs: int = 500) -> OracleResult:
        res = OracleResult()
        spans: dict[str, list[tuple]] = {}  # doc_id -> [(sortkey..., kind, text, ref)]
        from mediacrawler_spark.functions.urls import infer_kind_py

        candidates: list[Task] = [
            _task(
                r["url"],
                platform=r["platform"],
                # bare-URL seeds: dispatch kind from URL shape, exactly as
                # seeds_to_candidates does (zhihu judge_zhihu_url analog).
                # Infer on the CANONICAL url — the engine canonicalizes
                # before infer_kind, so both twins see the same path.
                kind=(
                    r["kind"]
                    if isinstance(r["kind"], str) and r["kind"]
                    else infer_kind_py(canonicalize_one(r["url"]))
                ),
                priority=int(r["priority"]),
                seq=int(r["seq"]),
            )
            for r in seeds.to_dict("records")
        ]
        frontier: list[Task] = []
        seen_hashes: set[int] = set()
        quarantine: dict[str, int] = dict(self.base_quarantine)

        for epoch in range(max_epochs):
            # 1. admission
            gated = [t for t in candidates if self._allowed(t)]
            best: dict[int, Task] = {}
            for t in gated:  # intra-batch dedup: (priority, seq, url)-minimal
                cur = best.get(t.url_hash)
                if cur is None or (t.priority, t.seq, t.url) < (cur.priority, cur.seq, cur.url):
                    best[t.url_hash] = t
            admitted = [
                replace(t, not_before_epoch=max(t.not_before_epoch, epoch))
                for t in best.values()
                if t.url_hash not in seen_hashes
            ]
            for t in admitted:
                seen_hashes.add(t.url_hash)
                res.seen.add(t.url)
            frontier.extend(admitted)
            candidates = []

            # 2. selection: per-host budget-prefix in (priority, seq, url_hash)
            by_host: dict[str, list[Task]] = {}
            due, held = [], []
            for t in frontier:
                (due if t.not_before_epoch <= epoch else held).append(t)
            for t in due:
                by_host.setdefault(t.host, []).append(t)
            selected: list[Task] = []
            deferred: list[Task] = list(held)
            for host, tasks in by_host.items():
                if quarantine.get(host, 0) > epoch:
                    deferred.extend(tasks)
                    continue
                budget = self.budgets.get(host, self.default_budget)
                tasks.sort(key=lambda t: (t.priority, t.seq, t.url_hash))
                selected.extend(tasks[:budget])
                deferred.extend(tasks[budget:])

            # 3. fetch in order, 4. outcomes + successors + spans
            retries: list[Task] = []
            for t in sorted(selected, key=lambda t: (t.host, t.priority, t.seq, t.url_hash)):
                page = self.pages.get(t.url)
                if page is None:
                    status = 404
                elif t.attempt < int(page.get("fail_times", 0)):
                    status = 503
                else:
                    status = int(page["status"])
                res.fetch_order.setdefault(t.host, []).append((t.url, epoch, t.kind))
                res.total_fetched += 1
                if status in BLOCKING:
                    quarantine[t.host] = max(
                        quarantine.get(t.host, 0), epoch + QUARANTINE_EPOCHS
                    )
                if status in RETRYABLE:
                    if t.attempt + 1 < MAX_ATTEMPTS:
                        retries.append(
                            replace(
                                t,
                                attempt=t.attempt + 1,
                                not_before_epoch=min(
                                    epoch + 2**t.attempt, epoch + BACKOFF_CAP
                                ),
                            )
                        )
                    continue
                if status != 200:
                    continue
                candidates.extend(self._successors(t, page))
                self._extract(t, page, spans)

            frontier = deferred + retries
            # mirror of the engine's end-of-epoch quarantine prune
            # (plans/epoch.py step 5): expired entries can never block a
            # later epoch, so dropping them is semantics-free — pinned by
            # the shared e2e tests (CLAUDE.md invariant: both sides).
            quarantine = {h: u for h, u in quarantine.items() if u > epoch}
            res.epochs = epoch + 1
            if not candidates and not frontier:
                break

        # 5. assemble documents (doc exists only if it has spans — the
        # engine only materializes docs from span rows)
        for doc_id, rows in spans.items():
            if not rows:
                continue
            rows.sort()
            res.documents[doc_id] = [
                (kind, text, ref, off)
                for off, (*_, kind, text, ref) in enumerate(rows)
            ]
        return res

    # -- successor emission (mirrors operators/frontier.py) --------------------
    def _successors(self, t: Task, page: dict) -> list[Task]:
        out: list[Task] = []
        nid = page["note_id"]
        if t.kind == "search_page":
            for it in page["items"]:
                if it["model_type"] in ("rec_query", "hot_query"):
                    continue
                out.append(
                    _task(
                        f"https://{t.host}/note/{it['id']}",
                        platform=t.platform,
                        kind="detail",
                        priority=0,
                        seq=0,
                        parent_id=it["id"],
                        not_before_epoch=0,
                    )
                )
            streak = t.empty_streak + 1 if len(page["items"]) == 0 else 0
            if page["has_more"] and streak < 2 and t.seq < self.max_chain:
                import re

                nxt = re.sub(r"page=\d+$", f"page={page['next_cursor']}", t.url)
                out.append(
                    _task(
                        nxt,
                        platform=t.platform,
                        kind=t.kind,
                        priority=t.priority,
                        seq=t.seq + 1,
                        parent_id=t.parent_id,
                        cursor=page["next_cursor"],
                        empty_streak=streak,
                    )
                )
        elif t.kind == "detail":
            items = page["items"]
            if items and int(items[0]["comments_count"]) > 0:
                out.append(
                    _task(
                        f"https://{t.host}/comments/{nid}?cursor=0",
                        platform=t.platform,
                        kind="comment_page",
                        priority=1,
                        seq=0,
                        parent_id=nid,
                        cursor="0",
                    )
                )
        elif t.kind == "comment_page":
            for idx, c in enumerate(page["comments"]):
                if int(c["sub_comment_count"]) > 0:
                    out.append(
                        _task(
                            f"https://{t.host}/subcomments/{nid}/{c['comment_id']}"
                            f"?cursor={c['sub_comment_cursor']}",
                            platform=t.platform,
                            kind="sub_comment_page",
                            priority=1,
                            seq=0,
                            parent_id=c["comment_id"],
                            cursor=c["sub_comment_cursor"],
                            parent_seq=t.seq * self.cpp + idx,
                        )
                    )
            if (
                page["has_more"]
                and (t.seq + 1) * self.cpp < self.max_comments
                and t.seq < self.max_chain
            ):
                out.append(
                    _task(
                        f"https://{t.host}/comments/{nid}?cursor={page['next_cursor']}",
                        platform=t.platform,
                        kind=t.kind,
                        priority=1,
                        seq=t.seq + 1,
                        parent_id=t.parent_id,
                        cursor=page["next_cursor"],
                    )
                )
        elif t.kind == "listing":
            for it in page["items"]:
                if it["model_type"] != "note":
                    continue
                out.append(
                    _task(
                        f"https://{t.host}/note/{it['id']}",
                        platform=t.platform,
                        kind="detail",
                        priority=0,
                        seq=0,
                        parent_id=it["id"],
                    )
                )
            if page["has_more"] and t.seq < self.max_chain:
                out.append(
                    _task(
                        f"https://{t.host}/user/{nid}?cursor={page['next_cursor']}",
                        platform=t.platform,
                        kind=t.kind,
                        priority=t.priority,
                        seq=t.seq + 1,
                        parent_id=t.parent_id,
                        cursor=page["next_cursor"],
                    )
                )
        elif t.kind == "sub_comment_page":
            if page["has_more"] and t.seq < self.max_chain:
                out.append(
                    _task(
                        f"https://{t.host}/subcomments/{nid}/{t.parent_id}"
                        f"?cursor={page['next_cursor']}",
                        platform=t.platform,
                        kind=t.kind,
                        priority=1,
                        seq=t.seq + 1,
                        parent_id=t.parent_id,
                        cursor=page["next_cursor"],
                        parent_seq=t.parent_seq,
                    )
                )
        return out

    # -- span extraction (mirrors operators/extract.py) -------------------------
    def _extract(self, t: Task, page: dict, spans: dict[str, list[tuple]]) -> None:
        doc_id = f"{t.platform}:note:{page['note_id']}"
        rows = spans.setdefault(doc_id, [])
        if t.kind == "detail" and page["items"]:
            it = page["items"][0]
            rows.append((0, 0, 0, 0, 0, 0, "title", it["title"], ""))
            rows.append((1, 0, 0, 0, 0, 0, "text", it["text"], ""))
            for i, ref in enumerate(it["image_refs"]):
                rows.append((2, 0, 0, 0, 0, i, "image", "", ref))
            if it["video_ref"]:
                rows.append((3, 0, 0, 0, 0, 0, "video", "", it["video_ref"]))
        elif t.kind == "comment_page":
            for idx, c in enumerate(page["comments"]):
                gidx = t.seq * self.cpp + idx
                if gidx >= self.max_comments:
                    continue
                rows.append((4, t.seq, 0, gidx, 0, 0, "comment", c["content"], ""))
        elif t.kind == "sub_comment_page":
            parent_page = t.parent_seq // self.cpp
            for idx, c in enumerate(page["comments"]):
                rows.append(
                    (4, parent_page, 1, t.parent_seq, t.seq, idx, "comment", c["content"], "")
                )
        elif t.kind == "listing":
            for it in page["items"]:
                if it["model_type"] != "creator_profile":
                    continue
                pid = f"{t.platform}:creator:{page['note_id']}"
                prows = spans.setdefault(pid, [])
                prows.append((0, 0, 0, 0, 0, 0, "title", it["title"], ""))
                prows.append((1, 0, 0, 0, 0, 0, "text", it["text"], ""))

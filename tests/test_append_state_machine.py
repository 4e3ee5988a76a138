"""Model check of the append-table metadata layer.

Round 4 added three metadata ops on top of stage_append/commit/compact
(prune_appends, roll_log, drop-table migration); each is unit-tested,
but their INTERLEAVINGS are where metadata layers rot. This drives an
arbitrary short life of one append table — stage / commit / compact /
prune / roll / expire / crash-reopen — against a python model of
(tag, rows) entries and asserts the committed view and fsck after every
walk.

Compaction is run with a large tier fanout so only the small-dir merge
fires (tier merges pick victims by on-disk BYTES, which a model can't
predict for near-equal tiny parquet dirs); the tiering path itself is
covered by tests/test_compaction.py.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from mediacrawler_spark.sinks.snapshot import SnapshotCatalog


@st.composite
def _walk(draw):
    n_steps = draw(st.integers(min_value=4, max_value=9))
    steps = []
    for _ in range(n_steps):
        kind = draw(
            st.sampled_from(
                ["stage", "stage", "commit", "commit", "compact",
                 "prune", "roll", "expire", "reopen"]
            )
        )
        if kind == "stage":
            steps.append(("stage", draw(st.lists(st.integers(0, 99), min_size=1, max_size=3))))
        elif kind == "prune":
            steps.append(("prune", draw(st.integers(0, 10))))
        else:
            steps.append((kind,))
    return steps


@settings(max_examples=10, deadline=None)
@given(_walk())
def test_append_metadata_ops_match_model(spark, tmp_path_factory, walk):
    root = str(tmp_path_factory.mktemp("snap_app_hyp"))
    cat = SnapshotCatalog(spark, root)
    durable: list[tuple[int, list[int]]] = []  # (label-epoch tag, rows)
    pending: list[tuple[int, list[int]]] = []
    next_label = 0

    def no_pending():
        return not (cat._pending or cat._pending_appends or cat._pending_parts)

    for step in walk:
        if step[0] == "stage":
            rows = [v * 10 + next_label for v in step[1]]
            cat.stage_append(
                spark.createDataFrame([(r,) for r in rows], "val long"),
                "t",
                next_label,
            )
            pending.append((next_label, rows))
            next_label += 1
        elif step[0] == "commit":
            cat.commit(cat.committed_epoch() + 1)
            durable.extend(pending)
            pending = []
        elif step[0] == "compact":
            if no_pending():
                merged = cat.compact_appends("t", max_dirs=2, tier_fanout=99)
                smalls = [x for x in durable if x[0] < 1000]
                if merged:
                    assert len(smalls) > 2
                    durable = [x for x in durable if x[0] >= 1000] + [
                        (1000 + cat.committed_epoch(),
                         [r for _, rs in smalls for r in rs])
                    ]
                else:
                    assert len(smalls) <= 2
        elif step[0] == "prune":
            if no_pending():
                m = step[1]
                cat.prune_appends("t", min_epoch=m)
                durable = [
                    x for x in durable if (x[0] - 1000 if x[0] >= 1000 else x[0]) >= m
                ]
        elif step[0] == "roll":
            if no_pending():
                cat.roll_log(keep=2, max_lines=0)
        elif step[0] == "expire":
            if no_pending():
                cat.expire_versions(keep_last=2)
        elif step[0] == "reopen":
            cat = SnapshotCatalog(spark, root)
            pending = []
        # invariant: committed view == durable model, always
        df = cat.read("t")
        got = sorted(r["val"] for r in df.collect()) if df is not None else []
        assert got == sorted(r for _, rs in durable for r in rs), (step, walk)

    assert cat.fsck() == []
    # a crash-reopen after the walk sees exactly the durable state
    cat2 = SnapshotCatalog(spark, root)
    df2 = cat2.read("t")
    got2 = sorted(r["val"] for r in df2.collect()) if df2 is not None else []
    assert got2 == sorted(r for _, rs in durable for r in rs)
    assert cat2.committed_epoch() == cat.committed_epoch()

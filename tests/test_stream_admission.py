"""streaming_incremental_admission (streaming/frontier_stream.py): the
foreachBatch admission pipeline must equal the SEQUENTIAL batch process
— batch k classified against the union of batches <k's accepted docs —
computed here by an independent pure-Python reference (own normalizer,
own shingle Jaccard, own accepted-set fold)."""

import re
import shutil

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.streaming.frontier_stream import (
    streaming_incremental_admission,
)


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())


def _shingles(t):
    toks = [w for w in re.split(r"[\W_]+", t.lower()) if w]
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _ref(batches, threshold):
    """Sequential fold: decisions per doc + accepted corpus."""
    accepted = []  # (id, text)
    decisions = {}
    for bi, batch in enumerate(batches):
        new = []
        for did, text in batch:
            exact = [i for i, t in accepted if _norm(t) == _norm(text)]
            if exact:
                decisions[did] = ("exact", min(exact), bi)
                continue
            sh = _shingles(text)
            near = []
            for i, t in accepted:
                s2 = _shingles(t)
                inter = len(sh & s2)
                uni = len(sh | s2)
                if uni and inter / uni >= threshold:
                    near.append(i)
            if near:
                decisions[did] = ("near", min(near), bi)
            else:
                decisions[did] = ("unique", -1, bi)
                new.append((did, text))
        accepted.extend(new)
    return decisions


BATCHES = [
    [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely different text about spark shuffles and joins"),
    ],
    [
        (10, "The quick  brown fox jumps over the lazy dog tonight"),  # exact (norm)
        (11, "the quick brown fox jumps over the lazy dog today"),  # near of 1
        (12, "a third subject entirely with its own words and phrasing"),
    ],
    [
        (20, "completely different text about spark shuffles and joins"),  # exact of 2
        (21, "a third subject entirely with its own words and phrasing now"),  # near of 12
        (22, "nothing like anything else in this corpus whatsoever truly"),
    ],
]


def test_stream_admission_equals_sequential_reference(spark, tmp_path):
    src = tmp_path / "src"
    state = tmp_path / "state"
    src.mkdir()
    # stage one parquet file per batch with increasing mtimes so the
    # file source picks them up in order, one per micro-batch
    import os

    for k, batch in enumerate(BATCHES):
        d = tmp_path / f"stage{k}"
        spark.createDataFrame(batch, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        dst = src / f"b{k}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1000 + k, 1000 + k))

    sch = spark.read.parquet(str(src / "b0.parquet")).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_incremental_admission(
        stream, str(state), threshold=0.8, query_name="adm_test"
    )
    q.awaitTermination()

    dec = {
        r["doc_id"]: (r["status"], r["match_id"], r["batch_id"])
        for r in spark.read.parquet(str(state / "decisions")).collect()
    }
    ref = _ref(BATCHES, 0.8)
    assert dec == ref, (dec, ref)
    # the accepted corpus is exactly the unique-status docs
    corpus = {
        r["doc_id"] for r in spark.read.parquet(str(state / "corpus")).collect()
    }
    assert corpus == {d for d, (s, _, _) in ref.items() if s == "unique"}
    # every status appears
    statuses = {s for s, _, _ in dec.values()}
    assert statuses == {"exact", "near", "unique"}

"""average_hash (aHash) — perceptual-hash image dedup.

The reference stores every fetched image (study: /root/reference
store/*/…_store_impl.py media branches); keep-one-per-perceptual-hash is
the downstream training-pipeline step. The reference here is an
INDEPENDENT pure-Python aHash (own byte cycling, own integer threshold,
own bit packing) computed from the raw blob bytes — it never touches the
package's feature/decode helpers, so agreement is a real cross-check,
not self-agreement.
"""

from pyspark.sql import functions as F

from mediacrawler_spark.operators.media import (
    _FEATURE_DIM,
    _fake_decode,
    average_hash,
    decode_media,
)


def _ref_ahash(data: bytes, dim: int = _FEATURE_DIM) -> int:
    """Independent reference: cycle blob bytes to dim ints, bit i set iff
    dim*b_i > sum (strict), little-endian bit packing."""
    raw = list(data or b"\x00")
    vals = [raw[i % len(raw)] for i in range(dim)]
    total = sum(vals)
    out = 0
    for i, v in enumerate(vals):
        if dim * v > total:
            out |= 1 << i
    return out


BLOBS = [b"7", b"42", b"abcXYZ", b"aaaa", b"\x00\xff\x10\x80", b"hello world"]


def test_ahash_matches_independent_reference(spark):
    media = spark.createDataFrame(
        [(f"m{i}", "image", b) for i, b in enumerate(BLOBS)],
        "media_ref string, media_type string, data binary",
    )
    got = {
        r["media_ref"]: r["ahash"]
        for r in average_hash(decode_media(media, decoder=_fake_decode))
        .select("media_ref", "ahash")
        .collect()
    }
    for i, b in enumerate(BLOBS):
        assert got[f"m{i}"] == _ref_ahash(b), (i, b)


def test_ahash_constant_blob_is_zero(spark):
    # all bytes equal -> no block strictly above the mean -> hash 0
    media = spark.createDataFrame(
        [("m", "image", b"aaaa")], "media_ref string, media_type string, data binary"
    )
    row = average_hash(decode_media(media, decoder=_fake_decode)).first()
    assert row["ahash"] == 0


def test_ahash_null_feature_stays_null(spark):
    from mediacrawler_spark.operators.media import DECODED_SCHEMA

    decoded = spark.createDataFrame(
        [("m", "image", None, None, None, None)], schema=DECODED_SCHEMA
    )
    assert average_hash(decoded).first()["ahash"] is None


def test_ahash_groups_planted_duplicates(spark):
    # 3 copies of one blob + 2 of another + singletons; expected grouping
    # comes from the INDEPENDENT reference hash, so aHash collisions
    # between distinct blobs (e.g. any two constant blobs both hash to 0)
    # are part of the expectation, not an accident.
    rows = [
        ("a1", b"914"),
        ("a2", b"914"),
        ("a3", b"914"),
        ("b1", b"7401"),
        ("b2", b"7401"),
        ("c1", b"31x"),
        ("c2", b"zzz9"),
    ]
    media = spark.createDataFrame(
        [(r, "image", d) for r, d in rows],
        "media_ref string, media_type string, data binary",
    )
    hashed = average_hash(decode_media(media, decoder=_fake_decode))
    got = sorted(
        (r["ahash"], r["n"])
        for r in hashed.groupBy("ahash").agg(F.count("*").alias("n")).collect()
    )
    from collections import Counter

    want = sorted(Counter(_ref_ahash(d) for _, d in rows).items())
    assert got == want
    # the planted 3x blob really is a size-3 group (its hash is distinct
    # from every other blob's in this corpus)
    assert dict(want)[_ref_ahash(b"914")] == 3


def test_ahash_plan_is_codegen(spark):
    media = spark.createDataFrame(
        [("m", "image", b"12")], "media_ref string, media_type string, data binary"
    )
    plan = (
        average_hash(decode_media(media, decoder=_fake_decode))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF anywhere


# ----------------------------------------------------------- ahash_near_pairs


def _brute_pairs(hashes, k):
    """Independent all-pairs hamming reference."""
    hs = sorted(set(hashes))
    out = set()
    for i, a in enumerate(hs):
        for b in hs[i + 1 :]:
            h = bin(a ^ b).count("1")
            if h <= k:
                out.add((a, b, h))
    return out


def test_ahash_near_pairs_matches_bruteforce(spark):
    from mediacrawler_spark.operators.media import ahash_near_pairs

    # 16-bit hashes with planted near neighbors at hamming 1, 2 and 3
    hashes = [0x0000, 0x0001, 0x0003, 0x0007, 0x8001, 0xAAAA, 0xAAAB,
              0x5555, 0x1234, 0x1235, 0x1236, 0xFFFF, 0x7FFF]
    hashed = spark.createDataFrame(
        [(h,) for h in hashes for _ in range(2)], "ahash bigint"  # dup rows too
    )
    got = {
        (r["hash_a"], r["hash_b"], r["hamming"])
        for r in ahash_near_pairs(hashed, max_hamming=2).collect()
    }
    assert got == _brute_pairs(hashes, 2)
    # hamming-3 neighbors are excluded at k=2 but present at k=3
    got3 = {
        (r["hash_a"], r["hash_b"], r["hamming"])
        for r in ahash_near_pairs(hashed, max_hamming=3).collect()
    }
    assert got3 == _brute_pairs(hashes, 3)
    assert (0x0000, 0x0007, 3) in got3 and (0x0000, 0x0007, 3) not in got


def test_ahash_near_pairs_null_hash_ignored(spark):
    from mediacrawler_spark.operators.media import ahash_near_pairs

    hashed = spark.createDataFrame([(1,), (3,), (None,)], "ahash bigint")
    rows = ahash_near_pairs(hashed, max_hamming=2).collect()
    assert {(r["hash_a"], r["hash_b"], r["hamming"]) for r in rows} == {(1, 3, 1)}


# ----------------------------------------------------- scene changes ----
def _scene_reference(rows, thr):
    """Independent reference: own hamming + running scene counter."""
    from collections import defaultdict

    per = defaultdict(list)
    for vid, idx, h in rows:
        per[vid].append((idx, h))
    out = {}
    for vid, fr in per.items():
        fr.sort()
        prev = None
        scene = 1
        for idx, h in fr:
            if prev is None:
                ham, cut = None, 0
            else:
                ham = bin(h ^ prev).count("1")
                cut = 1 if ham > thr else 0
            scene += cut
            out[(vid, idx)] = (ham, cut, scene)
            prev = h
    return out


def test_scene_changes_matches_reference(spark):
    """Within-scene jitter (<= threshold bits) never cuts; hard jumps
    do; scene_id is the running cut prefix sum; first frame of every
    video opens scene 1. Exact equality with the independent
    reference."""
    from mediacrawler_spark.operators.media import scene_changes

    rows = [  # (video, frame_idx, hash)
        # video A: scene 0xFF00 with 1-2 bit jitter, cut to 0x00FF, jitter
        ("a", 0, 0xFF00), ("a", 30, 0xFF01), ("a", 60, 0xFF03),
        ("a", 90, 0x00FF), ("a", 120, 0x00FE),
        # back to a third scene
        ("a", 150, 0xF0F0),
        # video B: single frame
        ("b", 0, 0x1234),
        # video C: every frame a hard cut
        ("c", 0, 0x0000), ("c", 30, 0xFFFF), ("c", 60, 0x0000),
    ]
    want = _scene_reference(rows, thr=2)
    df = spark.createDataFrame(rows, "media_ref string, frame_idx long, frame_hash long")
    got = {
        (r["media_ref"], r["frame_idx"]): (r["hamming"], r["is_cut"], r["scene_id"])
        for r in scene_changes(df, max_same_scene_hamming=2).collect()
    }
    assert got == want
    assert got[("a", 0)] == (None, 0, 1)
    assert got[("a", 60)][1] == 0          # 2-bit jitter: same scene
    assert got[("a", 90)][1] == 1          # hard cut
    assert got[("a", 150)][2] == 3         # third scene
    assert got[("b", 0)] == (None, 0, 1)
    assert got[("c", 60)] == (16, 1, 3)


def test_scene_changes_single_exchange(spark):
    from mediacrawler_spark.operators.media import scene_changes

    df = spark.createDataFrame(
        [("a", 0, 1)], "media_ref string, frame_idx long, frame_hash long"
    )
    plan = scene_changes(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

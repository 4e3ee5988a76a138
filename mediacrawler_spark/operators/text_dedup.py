"""Corpus deduplication operators for training-data pipelines.

Four near/exact-dup strategies over a ``documents(doc_id, text)``-shaped
table, each designed so every stage is JVM-side (codegen) and the only
shuffles are the ones the algorithm inherently needs:

- **exact**: fingerprint (xxhash64 of normalized text) → hash-aggregate.
  One shuffle on the fingerprint; map-side partial agg halves the traffic.
- **MinHash + LSH**: word-shingles → n per-seed min-hashes (all
  ``array_min(transform(...))`` expressions — no UDF) → band buckets →
  self-join inside buckets only → signature-similarity verify. The
  candidate join is equi-join on (band, band_hash): at 100 TB this is the
  only quadratic-risk step and it's bounded per bucket.
- **SimHash**: per-token 64-bit hashes → 64 signed bit-sums (one
  hash-aggregate) → Hamming-ball candidate pairs via 4×16-bit chunk
  equality (any chunk equal ⇒ distance ≤ 3 possible) → verify with
  ``bit_count(xor) <= d``.
- **n-gram Jaccard**: exact verify used standalone on LSH candidates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import doc_fingerprint, tokens, word_shingles


# ---------------------------------------------------------------- exact ----
def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization) docs.
    Returns (fingerprint, n_dups, doc_ids) for groups with n>1."""
    return (
        df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per fingerprint group (deterministic winner)."""
    fp = df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    return (
        fp.groupBy("_fp")
        .agg(F.min_by(F.struct(*[F.col(c) for c in df.columns]), F.col(id_col)).alias("r"))
        .select("r.*")
    )


# -------------------------------------------------------------- minhash ----
def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signatures via explode + one
    hash-aggregate with n partial mins.

    Deliberately NOT a single projection of n ``array_min(transform(...))``
    expressions: Catalyst cannot CSE the shingle subtree across them, so
    that shape re-runs the regexp tokenizer per hash per element (measured
    ~60× slower). Explode evaluates shingling once per doc; the n mins are
    map-side partial aggregates — the same pattern scales to 100 TB because
    the shuffle carries only (id, n×8 bytes) partials."""
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))
    sh = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= shingle_k,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - shingle_k + 1),
                        lambda i: F.concat_ws(" ", F.slice("toks", i, shingle_k)),
                    )
                ),
            ).otherwise(F.array(F.concat_ws(" ", "toks")))
        ).alias("s"),
    )
    aggs = [F.min(F.xxhash64("s", F.lit(i))).alias(f"m{i}") for i in range(n_hashes)]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig"))
    )


def _cap_buckets(buckets: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop oversized LSH buckets before the self-join.

    A bucket of size s yields s²/2 candidate pairs; low-entropy corpora
    (tiny vocabularies, boilerplate) produce mega-buckets that are pure
    noise. Capping is the standard LSH practice: an oversized bucket means
    that band carries no discriminating information, and true near-dup
    pairs still collide in their other bands. Keeps the join linear."""
    ok = (
        buckets.groupBy(*keys)
        .agg(F.count("*").alias("_bsz"))
        .filter(F.col("_bsz") <= max_bucket)
        .select(*keys)
    )
    return buckets.join(ok, on=keys)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    bands×rows = n_hashes; a pair collides if any band matches — the
    standard S-curve. Estimated Jaccard = fraction of equal signature
    slots (unbiased MinHash estimator), verified per candidate pair only.
    Buckets larger than ``max_bucket`` are dropped (see _cap_buckets).
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    buckets = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.bh")
    buckets = _cap_buckets(buckets, ["band", "bh"], max_bucket)
    a = buckets.select(
        F.col("band"), F.col("bh"), F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = buckets.select(
        F.col("band"), F.col("bh"), F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    cand = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(n_hashes)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ------------------------------------------------------- ngram jaccard ----
def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,  # (id_a, id_b)
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage).
    Shingles are computed only for docs that appear in a candidate pair."""
    ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    ).distinct()
    sh = (
        df.join(ids, df[id_col] == ids["id"], "left_semi")
        .select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("sh"))
    )
    j = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------- simhash ----
def md5_token_hash60(tok: Column) -> Column:
    """60-bit token hash from the md5 hex prefix.

    Exists for ORACLE CHECKABILITY: DuckDB reproduces
    ``conv(substr(md5(tok),1,15),16,10)`` exactly in pure SQL, so a
    simhash built on it has a recomputable ground truth (the hamming≤3
    property oracle). xxhash64 stays the production default — one JVM
    hash pass, no hex round-trip."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """n-bit SimHash per doc: explode distinct tokens, one hash-aggregate
    with n signed bit-sums, recombined to a long. All JVM-side.
    ``token_hash`` maps a token Column to an int64 Column (default Spark
    xxhash64; see :func:`md5_token_hash60`)."""
    hash_fn = token_hash or F.xxhash64
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", hash_fn(F.col("tok")))
    bit = lambda b: F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1))
    aggs = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(n_bits)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    sim = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        ),
        range(1, n_bits),
        F.when(F.col("b0") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    return sums.select(F.col("id").alias(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 128,
    n_bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole: split n_bits into 4 chunks; distance ≤ 3 ⇒ at least
    one chunk identical → candidate generation is 4 equi-joins (one per
    chunk), then exact verify with bit_count(xor)."""
    chunk_bits = n_bits // 4
    chunk_mask = (1 << chunk_bits) - 1
    s = simhash(df, id_col, text_col, n_bits=n_bits, token_hash=token_hash)
    chunks = s.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(chunk_mask))
                        .alias("ck"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("x"),
    ).select("id", "simhash", "x.chunk", "x.ck")
    chunks = _cap_buckets(chunks, ["chunk", "ck"], max_bucket)
    a = chunks.select("chunk", "ck", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = chunks.select("chunk", "ck", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    cand = (
        a.join(b, on=["chunk", "ck"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

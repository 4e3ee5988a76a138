"""Corpus-preparation operators for the training-data pipeline.

Beyond near-dup detection (operators/text_dedup.py) a 100 TB corpus prep
needs the document-statistics filters the public pipelines run between
crawl and training: repetition signals (Gopher-style top-n-gram
fraction), exact sub-document span sharing (RefinedWeb-style duplicated
n-gram fraction), benchmark decontamination (n-gram overlap against an
eval set), and deterministic stratified sampling. All are expressed as
shuffle-bounded DataFrame plans:

- repetition / span sharing: explode n-grams -> hash-agg (map-side
  partial combine) keyed by (doc_id, gram) then doc_id / gram — never
  any all-pairs or per-row Python.
- decontamination: the benchmark's distinct-gram set is tiny relative
  to the corpus (eval suites are ~10^6 grams at most), so it is
  broadcast; the corpus side streams through one hash join, no shuffle
  of the big side.
- stratified sampling: two-phase salted top-k (same shape as the
  politeness scheduler, operators/politeness.py:22-27) so a skewed
  stratum never funnels into a single task.

Reference scope: the reference crawler stops at word-frequency analytics
(/root/reference/tools/words.py); these operators are the engine-side
extensions SURVEY §2 lists for LLM-corpus prep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import word_ngrams


def top_ngram_fraction(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signal: fraction of the doc's word n-grams
    taken by its single most frequent n-gram (Gopher repetition filter).

    Returns (id_col, n_grams, top_frac) for EVERY input doc; docs with
    fewer than n tokens get n_grams=0, top_frac=0.0. Plan: one explode,
    two hash-aggs (both with partial combine), one equi-join back on the
    id — no all-pairs, no Python."""
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(F.max("c").alias("top_c"))
    totals = docs.select(
        F.col(id_col),
        F.size(word_ngrams(F.col(text_col), n)).cast("bigint").alias("n_grams"),
    )
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_grams",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("top_c").cast("double") / F.col("n_grams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_frac"),
    )


def shared_ngram_stats(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc exact sub-document duplication: of the doc's DISTINCT word
    n-grams, how many also occur in at least one OTHER doc (RefinedWeb's
    duplicated-n-gram-fraction filter, the exact complement to MinHash's
    whole-doc near-dup).

    Returns (id_col, n_spans, shared_spans, shared_frac) for every doc.
    Plan: distinct grams per doc (array_distinct inside the row — no
    dedup shuffle), one gram-keyed hash-agg counting containing docs,
    one equi-join on gram, one id-keyed hash-agg. The gram-keyed steps
    have partial combine; skewed grams (boilerplate) fan out across
    partitions in the agg, not into a window."""
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    # rows are distinct per (doc, gram), so count(*) == distinct docs
    gram_docs = grams.groupBy("gram").agg(F.count("*").alias("n_docs"))
    shared = (
        grams.join(gram_docs.filter(F.col("n_docs") >= 2), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_spans"))
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(word_ngrams(F.col(text_col), n)))
        .cast("bigint")
        .alias("n_spans"),
    )
    return totals.join(shared, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce(F.col("shared_spans"), F.lit(0)).cast("bigint").alias("shared_spans"),
        F.when(
            F.col("n_spans") > 0,
            F.round(
                F.coalesce(F.col("shared_spans"), F.lit(0)).cast("double")
                / F.col("n_spans"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("shared_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing at least one word
    n-gram with the eval set, with the count of distinct contaminated
    grams per doc (the filter every public LLM pipeline runs before
    training).

    Grams are matched on NORMALIZED text on both sides — lowercased and
    punctuation-stripped via ``tokens()`` inside ``word_ngrams`` (the
    DuckDB oracle applies the identical lower + non-alnum split) — so
    cosmetic case/punctuation variants of an eval passage still count
    as contamination (pinned in tests/test_corpus.py).

    The benchmark's distinct gram set is broadcast — eval suites are
    orders of magnitude smaller than the corpus, so the 100 TB side
    streams through a broadcast hash join with zero shuffle; only the
    final per-doc count aggregates. Returns (id_col, n_contaminated)
    for contaminated docs only."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_contaminated"))
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    order_col: str,
    salt_splits: int = 8,
) -> DataFrame:
    """Deterministic stratified sample: the k smallest rows per stratum
    under ``order_col``. REQUIREMENT: ``order_col`` must be unique per
    stratum (hash the row key into it upstream — e.g. md5(doc_id) — for
    a uniform pseudo-random draw); both ranking windows order by it
    alone, so ties would make row_number nondeterministic across engines
    (ADVICE r04 — all callers use per-row hash draws).

    Two-phase salted top-k (politeness-scheduler shape): phase 1 ranks
    within (strata, salt) so a hot stratum is pruned to salt_splits*k
    rows by parallel tasks; phase 2 ranks the survivors per stratum.
    Output rows carry ``rk`` (1..k within stratum)."""
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_splits))
    w_local = Window.partitionBy(*strata, "_salt").orderBy(order_col)
    w_global = Window.partitionBy(*strata).orderBy(order_col)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= k)
        .drop("_salt", "_lrk")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF — the classic corpus
    keyword/relevance primitive (and the filter public pipelines use to
    spot template/boilerplate docs: their top terms carry near-zero IDF).

    score = tf · ln(N / df), tf the in-document term count, df the
    number of distinct documents containing the term, N the corpus
    size. Ties rank by term ascending so the output is deterministic
    across engines. Plan shape at 100 TB: one (doc, term) hash-agg with
    map-side combine, one term-keyed hash-agg for df, one equi-join of
    the two on term (both sides pre-aggregated — the join carries one
    row per distinct (doc, term) / term, never raw tokens), then the
    two-phase-free per-doc top-k window (per-doc term counts are
    bounded by vocabulary, not corpus size, so no salting is needed).

    Output: (id_col, term, tf bigint, score double, rk int). Tokens are
    :func:`mediacrawler_spark.functions.textual.tokens` — lowercased,
    split on non-alphanumerics — matching the decontamination and
    word-frequency tokenization.
    """
    from mediacrawler_spark.functions.textual import tokens

    n_docs = df.select(id_col).distinct().count()
    # persisted: tf is both the join's probe side AND the lineage dfreq
    # aggregates over — without the cache the tokenize-explode-agg chain
    # executes twice (measured 5.2s -> 2.0s at 10x; the frame is one row
    # per distinct (doc, term), far smaller than the token stream)
    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "score", "rk")
    )


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score — the
    perplexity-style quality signal public pipelines (CCNet's KenLM
    filter being the canonical one) run between crawl and training,
    expressed as one train+score dataflow with no external model:

        score(doc) = avg over the doc's word bigrams (prev, w) of
                     ln( (c(prev, w) + 1) / (c(prev) + V) )

    with corpus-wide Laplace-smoothed counts: c(prev, w) the bigram
    count, c(prev) the bigram-context count (occurrences of ``prev``
    followed by anything), V the corpus vocabulary size. Template/
    boilerplate text scores high (its bigrams dominate the corpus);
    shuffled or vocabulary-noise text scores low. Near-zero cross-doc
    signal is exactly what the filter flags.

    Plan shape at 100 TB: the exploded bigram stream is aggregated
    twice (bigram-keyed and context-keyed, both with map-side partial
    combine) into model tables bounded by vocabulary size — orders of
    magnitude smaller than the corpus — then the stream joins the two
    models on their keys (plain equi-joins; vocabulary tables shuffle,
    never more than the distinct-bigram set) and one per-doc hash-agg
    takes the average. V enters as a broadcast one-row literal (scalar
    subquery shape), so the whole plan stays lazy. No all-pairs, no
    Python, no driver loop.

    Output: (id_col, n_bigrams bigint, lm_score double rounded 6dp)
    for EVERY input doc; docs with fewer than 2 tokens get n_bigrams=0,
    lm_score=0.0. Tokenization is :func:`functions.textual.tokens`
    (lowercase, split on non-alphanumerics) — same as TF-IDF,
    repetition, and decontamination, so the model and every other
    corpus filter see one vocabulary.
    """
    from mediacrawler_spark.functions.textual import tokens

    bg = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("bg")
    )
    model = bg.groupBy("bg").agg(F.count("*").alias("c_bg"))
    ctx = (
        bg.select(F.substring_index("bg", " ", 1).alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").alias("c_ctx"))
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        bg.join(model, "bg")
        .withColumn("prev", F.substring_index("bg", " ", 1))
        .join(ctx, "prev")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.col("c_bg") + F.lit(1.0))
                / (F.col("c_ctx") + F.col("v").cast("double"))
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(F.avg("lp").alias("avg_lp"))
    )
    totals = docs.select(
        F.col(id_col),
        F.greatest(F.size(tokens(F.col(text_col))) - 1, F.lit(0))
        .cast("bigint")
        .alias("n_bigrams"),
    )
    return totals.join(scored, id_col, "left").select(
        id_col,
        "n_bigrams",
        F.coalesce(F.round(F.col("avg_lp"), 6), F.lit(0.0)).alias("lm_score"),
    )


# ----------------------------------------------------------- line dedup ----
def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 1,
    min_line_chars: int = 5,
) -> DataFrame:
    """Corpus-level duplicated-LINE removal (CCNet / RefinedWeb
    boilerplate pass): a line that occurs (trimmed-identical) in more
    than ``max_df`` distinct documents is dropped from every document;
    lines shorter than ``min_line_chars`` after trim are always kept
    (blank lines and short separators are formatting, not boilerplate).

    Plan shape at 100 TB: split+posexplode (narrow) → one hash-agg on
    the trimmed line for distinct-doc frequency (map-side partial
    count_distinct via the (line, id) pre-distinct) → equi-join back on
    the line → one per-doc hash-agg to reassemble in original order.
    No driver-side state, every shuffle keyed by line or doc id; a
    mega-hot boilerplate line is ONE aggregate row (its per-doc copies
    stay distributed).

    Output: (id_col, text_deduped, n_lines, n_dropped).
    """
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lkey", F.trim(F.col("line")))
    substantial = F.length("lkey") >= min_line_chars
    freq = (
        lines.filter(substantial)
        .select("lkey", "id")
        .distinct()
        .groupBy("lkey")
        .agg(F.count("*").alias("line_df"))
        .filter(F.col("line_df") > max_df)
    )
    marked = lines.join(freq, "lkey", "left")
    keep = F.col("line_df").isNull()
    return (
        marked.groupBy("id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text_deduped"),
            F.count("*").alias("n_lines"),
            F.sum(F.when(keep, 0).otherwise(1)).cast("bigint").alias("n_dropped"),
        )
        .select(F.col("id").alias(id_col), "text_deduped", "n_lines", "n_dropped")
    )


# ------------------------------------------------------ sequence packing ----
def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col=None,
    shard_col=None,
    n_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training
    layout): documents are deterministically sharded, concatenated in id
    order within each shard, and the token stream is cut every
    ``budget`` tokens. Each doc reports the pack(s) it lands in.

    Packing is embarrassingly parallel across shards — a real pipeline
    runs one writer task per shard — and the within-shard assignment is
    a single prefix-sum window (the shard bounds the window's partition,
    so no global sort and no single-partition window at any scale).

    ``len_col`` defaults to the whitespace/BPE-ish token count;
    ``shard_col`` defaults to ``pmod(xxhash64(id), n_shards)`` (pass an
    explicit column for SQL-reproducible sharding, e.g. ``id % n``).

    Output: (id_col, shard, n_tokens, start_offset, start_pack,
    end_pack) — offsets are within-shard; a doc spans packs
    [start_pack, end_pack].
    """
    from mediacrawler_spark.functions.textual import token_count

    if len_col is None:
        len_col = token_count(F.col("text"))
    if shard_col is None:
        shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    base = docs.select(
        F.col(id_col),
        shard_col.cast("bigint").alias("shard"),
        len_col.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        id_col,
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).cast("bigint").alias("start_pack"),
        F.floor(
            F.greatest(F.col("cum") - 1, start) / F.lit(budget)
        ).cast("bigint").alias("end_pack"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a fixed keyword query under BM25
    (Robertson/Sparck Jones probabilistic ranking; the `+1` idf variant
    Lucene uses, so idf stays positive at any df).

    Shuffle-minimal by construction — the shape a 100 TB corpus needs:

    - per-term tf and doc length are array HOFs over the shared token
      array (``aggregate``/``filter``), so SCORING IS A MAP: no explode,
      no (doc, term) shuffle at all.
    - corpus statistics (N, total dl, per-term df) are ONE single-row
      aggregate, broadcast back via crossJoin — the only exchange
      besides the final top-k, which is a TakeOrderedAndProject
      tree-reduce, never a global sort.
    - the score is a FIXED-ORDER sum of per-term closed forms (terms
      are query literals), so the float result is identical across
      engines and partitionings — no variable-order aggregation.

    avgdl is exact-int sum(dl)/count(*) in one IEEE division (never a
    streaming mean, which accumulates differently per engine). Output:
    (doc_id, score rounded 6dp, dl) ordered by (score desc, doc_id).
    Ordering uses the ROUNDED score so the k-boundary cannot flip on a
    last-bit ln() difference between engines.
    """
    from mediacrawler_spark.functions.textual import tokens

    if not terms or len(set(terms)) != len(terms):
        raise ValueError("bm25_topk: terms must be a non-empty list of unique terms")
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_ts"))

    # single-param closure factory: a (t, term=...) default-arg lambda would
    # be seen by F.filter as the two-arg (element, index) form, binding the
    # query term to the array index
    def _eq(term: str):
        return lambda t: t == F.lit(term)

    # persisted: `per` feeds the corpus-stats aggregate AND the scoring
    # projection — without the cache the tokenize + per-term tf HOFs run
    # twice (the frame is |docs| x (2 + |terms|) ints, tiny)
    per = toks.select(
        id_col,
        F.size("_ts").alias("dl"),
        *[
            F.size(F.filter("_ts", _eq(term))).alias(f"_tf{i}")
            for i, term in enumerate(terms)
        ],
    ).persist()
    stats = per.agg(
        F.count("*").alias("_n"),
        (F.sum("dl") / F.count("*")).alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"_tf{i}")
        score = score + idf * (tf * (k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
        )
    return (
        scored.select(
            id_col,
            F.round(score, 6).alias("score"),
            F.col("dl").cast("bigint").alias("dl"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def token_budget_sample(
    df: DataFrame,
    strata: list[str],
    budgets: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget data mixing: per stratum, keep documents in a
    deterministic pseudo-random order until the stratum's token budget
    is filled — the mixture-sampling step a pretraining pipeline runs to
    hit a target token count per source/language/domain.

    ``budgets`` maps stratum value (of the FIRST strata column when one
    column, else a tuple) -> token budget. Order within a stratum is
    md5(id) — uniform, engine-neutral, and unique per row, so the cut
    is deterministic on any engine. The keep rule is "running total
    BEFORE this document < budget": the budget is overshot by at most
    one document, never undershot while eligible docs remain.

    Scale shape: the only corpus-wide movement is ONE exchange of the
    narrow (id, strata, n_tokens, draw) projection for the per-stratum
    cumulative-sum window; token counts are computed scan-side
    (:func:`token_count` — pure codegen), and the budget table joins as
    a broadcast literal. Strata whose value is absent from ``budgets``
    are dropped (budget 0).

    Output: (id_col, *strata, n_tokens, cum_tokens) kept rows.
    """
    from mediacrawler_spark.functions.textual import token_count

    if len(strata) != 1:
        raise ValueError("token_budget_sample supports exactly one strata column")
    scol = strata[0]
    spark = df.sparkSession
    bdf = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(budgets.items())],
            [scol, "_budget"],
        )
    )
    # Two-phase salted cumsum (VERDICT r05 #4): a single
    # Window.partitionBy(stratum) serializes the hot stratum into ONE
    # task. ``_draw`` is a uniform md5 hex string, so its FIRST HEX CHAR
    # is an ORDERED range split (every draw starting '0' sorts before
    # every draw starting '1', ...): local cumsums per (stratum, bucket)
    # plus each bucket's preceding-bucket token offset reproduce the
    # global running sum EXACTLY, with parallelism |strata|×16. Buckets
    # whose offset already meets the budget are pruned before the window
    # — at a real mixing ratio (budget ≪ stratum total) the hot
    # stratum's window input shrinks by ~that ratio.
    base = df.select(
        F.col(id_col),
        F.col(scol),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_draw"),
    ).join(bdf, scol)
    base = base.withColumn("_bk", F.substring("_draw", 1, 1)).persist()
    per_bucket = base.groupBy(scol, "_bk").agg(
        F.sum("n_tokens").alias("_bkt")
    )
    w_off = (
        Window.partitionBy(scol)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "_off", F.coalesce(F.sum("_bkt").over(w_off), F.lit(0).cast("bigint"))
    ).select(scol, "_bk", "_off")
    w_local = (
        Window.partitionBy(scol, "_bk")
        .orderBy("_draw")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        base.join(F.broadcast(offsets), [scol, "_bk"])
        .filter(F.col("_off") < F.col("_budget"))  # later buckets can't keep rows
        .withColumn(
            "cum_tokens", F.sum("n_tokens").over(w_local) + F.col("_off")
        )
    )
    before = F.col("cum_tokens") - F.col("n_tokens")
    return (
        cum.filter(before < F.col("_budget"))
        .select(id_col, scol, "n_tokens", "cum_tokens")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shuffle-and-shard: the physical layout step a
    training pipeline runs last — every doc lands in shard
    ``md5(id) % n_shards`` and takes an md5-order position inside it, so
    independent runs (and independent engines) write byte-identical
    shard files. The hash IS the global shuffle: any id scheme, however
    clustered, spreads evenly, and the draw fixes a reproducible order
    with no coordinator. Shard id and draw are scan-side codegen; the
    ONE exchange is the shard partition for the position window.

    Returns (id_col, shard, pos) with pos 1-based and contiguous per
    shard. 15 hex digits (60 bits) keep the draw-to-integer conversion
    exact in a signed 64-bit value on any engine.
    """
    draw = F.md5(F.col(id_col).cast("string"))
    shard = F.pmod(
        F.conv(F.substring(draw, 1, 15), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("bigint")
    base = df.select(F.col(id_col), shard.alias("shard"), draw.alias("_draw"))
    w = Window.partitionBy("shard").orderBy("_draw", id_col)
    return base.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def term_drift(
    df: DataFrame,
    slice_col: str = "slice",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Term-distribution drift between two corpus slices, INTEGER-EXACT.

    The monitor a continuously-fed training pipeline runs between crawl
    batches: has the unigram distribution of slice 'a' (say, last
    week's crawl) moved away from slice 'b' (this week's)?  The metric
    is total-variation distance ``TV = 1/2 · Σ_t |p_a(t) - p_b(t)|``
    — but floating-point probability sums are engine-order-dependent,
    so everything up to the FINAL division stays in exact integers:

        |p_a - p_b| = |k_a·N_b - k_b·N_a| / (N_a·N_b)

    with k the term count in a slice and N the slice's total token
    count. ``drift_num = |k_a·N_b - k_b·N_a|`` is an exact bigint per
    term; their bigint sum divides ONCE by ``2·N_a·N_b`` in double,
    identical on any engine. (Headroom: k·N < 2^63 holds to ~3×10^9
    tokens per slice; beyond that, pre-scale counts by a common power
    of two — the ranking and the 6-dp TV are unchanged.)

    Output: the ``top_k`` most-drifted terms (ORDER BY drift_num DESC,
    term ASC — fully deterministic) with their exact per-slice counts,
    plus the corpus-wide ``tv_distance`` repeated on each row so one
    result set carries both the headline scalar and its attribution.

    Scale: tokenization is scan-side codegen; ONE hash-agg keyed by
    term (map-side partial combine) with conditional sums per slice;
    totals are a single-row broadcast; top-k is TakeOrderedAndProject.
    No join of the corpus against itself, nothing driver-side.
    """
    from mediacrawler_spark.functions.textual import tokens

    ex = df.select(
        F.col(slice_col).alias("s"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    # persisted: per_term feeds the totals row, the tv-distance agg, and
    # the top-k — uncached, the corpus tokenize-explode-agg runs 3x
    # (the frame is vocabulary-bounded)
    per_term = ex.groupBy("term").agg(
        F.sum(F.when(F.col("s") == "a", 1).otherwise(0)).cast("bigint").alias("k_a"),
        F.sum(F.when(F.col("s") == "b", 1).otherwise(0)).cast("bigint").alias("k_b"),
    ).persist()
    totals = per_term.agg(
        F.sum("k_a").cast("bigint").alias("n_a"), F.sum("k_b").cast("bigint").alias("n_b")
    )
    scored = per_term.crossJoin(F.broadcast(totals)).select(
        "term",
        "k_a",
        "k_b",
        F.abs(F.col("k_a") * F.col("n_b") - F.col("k_b") * F.col("n_a"))
        .cast("bigint")
        .alias("drift_num"),
        "n_a",
        "n_b",
    )
    tv = scored.groupBy("n_a", "n_b").agg(
        F.sum("drift_num").cast("bigint").alias("s_num")
    )
    tv_col = F.round(
        F.col("s_num").cast("double")
        / (F.lit(2.0) * (F.col("n_a") * F.col("n_b")).cast("double")),
        6,
    ).alias("tv_distance")
    top = (
        scored.select("term", "k_a", "k_b", "drift_num")
        .orderBy(F.col("drift_num").desc(), "term")
        .limit(top_k)
    )
    return top.crossJoin(F.broadcast(tv.select(tv_col)))


def remove_shared_spans(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL — the edit pass behind
    :func:`shared_ngram_stats`'s measurement (public pipelines measure
    the duplicated-n-gram fraction, then CUT the duplicated spans and
    keep the remainder; whole-doc dropping loses the unique tail of a
    mostly-boilerplate page).

    Rule (deterministic, engine-exact): a token position is removed iff
    it is covered by some word n-gram occurrence whose gram also appears
    in at least one OTHER document and this document is NOT the gram's
    owner (owner = min ``id_col`` over containing docs — the first
    occurrence keeps its text, every later doc loses it). Intra-doc
    repeats with no cross-doc sharing are kept (that is the repetition
    filter's job, :func:`top_ngram_fraction`). The cleaned text is the
    kept tokens joined by single spaces in original order.

    Returns (id_col, n_tokens, n_removed, removed_frac, clean_text) for
    EVERY input doc (docs shorter than ``n`` tokens pass through whole).

    Scale shape: positional grams are one row per token (same volume as
    the stats op); gram ownership is ONE gram-keyed hash-agg with
    map-side partial combine (hot boilerplate grams fan out across
    partitions, never into a window); covered positions explode at most
    n rows per duplicated occurrence; reconstruction is one id-keyed
    agg whose group size is bounded by document length. No all-pairs,
    no window over the corpus, no UDF anywhere.
    """
    from mediacrawler_spark.functions.textual import tokens

    tok_tbl = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).persist()
    pos_grams = tok_tbl.select(
        "id",
        F.posexplode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - n + 1),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("p0", "gram"),
    )
    gram_docs = pos_grams.groupBy("gram").agg(
        F.min("id").alias("owner"), F.countDistinct("id").alias("nd")
    )
    dup_occ = pos_grams.join(gram_docs.filter(F.col("nd") >= 2), "gram").filter(
        F.col("id") != F.col("owner")
    )
    covered = dup_occ.select(
        "id", F.explode(F.sequence(F.col("p0") + 1, F.col("p0") + n)).alias("p")
    ).distinct()
    toks_pos = tok_tbl.select(
        "id", F.posexplode("toks").alias("pt", "tok")
    ).select("id", (F.col("pt") + 1).alias("p"), "tok")
    clean = (
        toks_pos.join(covered, ["id", "p"], "left_anti")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("p", "tok"))).alias("kept"))
        .select(
            "id",
            F.concat_ws(
                " ", F.transform("kept", lambda s: s["tok"])
            ).alias("clean_text"),
        )
    )
    removed = covered.groupBy("id").agg(F.count("*").alias("n_removed"))
    return (
        tok_tbl.select("id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(removed, "id", "left")
        .join(clean, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce(F.col("n_removed"), F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("removed_frac"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_vocab: int = 2000,
    min_pair: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Document-level collocation mining — term pairs that co-occur in
    documents far more than chance (PMI/lift), the phrase-detection and
    topic-seed primitive of corpus analysis.

    Co-occurrence is at DOCUMENT granularity over distinct terms. The
    quadratic pair fan-out is bounded up front: the vocabulary is the
    ``max_vocab`` terms with doc-frequency ≥ ``min_df`` (ordered df
    desc, term asc — deterministic), broadcast as a set, and each doc
    contributes pairs only over its vocab terms (≤ C(|vocab ∩ doc|, 2),
    in practice tiny). Lift = n_ab·N / (n_a·n_b) — two exact bigint
    products (n ≤ 10^6 vocab df ⇒ products < 2^63 at any corpus size up
    to N ~ 9·10^12 docs) in ONE double division, rounded 6dp; ranking
    is lift desc then pair asc, so ties are engine-independent.

    Scale shape: one term df hash-agg, the vocab broadcast back (top-k
    on it is driver-side small), per-doc pair generation as pure array
    HOFs (sorted kept-term array → index-pair flatten — no UDF), one
    pair-keyed hash-agg with map-side combine, two small equi-joins to
    attach n_a/n_b, TakeOrderedAndProject. No self-join of the corpus.
    """
    from mediacrawler_spark.functions.textual import tokens

    n_docs = docs.select(id_col).distinct().count()
    per_doc = docs.select(
        F.col(id_col),
        F.array_sort(F.array_distinct(tokens(F.col(text_col)))).alias("ts"),
    ).persist()  # feeds dfreq AND the vocab filter: tokenize once
    dfreq = per_doc.select(F.explode("ts").alias("term")).groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    vocab = (
        dfreq.filter(F.col("df") >= int(min_df))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(int(max_vocab))
    )
    # The vocab is max_vocab-bounded, so collecting it to the driver is a
    # k-bounded collect (like the shard-id lists) and the df agg runs
    # exactly once. Terms are mapped to small vocab-rank INTS for the
    # pair stage (r06): the per-doc pair fan-out is C(|vocab ∩ doc|, 2),
    # and on a dense corpus that is thousands of pairs per doc — packing
    # each pair into ONE long key (vid_a·V + vid_b) turns the explode +
    # hash-agg from string-struct rows into longs (measured 8.4s → ~3s
    # at sf1.0). Strings re-attach after the agg via the tiny vocab map;
    # pair identity is preserved (vid ↔ term is a bijection), and the
    # output keys re-normalize to term_a < term_b string order.
    vrows = vocab.collect()
    spark = docs.sparkSession
    vmax = int(max_vocab)
    vmap = spark.createDataFrame(
        [(r["term"], i, r["df"]) for i, r in enumerate(vrows)],
        "term string, vid int, df long",
    )
    exk = per_doc.select(
        F.col(id_col), F.explode("ts").alias("term")
    ).join(F.broadcast(vmap.select("term", "vid")), "term")
    # pair enumeration as a parallelism-pinned self-join on the doc id
    # (fanout.py pin, CLAUDE.md invariant) instead of collect_list +
    # nested transform/element_at: HOF lambdas evaluate interpreted per
    # pair, the join emits the identical {vid_a < vid_b} pair set from
    # codegen'd probe loops and skips the per-doc array collect exchange
    # entirely (same rewrite as graph.copageview, measured ~3x there).
    from mediacrawler_spark.operators.fanout import pin_parallelism

    exv = exk.select(F.col(id_col).alias("_pid"), "vid").persist()
    pairs = (
        pin_parallelism(exv.select("_pid", F.col("vid").alias("vid_a")), "_pid")
        .join(
            # shuffle-hash, not sort-merge: the per-doc groups are
            # cap-bounded, so the build side hashes cheaply and neither
            # 1.5M-row stream pays a sort
            exv.select("_pid", F.col("vid").alias("vid_b")).hint("shuffle_hash"),
            "_pid",
        )
        .filter(F.col("vid_a") < F.col("vid_b"))
        .select(
            (F.col("vid_a").cast("long") * F.lit(vmax) + F.col("vid_b")).alias("pk")
        )
    )
    pc = pairs.groupBy("pk").agg(
        F.count("*").cast("long").alias("n_ab")
    ).filter(F.col("n_ab") >= int(min_pair)).select(
        (F.col("pk") / vmax).cast("int").alias("vid_a"),
        F.pmod(F.col("pk"), F.lit(vmax)).cast("int").alias("vid_b"),
        "n_ab",
    )
    va = vmap.select(
        F.col("vid").alias("vid_a"), F.col("term").alias("ta"), F.col("df").alias("na")
    )
    vb = vmap.select(
        F.col("vid").alias("vid_b"), F.col("term").alias("tb"), F.col("df").alias("nb")
    )
    return (
        pc.join(F.broadcast(va), "vid_a")
        .join(F.broadcast(vb), "vid_b")
        .select(
            F.least("ta", "tb").alias("term_a"),
            F.greatest("ta", "tb").alias("term_b"),
            "n_ab",
            F.when(F.col("ta") <= F.col("tb"), F.col("na"))
            .otherwise(F.col("nb"))
            .alias("n_a"),
            F.when(F.col("ta") <= F.col("tb"), F.col("nb"))
            .otherwise(F.col("na"))
            .alias("n_b"),
            F.round(
                (F.col("n_ab") * F.lit(int(n_docs))).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "term_a", "term_b")
        .limit(int(top_k))
    )


def skipgram_cooc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    min_count: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Positional skip-gram co-occurrence counts — the word2vec/GloVe
    input statistic: for every unordered term pair, how many token-index
    pairs (i, j) with 0 < j−i ≤ ``window`` land on it, summed over the
    corpus. Unlike ``pmi_collocations`` (document-level, distinct terms)
    this counts at TOKEN granularity with positional adjacency, so
    repeated phrases weigh in proportionally — exactly what an embedding
    trainer consumes. Pairs are canonicalized (lexicographic min, max);
    same-term pairs (a repeated word inside the window) count too.
    Output: (term_a, term_b, n) with n ≥ ``min_count``, ordered n desc
    then pair asc (deterministic), top_k rows; exact bigint counts.

    Scale shape: pair generation is per-doc array surgery over the token
    array (fan-out ≤ window per token — linear, never quadratic), one
    explode, ONE pair-keyed hash-agg with map-side combine,
    TakeOrderedAndProject. No join, no UDF, no corpus self-join. At
    100 TB the only shuffle is the pair aggregation and its key space
    is vocabulary-bounded.

    The pairs for gap k are ``zip(ts[0:n-k], ts[k:n])`` — one
    ``arrays_zip`` of two slices per gap, concatenated over k = 1..W and
    exploded, with the unordered-pair canonicalization (least/greatest)
    applied AFTER the explode in a codegen'd projection. Equivalent to
    the nested per-(i, j) lambda formulation (i<j, j−i ≤ W) but without
    higher-order-function interpretation: HOF lambdas don't enter
    whole-stage codegen, so the old form paid an interpreter dispatch
    plus two element_at calls per pair (measured 6.1s vs 1.25s on 50k
    docs / 7.5M pairs).
    """
    from mediacrawler_spark.functions.textual import tokens

    W_ = int(window)
    per_doc = docs.select(tokens(F.col(text_col)).alias("ts"))
    n = F.size("ts")
    gap_pairs = [
        F.when(
            n > k,
            F.arrays_zip(
                F.slice("ts", 1, n - k).alias("x"),
                F.slice("ts", k + 1, n - k).alias("y"),
            ),
        ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        for k in range(1, W_ + 1)
    ]
    pairs = (
        per_doc.filter(n >= 2)
        .select(F.explode(F.concat(*gap_pairs)).alias("p"))
        .select(
            F.least("p.x", "p.y").alias("term_a"),
            F.greatest("p.x", "p.y").alias("term_b"),
        )
    )
    return (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") >= int(min_count))
        .orderBy(F.col("n").desc(), "term_a", "term_b")
        .limit(int(top_k))
    )


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Inverted-index build — the physical artifact behind bm25_topk's
    statistics: per term its document frequency, collection frequency,
    and the postings list as a STRING ``"doc:tf,doc:tf,..."`` in doc-id
    order. String encoding is deliberate: a string column hash-compares
    bit-identically across engines (an array<struct> renders
    differently per engine), and it is exactly how postings serialize
    into an index segment anyway. Top ``top_k`` terms by (df desc,
    term asc) — deterministic.

    Scale shape: one explode → (term, doc) hash-agg with map-side
    combine (tf), one term-keyed agg for df/cf/the sorted postings
    concat, TakeOrderedAndProject. The postings string for a stop-word
    term is df-bounded — at 10^10 docs a real index would shard hot
    terms' postings (doc-range segmenting); this operator is the
    per-shard build, which is why there is no cap here.
    """
    from mediacrawler_spark.functions.textual import tokens

    tf = (
        docs.select(
            F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .groupBy("term", "doc")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("doc"), F.col("tf")))
                    ),
                    lambda s: F.concat_ws(":", s["doc"], s["tf"]),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= int(min_df))
        .orderBy(F.col("df").desc(), "term")
        .limit(int(top_k))
    )


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    ratios: tuple = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Deterministic train/val/test split — the last labeling step
    before a corpus ships to training: every doc draws the 60-bit
    integer ``conv(md5(id)[0:15], 16, 10)`` and lands in the split whose
    EXACT integer threshold band contains it (cum_percent · 16^15 div
    100 — no float probability anywhere), so independent runs AND
    independent engines assign byte-identical splits with no
    coordinator, and a doc's split never changes as the corpus grows
    (the property a contamination-free eval set needs: train/test
    membership is a pure function of the id).

    ``ratios`` are (name, integer-percent) pairs summing to 100.
    Output: (id, draw, split) — pure scan-side codegen, no shuffle, no
    UDF.
    """
    pcts = [int(p) for _, p in ratios]
    if sum(pcts) != 100 or any(p <= 0 for p in pcts):
        raise ValueError("ratios must be positive integer percents summing to 100")
    top = 16**15
    draw = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    cum = 0
    expr = None
    names = [n for n, _ in ratios]
    for name, p in ratios[:-1]:
        cum += int(p)
        thr = cum * top // 100
        cond = F.col("draw") < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return docs.select(F.col(id_col), draw.alias("draw")).withColumn(
        "split", expr
    )

"""Deterministic sketching: HyperLogLog distinct counts and count-min
frequency estimates.

Counting distinct keys per group exactly needs a shuffle of every
(group, key) pair — at crawl scale (distinct URLs per host over 10^10
URLs) that is the single biggest exchange in the pipeline. HyperLogLog
(Flajolet et al. 2007) replaces it with m tiny integer registers per
group: two hash-aggregates with full map-side partial combine, shuffling
at most |groups| * m rows regardless of key cardinality.

This implementation is ENGINE-DETERMINISTIC, unlike the built-in
``approx_count_distinct`` (whose HLL++ register layout is a Spark
implementation detail no other engine reproduces): every step is either
exact integer arithmetic or a single fixed-form IEEE expression, so
Spark and DuckDB produce byte-identical registers AND estimates from
the same rows:

- hash = md5 of the key rendered as a string (md5 is bit-stable
  everywhere; the crawl engine's xxhash64 keying stays for the seen set
  — this sketch is for analytics parity).
- bucket = first 2 hex chars (m = 256 registers).
- rho = leading-zero count of the next 13 hex chars (52 bits) + 1,
  computed with string ops (regexp leading-zeros * 4 + a 16-way CASE on
  the first non-zero digit) — never float log2; capped at 30 so the
  exact register sum below cannot overflow.
- sum over registers of 2^-reg is computed EXACTLY as an integer:
  sum(1L << (31 - reg)) / 2^31 — float summation order never enters.
- small-range correction: linear counting m*ln(m/zeros) when the raw
  estimate <= 2.5m and empty registers exist (the standard rule).

Reference scope: the reference crawler has no sketching (its counts are
exact SQL aggregates, /root/reference/store/*); this is the §2-extras
scale path for per-host distinct-URL accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: register-count exponent: m = 2^P_BITS, P_BITS fixed at 8 (2 hex chars)
M = 256
#: rho cap keeping sum(1L << (31 - reg)) * m < 2^63
RHO_CAP = 30

# leading zero bits of one hex digit (within its 4 bits)
_DIGIT_LZ = {
    "1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1,
    "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0, "f": 0,
}


def _rho_expr(hex13):
    """rho = leading zero BITS of the 52-bit field + 1, via string ops."""
    zeros = F.length(F.regexp_extract(hex13, "^(0*)", 1))
    first = F.substring(F.concat(F.regexp_replace(hex13, "^0*", ""), F.lit("x")), 1, 1)
    extra = F.lit(0)
    for d, lz in _DIGIT_LZ.items():
        extra = F.when(first == d, F.lit(lz)).otherwise(extra)
    # all-zero field: rho = 52 + 1 (extra stays 0, zeros = 13)
    return F.least(zeros * 4 + extra + 1, F.lit(RHO_CAP))


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """(group..., bucket, reg): the m=256 HLL registers per group. One
    hash-agg keyed by (group, bucket) with map-side combine — the only
    shuffle proportional to data; everything after is |groups|*256 rows."""
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = _rho_expr(F.substring(h, 3, 13))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., est_distinct) from a register table (group..., bucket,
    reg) — the estimation step shared by the direct path and sketch
    merges. Register sum is exact integer arithmetic; the standard
    linear-counting small-range correction applies."""
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("m_present"),
        F.sum(F.expr("shiftleft(1L, 31 - reg)")).alias("s_int"),
    )
    zeros = F.lit(M) - F.col("m_present")
    denom = zeros.cast("double") + F.col("s_int") / F.lit(float(2**31))
    alpha = 0.7213 / (1.0 + 1.079 / M)
    raw = F.lit(alpha) * F.lit(float(M)) * F.lit(float(M)) / denom
    est = F.when(
        (raw <= F.lit(2.5 * M)) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est_distinct"))


def approx_distinct_hll(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """(group..., est_distinct): HyperLogLog distinct-count estimate per
    group, deterministic across engines and partitionings. Standard
    accuracy ~1.04/sqrt(256) = 6.5% relative error."""
    return hll_estimate(hll_registers(df, group_cols, key_col), group_cols)


def hll_merge(
    regs: DataFrame, keep_cols: list[str] | None = None
) -> DataFrame:
    """Merge register sets down to ``keep_cols`` granularity by
    register-wise max — THE distributed-sketch property: merging group
    sketches yields registers BIT-IDENTICAL to sketching the union
    directly, so rollups (per-host → per-TLD → global distinct-URL
    counts) reuse stored sketches and never rescan the raw keys.
    Input (group..., bucket, reg); output (keep..., bucket, reg).
    Cost: one hash-agg over |groups| * 256 register rows — raw-data
    volume never enters."""
    keep = list(keep_cols or [])
    return regs.groupBy(*keep, "bucket").agg(F.max("reg").alias("reg"))


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#: depth (independent hash rows) and width (buckets per row)
CMS_D = 4
CMS_W = 1024


def _cms_bucket(col, j: int):
    """Row-j bucket: 4 hex chars of md5(salt_j || key) -> int % CMS_W.
    String-ops hex decode (same determinism rationale as the HLL
    registers): never engine-private hashing."""
    h = F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), col.cast("string"))), 1, 4)
    v = F.conv(h, 16, 10).cast("int")
    return F.pmod(v, F.lit(CMS_W))


def cms_build(items: DataFrame, key_col: str) -> DataFrame:
    """(j, bucket, cnt): the d x w count-min table over a key stream
    (duplicates counted — this sketches FREQUENCIES, unlike HLL).

    Scale shape: the input is mapped to CMS_D (j, bucket) cells per row
    (a Generate of a 4-element literal array — no data-dependent blowup)
    and reduced by ONE hash-agg with map-side partial combine; the
    result is <= d*w = 4096 rows total regardless of input size, so
    estimation joins against it are always broadcast."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col(key_col), j).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.j", "c.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, queries: DataFrame, key_col: str) -> DataFrame:
    """(key, est): count-min frequency estimate (min over the d rows)
    for each query key. Overestimates only — est >= true count always,
    with the standard (e/w, 1-e^-d) error bound. The 4096-cell sketch is
    broadcast; the query side never shuffles."""
    probes = queries.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col(key_col), j).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.j", "c.bucket")
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# sampled quantiles (deterministic md5-Bernoulli sample + exact interpolation)
# ---------------------------------------------------------------------------


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    probs: dict[str, float],
    prefix_len: int = 1,
) -> DataFrame:
    """Per-group quantile estimates over a deterministic Bernoulli
    sample: keep rows whose md5(key) starts with ``prefix_len`` zero hex
    digits (rate 16^-prefix_len), then take EXACT linearly-interpolated
    percentiles of the sample. ``probs`` maps output column name ->
    probability; ``n_sampled`` is appended.

    Scale shape: the sample predicate is a pure column filter evaluated
    AT THE SCAN — the corpus never shuffles; only the fixed-rate sample
    (16^-p of the rows, 3 narrow columns) reaches the one group-by
    exchange. Exact per-group quantiles would instead sort every row.
    Deterministic on any engine: md5 of the key's decimal string is
    bit-stable, and percentile interpolation (type-7 linear) is the
    same fixed IEEE expression in Spark and DuckDB, so estimates
    hash-match cross-engine from the same rows.

    Reference scope: the reference has no quantile machinery (exact SQL
    aggregates only, /root/reference/store/*); this is the §2-extras
    distribution sketch beside HLL (cardinality) and count-min
    (frequency).
    """
    sample = df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, prefix_len)
        == "0" * prefix_len
    )
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 6).alias(name)
        for name, p in probs.items()
    ]
    aggs.append(F.count("*").cast("bigint").alias("n_sampled"))
    return sample.groupBy(*group_cols).agg(*aggs)

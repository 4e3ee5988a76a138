"""embedding_incremental (operators/similarity.py): cross-frame
semantic admission vs a numpy brute-force reference (planted identical
and scaled-copy vectors must classify 'dup' with the right match_id;
orthogonal vectors 'unique'), zero-vector safety, and the plan keeping
the signature UDF to one pass per side."""

import numpy as np
from pyspark.sql import types as T

from mediacrawler_spark.operators.similarity import embedding_incremental

DIM = 8
SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def _ref(base, incoming, threshold):
    out = {}
    for ii, vi in incoming:
        vi = np.asarray(vi, dtype=np.float64)
        best = None
        for bi, vb in base:
            vb = np.asarray(vb, dtype=np.float64)
            na, nb = np.linalg.norm(vi), np.linalg.norm(vb)
            cos = float(vi @ vb / (na * nb)) if na > 0 and nb > 0 else 0.0
            if cos >= threshold and (best is None or bi < best[0]):
                best = (bi, cos)
        out[ii] = (
            ("dup", best[0], round(best[1], 6)) if best else ("unique", -1, 0.0)
        )
    return out


def _rng_vecs(n, seed):
    r = np.random.RandomState(seed)
    return [(i, r.standard_normal(DIM)) for i in range(n)]


def test_embedding_incremental_matches_brute_force(spark):
    base = _rng_vecs(30, 1)
    # incoming: ids 100.. — copies of base 3 and 7 (identical + scaled),
    # plus fresh random vectors
    incoming = [
        (100, base[3][1].copy()),
        (101, base[7][1] * 2.5),  # same direction: cosine 1
        (102, np.random.RandomState(99).standard_normal(DIM)),
        (103, base[3][1] * -1.0),  # anti-parallel: cosine -1, unique
    ]
    got = {
        r["vec_id"]: (r["status"], r["match_id"], r["cosine"])
        for r in embedding_incremental(
            _mk(spark, base), _mk(spark, incoming),
            threshold=0.95, dim=DIM, max_bucket=1 << 20,
        ).collect()
    }
    ref = _ref(base, incoming, 0.95)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0], (k, got[k], ref[k])
        assert got[k][1] == ref[k][1]
        assert abs(got[k][2] - ref[k][2]) < 1e-6
    assert got[100][0] == "dup" and got[100][1] == 3
    assert got[101][0] == "dup" and got[101][1] == 7
    assert got[103][0] == "unique"


def test_embedding_incremental_min_id_tiebreak_and_zero_vec(spark):
    v = np.ones(DIM)
    base = [(5, v.copy()), (2, v.copy()), (9, v.copy())]
    incoming = [(100, v.copy()), (101, np.zeros(DIM))]
    got = {
        r["vec_id"]: (r["status"], r["match_id"])
        for r in embedding_incremental(
            _mk(spark, base), _mk(spark, incoming),
            threshold=0.95, dim=DIM, max_bucket=1 << 20,
        ).collect()
    }
    assert got[100] == ("dup", 2)  # smallest matching base id
    assert got[101] == ("unique", -1)  # zero vector matches nothing


def test_embedding_incremental_one_udf_pass_per_side(spark):
    base = _mk(spark, _rng_vecs(10, 3))
    inc = _mk(spark, _rng_vecs(4, 4))
    # runtime proof of ONE UDF pass per side (a plan-string count can't
    # distinguish the cached plan inlined under each InMemoryTableScan
    # from actual re-execution): an accumulator inside the bucket UDF
    # counts rows processed — with the persist in place it must equal
    # exactly n_base + n_incoming, not a multiple
    import mediacrawler_spark.operators.similarity as sim

    import pandas as pd
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    def counting(dim, n_planes=16, seed=42):
        planes = np.random.RandomState(seed).standard_normal((dim, n_planes))

        @F.pandas_udf(T.LongType())
        def bucket(vecs: pd.Series) -> pd.Series:
            acc.add(len(vecs))
            m = np.vstack(vecs.to_numpy())
            w = (1 << np.arange(n_planes)).astype(np.int64)
            return pd.Series(((m @ planes) > 0) @ w)

        return bucket

    old = sim.hyperplane_bucket_udf
    sim.hyperplane_bucket_udf = counting
    try:
        df = embedding_incremental(base, inc, dim=DIM, max_bucket=1 << 20)
        df.collect()
    finally:
        sim.hyperplane_bucket_udf = old
    assert acc.value == 10 + 4, acc.value

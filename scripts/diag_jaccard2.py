"""Stage split of the CURRENT int-id jaccard join at a given SF (guide 1):
candidate generation vs set-attach joins vs the intersect verify, plus
the join strategies the planner picked.
Usage: python scripts/diag_jaccard2.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import word_shingles
from mediacrawler_spark.operators.text_dedup import _with_gram_ids
from mediacrawler_spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    threshold = 0.5
    spark = get_spark(app_name="diag_jaccard2")
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    sh = d.select(F.col("doc_id").alias("id"), word_shingles(F.col("text"), 3).alias("sh"))
    sh = sh.select("id", "sh", F.size("sh").alias("n")).persist()
    sh.count()
    print(f"shingles: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    ex = sh.select("id", "n", F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("gdf"))
    exg = ex.join(_with_gram_ids(freq), "g")
    ish = exg.groupBy("id").agg(F.array_sort(F.collect_list("gid")).alias("ish")).persist()
    ish.count()
    print(f"int sets:  {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    w = Window.partitionBy("id").orderBy("gdf", "g")
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    prefix = (
        exg.select("id", "n", "gid", F.row_number().over(w).alias("p"))
        .filter(F.col("p") <= plen)
    )
    a = prefix.select("gid", F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("p").alias("p_a"))
    b = prefix.select("gid", F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("p").alias("p_b"))
    overlap_floor = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    overlap_ub = F.lit(1) + F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b"))
    cand = (
        a.join(b, "gid")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") * F.lit(1.0) >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") * F.lit(1.0) >= F.lit(threshold) * F.col("n_b"))
            & (overlap_ub >= overlap_floor)
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .dropDuplicates(["id_a", "id_b"])
    ).persist()
    nc = cand.count()
    print(f"candidates: {nc} in {time.perf_counter()-t0:.2f}s", flush=True)

    def verify(tag, c, bcast):
        ia = ish.select(F.col("id").alias("id_a"), F.col("ish").alias("ish_a"))
        ib = ish.select(F.col("id").alias("id_b"), F.col("ish").alias("ish_b"))
        if bcast:
            ia, ib = F.broadcast(ia), F.broadcast(ib)
        j = c.join(ia, "id_a").join(ib, "id_b")
        inter = F.size(F.array_intersect("ish_a", "ish_b"))
        union = (F.col("n_a") + F.col("n_b") - inter).cast("double")
        out = (
            j.withColumn("jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        t0 = time.perf_counter()
        n = out.count()
        print(f"verify[{tag}]: {n} pairs in {time.perf_counter()-t0:.2f}s", flush=True)
        return out

    v1 = verify("smj-default", cand, bcast=False)
    verify("smj-default rep2", cand, bcast=False)
    verify("broadcast-ish", cand, bcast=True)
    verify("broadcast-ish rep2", cand, bcast=True)
    print(v1._jdf.queryExecution().executedPlan().toString()[:2200])
    spark.stop()


if __name__ == "__main__":
    main()

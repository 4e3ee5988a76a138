"""Compare skipgram pair-generation formulations (guide 1: measure
before changing). Usage: python scripts/diag_pairs.py [sf_dir]"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import tokens
from mediacrawler_spark.session import get_spark


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter()-t0:.2f}s", flush=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    spark = get_spark(app_name="diag_pairs")
    d = spark.read.parquet(f"{sf}/documents.parquet")
    W_ = 3
    per_doc = d.select(tokens(F.col("text")).alias("ts")).persist()
    per_doc.count()
    t("tokenize only", per_doc)

    # current: nested transform + element_at
    cur = per_doc.filter(F.size("ts") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.least(i + F.lit(W_), F.size("ts"))),
                        lambda j: F.struct(
                            F.least(F.element_at("ts", i), F.element_at("ts", j)).alias("a"),
                            F.greatest(F.element_at("ts", i), F.element_at("ts", j)).alias("b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).groupBy("p.a", "p.b").count()
    t("nested transform", cur)
    t("nested transform rep2", cur)

    # slice + zip_with per gap
    n = F.size("ts")
    zs = [
        F.when(
            n > k,
            F.zip_with(
                F.slice("ts", 1, n - k),
                F.slice("ts", k + 1, n - k),
                lambda x, y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        for k in range(1, W_ + 1)
    ]
    zw = per_doc.filter(F.size("ts") >= 2).select(
        F.explode(F.concat(*zs)).alias("p")
    ).groupBy("p.a", "p.b").count()
    t("slice+zip_with", zw)
    t("slice+zip_with rep2", zw)

    # arrays_zip then least/greatest post-explode (codegen candidates)
    az = [
        F.when(
            n > k,
            F.arrays_zip(
                F.slice("ts", 1, n - k).alias("x"),
                F.slice("ts", k + 1, n - k).alias("y"),
            ),
        ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        for k in range(1, W_ + 1)
    ]
    a2 = per_doc.filter(F.size("ts") >= 2).select(
        F.explode(F.concat(*az)).alias("p")
    ).select(
        F.least("p.x", "p.y").alias("a"), F.greatest("p.x", "p.y").alias("b")
    ).groupBy("a", "b").count()
    t("arrays_zip+post", a2)
    t("arrays_zip+post rep2", a2)

    # posexplode + 3 lead windows? skip — needs a doc id + shuffle.
    spark.stop()


if __name__ == "__main__":
    main()

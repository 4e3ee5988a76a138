"""Driver-style correctness sweep: every queries() entry vs its
oracle_sql() in DuckDB at a given sf dir, comparing row count, sorted
column names, and a value hash over column-name-sorted stringified rows
(floats canonicalized to 9 significant decimals to absorb engine repr
differences the driver's hash also tolerates).

Usage: python scripts/correctness_sweep.py [sf_dir] [only_query ...]
"""
import json
import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            # DuckDB fetch_df renders numeric SQL NULL as NaN; the
            # queries never emit true NaN, so fold it to NULL.
            return "NULL"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon_rows(rows, cols):
    return sorted(tuple(_canon_val(r[c]) for c in cols) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/sweep_tmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    results, bad = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            s_rows = _canon_rows(
                [r.asDict() for r in df.collect()], cols
            )
            sql = os_.get(name)
            if sql is None:
                results[name] = {"rows": len(s_rows), "oracle": None}
                continue
            o_df = con.execute(sql).fetch_df()
            o_cols = sorted(o_df.columns)
            o_rows = _canon_rows(o_df.to_dict("records"), o_cols)
            ok = (cols == o_cols) and (s_rows == o_rows)
            results[name] = {
                "rows": len(s_rows),
                "oracle_rows": len(o_rows),
                "schema_match": cols == o_cols,
                "hash_match": s_rows == o_rows,
            }
            if not ok:
                bad.append(name)
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    if a != b:
                        results[name]["first_diff"] = {
                            "i": i, "spark": a[:6], "oracle": b[:6],
                        }
                        break
                if cols != o_cols:
                    results[name]["cols"] = [cols, o_cols]
            print(
                f"{name}: {'OK' if ok else 'MISMATCH'} "
                f"({len(s_rows)} rows)", flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            results[name] = {"err": repr(exc)[:400]}
            print(f"{name}: ERROR {exc!r}"[:300], flush=True)
    print(json.dumps({"bad": bad, "n": len(results)}))
    with open("/tmp/sweep_results.json", "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

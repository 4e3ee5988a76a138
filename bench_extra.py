#!/usr/bin/env python
"""Side benchmark harness for optimization work (guide §1.4/§1.5).

NOT used by the driver — bench.py stays the frozen measurement. This
one times individual declared queries (same `.count()` methodology as
bench.py) at an arbitrary SF dir, optionally repeats, and can dump
`.explain("formatted")` to plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain TAG] q1 q2 ...
  python bench_extra.py --sf /root/testdata/sf1.0 dedup_edit_distance
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None, help="suffix tag: write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--noop", action="store_true",
        help="time a noop-sink write (computes every column; guide 1.4) "
        "instead of bench.py's frozen .count() methodology",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mediacrawler_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cpus=args.cpus)
    qmap = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = qmap[name]
        if args.explain:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as f:
                f.write(plan)
        times, n = [], None
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            if args.noop:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = fn(spark, args.sf).count()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"# {name}: {times} ({n} rows)", flush=True)
    print(json.dumps({"sf": args.sf, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()

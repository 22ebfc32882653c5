"""Per-query timing harness for the optimization round (guide §1.4).

Times individual declared queries with the SAME methodology as the frozen
bench.py (build DataFrame + .count()), plus optional noop-sink isolation
(--noop: computes every column, not just the count) and plan capture
(--explain DIR writes <query>.txt with .explain formatted output).

Usage:
  python tools/bench_query.py [--sf DIR] [--runs N] [--noop]
         [--explain DIR] query [query ...]

Separate from bench.py on purpose: bench.py is FROZEN for measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from data_quality_autohealer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of count()")
    ap.add_argument("--explain", default=None,
                    help="directory to write .explain('formatted') per query")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for --explain output, e.g. _before")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dqa-bench-query",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    qs = entry_mod.queries()
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf}/documents.parquet").count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in args.queries:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)

    timings: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.runs):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {n: {"min": min(v), "samples": v} for n, v in timings.items()}
    out["_meta"] = {"sf": args.sf, "cpus": cpus, "noop": args.noop,
                    "loadavg": [round(x, 2) for x in os.getloadavg()]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Mega-host skew proof for per-host rollups (VERDICT-r04 task 6).

Builds an N-doc corpus with ``hot_pct`` % of all docs on ONE host (the
rest Zipf-ish over 50k hosts), materializes it, then times
``per_host_metrics_plain`` vs ``per_host_metrics_salted`` interleaved
best-of-R on the same cached input. Also reports the LOGICAL per-reducer
row bound each plan implies:

* plain groupBy(host): with map-side partial aggregation (always active
  for count/sum), the hot key's reducer receives one partial row per map
  partition — NOT one row per doc. Algebraic aggregates therefore absorb
  key skew already; the measured walls are expected to be close.
* salted groupBy(host, salt): bounds the PRE-combine state per reducer at
  ~hot/S even when partial aggregation cannot compress (large-state
  aggregates: collect_*/exact percentile/count_distinct rewrites), which
  is where the two-phase pattern earns its keep at 10^12 rows.

Usage: python tools/bench_skew.py [docs] [hot_pct] [salts] [rounds]
Prints one JSON line; paste the row into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_quality_autohealer_spark.operators import skew  # noqa: E402
from data_quality_autohealer_spark.session import get_spark  # noqa: E402


def build_corpus(spark, n: int, hot_pct: float):
    """(url, keep) frame: ``hot_pct`` (a FRACTION, e.g. 0.3 = 30%) of ids
    on mega.example, rest spread. Granularity 1/10000 so sub-1% shares
    don't truncate to zero (review finding)."""
    cut = int(round(hot_pct * 10000))
    return (spark.range(n).select(
        F.when(F.pmod(F.col("id"), F.lit(10000)) < cut,
               F.concat(F.lit("https://mega.example/p/"), F.col("id")))
        .otherwise(F.concat(F.lit("https://host"),
                            F.pmod(F.xxhash64("id"), F.lit(50_000)),
                            F.lit(".example/p/"), F.col("id")))
        .alias("url"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 6).alias("keep")))


def main() -> dict:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hot_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    salts = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark(app_name="bench-skew")
    df = build_corpus(spark, n, hot_pct / 100.0).persist()
    df.count()  # materialize + numpy/JVM warm-up before timing

    def wall(mk):
        t0 = time.perf_counter()
        mk().collect()
        return round(time.perf_counter() - t0, 3)

    plain, salted = [], []
    for _ in range(rounds):  # interleaved (CLAUDE.md shared-VM rule)
        plain.append(wall(lambda: skew.per_host_metrics_plain(df)))
        salted.append(wall(
            lambda: skew.per_host_metrics_salted(df, num_salts=salts)))

    # logical reducer-input bounds (rows of pre-combine state per task)
    hot = df.where(F.col("url").startswith("https://mega.example/")).count()
    per_salt = (df.where(F.col("url").startswith("https://mega.example/"))
                .groupBy(F.pmod(F.xxhash64("url"), F.lit(salts)))
                .count().agg(F.max("count")).collect()[0][0])
    out = {
        "metric": "skew_salted_vs_plain", "docs": n, "hot_pct": hot_pct,
        "salts": salts, "hot_rows": hot,
        "plain_sec_best": min(plain), "salted_sec_best": min(salted),
        "plain_secs": plain, "salted_secs": salted,
        "map_partitions": df.rdd.getNumPartitions(),
        "max_rows_per_salted_reducer": per_salt,
        "unsalted_hot_state_rows": hot,
    }
    df.unpersist()
    return out


if __name__ == "__main__":
    json.dump(main(), sys.stdout)
    print()

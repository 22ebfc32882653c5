"""Quality report from the metrics/alerts tables — the batch analogue of the
reference's dashboard/WebSocket surface (src/api/websocket_server.py,
src/api/quality_service.py): per-run totals, rule-hit breakdown, severity
histogram, worst buckets.

Usage: python jobs/quality_report.py --warehouse /tmp/wh [--run-id r1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", default=None)
    p.add_argument("--top-buckets", type=int, default=5)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from data_quality_autohealer_spark.session import get_spark
    from data_quality_autohealer_spark.warehouse import Warehouse

    spark = get_spark(app_name="dqa-report", master=args.master)
    wh = Warehouse(spark, args.warehouse)
    m = wh.read_metrics()
    if args.run_id:
        m = m.where(F.col("run_id") == args.run_id)
    m = m.persist()

    totals = m.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("docs_in").alias("docs_in"),
        F.sum("docs_kept").alias("docs_kept"),
        F.sum("docs_dropped").alias("docs_dropped"),
    ).collect()[0]

    rule_hits = (m.select(F.explode("rule_hits").alias("reason", "hits"))
                 .groupBy("reason").agg(F.sum("hits").alias("hits"))
                 .orderBy(F.desc("hits")).collect())
    pii = (m.select(F.explode("pii_scrubbed").alias("kind", "n"))
           .groupBy("kind").agg(F.sum("n").alias("n")).collect())
    worst = (m.withColumn("drop_rate", F.round(
        F.col("docs_dropped") / F.greatest(F.col("docs_in"), F.lit(1)), 4))
        .orderBy(F.desc("drop_rate")).limit(args.top_buckets)
        .select("run_id", "bucket", "docs_in", "drop_rate").collect())
    runs = sorted({r["run_id"] for r in
                   m.select("run_id").distinct().collect()})
    m.unpersist()

    report = {
        "runs": runs,
        "buckets": totals["buckets"],
        "docs_in": totals["docs_in"],
        "docs_kept": totals["docs_kept"],
        "docs_dropped": totals["docs_dropped"],
        "keep_rate": round((totals["docs_kept"] or 0)
                           / max(totals["docs_in"] or 1, 1), 4),
        "rule_hits": {r["reason"]: r["hits"] for r in rule_hits},
        "pii_scrubbed": {r["kind"]: r["n"] for r in pii},
        "worst_buckets": [
            {"run_id": r["run_id"], "bucket": r["bucket"],
             "docs_in": r["docs_in"], "drop_rate": r["drop_rate"]}
            for r in worst],
    }
    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()

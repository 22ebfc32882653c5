"""Dump the physical plans of the load-bearing operators to docs/PLANS.md —
the '.explain and iterate' evidence (each plan annotated with what we verify
on it)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from data_quality_autohealer_spark import synth  # noqa: E402
from data_quality_autohealer_spark.operators import dedup, skew  # noqa: E402
from data_quality_autohealer_spark.plans import pipeline  # noqa: E402
from data_quality_autohealer_spark.session import get_spark  # noqa: E402
from data_quality_autohealer_spark.warehouse import Warehouse  # noqa: E402

CHECKS = []


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    os.makedirs("/root/repo/docs", exist_ok=True)
    tmp = "/tmp/plans_pages"
    synth.gen_pages_df(spark, 500, num_partitions=2).write.mode(
        "overwrite").parquet(tmp)
    pages = spark.read.parquet(tmp)

    wh = Warehouse(spark, "/tmp/plans_wh", num_buckets=8)
    wh.write_pages(synth.gen_pages_df(spark, 500, num_partitions=2))
    scored_small = pipeline.score_pages(wh.read_pages()).limit(50)
    wh.append_metrics(pipeline.bucket_metrics(scored_small, "p1"))

    sections = [
        ("Scoring pipeline + keep filter",
         "Verify: ReadSchema excludes `html` (column pruning); exactly one "
         "ArrowEvalPython (one UDF crossing); no Exchange (shuffle-free "
         "scoring).",
         pipeline.score_pages(pages).where("keep")),
        ("Per-bucket metrics",
         "Verify: two HashAggregate nodes around ONE Exchange "
         "(map-side partial aggregation); no Generate/explode.",
         pipeline.bucket_metrics(pipeline.score_pages(wh.read_pages()), "r")),
        ("Resume anti-join",
         "Verify: BroadcastHashJoin LeftAnti (completed-bucket set ≤ N rows "
         "broadcast; the 100 TB side never shuffles).",
         wh.resume_filter(wh.read_pages(), "p1")),
        ("Salted per-host metrics",
         "Verify: two aggregation rounds (host,salt) then (host) — the "
         "mega-host's rows spread over S reducers in round 1.",
         skew.per_host_metrics_salted(
             pipeline.score_pages(pages, include_model_rules=False))),
        ("MinHash signatures",
         "Verify: pure Project over the scan (signatures are shuffle-free).",
         dedup.with_minhash(pages.select("url", "text")).drop("text")),
    ]
    out = ["# Physical plans of the load-bearing operators\n",
           "Regenerate: `python tools/dump_plans.py`\n"]
    for title, check, df in sections:
        p = plan_of(df)
        out.append(f"\n## {title}\n\n{check}\n\n```\n{p}\n```\n")
    with open("/root/repo/docs/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()

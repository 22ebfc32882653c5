"""Corpus dedup pre-pass CLI: exact or near-dup (LSH→Jaccard→components)
dedup of the pages table into a deduped pages table, with an audit row.

At 100 TB dedup runs as its own pass BEFORE the quality filter (its unit is
the whole corpus, not a bucket, so folding it into the bucket-resumable
filter would make a bucket's output depend on other buckets and break
idempotent resume). The deduped table is then the filter's input.

Usage:
  python jobs/run_dedup.py --warehouse /tmp/wh --mode exact
  python jobs/run_dedup.py --warehouse /tmp/wh --mode neardup \
      --jaccard-threshold 0.5
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--pages-table", default="pages")
    p.add_argument("--out-table", default="pages_deduped")
    p.add_argument("--mode", choices=["exact", "neardup"], default="exact")
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--jaccard-n", type=int, default=3)
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--max-bucket-size", type=int, default=1000)
    p.add_argument("--master", default=None)
    p.add_argument("--generate", type=int, default=0,
                   help="generate N synthetic pages into the warehouse first")
    args = p.parse_args()

    from data_quality_autohealer_spark import synth
    from data_quality_autohealer_spark.operators import dedup
    from data_quality_autohealer_spark.session import get_spark
    from data_quality_autohealer_spark.warehouse import AUDIT_SCHEMA, Warehouse

    spark = get_spark(app_name=f"dqa-dedup-{args.mode}", master=args.master)
    wh = Warehouse(spark, args.warehouse)
    if args.generate:
        wh.write_pages(synth.gen_pages_df(spark, args.generate),
                       args.pages_table)
    pages = wh.read_pages(args.pages_table)
    n_in = pages.count()

    t0 = time.perf_counter()
    if args.mode == "exact":
        deduped = dedup.exact_dedup(pages, text_col="text", id_col="url")
    else:
        # exact dedup FIRST: identical-text clusters are the worst LSH
        # mega-buckets (every member shares every band); removing them
        # upstream keeps the band self-join fan-out to genuine near-dups
        exact = dedup.exact_dedup(pages, text_col="text", id_col="url")
        exact = exact.persist()
        exact.count()
        deduped = dedup.neardup_dedup(
            exact, text_col="text", id_col="url",
            shingle_n=args.shingle_n, jaccard_n=args.jaccard_n,
            threshold=args.jaccard_threshold,
            max_bucket_size=args.max_bucket_size)
    wh.write_pages(deduped.drop("bucket"), table=args.out_table)
    n_out = wh.read_pages(args.out_table).count()
    sec = round(time.perf_counter() - t0, 2)

    audit = spark.createDataFrame(
        [(f"dedup-{args.mode}", "dedup", n_in,
          round(1.0 - n_out / max(n_in, 1), 6), "ok",
          f"{args.mode} dedup {n_in} -> {n_out} docs in {sec}s",
          datetime.datetime.now())], AUDIT_SCHEMA)
    wh.append_audit(audit)

    json.dump({"mode": args.mode, "docs_in": n_in, "docs_out": n_out,
               "removed": n_in - n_out, "sec": sec}, sys.stdout)
    print()


if __name__ == "__main__":
    main()

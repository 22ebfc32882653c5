"""Build a TIMING-ONLY scaled dataset from an existing testdata dir.

Replicates documents/embeddings/lineitem ``--mult`` times with shifted keys
and deterministic per-copy perturbations (text gets a per-copy suffix token;
embeddings are rolled by the copy index so copies are NOT near-duplicates of
each other). The result approximates the driver's larger scale factors for
A/B benchmarking of the SAME code paths — it has NO oracle validity and is
never used for correctness checks (the driver's own sf data is generated
with its private seed; this exists because that data is not on disk between
rounds).

Usage: python tools/make_timing_sf.py [--src DIR] [--dst DIR] [--mult N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_quality_autohealer_spark.session import get_spark  # noqa: E402

_ID_OFFSET = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf_timing")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dqa-make-timing-sf",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    os.makedirs(args.dst, exist_ok=True)

    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    parts = []
    for i in range(args.mult):
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(i * _ID_OFFSET)).alias("doc_id"),
            *[F.concat(F.col(c), F.lit(f" zcopy{i}")).alias(c)
              if c == "text" else F.col(c)
              for c in docs.columns if c != "doc_id"]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(cpus).write.mode("overwrite").parquet(
        f"{args.dst}/documents.parquet")

    emb = spark.read.parquet(f"{args.src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for i in range(args.mult):
        # roll the vector by i: copies of the same row are far apart in
        # cosine, so the near-dup structure stays candidate-sparse like the
        # driver's organic data instead of exploding into 10-cliques
        rolled = F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"j -> embedding[(j + {i}) % {dim}])")
        parts.append(emb.select(
            (F.col("vec_id") + F.lit(i * _ID_OFFSET)).alias("vec_id"),
            rolled.alias("embedding"),
            *[F.col(c) for c in emb.columns
              if c not in ("vec_id", "embedding")]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(cpus).write.mode("overwrite").parquet(
        f"{args.dst}/embeddings.parquet")

    li = spark.read.parquet(f"{args.src}/lineitem.parquet")
    key = "l_orderkey" if "l_orderkey" in li.columns else li.columns[0]
    parts = []
    for i in range(args.mult):
        parts.append(li.select(
            (F.col(key) + F.lit(i * _ID_OFFSET)).alias(key),
            *[F.col(c) for c in li.columns if c != key]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(cpus).write.mode("overwrite").parquet(
        f"{args.dst}/lineitem.parquet")

    # remaining tables: straight copies (small dims / unused by the heavy
    # queries; present so loaders that touch them still work)
    for name in ("customer", "orders", "part", "supplier", "nation",
                 "region", "events"):
        src = f"{args.src}/{name}.parquet"
        dst = f"{args.dst}/{name}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copytree(src, dst) if os.path.isdir(src) \
                else shutil.copy(src, dst)
    print(f"wrote {args.dst} (mult={args.mult})")


if __name__ == "__main__":
    main()

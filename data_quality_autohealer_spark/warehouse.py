"""Iceberg-style warehouse layer: bucketed tables + metrics/lineage + resume.

Reference analogues:
  * schema registry JSON manifest
    (/root/reference/src/remediation/airflow_dags/schema_drift_remediation.py:92-107)
  * Kafka metrics topic (src/streaming/kafka_producer.py:36-109) → here an
    append-only METRICS TABLE, one row per (run_id, bucket), which doubles as
    the resume checkpoint (north_rule: "checkpoints per-partition lineage +
    rule-hit metrics ... so a killed job resumes without rescoring completed
    partitions").

When a real Iceberg catalog is configured (``spark.sql.catalog.<name>`` +
runtime jar), tables are created with
``CREATE TABLE ... USING iceberg PARTITIONED BY (bucket(N, url))`` and written
via ``writeTo().append()``. In this sandbox (no Iceberg jar) the layer falls
back transparently to hash-bucketed Parquet: a materialized
``bucket = pmod(xxhash64(url), N)`` column used as the physical partition
column — the same pruning/co-location semantics Iceberg's bucket transform
provides. All call sites are engine-agnostic.

Scale notes: bucket count N is the unit of parallelism for resume and metrics
(at 10^12 docs choose N ~ 10k-100k so each bucket is a few GB); xxhash64(url)
decorrelates skewed hosts across buckets (host-level Zipf skew lands evenly).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("step", T.StringType(), False),
    T.StructField("docs_validated", T.LongType()),
    T.StructField("revalidation_drop_rate", T.DoubleType()),
    T.StructField("status", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField("completed_at", T.TimestampType()),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("docs_in", T.LongType()),
    T.StructField("docs_kept", T.LongType()),
    T.StructField("docs_dropped", T.LongType()),
    T.StructField("rule_hits", T.MapType(T.StringType(), T.LongType())),
    T.StructField("pii_scrubbed", T.MapType(T.StringType(), T.LongType())),
    T.StructField("completed_at", T.TimestampType()),
])


def bucket_expr(url_col: str = "url", num_buckets: int = 64):
    """Iceberg-equivalent bucket transform: pmod(xxhash64(url), N)."""
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_buckets)).cast("int")


class Warehouse:
    """Engine-agnostic table layer rooted at a directory (Parquet fallback)
    or an Iceberg catalog namespace when available."""

    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 64,
                 catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.num_buckets = num_buckets
        self.catalog = catalog or self._detect_catalog()
        if not self.use_iceberg:
            os.makedirs(root, exist_ok=True)

    def _detect_catalog(self) -> str | None:
        for k, v in self.spark.sparkContext.getConf().getAll():
            if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and \
                    "iceberg" in str(v).lower():
                return k.split(".")[-1]
        return None

    @property
    def use_iceberg(self) -> bool:
        return self.catalog is not None

    # -- pages ---------------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _fqn(self, table: str) -> str:
        return f"{self.catalog}.wh.{table}"

    def write_pages(self, df: DataFrame, table: str = "pages",
                    mode: str = "overwrite") -> None:
        if self.use_iceberg:
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {self._fqn(table)} "
                f"(url string, warc_ts timestamp, html binary, text string, "
                f"lang string) USING iceberg "
                f"PARTITIONED BY (bucket({self.num_buckets}, url))"
            )
            writer = df.writeTo(self._fqn(table))
            (writer.replace() if mode == "overwrite" else writer.append())
        else:
            out = df.withColumn("bucket", bucket_expr("url", self.num_buckets))
            (out.write.mode(mode).partitionBy("bucket")
                .parquet(self._path(table)))
            self._write_manifest(table, {"num_buckets": self.num_buckets,
                                         "partition_spec": "bucket(url)"})

    def upsert_pages(self, new_df: DataFrame, table: str = "pages") -> dict:
        """Incremental re-crawl ingest: latest ``warc_ts`` per url wins
        (ties prefer the incoming row). Only the bucket partitions TOUCHED
        by incoming urls are rewritten — dynamic partition overwrite, so
        merge cost tracks the delta's bucket footprint, not table size
        (at 65,536 buckets a 0.1% recrawl rewrites ~0.1% of partitions
        unless its urls are spread; content-addressed bucketing means a
        host-focused recrawl stays focused).

        Parquet fallback note: the merged frame is localCheckpoint'ed
        before the write because the job reads the same path it overwrites
        (Spark refuses self-overwrite through lineage). The checkpoint is
        bounded: affected buckets only. On Iceberg this is
        ``MERGE INTO``/overwritePartitions against a snapshot — no
        checkpoint needed.
        """
        from pyspark.sql.window import Window

        def _latest(df):
            # total order: newest ts, then incoming over existing, then a
            # content hash — so equal-ts duplicates WITHIN one batch (a
            # crawler retry) resolve identically on every (re)run, keeping
            # the merge idempotent as upsert_stream's exactly-once relies on
            w = (Window.partitionBy("url")
                 .orderBy(F.col("warc_ts").desc(), F.col("_src").desc(),
                          F.md5(F.col("text")).desc()))
            return (df.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") == 1).drop("_rn", "_src"))

        exists = (self.spark.catalog.tableExists(self._fqn(table))
                  if self.use_iceberg
                  else os.path.exists(self._path(table)))
        if not exists:
            # first delta against an empty warehouse: dedupe the batch
            # itself, then a plain bucketed write
            self.write_pages(_latest(new_df.withColumn("_src", F.lit(1))),
                             table)
            return {"affected_buckets": self.num_buckets,
                    "total_buckets": self.num_buckets}
        new_b = new_df.withColumn(
            "bucket", bucket_expr("url", self.num_buckets))
        affected = sorted(r["bucket"] for r in
                          new_b.select("bucket").distinct().collect())
        existing = self.read_pages(table).where(
            F.col("bucket").isin(affected))
        merged = (existing.withColumn("_src", F.lit(0))
                  .unionByName(new_b.withColumn("_src", F.lit(1))))
        latest = _latest(merged)
        if self.use_iceberg:
            latest.drop("bucket").writeTo(self._fqn(table)) \
                .overwritePartitions()
        else:
            snap = latest.localCheckpoint(eager=True)
            (snap.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("bucket").parquet(self._path(table)))
        return {"affected_buckets": len(affected),
                "total_buckets": self.num_buckets}

    def read_pages(self, table: str = "pages") -> DataFrame:
        if self.use_iceberg:
            df = self.spark.read.table(self._fqn(table))
            return df.withColumn("bucket", bucket_expr("url", self.num_buckets))
        return self.spark.read.parquet(self._path(table))

    def write_clean(self, df: DataFrame, table: str = "pages_clean",
                    run_id: str | None = None) -> None:
        """Idempotent per-bucket append: overwrite the bucket partitions
        being written (dynamic partition overwrite) so a resumed run can
        rewrite a half-written bucket safely."""
        if self.use_iceberg:
            fqn = self._fqn(table)
            if run_id is None:
                (df.writeTo(fqn).using("iceberg")
                   .partitionedBy(F.col("bucket")).createOrReplace())
            else:
                # first run of a run_id must CREATE the table — write_pages /
                # append_metrics both do, but overwritePartitions() alone
                # fails with table-not-found on a fresh catalog
                if not self.spark.catalog.tableExists(fqn):
                    (df.writeTo(fqn).using("iceberg")
                       .partitionedBy(F.col("bucket")).create())
                else:
                    # idempotent per-bucket rewrite on resume
                    df.writeTo(fqn).overwritePartitions()
        else:
            (df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket").parquet(self._path(table)))

    def read_clean(self, table: str = "pages_clean") -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._fqn(table))
        return self.spark.read.parquet(self._path(table))

    # -- metrics / lineage / resume -------------------------------------------

    def append_metrics(self, df: DataFrame) -> None:
        if self.use_iceberg:
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {self._fqn('metrics')} "
                f"(run_id string, bucket int, docs_in bigint, docs_kept bigint,"
                f" docs_dropped bigint, rule_hits map<string,bigint>,"
                f" pii_scrubbed map<string,bigint>, completed_at timestamp) "
                f"USING iceberg"
            )
            df.writeTo(self._fqn("metrics")).append()
        else:
            df.write.mode("append").parquet(self._path("metrics"))

    def read_metrics(self) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._fqn("metrics"))
        path = self._path("metrics")
        if not os.path.exists(path):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.read.parquet(path)

    def append_alerts(self, df: DataFrame) -> None:
        """Alert sink routed through the warehouse abstraction (Iceberg table
        when a catalog is configured, bucketed Parquet otherwise)."""
        if self.use_iceberg:
            fqn = self._fqn("alerts")
            if not self.spark.catalog.tableExists(fqn):
                df.writeTo(fqn).using("iceberg").create()
            else:
                df.writeTo(fqn).append()
        else:
            df.write.mode("append").parquet(self._path("alerts"))

    def read_alerts(self) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._fqn("alerts"))
        return self.spark.read.parquet(self._path("alerts"))

    def append_audit(self, df: DataFrame) -> None:
        """Completion/validation audit rows — the notification analogue of
        the reference's send_completion_notification
        (schema_drift_remediation.py:182-204)."""
        if self.use_iceberg:
            fqn = self._fqn("audit")
            if not self.spark.catalog.tableExists(fqn):
                df.writeTo(fqn).using("iceberg").create()
            else:
                df.writeTo(fqn).append()
        else:
            df.write.mode("append").parquet(self._path("audit"))

    def read_audit(self) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._fqn("audit"))
        path = self._path("audit")
        if not os.path.exists(path):
            return self.spark.createDataFrame([], AUDIT_SCHEMA)
        return self.spark.read.parquet(path)

    def completed_buckets(self, run_id: str) -> DataFrame:
        """Buckets already checkpointed for this run (the resume set)."""
        return (self.read_metrics()
                .where(F.col("run_id") == run_id)
                .select("bucket").distinct())

    def resume_filter(self, pages: DataFrame, run_id: str) -> DataFrame:
        """Anti-join input buckets against completed buckets. The completed
        set is tiny (≤ num_buckets rows) → broadcast left_anti join, no
        shuffle of the big side."""
        done = self.completed_buckets(run_id)
        return pages.join(F.broadcast(done), on="bucket", how="left_anti")

    # -- manifest --------------------------------------------------------------

    def _write_manifest(self, table: str, extra: dict) -> None:
        manifest = {
            "table": table,
            "format": "parquet-bucketed",
            "snapshot_id": uuid.uuid4().hex,
            "created_unix": int(time.time()),
            **extra,
        }
        with open(os.path.join(self.root, f"_manifest_{table}.json"), "w") as f:
            json.dump(manifest, f, indent=2)

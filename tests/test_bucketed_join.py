"""Bucketed-table co-located join: writing both sides bucketed on the join
key lets SortMergeJoin read pre-partitioned buckets with NO Exchange — the
co-location strategy for repeated big-big joins at 100 TB (e.g. scored docs
⋈ per-doc features across pipeline stages)."""

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # external tables (explicit path) — warehouse.dir is a static conf
    a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10_000).withColumn("w", F.col("id") % 7)
    for name, df in [("t_bucketed_a", a), ("t_bucketed_b", b)]:
        spark.sql(f"drop table if exists {name}")
        (df.write.bucketBy(8, "id").sortBy("id")
         .option("path", str(tmp_path / name))
         .saveAsTable(name))
    yield "t_bucketed_a", "t_bucketed_b"
    for name in ("t_bucketed_a", "t_bucketed_b"):
        spark.sql(f"drop table if exists {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ta).join(spark.table(tb), "id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed-on-join-key tables must join without a shuffle:\n"
            + plan)
        # and the answer is right
        assert j.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_needs_exchange(spark, bucketed_tables, tmp_path):
    # control: the same join over plain parquet DOES shuffle both sides
    ta, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 10_000).withColumn("w", F.col("id") % 7)
        plain.write.mode("overwrite").parquet(str(tmp_path / "plain"))
        j = spark.table(ta).join(spark.read.parquet(str(tmp_path / "plain")),
                                 "id")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in explain output (SURVEY §4.2)."""

import io
import re
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.operators.schema_drift import (
    SchemaRegistry, diff_schemas, schema_fingerprint,
)
from data_quality_autohealer_spark.plans.pipeline import score_pages


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scoring_never_reads_html(spark, tmp_path):
    """Column pruning: the scoring path must not read the html BINARY column
    from the scan (SURVEY §4.2 'critical')."""
    path = str(tmp_path / "pages")
    synth.gen_pages_df(spark, 200, num_partitions=2).write.parquet(path)
    pages = spark.read.parquet(path)
    plan = _plan(score_pages(pages).where("keep"))
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    assert "html" not in m.group(1)
    assert "text" in m.group(1)


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "pages2")
    synth.gen_pages_df(spark, 200, num_partitions=2).write.parquet(path)
    pages = spark.read.parquet(path)
    plan = _plan(pages.where(F.col("lang") == "en").select("url"))
    assert re.search(r"PushedFilters: .*(EqualTo|IsNotNull)", plan), plan


def test_single_udf_node(spark):
    """The scoring UDF must appear exactly once even under a keep-filter
    (regression: filter pushdown used to clone the ArrowEvalPython node)."""
    pages = synth.gen_pages_df(spark, 50, num_partitions=1)
    plan = _plan(score_pages(pages).where("keep"))
    assert plan.count("ArrowEvalPython") <= 2  # 1 tree node + 1 detail entry


def test_resume_antijoin_is_broadcast(spark, tmp_path):
    from data_quality_autohealer_spark.warehouse import Warehouse
    wh = Warehouse(spark, str(tmp_path / "wh"), num_buckets=8)
    wh.write_pages(synth.gen_pages_df(spark, 500, num_partitions=2))
    from data_quality_autohealer_spark.plans.pipeline import (
        bucket_metrics,
    )
    scored = score_pages(wh.read_pages().limit(100))
    wh.append_metrics(bucket_metrics(scored, "r1"))
    plan = _plan(wh.resume_filter(wh.read_pages(), "r1"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_schema_drift(spark, tmp_path):
    a = spark.createDataFrame([(1, "x", 1.0)], "id long, s string, v double")
    b = spark.createDataFrame([(1, "x")], "id long, s string")
    d = diff_schemas(a.schema, b.schema)
    assert d["new_columns"] == ["v"] and d["has_drift"]
    reg = SchemaRegistry(str(tmp_path / "registry.json"))
    reg.record("t", b)
    chk = reg.check("t", a)
    assert chk["new_columns"] == ["v"]
    c = spark.createDataFrame([("1", "x")], "id string, s string")
    assert reg.check("t", c)["type_changed_columns"] == ["id"]
    assert schema_fingerprint(a) != schema_fingerprint(b)

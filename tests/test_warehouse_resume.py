"""Resume contract (north_rule): a killed job resumes without rescoring
completed partitions. Mirrors SURVEY §5.2.4."""

import pyspark.sql.functions as F
import pytest

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.plans.pipeline import (
    bucket_metrics, run_filter, score_pages,
)
from data_quality_autohealer_spark.warehouse import Warehouse

N = 2000
BUCKETS = 8


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"), num_buckets=BUCKETS)
    pages = synth.gen_pages_df(spark, N, num_partitions=4)
    w.write_pages(pages)
    return w


def test_full_run_writes_clean_and_metrics(wh, spark):
    summary = run_filter(wh, "run1")
    assert summary["docs_in"] == N
    clean = wh.read_clean()
    assert clean.count() == summary["docs_kept"] > 0
    m = wh.read_metrics().where(F.col("run_id") == "run1")
    rows = m.collect()
    assert {r["bucket"] for r in rows} == set(range(BUCKETS))
    assert sum(r["docs_in"] for r in rows) == N
    assert sum(r["docs_kept"] for r in rows) == summary["docs_kept"]
    hits = rows[0]["rule_hits"]
    assert set(hits) >= {"gopher.word_count", "langid", "perplexity"}


def test_resume_skips_completed_buckets(wh, spark):
    # simulate a killed run: checkpoint metrics for buckets 0..3 only
    pages = wh.read_pages()
    part = pages.where(F.col("bucket") < 4)
    scored = score_pages(part)
    wh.append_metrics(bucket_metrics(scored, "run2"))

    todo = wh.resume_filter(pages, "run2")
    todo_buckets = {r["bucket"] for r in todo.select("bucket").distinct().collect()}
    assert todo_buckets == {4, 5, 6, 7}

    # full resume run completes the remaining buckets only
    summary = run_filter(wh, "run2")
    assert summary["docs_in"] == pages.where(F.col("bucket") >= 4).count()
    m = wh.read_metrics().where(F.col("run_id") == "run2")
    assert m.select("bucket").distinct().count() == BUCKETS
    # re-run again: nothing left to do
    summary2 = run_filter(wh, "run2")
    assert summary2["docs_in"] == 0


def test_validate_and_notify_tail(wh, spark):
    # reference: every DAG ends validate_remediation >> notify
    # (schema_drift_remediation.py:143-204); here: re-score the clean table,
    # assert re-drop ≈ 0, and append the completion audit row
    from data_quality_autohealer_spark.plans.pipeline import validate_run
    run_filter(wh, "runv")
    result = validate_run(wh, "runv")
    assert result["status"] == "ok", result
    assert result["docs_validated"] == wh.read_clean().count() > 0
    assert result["revalidation_drop_rate"] <= 0.02
    audit = wh.read_audit().where(F.col("run_id") == "runv").collect()
    assert len(audit) == 1
    assert audit[0]["step"] == "validate_remediation"
    assert audit[0]["status"] == "ok"
    assert audit[0]["completed_at"] is not None


def test_drift_triggered_retrain(wh, spark):
    # reference distribution_shift_remediation.py:69-104: retrain on drift
    import datetime
    from data_quality_autohealer_spark.functions.perplexity import (
        PerplexityModel,
    )
    from data_quality_autohealer_spark.plans.pipeline import drift_retrain

    run_filter(wh, "base")  # baseline drop rate on the normal mix

    # same corpus again: no drift -> no retrain, audit row 'skipped'
    run_filter(wh, "same")
    r = drift_retrain(wh, "same", "base")
    assert r["retrained"] is False and r["drift"] < 0.05

    # symbol-soup corpus: drop rate jumps -> retrain fires
    bad = spark.createDataFrame(
        [(f"http://bad.test/{i}", datetime.datetime(2026, 1, 1),
          bytearray(b""), "### {} => ~~ @@ |||| ^^^ " * 10, "en")
         for i in range(200)],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    wh.write_pages(bad, table="pages_bad")
    run_filter(wh, "bad", pages_table="pages_bad")
    r2 = drift_retrain(wh, "bad", "base")
    assert r2["retrained"] is True and r2["drift"] > 0.15
    m = PerplexityModel.load(r2["model_path"])  # artifact round-trips
    assert m.total > 0
    steps = {a["run_id"]: a["status"] for a in wh.read_audit().collect()
             if a["step"] == "drift_retrain"}
    assert steps == {"same": "skipped", "bad": "retrained"}


def test_run_filter_in_waves(wh, spark):
    from data_quality_autohealer_spark.plans.pipeline import (
        run_filter_in_waves,
    )
    summary = run_filter_in_waves(wh, "w1", wave_buckets=3)
    assert summary["docs_in"] == N and summary["waves"] == 3  # ceil(8/3)
    m = wh.read_metrics().where(F.col("run_id") == "w1")
    assert m.select("bucket").distinct().count() == BUCKETS
    # wave output identical to a single-shot run of the same corpus
    single = run_filter(wh, "w1-single")
    assert summary["docs_kept"] == single["docs_kept"]
    # resume after waves: nothing left
    again = run_filter_in_waves(wh, "w1", wave_buckets=3)
    assert again["docs_in"] == 0 and again["buckets_skipped"] == BUCKETS


def test_metrics_drift_per_bucket(wh, spark):
    from data_quality_autohealer_spark.plans.pipeline import metrics_drift
    run_filter(wh, "d1")
    run_filter(wh, "d2")  # identical corpus → zero drift everywhere
    rows = metrics_drift(wh, "d2", "d1").collect()
    assert {r["bucket"] for r in rows} == set(range(BUCKETS))
    for r in rows:
        assert r["drop_rate_delta"] == 0.0
        assert all(v == 0.0 for v in r["rule_hit_rate_delta"].values())


def test_bucket_assignment_is_stable(wh, spark):
    a = wh.read_pages().select("url", "bucket")
    b = wh.read_pages().select(
        "url", F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int")
        .alias("bucket2"))
    j = a.join(b, "url")
    assert j.where(F.col("bucket") != F.col("bucket2")).count() == 0


def test_quality_alerts(spark):
    from data_quality_autohealer_spark.plans.pipeline import quality_alerts
    from data_quality_autohealer_spark.warehouse import METRICS_SCHEMA
    import datetime
    rows = [
        ("r", 0, 100, 5, 95, {"langid": 90}, {}, datetime.datetime(2026, 1, 1)),
        ("r", 1, 100, 85, 15, {}, {}, datetime.datetime(2026, 1, 1)),
        ("r", 2, 100, 30, 70, {}, {}, datetime.datetime(2026, 1, 1)),
    ]
    m = spark.createDataFrame(rows, METRICS_SCHEMA)
    alerts = {r["bucket"]: r for r in quality_alerts(m).collect()}
    assert alerts[0]["severity"] == "critical"
    assert 1 not in alerts           # 15% drop rate -> below medium cut
    assert alerts[2]["severity"] == "medium"
    assert '"docs_dropped":95' in alerts[0]["payload"]

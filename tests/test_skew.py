"""Salted vs plain per-host aggregation equivalence + mega-host fixture
(SURVEY §7.3 'one mega-host fixture')."""

import pyspark.sql.functions as F

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.operators import skew
from data_quality_autohealer_spark.plans.pipeline import score_pages


def test_salted_equals_plain_on_zipf_corpus(spark):
    pages = synth.gen_pages_df(spark, 2000, num_partitions=8)
    scored = score_pages(pages, include_model_rules=False).persist()
    a = skew.per_host_metrics_salted(scored, num_salts=8).toPandas() \
        .sort_values("host").reset_index(drop=True)
    b = skew.per_host_metrics_plain(scored).toPandas() \
        .sort_values("host").reset_index(drop=True)
    scored.unpersist()
    assert a.equals(b[a.columns])
    # Zipf skew is real: top host owns many docs
    assert a["docs_in"].max() > 10 * a["docs_in"].median()


def test_mega_host(spark):
    # one host owning 90% of rows — the salted path must still partition
    rows = [(f"https://mega.example.com/p/{i}", True) for i in range(900)]
    rows += [(f"https://host{i}.example.com/p/{i}", i % 2 == 0)
             for i in range(100)]
    df = spark.createDataFrame(rows, "url string, keep boolean")
    out = {r["host"]: r for r in
           skew.per_host_metrics_salted(df, num_salts=4).collect()}
    assert out["mega.example.com"]["docs_in"] == 900
    assert out["mega.example.com"]["docs_kept"] == 900
    assert len(out) == 101

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


def test_salting_bounds_per_reducer_rows(spark):
    """VERDICT-r04 task 6: the salted plan's per-reducer PRE-combine state
    for the hottest host is bounded at ~hot/S (binomial noise allowed),
    while the unsalted key concentrates all hot rows on one reducer key.
    This is the bound that matters for large-state aggregates, where
    map-side partial aggregation cannot compress."""
    from tools.bench_skew import build_corpus

    S = 16
    df = build_corpus(spark, 20_000, hot_frac := 0.4)
    hot = df.where(F.col("url").startswith("https://mega.example/"))
    n_hot = hot.count()
    assert abs(n_hot - 20_000 * hot_frac) < 20_000 * 0.05
    sizes = [r["count"] for r in
             hot.groupBy(F.pmod(F.xxhash64("url"), F.lit(S)).alias("s"))
             .count().collect()]
    assert len(sizes) == S, "some salt reducers never used"
    assert max(sizes) <= (n_hot / S) * 1.3, \
        f"hot reducer saw {max(sizes)} rows, expected ~{n_hot // S}"
    # and the salted rollup still reconciles exactly with the plain one
    a = {r["host"]: (r["docs_in"], r["docs_kept"]) for r in
         skew.per_host_metrics_salted(df, num_salts=S).collect()}
    b = {r["host"]: (r["docs_in"], r["docs_kept"]) for r in
         skew.per_host_metrics_plain(df).collect()}
    assert a == b

"""Curation operators: deterministic stratified sampling, quality strata,
per-group term census (round-3 first-class additions; oracle twins are
exercised by the driver gate + check_oracle)."""

import pyspark.sql.functions as F

from data_quality_autohealer_spark.operators import curation


def _ids(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr("case when id % 4 = 0 then 'en' when id % 4 = 1 then 'de' "
               "when id % 4 = 2 then 'fr' else 'xx' end").alias("lang"))


def test_stratified_sample_rates_and_determinism(spark):
    df = _ids(spark, 20000)
    rates = {"en": 0.5, "de": 0.2}
    samp = curation.stratified_sample(df, rates, default_rate=0.05)
    counts = {r["lang"]: r["n"] for r in
              samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # each stratum has 5000 docs; hash fractions are uniform to ~2%
    assert abs(counts["en"] / 5000 - 0.5) < 0.03
    assert abs(counts["de"] / 5000 - 0.2) < 0.03
    assert abs(counts.get("fr", 0) / 5000 - 0.05) < 0.02
    assert abs(counts.get("xx", 0) / 5000 - 0.05) < 0.02
    # reproducible: the same (salt, id) always selects the same rows
    a = {r["doc_id"] for r in samp.select("doc_id").collect()}
    b = {r["doc_id"] for r in curation.stratified_sample(
        df, rates, default_rate=0.05).select("doc_id").collect()}
    assert a == b
    # every emitted fraction is below its stratum's rate
    over = samp.where(
        (F.col("lang") == "en") & (F.col("sample_frac") >= 0.5)).count()
    assert over == 0


def test_stratified_sample_salts_draw_independent_samples(spark):
    df = _ids(spark, 8000)
    rates = {"en": 0.3, "de": 0.3, "fr": 0.3, "xx": 0.3}
    a = {r["doc_id"] for r in curation.stratified_sample(
        df, rates, salt="s1").select("doc_id").collect()}
    b = {r["doc_id"] for r in curation.stratified_sample(
        df, rates, salt="s2").select("doc_id").collect()}
    assert a != b
    # overlap/|a| ≈ rate (independent draws), loose bound
    overlap = len(a & b) / len(a)
    assert 0.15 < overlap < 0.45


def test_quality_strata_balanced_and_monotonic(spark):
    df = spark.range(1003).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 997).cast("int").alias("score"))
    strata = curation.quality_strata(df, "score", n_tiles=4).collect()
    sizes = [r["n_docs"] for r in strata]
    assert sum(sizes) == 1003 and max(sizes) - min(sizes) <= 1
    for lo, hi in zip(strata, strata[1:]):
        assert lo["max_score"] <= hi["min_score"]


def test_top_terms_shape_and_map_side_combine(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c", "en"), (1, "b b c c c d", "en"),
         (2, "x y x y x", "de")],
        "doc_id long, text string, lang string")
    out = curation.top_terms_per_group(df, k=2)
    rows = {(r["lang"], r["rank"]): (r["term"], r["n"])
            for r in out.collect()}
    assert rows[("en", 1)] == ("b", 4) and rows[("en", 2)] == ("c", 4)
    assert rows[("de", 1)] == ("x", 3) and rows[("de", 2)] == ("y", 2)
    # the count must partial-aggregate map-side: two HashAggregates with
    # ONE exchange between them, so shuffle volume is per-partition
    # distinct terms, not exploded tokens
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_quality_strata_approx_parity_and_no_window(spark):
    """The scale path (percentile_approx cut points + per-row bucket
    lookup) must census the same strata as the exact global-ntile twin at
    test scale, with NO Window node (the exact path's single-partition
    sort is what it exists to remove)."""
    df = spark.range(1003).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 997).cast("int").alias("score"))
    exact = curation.quality_strata(df, "score", n_tiles=4).collect()
    approx = curation.quality_strata(df, "score", n_tiles=4,
                                     exact_ntile=False)
    rows = approx.collect()
    assert [r["stratum"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == 1003
    # value-bucketing vs count-bucketing: counts agree up to boundary ties
    # (1003 rows over 0..996 -> at most 2 docs per value)
    for e, a in zip(exact, rows):
        assert abs(e["n_docs"] - a["n_docs"]) <= 4
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score"] <= hi["min_score"]
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_token_budget_sample_semantics(spark):
    """Whole-doc greedy selection under a per-stratum token budget:
    cumulative total never exceeds the budget, order follows the salted
    hash fraction, and re-runs select the identical set."""
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", 10 + (i % 5)) for i in range(200)],
        "doc_id long, lang string, word_count int")
    out = curation.token_budget_sample(df, {"en": 120, "de": 60})
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert max(r["cum_tokens"] for r in by_lang["en"]) <= 120
    assert max(r["cum_tokens"] for r in by_lang["de"]) <= 60
    # budgets bite: not everything selected, but something is
    assert 0 < len(rows) < 200
    # cum_tokens is a proper running sum of n_tokens within each stratum
    for lang, lr in by_lang.items():
        lr.sort(key=lambda r: r["cum_tokens"])
        total = 0
        for r in lr:
            total += r["n_tokens"]
            assert r["cum_tokens"] == total
    again = {r["doc_id"] for r in
             curation.token_budget_sample(df, {"en": 120, "de": 60})
             .collect()}
    assert again == {r["doc_id"] for r in rows}
    # unknown stratum with default_budget=0 selects nothing
    assert curation.token_budget_sample(
        df.withColumn("lang", F.lit("xx")), {"en": 120}).count() == 0


def test_quality_strata_approx_empty_and_null_edges(spark):
    """Review findings: the approx path must survive an empty frame (the
    exact twin does) and must census NULL scores into stratum 1, matching
    the exact path's NULLS-FIRST ascending window."""
    empty = spark.createDataFrame([], "doc_id long, score int")
    assert curation.quality_strata(empty, "score", n_tiles=4,
                                   exact_ntile=False).count() == 0
    rows = [(i, None if i < 5 else i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score int")
    exact = {r["stratum"]: r["n_docs"] for r in
             curation.quality_strata(df, "score", n_tiles=4).collect()}
    approx = {r["stratum"]: r["n_docs"] for r in
              curation.quality_strata(df, "score", n_tiles=4,
                                      exact_ntile=False).collect()}
    # NULLs occupy the low stratum on both paths
    assert exact[1] >= 5 and approx[1] >= 5
    assert sum(exact.values()) == sum(approx.values()) == 100


# ---------------------------------------------------------------------------
# Domain blocklist (round 6)
# ---------------------------------------------------------------------------


def test_blocklist_subdomains_collapse_and_match(spark):
    docs = spark.createDataFrame(
        [(1, "http://bad.example/x"),
         (2, "http://ads.sub.bad.example/y"),      # subdomain of blocked
         (3, "http://good.example/z"),
         (4, "not a url at all"),
         (5, None)],
        "doc_id long, url string")
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.apply_domain_blocklist(docs, bl).collect()}
    assert out[1]["blocked"] and out[2]["blocked"]
    assert out[2]["reg_domain"] == "bad.example"
    assert not out[3]["blocked"]
    assert out[4]["host"] == "" and not out[4]["blocked"]
    assert out[5]["host"] == "" and not out[5]["blocked"]   # null is absence
    assert len(out) == 5                                    # flag, never drop


def test_blocklist_join_is_broadcast(spark):
    import io
    from contextlib import redirect_stdout
    docs = spark.createDataFrame(
        [(1, "http://a.example/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("a.example",)], "domain string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        curation.apply_domain_blocklist(docs, bl).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_temperature_mix_allocation_values_and_parity(spark):
    import duckdb
    import pandas as pd
    rows = [(i, "en" if i < 90 else "de", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, word_count int")
    out = {r["lang"]: r.asDict() for r in
           curation.temperature_mix_allocation(df, 1000).collect()}
    # exact: sqrt(9000)=94.868..., sqrt(1000)=31.622...; integer alloc
    import math
    s_en = math.floor(math.sqrt(9000) * 1e6 + 0.5)
    s_de = math.floor(math.sqrt(1000) * 1e6 + 0.5)
    tot = s_en + s_de
    assert out["en"]["alloc_tokens"] == (1000 * s_en) // tot
    assert out["de"]["alloc_tokens"] == (1000 * s_de) // tot
    assert out["de"]["alloc_tokens"] + out["en"]["alloc_tokens"] <= 1000
    # low-resource de is up-sampled vs its 10% token share
    assert out["de"]["weight"] > 0.1
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "lang",
                                                  "word_count"]))
    want = con.execute(curation.duckdb_temperature_mix_sql("t", 1000)) \
        .fetchdf().sort_values("lang").reset_index(drop=True)
    got = (curation.temperature_mix_allocation(df, 1000).toPandas()
           .sort_values("lang").reset_index(drop=True))
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=True)


def test_grouped_strata_exact_and_approx(spark):
    import duckdb
    import pandas as pd
    rows = [(i, "en" if i < 60 else "de", i % 97) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score int")
    exact = curation.grouped_quality_strata(df, "score", "lang", 3)
    got = exact.toPandas()
    # per-group ntile: tiles within each lang are equal +/-1
    for lang, grp in got.groupby("lang"):
        counts = grp["n_docs"].tolist()
        assert max(counts) - min(counts) <= 1
        assert sorted(grp["bucket"]) == ["head", "middle", "tail"]
    assert got["n_docs"].sum() == 90
    # score ranges are ordered within each lang
    for lang, grp in got.sort_values("stratum").groupby("lang"):
        ms = grp["min_score"].tolist()
        assert ms == sorted(ms)
    # DuckDB twin parity
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "lang", "score"]))
    want = con.execute(curation.duckdb_grouped_strata_sql(
        "select doc_id, lang, score from t", "score", "lang", 3)).fetchdf()
    cols = sorted(got.columns)
    key = ["lang", "stratum"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[cols],
        want.sort_values(key).reset_index(drop=True)[cols],
        check_dtype=False)
    # approx path: same total census, per-group buckets, broadcast cuts
    approx = curation.grouped_quality_strata(
        df, "score", "lang", 3, exact_ntile=False).toPandas()
    assert approx["n_docs"].sum() == 90
    assert set(approx["lang"]) == {"en", "de"}
    # NULL scores land in the bottom bucket on both paths
    df_null = spark.createDataFrame(
        [(i, "en", None if i < 5 else i) for i in range(30)],
        "doc_id long, lang string, score int")
    for exact_flag in (True, False):
        strata = {r["stratum"]: r["n_docs"]
                  for r in curation.grouped_quality_strata(
                      df_null, "score", "lang", 3,
                      exact_ntile=exact_flag).collect()}
        assert strata[1] >= 5

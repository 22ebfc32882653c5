"""Training-mix export: mixture rates honored, content-addressed sharding
deterministic across runs, JSONL.gz round-trips."""

import jobs.export_training_mix as ex
from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.plans.pipeline import run_filter
from data_quality_autohealer_spark.warehouse import Warehouse


def _clean_warehouse(spark, tmp_path, n=3000):
    wh = Warehouse(spark, str(tmp_path / "wh"), num_buckets=4)
    wh.write_pages(synth.gen_pages_df(spark, n, num_partitions=4))
    run_filter(wh, "r1")
    return str(tmp_path / "wh")


def test_parse_rates():
    assert ex.parse_rates("en=1.0, de=0.5,fr=0.25") == {
        "en": 1.0, "de": 0.5, "fr": 0.25}
    assert ex.parse_rates("") == {}


def test_export_rates_shards_and_determinism(spark, tmp_path):
    wh_dir = _clean_warehouse(spark, tmp_path)
    out1 = str(tmp_path / "mix1")
    s = ex.main(["--warehouse", wh_dir, "--out", out1,
                 "--rates", "en=0.5", "--shards", "8"])
    assert s["docs_out"] < s["docs_in"]
    en = s["by_lang"]["en"]
    assert 0.35 < en["out"] / en["in"] < 0.65  # ~0.5 hash-fraction sample
    for lang, c in s["by_lang"].items():
        if lang != "en":
            assert c["out"] == c["in"]  # default rate 1.0 keeps the rest

    back = spark.read.json(out1)
    assert back.count() == s["docs_out"]
    assert back.select("shard").distinct().count() <= 8
    assert set(back.columns) >= {"url", "lang", "text", "shard"}

    # content-addressed sharding: a second export maps every url to the
    # SAME shard (a re-run or second cluster produces the same layout)
    out2 = str(tmp_path / "mix2")
    s2 = ex.main(["--warehouse", wh_dir, "--out", out2,
                  "--rates", "en=0.5", "--shards", "8"])
    assert s2["docs_out"] == s["docs_out"]
    m1 = {r["url"]: r["shard"]
          for r in back.select("url", "shard").collect()}
    m2 = {r["url"]: r["shard"]
          for r in spark.read.json(out2).select("url", "shard").collect()}
    assert m1 == m2


def test_export_salt_varies_sample(spark, tmp_path):
    wh_dir = _clean_warehouse(spark, tmp_path, n=1500)
    a = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "a"),
                 "--rates", "en=0.5", "--shards", "4", "--salt", "s1"])
    b = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "b"),
                 "--rates", "en=0.5", "--shards", "4", "--salt", "s2"])
    ua = {r["url"] for r in spark.read.json(str(tmp_path / "a")).collect()}
    ub = {r["url"] for r in spark.read.json(str(tmp_path / "b")).collect()}
    assert ua != ub  # independent draws
    assert abs(len(ua) - len(ub)) < 0.2 * max(len(ua), len(ub))


def test_export_token_budget_mode(spark, tmp_path):
    """--token-budgets selects whole docs per lang until the running token
    total hits the budget; output round-trips and respects the cap."""
    wh_dir = _clean_warehouse(spark, tmp_path, n=1500)
    out = str(tmp_path / "budget_mix")
    s = ex.main(["--warehouse", wh_dir, "--out", out,
                 "--token-budgets", "en=3000,de=1500",
                 "--shards", "4"])
    assert s["docs_out"] > 0
    assert s["by_lang"]["en"]["tokens"] <= 3000
    assert s["by_lang"].get("de", {"tokens": 0})["tokens"] <= 1500
    # unlisted langs with default budget 0 export nothing
    assert set(s["by_lang"]) <= {"en", "de"}
    back = spark.read.json(out)
    assert back.count() == s["docs_out"]
    assert set(back.columns) >= {"url", "lang", "text", "shard"}
    # deterministic: same budgets + salt -> identical doc set
    s2 = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "b2"),
                  "--token-budgets", "en=3000,de=1500", "--shards", "4"])
    u1 = {r["url"] for r in back.select("url").collect()}
    u2 = {r["url"] for r in
          spark.read.json(str(tmp_path / "b2")).select("url").collect()}
    assert u1 == u2


def test_export_token_budget_bpe_tokenizer(spark, tmp_path):
    """--tokenizer bpe budgets by TRAINED-vocab token counts: the cap is
    honored under the learned counts (verified against an independent
    recount via functions/bpe), and the doc set is deterministic."""
    from pyspark.sql import functions as F

    from data_quality_autohealer_spark.functions import bpe

    wh_dir = _clean_warehouse(spark, tmp_path, n=1200)
    out = str(tmp_path / "bpe_mix")
    s = ex.main(["--warehouse", wh_dir, "--out", out,
                 "--token-budgets", "en=4000,de=2000",
                 "--tokenizer", "bpe", "--bpe-merges", "8",
                 "--shards", "4"])
    assert s["docs_out"] > 0
    assert s["by_lang"]["en"]["tokens"] <= 4000
    # recount the exported docs with an independently trained vocab
    # (same corpus, same merge count -> identical merges) and confirm
    # the reported per-lang totals are BPE counts, not word counts
    wh = Warehouse(spark, wh_dir, num_buckets=4)
    clean = wh.read_clean()
    merges = bpe.train_bpe_merges(clean, text_col="text", num_merges=8)
    back = spark.read.json(out)
    joined = bpe.with_bpe_token_counts(
        back.select("url", "lang", "text"), merges, text_col="text")
    totals = {r["lang"]: r["t"] for r in
              joined.groupBy("lang")
              .agg(F.sum("n_tokens_bpe").alias("t")).collect()}
    for lang, rec in s["by_lang"].items():
        assert totals.get(lang, 0) == rec["tokens"], (lang, totals, rec)
    # deterministic doc set on re-run
    s2 = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "bm2"),
                  "--token-budgets", "en=4000,de=2000",
                  "--tokenizer", "bpe", "--bpe-merges", "8",
                  "--shards", "4"])
    u1 = {r["url"] for r in back.select("url").collect()}
    u2 = {r["url"] for r in
          spark.read.json(str(tmp_path / "bm2")).select("url").collect()}
    assert u1 == u2


def test_export_total_budget_temperature_mode(spark, tmp_path):
    """--total-token-budget derives per-lang budgets by sqrt-temperature
    allocation; sampler then honors those budgets exactly."""
    wh_dir = _clean_warehouse(spark, tmp_path)
    out = str(tmp_path / "mix_temp")
    s = ex.main(["--warehouse", wh_dir, "--out", out,
                 "--total-token-budget", "20000", "--shards", "4"])
    alloc = s["allocation"]
    assert set(alloc) == set(s["by_lang"])
    assert sum(a["budget"] for a in alloc.values()) <= 20000
    # sqrt temperature: every stratum's budget share exceeds its
    # (sub-linear) token share iff it is low-resource
    tot_in = sum(a["tokens_in"] for a in alloc.values())
    tot_b = sum(a["budget"] for a in alloc.values())
    small = min(alloc.values(), key=lambda a: a["tokens_in"])
    big = max(alloc.values(), key=lambda a: a["tokens_in"])
    assert small["budget"] / tot_b > small["tokens_in"] / tot_in
    assert big["budget"] / tot_b < big["tokens_in"] / tot_in
    # sampler honors the derived budgets
    for lang, c in s["by_lang"].items():
        assert c["tokens"] <= alloc[lang]["budget"]
    # explicit budgets win over the derived ones
    s2 = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "m2"),
                  "--total-token-budget", "20000",
                  "--token-budgets", "en=500", "--shards", "4"])
    assert "allocation" not in s2
    assert s2["by_lang"]["en"]["tokens"] <= 500


def test_export_dsir_gate(spark, tmp_path):
    wh_dir = _clean_warehouse(spark, tmp_path)
    out = str(tmp_path / "dsir")
    s = ex.main(["--warehouse", wh_dir, "--out", out,
                 "--dsir-target", "lang = 'en'", "--shards", "4"])
    assert s["dsir"]["target"] == "lang = 'en'"
    assert 0 < s["dsir"]["docs_selected"] < s["dsir"]["docs_in"]
    # the gate runs BEFORE sampling: docs_in of the mix is the selected set
    assert s["docs_in"] == s["dsir"]["docs_selected"]
    back = spark.read.json(out)
    assert back.count() == s["docs_out"]
    # target-likeness: the en share of the export beats the en share of
    # the clean corpus (hashed-ngram weights separate languages sharply)
    langs = {r["lang"]: r["cnt"] for r in
             back.groupBy("lang").count().withColumnRenamed(
                 "count", "cnt").collect()}
    en_share = langs.get("en", 0) / max(sum(langs.values()), 1)
    assert en_share > 0.8


def test_export_dsir_stored_weights_wave(spark, tmp_path):
    """Train-once-score-every-wave: wave 1 persists the weight table,
    wave 2 loads it (no target predicate needed) and selects the same
    url set on the same corpus."""
    wh_dir = _clean_warehouse(spark, tmp_path)
    wpath = str(tmp_path / "dsir_weights")
    s1 = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "w1"),
                  "--dsir-target", "lang = 'en'",
                  "--dsir-weights-out", wpath, "--shards", "2"])
    s2 = ex.main(["--warehouse", wh_dir, "--out", str(tmp_path / "w2"),
                  "--dsir-weights", wpath, "--shards", "2"])
    assert s2["dsir"]["weights"] == wpath
    assert s2["dsir"]["docs_selected"] == s1["dsir"]["docs_selected"]
    a = {r["url"] for r in spark.read.json(str(tmp_path / "w1")).collect()}
    b = {r["url"] for r in spark.read.json(str(tmp_path / "w2")).collect()}
    assert a == b

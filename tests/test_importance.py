"""DSIR-style importance weighting (operators/importance.py): target
separation, stored-weights prior on unseen buckets, partitioning
invariance of the exact integer scores, DuckDB twin parity."""
from __future__ import annotations

import duckdb
import pandas as pd

from data_quality_autohealer_spark.operators import importance

TARGETY = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a good book and a cup of tea make the evening pleasant and calm",
    "the morning sun rises slowly over the distant hills and fields",
]
RAWY = [
    "click here buy now free offer casino bonus spins jackpot win",
    "cheap pills discount meds order now limited stock act fast",
    "download crack keygen serial torrent warez free full version",
]


def _frame(spark):
    rows = ([(i, t, True) for i, t in enumerate(TARGETY)]
            + [(10 + i, t, False) for i, t in enumerate(RAWY)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean")


def test_target_separation(spark):
    df = _frame(spark)
    out = {r["doc_id"]: r for r in importance.dsir_scores(
        df, "is_target", n_buckets=512).collect()}
    for i in range(len(TARGETY)):
        assert out[i]["score_per_feat_micro"] > 0 and out[i]["selected"]
    for i in range(len(RAWY)):
        j = 10 + i
        assert out[j]["score_per_feat_micro"] < 0 and not out[j]["selected"]


def test_scores_partitioning_invariant(spark):
    df = _frame(spark)
    a = sorted(importance.dsir_scores(
        df.repartition(1), "is_target", n_buckets=512).collect())
    b = sorted(importance.dsir_scores(
        df.repartition(7, "doc_id"), "is_target", n_buckets=512).collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_unseen_bucket_takes_prior(spark):
    df = _frame(spark)
    w = importance.dsir_weights(df, "is_target", n_buckets=512)
    wt = {r["bucket"]: r["w_micro"] for r in w.collect()}
    w0 = w.select("w0_micro").first()["w0_micro"]
    # a new-corpus doc of words the training corpus never saw: buckets
    # missing from the weight table take the smoothed prior, never
    # silently 0 (3 unigrams + 2 bigrams = 5 features; a md5-bucket may
    # still collide with a training bucket — compute the expectation
    # through the same hash)
    words = ["zyzzyva", "qwertyuiop", "asdfghjkl"]
    feats = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    con = duckdb.connect()
    buckets = [con.execute(
        "select ('0x' || substr(md5(?), 1, 15))::bigint % 512", [g]
    ).fetchone()[0] for g in feats]
    assert any(b not in wt for b in buckets)   # the prior path is hit
    expected = sum(wt.get(b, w0) for b in buckets)
    new = spark.createDataFrame(
        [(99, " ".join(words))], "doc_id long, text string")
    row = importance.dsir_scores(
        new, "true", n_buckets=512, weights=w).collect()[0]
    assert row["n_features"] == 5
    assert row["dsir_score_micro"] == expected
    # null/empty text: zero features, score 0, not selected
    empty = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string")
    for r in importance.dsir_scores(
            empty, "true", n_buckets=512, weights=w).collect():
        assert r["n_features"] == 0 and r["dsir_score_micro"] == 0
        assert not r["selected"]


def test_duckdb_twin_parity(spark):
    df = _frame(spark)
    got = sorted(
        importance.dsir_scores(df, "is_target", n_buckets=512).collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({
        "doc_id": [r["doc_id"] for r in df.collect()],
        "text": [r["text"] for r in df.collect()],
        "is_target": [r["is_target"] for r in df.collect()]}))
    duck = con.execute(
        importance.duckdb_dsir_sql("docs", target_pred="is_target",
                                   n_buckets=512)
        + " order by 1").fetchall()
    assert [tuple(r) for r in got] == duck


def test_weight_table_is_broadcast(spark):
    df = _frame(spark)
    plan = (importance.dsir_scores(df, "is_target", n_buckets=512)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_save_load_weights_roundtrip_and_guards(spark, tmp_path):
    df = _frame(spark)
    w = importance.dsir_weights(df, "is_target", n_buckets=512)
    path = str(tmp_path / "dsirw")
    importance.save_weights(w, path, n_buckets=512,
                            target_desc="is_target")
    back = importance.load_weights(spark, path, n_buckets=512)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, w.collect()))
    # scoring through the stored table matches in-flight weights exactly
    a = sorted(map(tuple, importance.dsir_scores(
        df, "is_target", n_buckets=512).collect()))
    b = sorted(map(tuple, importance.dsir_scores(
        df, "is_target", n_buckets=512, weights=back).collect()))
    assert a == b
    # params mismatch and missing sidecar both fail loudly
    import pytest
    with pytest.raises(ValueError, match="trained with"):
        importance.load_weights(spark, path, n_buckets=1024)
    from data_quality_autohealer_spark.sources import fsio
    fs, p = fsio._fs_path(spark, f"{path}/_dsir_params.json")
    fs.delete(p, False)
    with pytest.raises(ValueError, match="sidecar"):
        importance.load_weights(spark, path, n_buckets=512)

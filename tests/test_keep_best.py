"""Quality-aware near-dup survivor selection (dedup.keep_best_representatives):
crafted clusters where the best-scoring member is NOT the min-id
representative, pass-through of unclustered docs, and DuckDB parity."""
from __future__ import annotations

import duckdb
import pandas as pd

from data_quality_autohealer_spark.operators import dedup


def _groups_df(spark):
    # two clusters: {1, 2, 3} rep 1 and {10, 11} rep 10
    rows = [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)]
    return spark.createDataFrame(
        rows, "doc_id long, rep_id long, cluster_size long")


def _scores_df(spark):
    # best member of cluster 1 is doc 3 (not min id); cluster 10 ties on
    # score -> min id 10 wins; doc 99 is unclustered noise
    rows = [(1, 5), (2, 7), (3, 9), (10, 4), (11, 4), (99, 100)]
    return spark.createDataFrame(rows, "doc_id long, score_micro long")


def test_keep_best_argmax_and_tiebreak(spark):
    out = {r["rep_id"]: r.asDict() for r in dedup.keep_best_representatives(
        _groups_df(spark), _scores_df(spark)).collect()}
    assert out[1]["kept_id"] == 3 and out[1]["kept_score_micro"] == 9
    assert out[1]["cluster_size"] == 3
    assert out[10]["kept_id"] == 10          # tie -> min id
    assert set(out) == {1, 10}


def test_neardup_dedup_keep_best_passthrough(spark):
    # identical texts cluster; the higher-scored copy survives, the
    # unclustered doc passes through untouched
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta"),
         (3, "completely different words nobody else repeats anywhere")],
        "doc_id long, text string")
    scores = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 1)], "doc_id long, score_micro long")
    kept = sorted(r["doc_id"] for r in
                  dedup.neardup_dedup_keep_best(docs, scores).collect())
    assert kept == [2, 3]


def test_duckdb_parity(spark):
    gpdf = pd.DataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)],
        columns=["doc_id", "rep_id", "cluster_size"])
    spdf = pd.DataFrame(
        [(1, 5), (2, 7), (3, 9), (10, 4), (11, 4), (99, 100)],
        columns=["doc_id", "score_micro"])
    con = duckdb.connect()
    con.register("g_tbl", gpdf)
    con.register("s_tbl", spdf)
    want = con.execute(dedup.duckdb_keep_best_sql(
        "select * from g_tbl", "select * from s_tbl")).fetchdf() \
        .sort_values("rep_id").reset_index(drop=True)
    got = dedup.keep_best_representatives(
        _groups_df(spark), _scores_df(spark)).toPandas() \
        .sort_values("rep_id").reset_index(drop=True)
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=True)

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


# ---------------------------------------------------------------------------
# SimHash banded pairs (round 6)
# ---------------------------------------------------------------------------


def test_simhash_pairs_pigeonhole_and_parity(spark):
    """Near-identical docs land within Hamming radius and are emitted
    exactly once; a genuinely different doc pairs with nobody; Spark and
    DuckDB emit the identical pair set."""
    base = ("spark executes declarative plans through catalyst and "
            "tungsten with whole stage code generation for speed")
    rows = [
        (1, base),
        (2, base + " extra"),             # near-identical -> tiny hamming
        (3, "completely unrelated knitting patterns involve wool gauge "
            "swatches and circular needles for seamless sweaters"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_neardup_pairs(df, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert (1, 2) in got
    assert all(k == (1, 2) for k in got)
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.register("docs_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("create table documents as select * from docs_in")
    want = {(r[0], r[1]): r[2] for r in con.execute(
        dedup.duckdb_simhash_pairs_sql(max_hamming=3)).fetchall()}
    assert got == want


def test_simhash_pairs_bucket_cap_drops_megabucket(spark):
    # 30 identical docs share every band; cap below the bucket size
    # removes the degenerate bucket entirely (the LSH discipline)
    rows = [(i, "same words everywhere " * 5) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.simhash_neardup_pairs(
        df, max_bucket_size=10).count() == 0
    assert dedup.simhash_neardup_pairs(
        df, max_bucket_size=None).count() == 30 * 29 // 2

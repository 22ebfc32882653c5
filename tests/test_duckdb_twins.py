"""In-suite DuckDB oracle parity for a representative subset of the driver
queries, so `python -m pytest -x -q` (the BASELINE verify command) exercises
the cross-engine gate end-to-end at sf0.001."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_oracle import TABLES, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "quality_signals", "quality_decision", "quality_drop_summary",
    "langid_stopword_heuristic", "exact_dedup_groups", "minhash_signatures",
    "simhash", "pii_scrub", "knn_cosine_topk", "token_count_bpe",
    "asof_join_events", "time_range_join_events", "lexical_diversity",
    "domain_quality", "snapshot_delta", "cross_corpus_neardup",
    "kmeans_embeddings", "sequence_pack", "readability", "lang_agreement",
    "pii_density_by_source", "line_dedup", "token_budget_sample",
    "canonical_dedup_groups", "url_canonical_dedup",
    "intra_doc_line_dedup", "bucket_skew",
    # round-5 additions
    "ngram_novelty", "charset_quality", "dup_cluster_histogram",
    "boilerplate_by_source", "substring_dup_summary",
    "incremental_novelty",
    # round-6 continuation additions
    "c4_line_filter", "dsir_importance", "bpe_fertility_by_lang",
    "paragraph_dedup", "classifier_calibration", "rule_ablation",
    "corpus_report", "similarity_histogram",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb_twin(name, spark, duck):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)


def test_zscore_degenerate_groups_match_oracle(spark, tmp_path):
    """Adversarial events: a single-row group, a zero-variance group, and a
    normal group must agree across engines (ADVICE r02: Spark NULL-sum vs
    DuckDB CASE-else-0 divergence on degenerate groups)."""
    import pandas as pd

    rows = [("solo", 5.0)]
    rows += [("flat", 2.0)] * 6
    rows += [("normal", float(v)) for v in
             [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 100]]
    pdf = pd.DataFrame(rows, columns=["event_type", "value"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    # point an sf-dir shim at the crafted table
    sf_dir = str(tmp_path)
    os.rename(path, os.path.join(sf_dir, "events.parquet"))

    sdf = entry_mod.queries()["zscore_outliers_events"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"read_parquet('{sf_dir}/events.parquet')")
    odf = con.execute(entry_mod.oracle_sql()["zscore_outliers_events"]).fetchdf()
    assert len(sdf) == len(odf) == 3
    assert value_hash(sdf) == value_hash(odf)
    by_type = {r.event_type: r.n_outliers for r in sdf.itertuples()}
    assert by_type["solo"] == 0 and by_type["flat"] == 0


def test_rule_ablation_and_corpus_report_invariants(spark):
    """Cross-query reconciliation: ablation hits == drop_summary counts
    per rule; sole_hits <= hits; corpus_report rates are consistent with
    the decision query's keep census."""
    abl = {r["reason"]: r for r in entry_mod.queries()["rule_ablation"](
        spark, SF_DIR).collect()}
    drop = {r["reason"]: r["n_docs"] for r in
            entry_mod.queries()["quality_drop_summary"](
                spark, SF_DIR).collect()}
    assert set(abl) == set(drop)
    for code, row in abl.items():
        assert row["hits"] == drop[code]
        assert 0 <= row["sole_hits"] <= row["hits"]
    rep = entry_mod.queries()["corpus_report"](spark, SF_DIR).collect()[0]
    dec = entry_mod.queries()["quality_decision"](spark, SF_DIR).collect()
    assert rep["n_docs"] == len(dec)
    kept = sum(1 for r in dec if r["keep"])
    assert abs(rep["keep_rate"] - kept / len(dec)) < 1e-6
    assert rep["distinct_texts"] <= rep["n_docs"]
    assert 0.0 <= rep["exact_dup_rate"] <= 1.0

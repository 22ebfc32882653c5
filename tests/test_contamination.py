"""Winnowing fingerprints + benchmark decontamination guarantees."""

import pyspark.sql.functions as F
import pytest

from data_quality_autohealer_spark.operators import contamination


@pytest.fixture(scope="module")
def corpus(spark):
    passage = ("the hidden benchmark answer is forty two and the question "
               "remains unknown to everyone")
    rows = [
        (0, passage, "en"),                                     # benchmark
        (1, "intro words here " + passage + " plus a closing remark", "en"),
        (2, "a completely unrelated document about parquet files and "
            "shuffle partitions in spark clusters today", "en"),
        (3, "the hidden benchmark answer is not here at all really", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_winnowing_shared_run_guarantee(corpus):
    # docs 0 and 1 share a 15-word run; with n=3, window=4 any shared run of
    # ≥ window+n−1 = 6 words must share a fingerprint
    fps = contamination.winnow_fingerprints(corpus, n=3, window=4)
    by_doc = {r["doc_id"]: set() for r in fps.select("doc_id").collect()}
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fingerprint"])
    assert by_doc[0] & by_doc[1], "shared run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2]), "unrelated docs must not collide"


def test_contamination_flags_embedding_doc(corpus):
    bench = corpus.where(F.col("doc_id") == 0)
    flagged = {r["doc_id"]: r["n_shared_ngrams"]
               for r in contamination.contamination_flags(
                   corpus, bench, n=8).collect()}
    assert 0 in flagged           # the benchmark doc itself
    assert 1 in flagged           # embeds the passage verbatim
    assert flagged[1] >= 5        # a 15-word run shares ≥ 8 distinct 8-grams
    assert 2 not in flagged
    assert 3 not in flagged       # shares only a 6-word prefix < n=8

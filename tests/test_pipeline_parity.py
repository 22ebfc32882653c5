"""The F1≥0.99 + byte-identical-scrubbed-text gate (BASELINE.md targets).

Spark pipeline output vs the pandas oracle on the deterministic synthetic
corpus (FIXTURES.md §1 quality mix). Mirrors the reference's end-to-end
detect test (/root/reference/tests/test_ensemble.py:183-199) at document
granularity.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.plans import pipeline
from oracle.rules import reference_labels

N_DOCS = 3000


@pytest.fixture(scope="module")
def spark_scored(spark):
    pages = synth.gen_pages_df(spark, N_DOCS, num_partitions=8)
    scored = pipeline.score_pages(pages)
    pdf = (scored
           .withColumn("reasons_csv", F.array_join("reasons", ","))
           .select("url", "lang", "keep", "reasons_csv", "scrubbed_text",
                   "word_count", "log_pplx", "lang_pred")
           .toPandas()
           .sort_values("url").reset_index(drop=True))
    return pdf


@pytest.fixture(scope="module")
def oracle_scored():
    pdf = synth.gen_pages_pdf(np.arange(N_DOCS))
    out = reference_labels(pdf[["url", "text", "lang"]])
    return out.sort_values("url").reset_index(drop=True)


def test_keep_f1(spark_scored, oracle_scored):
    assert len(spark_scored) == len(oracle_scored) == N_DOCS
    s = spark_scored["keep"].to_numpy()
    o = oracle_scored["keep"].to_numpy()
    tp = int((s & o).sum())
    fp = int((s & ~o).sum())
    fn = int((~s & o).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} < 0.99 (fp={fp}, fn={fn})"


def test_reason_codes_match(spark_scored, oracle_scored):
    mismatch = (spark_scored["reasons_csv"] != oracle_scored["reasons_csv"])
    frac = mismatch.mean()
    assert frac <= 0.01, (
        f"{mismatch.sum()} reason mismatches; e.g. "
        f"{spark_scored[mismatch].head(3)[['url','reasons_csv']].values} vs "
        f"{oracle_scored[mismatch].head(3)[['reasons_csv']].values}"
    )


def test_scrubbed_text_byte_identical(spark_scored, oracle_scored):
    eq = spark_scored["scrubbed_text"].to_numpy() == \
        oracle_scored["scrubbed_text"].to_numpy()
    assert eq.all(), f"{int((~eq).sum())} scrubbed_text byte mismatches"


def test_pii_slice_scrubbed(oracle_scored):
    # PII slice (row_id % 100 in 94..97) must be kept with text != scrubbed
    ids = oracle_scored["url"].str.extract(r"/p/(\d+)$")[0].astype(int)
    pii = (ids % 100).between(94, 97)
    sub = oracle_scored[pii]
    assert (sub["scrubbed_text"] != sub["text"]).all()
    assert sub["keep"].mean() > 0.95


def test_quality_mix_expectations(oracle_scored):
    ids = oracle_scored["url"].str.extract(r"/p/(\d+)$")[0].astype(int)
    sl = ids % 100
    o = oracle_scored
    assert o[sl < 55]["keep"].mean() > 0.95           # clean
    assert not o[(sl >= 55) & (sl < 63)]["keep"].any()  # too-short
    assert not o[(sl >= 63) & (sl < 69)]["keep"].any()  # gibberish
    assert not o[(sl >= 69) & (sl < 75)]["keep"].any()  # symbol-heavy
    assert not o[(sl >= 75) & (sl < 83)]["keep"].any()  # repetitive
    assert o[(sl >= 83) & (sl < 89)]["keep"].mean() < 0.05  # wrong-language
    assert o[(sl >= 89) & (sl < 94)]["keep"].mean() < 0.05  # word salad

"""The three signal implementations must agree exactly:
native Spark column expressions (functions.text_heuristics), the batched
Python pass inside the scoring UDF (operators.scoring.heuristic_signal_batch),
and the independent pandas oracle (oracle.rules.heuristic_signals)."""

import numpy as np
import pandas as pd

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.functions import text_heuristics as th
from data_quality_autohealer_spark.operators.scoring import (
    heuristic_signal_batch,
)
from oracle.rules import heuristic_signals

N = 1200
SIGNALS = th.SIGNAL_COLS


def test_udf_signals_match_native_exprs(spark):
    pdf = synth.gen_pages_pdf(np.arange(N))
    sdf = spark.createDataFrame(pdf[["url", "text", "lang"]])
    native = (th.with_signal_columns(sdf, "text")
              .select("url", *SIGNALS).toPandas()
              .sort_values("url").reset_index(drop=True))
    batch = heuristic_signal_batch(pdf["text"], th.DEFAULT_THRESHOLDS.stopwords)
    batch["url"] = pdf["url"].to_numpy()
    batch = batch.sort_values("url").reset_index(drop=True)
    for c in SIGNALS:
        a, b = native[c].to_numpy(), batch[c].to_numpy()
        assert (a == b).all(), (
            f"{c}: {int((a != b).sum())} mismatches, e.g. "
            f"{list(zip(a[a != b][:3], b[a != b][:3]))}")


def test_oracle_signals_match_udf_batch():
    pdf = synth.gen_pages_pdf(np.arange(N))
    a = heuristic_signals(pdf["text"])
    b = heuristic_signal_batch(pdf["text"], th.DEFAULT_THRESHOLDS.stopwords)
    for c in SIGNALS:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), f"{c}: {int((av != bv).sum())} mismatches"


def test_edge_cases():
    edge = pd.Series(["", None, "word", "a  b\t c", "### {} => ~~",
                      "the of and to be that have with"])
    b = heuristic_signal_batch(edge, th.DEFAULT_THRESHOLDS.stopwords)
    assert b["word_count"].tolist()[0:2] == [0, 0]
    assert b.loc[3, "word_count"] == 3
    assert b.loc[5, "distinct_stopwords"] == 8

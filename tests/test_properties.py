"""Property-based tests (SURVEY §5.2.3): scrub idempotence, decision
invariance under row order / partitioning, metrics consistency."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.functions.scrub import scrub_series
from data_quality_autohealer_spark.operators.scoring import (
    heuristic_signal_batch,
)
from data_quality_autohealer_spark.functions.text_heuristics import (
    DEFAULT_THRESHOLDS,
)

text_strategy = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
    max_size=400)


@given(st.lists(text_strategy, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_scrub_idempotent(texts):
    s = pd.Series(texts)
    once = scrub_series(s)
    twice = scrub_series(once["scrubbed_text"])
    assert (once["scrubbed_text"] == twice["scrubbed_text"]).all()


@given(st.lists(text_strategy, min_size=2, max_size=20),
       st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None)
def test_signals_order_invariant(texts, rnd):
    s = pd.Series(texts)
    idx = list(range(len(texts)))
    rnd.shuffle(idx)
    a = heuristic_signal_batch(s, DEFAULT_THRESHOLDS.stopwords)
    b = heuristic_signal_batch(s.iloc[idx].reset_index(drop=True),
                               DEFAULT_THRESHOLDS.stopwords)
    a_sorted = a.iloc[idx].reset_index(drop=True)
    assert a_sorted.equals(b)


@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=20, deadline=None)
def test_generator_pure_function_of_id(rid):
    a = synth.gen_pages_pdf(np.array([rid]))
    b = synth.gen_pages_pdf(np.array([rid, rid + 1]))
    assert a.loc[0, "text"] == b.loc[0, "text"]
    assert a.loc[0, "url"] == b.loc[0, "url"]


def _union_find_components(edges):
    """Pure-Python reference for connected components (min label)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=40))
@settings(max_examples=12, deadline=None)
def test_connected_components_match_union_find(edges):
    # dedupe/canonicalize pairs the way the operator receives them
    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges})
    from data_quality_autohealer_spark.operators.dedup import (
        connected_components,
    )
    from data_quality_autohealer_spark.session import get_spark
    spark = get_spark(app_name="dqa-tests", master="local[8]",
                      shuffle_partitions=8)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _union_find_components(pairs)


def test_decision_partition_invariant(spark):
    from data_quality_autohealer_spark.plans.pipeline import score_pages
    pdf = synth.gen_pages_pdf(np.arange(400))
    one = score_pages(
        spark.createDataFrame(pdf[["url", "text", "lang"]]).coalesce(1))
    many = score_pages(
        spark.createDataFrame(pdf[["url", "text", "lang"]]).repartition(13))
    a = {r["url"]: (r["keep"], tuple(r["reasons"])) for r in one.collect()}
    b = {r["url"]: (r["keep"], tuple(r["reasons"])) for r in many.collect()}
    assert a == b


# --- temporal join properties (Spark vs a brute-force python reference) ---

import datetime as _dt

from data_quality_autohealer_spark.operators.temporal import (
    asof_join, time_range_join,
)

_key = st.sampled_from(["a", "b", None])
_sec = st.integers(0, 20)


def _t(s):
    return _dt.datetime(2024, 1, 1, 0, 0, s)


@given(st.lists(st.tuples(_key, _sec), min_size=1, max_size=10),
       st.lists(st.tuples(_key, _sec), min_size=0, max_size=15))
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k, _t(s)) for i, (k, s) in enumerate(lrows)],
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(k, _t(s), i, float(i)) for i, (k, s) in enumerate(rrows)],
        "k string, ts timestamp, rid long, val double")
    got = {r["lid"]: r["rid_asof"]
           for r in asof_join(left, right, on=["k"], left_ts="ts",
                              right_ts="ts", payload=["rid", "val"],
                              tie_col="rid").collect()}
    for i, (k, s) in enumerate(lrows):
        cands = [(rs, j) for j, (rk, rs) in enumerate(rrows)
                 if rk == k and rk is not None and rs <= s]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, s, cands)


@given(st.lists(st.tuples(_key, _sec), min_size=1, max_size=8),
       st.lists(st.tuples(_key, _sec), min_size=0, max_size=12),
       st.integers(1, 7))
@settings(max_examples=8, deadline=None)
def test_time_range_join_matches_brute_force_property(spark, lrows, rrows,
                                                      win):
    left = spark.createDataFrame(
        [(i, k, _t(s)) for i, (k, s) in enumerate(lrows)],
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(k, _t(s), i) for i, (k, s) in enumerate(rrows)],
        "k string, ts timestamp, rid long")
    got = {(r["lid"], r["rid_r"])
           for r in time_range_join(left, right, on=["k"], left_ts="ts",
                                    right_ts="ts", window_sec=win,
                                    right_cols=["rid"]).collect()}
    want = {(i, j)
            for i, (lk, ls) in enumerate(lrows)
            for j, (rk, rs) in enumerate(rrows)
            if lk == rk and lk is not None and abs(ls - rs) <= win}
    assert got == want

"""Gopher repetition char-mass signals: crafted hand-checked values,
randomized brute-force equivalence vs a pure-Python reference, Spark/DuckDB
parity, and determinism under repartition."""
from __future__ import annotations

import math
import random
import re

import duckdb
import pandas as pd
import pytest

from data_quality_autohealer_spark.operators.repetition import (
    NS_DUP, NS_TOP, duckdb_gopher_repetition_sql, gopher_repetition)

_WS = re.compile(r"[ \t\n\r\f\x0b]+")


def _py_reference(text: str | None) -> dict[str, float]:
    """Independent plain-Python implementation of the documented contract."""
    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    words = _WS.split((text or "").strip()) if (text or "").strip() else [""]
    # blank doc convention: the tokenizer yields [''] for blank text
    if text is None or text.strip() == "":
        words = [""]
    norm = " ".join(words)
    out: dict[str, float] = {}
    total, distinct = len(words), len(set(words))
    out["dup_word_frac"] = r6((total - distinct) / total) if total else 0.0
    for n in NS_TOP:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)] \
            if len(words) >= n else []
        if not grams or len(norm) == 0:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        cnt: dict[str, int] = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        best_c = max(cnt.values())
        # tie-break: shortest gram then smallest md5-48 prefix — same rule
        import hashlib
        def key(g):
            return (min(len(g), 1023),
                    int(hashlib.md5(g.encode()).hexdigest()[:12], 16))
        best = min((g for g, c in cnt.items() if c == best_c), key=key)
        out[f"top_{n}gram_char_frac"] = r6(
            min(1.0, best_c * min(len(best), 1023) / len(norm)))
    for n in NS_DUP:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)] \
            if len(words) >= n else []
        if not grams or len(norm) == 0:
            out[f"dup_{n}gram_char_frac"] = 0.0
            continue
        cnt = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        dup_chars = sum(c * min(len(g), 1023) for g, c in cnt.items() if c > 1)
        out[f"dup_{n}gram_char_frac"] = r6(min(1.0, dup_chars / len(norm)))
    return out


CRAFTED = [
    "the cat sat on the mat the cat sat again",
    "a b a b a b a b a b a b",
    "",
    None,
    "unique words only here today friends forever now and then maybe",
    "x " * 30,                       # one word repeated: total repetition
    "one two three four five six seven eight nine ten " * 3,  # long-gram dups
    "  leading and trailing   whitespace  ",
]


def _vocab_corpus(seed: int, n_docs: int = 40) -> list[str]:
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "ep", "zeta18", "eta", "theta"]
    docs = []
    for _ in range(n_docs):
        k = rng.randint(0, 25)
        words = [rng.choice(vocab) for _ in range(k)]
        # plant runs so long-gram duplication actually fires
        if k > 12 and rng.random() < 0.5:
            run = words[:6]
            words = words[:k // 2] + run + run + words[k // 2:]
        docs.append(" ".join(words))
    return docs


def test_crafted_values_match_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CRAFTED)], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}
    for i, t in enumerate(CRAFTED):
        want = _py_reference(t)
        for col, v in want.items():
            assert got[i][col] == pytest.approx(v, abs=1e-9), (i, col, t)


def test_one_word_doc_is_total_repetition(spark):
    df = spark.createDataFrame([(0, "x " * 30)], "doc_id long, text string")
    row = gopher_repetition(df).collect()[0]
    assert row["dup_word_frac"] == pytest.approx(1 - 1 / 30)
    for n in NS_DUP:
        assert row[f"dup_{n}gram_char_frac"] == 1.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_brute_force(spark, seed):
    docs = _vocab_corpus(seed)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}
    assert len(got) == len(docs)
    for i, t in enumerate(docs):
        want = _py_reference(t)
        for col, v in want.items():
            assert got[i][col] == pytest.approx(v, abs=1e-9), (i, col, t)


def test_duckdb_parity_and_repartition_determinism(spark):
    docs = CRAFTED + _vocab_corpus(7, 20)
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = (gopher_repetition(sdf.repartition(7))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    got1 = (gopher_repetition(sdf.coalesce(1))
            .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (con.execute(duckdb_gopher_repetition_sql("documents"))
            .fetchdf().sort_values("doc_id").reset_index(drop=True))
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=True)
    pd.testing.assert_frame_equal(got[cols], got1[cols], check_dtype=True)

"""BPE tokenizer training: Spark trainer and DuckDB twin must both equal a
pure-Python CANONICAL byte-pair-encoding reference (pairwise left-to-right
merge, overlapping pair counts, lexicographic ties) — the double-delimiter
replace trick's correctness claim — plus determinism, blank-doc, and
exhaustion guards."""

import re
from collections import Counter

import duckdb
import pytest

from data_quality_autohealer_spark.functions import bpe

# adversarial corpus: same-symbol runs ('aaaa') and alternations ('abab')
# are exactly where a naive single-delimiter replace diverges from
# canonical BPE (the first match consumes the shared boundary); plus
# null/whitespace docs and repeated real words for stable merge ranks
TEXTS = [
    "aaaa abab banana bandana the cat sat on the mat",
    "the banana man ran a bandana stand",
    "abab aaaa the the the",
    "Mixed CASE and punct-uation! keeps only [a-z] runs 123",
    None,
    "   ",
]
R = 8


def _ref_train(texts, num_merges):
    """Canonical BPE (Sennrich et al.): overlapping adjacent pair counts
    weighted by word freq; argmax by (count desc, left asc, right asc);
    pairwise left-to-right non-overlapping merge application."""
    words = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", (t or "").lower()):
            words[w] += 1
    vocab = {w: tuple(w) + ("</w>",) for w in words}
    merges = []
    for rank in range(1, num_merges + 1):
        counts = Counter()
        for w, f in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            raise ValueError("exhausted")
        (left, right), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append({"merge_rank": rank, "lhs": left, "rhs": right,
                       "merged": left + right, "freq": f})
        for w in vocab:
            syms = vocab[w]
            new, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = tuple(new)
    return merges, vocab


def _ref_token_counts(texts, vocab):
    return [sum(len(vocab[w]) for w in re.findall("[a-z]+",
                                                  (t or "").lower()))
            for t in texts]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)),
                                 "doc_id long, text string")


def test_driver_fast_path_equals_distributed_loop(corpus_df):
    """The round-7 collected-census trainer must emit byte-identical
    merges to the distributed per-round loop (census_driver_max=0 forces
    the distributed path)."""
    fast = bpe.train_bpe_merges(corpus_df, num_merges=R)
    dist = bpe.train_bpe_merges(corpus_df, num_merges=R,
                                census_driver_max=0)
    assert fast == dist


def test_spark_trainer_matches_canonical_bpe(corpus_df):
    ref_merges, _ = _ref_train(TEXTS, R)
    assert bpe.train_bpe_merges(corpus_df, num_merges=R) == ref_merges


def test_spark_token_counts_match_canonical_bpe(corpus_df):
    ref_merges, vocab = _ref_train(TEXTS, R)
    got = {r["doc_id"]: r["n_tokens_bpe"]
           for r in bpe.doc_token_counts(corpus_df, ref_merges).collect()}
    for i, want in enumerate(_ref_token_counts(TEXTS, vocab)):
        assert got[i] == want, (i, got[i], want)
    # null / whitespace docs tokenize to 0, never null
    assert got[4] == 0 and got[5] == 0


def test_duckdb_twin_matches_canonical_bpe():
    ref_merges, vocab = _ref_train(TEXTS, R)
    con = duckdb.connect()
    con.execute(
        "create table documents as select * from (values "
        + ", ".join(f"({i}, {'NULL' if t is None else repr(t)})"
                    for i, t in enumerate(TEXTS))
        + ") t(doc_id, text)")
    odf = con.execute(bpe.duckdb_bpe_vocab_sql(R)).fetchdf()
    got = [dict(zip(odf.columns, row))
           for row in odf.sort_values("merge_rank").itertuples(index=False)]
    assert got == ref_merges
    tdf = (con.execute(bpe.duckdb_bpe_token_count_sql(R)).fetchdf()
           .sort_values("doc_id"))
    assert list(tdf["n_tokens_bpe"]) == _ref_token_counts(TEXTS, vocab)


def test_trainer_is_deterministic(corpus_df):
    a = bpe.train_bpe_merges(corpus_df, num_merges=4)
    b = bpe.train_bpe_merges(corpus_df.repartition(7), num_merges=4)
    assert a == b


def test_trainer_raises_when_corpus_exhausts(spark):
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    # 'ab' has 2 mergeable pairs total; asking for 8 merges must raise
    # (the fixed-depth oracle twin cannot terminate early)
    with pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe_merges(tiny, num_merges=8)


def test_min_freq_caps_census(corpus_df):
    # rare-word tail removed: merges still deterministic and well-formed
    merges = bpe.train_bpe_merges(corpus_df, num_merges=3, min_freq=2)
    assert [m["merge_rank"] for m in merges] == [1, 2, 3]
    for m in merges:
        assert m["merged"] == m["lhs"] + m["rhs"] and m["freq"] >= 2


def test_save_load_merges_roundtrip(spark, corpus_df, tmp_path):
    merges = bpe.train_bpe_merges(corpus_df, num_merges=4)
    path = str(tmp_path / "vocab")
    bpe.save_merges(spark, merges, path)
    assert bpe.load_merges(spark, path) == merges
    # tokenization with the loaded vocab is identical
    a = {r["doc_id"]: r["n_tokens_bpe"]
         for r in bpe.doc_token_counts(corpus_df, merges).collect()}
    b = {r["doc_id"]: r["n_tokens_bpe"]
         for r in bpe.doc_token_counts(
             corpus_df, bpe.load_merges(spark, path)).collect()}
    assert a == b


def test_load_merges_rejects_gapped_ranks(spark, corpus_df, tmp_path):
    merges = bpe.train_bpe_merges(corpus_df, num_merges=4)
    path = str(tmp_path / "gapped")
    bpe.save_merges(spark, [m for m in merges if m["merge_rank"] != 2],
                    path)
    with pytest.raises(ValueError, match="contiguous"):
        bpe.load_merges(spark, path)


def test_doc_tokens_match_canonical_segmentation(corpus_df):
    ref_merges, vocab = _ref_train(TEXTS, R)
    got = {r["doc_id"]: list(r["tokens"])
           for r in bpe.doc_tokens(corpus_df, ref_merges).collect()}
    for i, t in enumerate(TEXTS):
        want = [s for w in re.findall("[a-z]+", (t or "").lower())
                for s in vocab[w]]
        assert got[i] == want, (i, got[i], want)


def test_fertility_by_lang_semantics(spark):
    """Fertility = tokens emitted per word under the trained vocab; a
    language with no [a-z] words contributes 0/0 -> fertility 0 (never a
    division error)."""
    import __spark_entry__ as entry

    rows = [
        (0, "en", "the cat sat on the mat near the cat and the mat"),
        (1, "en", "the cat and the mat and the cat sat down again"),
        (2, "zh", "漢字文本 沒有 拉丁 字母"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    merges = bpe.train_bpe_merges(df, num_merges=4)
    counted = bpe.with_bpe_token_counts(df, merges)
    from pyspark.sql import functions as F
    counted = counted.withColumn(
        "n_words", F.expr(
            "cast(size(regexp_extract_all(lower(coalesce(text, '')), "
            f"'{bpe.WORD_RE}', 0)) as bigint)"))
    got = {r["lang"]: r for r in
           (counted.groupBy("lang")
            .agg(F.sum("n_tokens_bpe").cast("bigint").alias("tokens"),
                 F.sum("n_words").cast("bigint").alias("words"))
            .selectExpr("lang", "tokens", "words",
                        "floor(tokens / cast(greatest(words, 1) as double)"
                        " * cast(1000000 as double) + cast(0.5 as double))"
                        " / cast(1000000 as double) as fertility")
            .collect())}
    en = got["en"]
    assert en["words"] == 23 and en["tokens"] >= en["words"]
    assert en["fertility"] == pytest.approx(
        int(en["tokens"] / en["words"] * 1e6 + 0.5) / 1e6)
    zh = got["zh"]
    assert zh["tokens"] == 0 and zh["words"] == 0 and zh["fertility"] == 0.0

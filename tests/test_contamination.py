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


def test_dup_substring_spans_crafted(spark):
    """Planted duplications: two docs share an 10-word run (detected in
    both, clamped word positions); a doc repeats its own 9-word phrase
    (within-doc duplication counts); overlapping duplicated windows merge
    into ONE span (gap <= k-1 tolerance) so coverage never double-counts;
    a unique doc yields nothing."""
    from data_quality_autohealer_spark.operators.contamination import (
        dup_substring_spans, dup_substring_summary,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        # within-doc repeat of a 9-word phrase, separated by filler
        (3, "p1 p2 p3 p4 p5 p6 p7 p8 p9 filler1 filler2 filler3 "
            "p1 p2 p3 p4 p5 p6 p7 p8 p9"),
        (4, "totally unique words nothing here repeats anywhere at all "
            "honestly never once"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 8
    spans = {r["doc_id"]: r for r in
             dup_substring_spans(df, k=k).collect()}
    rows = dup_substring_spans(df, k=k).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 4: nothing
    assert 4 not in by_doc
    # docs 1/2: the shared 10-word run spawns 3 duplicated windows each
    # (10 - 8 + 1), all overlapping -> exactly ONE merged span of 10 words
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    s1, s2 = by_doc[1][0], by_doc[2][0]
    assert s1["n_windows"] == 3 and s2["n_windows"] == 3
    assert s1["span_start"] == 3 and s1["span_end"] == 12  # words 3..12
    assert s2["span_start"] == 0 and s2["span_end"] == 9
    # doc 3: the repeated 9-word phrase -> 2 windows per occurrence;
    # occurrences are 12 words apart (> k-1) -> TWO spans of 9 words
    assert len(by_doc[3]) == 2
    covers = sorted((r["span_start"], r["span_end"]) for r in by_doc[3])
    assert covers == [(0, 8), (12, 20)]
    # summary coverage is the disjoint-union word count
    summ = {r["doc_id"]: r for r in
            dup_substring_summary(df, k=k).collect()}
    assert summ[1]["dup_word_frac"] == round(10 / 16, 6)
    assert summ[3]["n_dup_spans"] == 2
    assert summ[3]["dup_word_frac"] == round(18 / 21, 6)


def test_dup_substring_spans_randomized_vs_bruteforce(spark):
    """Randomized equivalence: dup_substring_spans / dup_substring_summary
    vs an independent pure-Python brute-force model (explicit window
    enumeration, occurrence counting on window WORD TUPLES, gap<=k-1
    island merge), over corpora drawn from a tiny word vocabulary so
    cross-doc and within-doc window collisions are dense. Three seeds."""
    import random
    from collections import Counter

    from data_quality_autohealer_spark.operators.contamination import (
        dup_substring_spans, dup_substring_summary,
    )

    k = 4
    vocab = [f"w{i}" for i in range(6)]
    for seed in (3, 99, 2024):
        rng = random.Random(seed)
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(1, 14))))
                for i in range(24)]
        df = spark.createDataFrame(docs, "doc_id long, text string")

        # brute-force model over word tuples (md5 hashing is injective
        # here up to negligible collision odds; tuples are the semantics)
        windows = {}   # doc -> [(pos, tuple)]
        counts = Counter()
        for i, t in docs:
            words = t.split(" ")
            if len(words) < k:
                ws = [(0, tuple(words))]
            else:
                ws = [(p, tuple(words[p:p + k]))
                      for p in range(len(words) - k + 1)]
            windows[i] = (len(words), ws)
            for _, w in ws:
                counts[w] += 1
        expect_spans = {}
        expect_summary = {}
        for i, (nw, ws) in windows.items():
            dup_pos = [p for p, w in ws if counts[w] >= 2]
            if not dup_pos:
                continue
            spans = []
            start = prev = dup_pos[0]
            for p in dup_pos[1:]:
                if p - prev > k - 1:
                    spans.append((start, min(prev + k - 1, nw - 1)))
                    start = p
                prev = p
            spans.append((start, min(prev + k - 1, nw - 1)))
            expect_spans[i] = sorted(spans)
            covered = sum(e - s + 1 for s, e in spans)
            expect_summary[i] = (len(spans), round(covered / nw, 6))

        got_spans = {}
        for r in dup_substring_spans(df, k=k).collect():
            got_spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        got_spans = {i: sorted(v) for i, v in got_spans.items()}
        assert got_spans == expect_spans, f"spans mismatch at seed {seed}"
        got_summary = {r["doc_id"]: (r["n_dup_spans"], r["dup_word_frac"])
                       for r in dup_substring_summary(df, k=k).collect()}
        assert got_summary == expect_summary, f"summary seed {seed}"

"""Document fingerprinting (winnowing) and benchmark decontamination.

Training-data hygiene operators a 10^12-doc corpus pipeline needs (no
reference analogue — the reference's nearest miss is its md5 schema
fingerprint, spark_profiler.py:44-46):

* **Winnowing fingerprints** (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public):
  per document, the set of per-window minima over the rolling sequence of
  hashed word n-grams. Guarantees any shared run of ≥ window+n−1 words
  between two documents shares a fingerprint — the deterministic cousin of
  MinHash used for plagiarism / benchmark-contamination detection.

* **Decontamination**: flag corpus documents sharing any n-gram with a
  benchmark/eval set (the C4/GPT-style 8-to-13-gram overlap rule, public).
  The benchmark n-gram set is tiny → broadcast hash-semi-join against the
  exploded corpus n-grams; corpus side never shuffles its text, only
  (id, 8-byte hash) pairs.

Both reuse dedup's engine-identical hashed-shingle builders (one md5 pass,
60-bit ints, bit-identical in Spark and DuckDB), so both have exact SQL
oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_base, _ngrams_raw, _words


def _hashed_seq(text: str, n: int, engine: str,
                words_col: str | None = None) -> str:
    """Positional (non-distinct) hashed n-gram sequence — order matters for
    the rolling windows."""
    ng = _ngrams_raw(text, n, engine, words_col)
    if engine == "spark":
        return f"transform({ng}, g -> {_hash_base('g', 'spark')})"
    return f"list_transform({ng}, g -> {_hash_base('g', 'duck')})"


def _winnow_expr(hseq_col: str, window: int, engine: str) -> str:
    """Distinct per-window minima over the hash sequence (the fingerprint
    set). Sequences shorter than the window yield their single minimum."""
    if engine == "spark":
        return (
            f"case when size({hseq_col}) <= {window} "
            f"then array(array_min({hseq_col})) "
            f"else array_distinct(transform("
            f"sequence(1, size({hseq_col}) - {window} + 1), "
            f"i -> array_min(slice({hseq_col}, i, {window})))) end"
        )
    return (
        f"case when len({hseq_col}) <= {window} "
        f"then [list_min({hseq_col})] "
        f"else list_distinct(list_transform("
        f"generate_series(1, len({hseq_col}) - {window} + 1), "
        f"i -> list_min({hseq_col}[i:i+{window}-1]))) end"
    )


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        window: int = 4) -> DataFrame:
    """One row per (doc, fingerprint). Shuffle-free per-partition compute;
    output is (id, 8-byte int) — the only thing that ever moves."""
    base = df.withColumn("_w", F.expr(_words(text_col, "spark")))
    base = base.withColumn(
        "_hs", F.expr(_hashed_seq(text_col, n, "spark", words_col="_w")))
    # explode_OUTER: plain explode triggers InferFiltersFromGenerate,
    # whose synthesized size(_fps) > 0 filter inlines the ENTIRE staged
    # chain (split → hashed seq → winnow minima) with every lambda
    # re-evaluating its inputs per element — at sf0.1 the query stopped
    # completing at all (>7 min vs 3.3 s with outer). _fps always holds
    # ≥ 1 fingerprint, so outer ≡ inner; null guard kept for form.
    return (base.selectExpr(
        id_col, f"{_winnow_expr('_hs', window, 'spark')} as _fps")
        .select(F.col(id_col), F.explode_outer("_fps").alias("fingerprint"))
        .where(F.col("fingerprint").isNotNull()))


def duckdb_winnow_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      window: int = 4) -> str:
    hs = _hashed_seq(text_col, n, "duck")
    return f"""
        with h as (select {id_col}, {hs} as hs from {table}),
        w as (select {id_col},
                     {_winnow_expr('hs', window, 'duck')} as fps
              from h)
        select {id_col}, unnest(fps) as fingerprint from w
    """


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8) -> DataFrame:
    """Corpus docs sharing ≥1 word n-gram with the benchmark set:
    (doc_id, n_shared_ngrams). The benchmark's distinct hashed n-grams are
    broadcast; the corpus side explodes to (id, hash) and semi-aggregates —
    no corpus text ever shuffles."""
    def hashed(frame):
        return (frame.withColumn("_w", F.expr(_words(text_col, "spark")))
                .selectExpr(id_col,
                            f"{_hashed_seq(text_col, n, 'spark', words_col='_w')}"
                            f" as _hs"))

    bench_h = (hashed(benchmark)
               .select(F.explode("_hs").alias("h")).distinct())
    doc_h = (hashed(docs)
             .select(F.col(id_col), F.explode("_hs").alias("h"))
             .distinct())
    return (doc_h.join(F.broadcast(bench_h), "h")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams")))


def duckdb_contamination_sql(doc_table: str, bench_predicate: str,
                             text_col: str = "text", id_col: str = "doc_id",
                             n: int = 8) -> str:
    """Twin with the benchmark defined as ``doc_table where bench_predicate``
    (the driver-query form: a deterministic slice of the same table)."""
    hs = _hashed_seq(text_col, n, "duck")
    return f"""
        with bench as (
            select distinct unnest({hs}) as h
            from {doc_table} where {bench_predicate}
        ),
        doc_h as (
            select distinct {id_col}, unnest({hs}) as h from {doc_table}
        )
        select d.{id_col}, count(*)::bigint as n_shared_ngrams
        from doc_h d join bench b on d.h = b.h
        group by d.{id_col}
    """


def dup_substring_spans(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        min_count: int = 2) -> DataFrame:
    """Exact duplicate-substring spans per document — the Spark-native
    shape of suffix-array substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22 — public): any
    run of ≥ k words whose text occurs ``min_count``+ times in the corpus
    (across documents OR repeated within one) is covered by a rolling
    k-word window hash that repeats, so duplicated-window positions mark
    it; duplicated positions merge into maximal spans by gaps-and-islands
    with a k−1 gap tolerance: two windows at positions p < q cover
    overlapping WORD ranges iff q ≤ p+k−1, so a new island starts only
    when the gap exceeds k−1 (a plain pos−row_number island would split
    overlapping word ranges into two spans and double-count the overlap
    in coverage sums).

    Scale shape: posexplode ships (id, pos, 8-byte window hash) — never
    window text; the census is an algebraic count with map-side combine;
    the duplicated-hash set joins back on the hash (broadcast under AQE
    when small); the islands window partitions BY DOCUMENT (no global
    sort). Docs with < k words contribute their whole text as one window
    (the _ngrams_raw convention). NULL/whitespace-only docs are EXCLUDED
    up front (the bloom.py convention: null is absence, not a value — two
    scrape-failure blanks are not "duplicated substrings" of each other),
    so e.g. run_dedup --mode substring never drops them.

    Returns (id, span_start, span_end, n_windows, doc_words) — word
    positions, end-inclusive, clamped to the doc's word count (carried as
    ``doc_words`` so the summary needs no second corpus scan).
    """
    from pyspark.sql.window import Window

    from .dedup import _spread, hashed_ngrams_batched_udf

    df = df.where(F.expr(f"trim(coalesce({text_col}, '')) != ''"))
    # round 7: positional window hashes via the batched md5 twin (one Arrow
    # crossing; value-identical, tests/test_dedup_batched_twins.py) instead
    # of one interpreted md5 expression per window occurrence
    staged = (_spread(df)
              .withColumn("_w", F.expr(_words(text_col, "spark")))
              .withColumn("_hs", hashed_ngrams_batched_udf(
                  k, distinct=False)(F.col(text_col))))
    # posexplode_OUTER + null guard: plain explode triggers
    # InferFiltersFromGenerate's inlined size()>0 filter (the CLAUDE.md
    # blow-up); _hs always has ≥ 1 element so outer ≡ inner
    pos = (staged.select(
        F.col(id_col), F.size("_w").alias("_nw"),
        F.posexplode_outer("_hs").alias("pos", "h"))
        .where(F.col("h").isNotNull()))
    # pos feeds BOTH the census and the join-back — materialize it once
    # (id + pos + 8-byte hash per window, never window text) instead of
    # re-running the tokenize+hash pass per consumer (round 7)
    pos = pos.localCheckpoint(eager=True)
    dup = (pos.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
           .where(F.col("_c") >= min_count).select("h"))
    dp = pos.join(dup, "h")
    w = Window.partitionBy(id_col).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    new_island = F.when(
        F.col("pos") - F.lag("pos", 1).over(w) > k - 1, 1).otherwise(0)
    return (dp.withColumn("_new", new_island)
            .withColumn("_g", F.sum("_new").over(run))
            .groupBy(id_col, "_g")
            .agg(F.min("pos").alias("span_start"),
                 F.least(F.max("pos") + F.lit(k - 1),
                         F.max(F.col("_nw") - 1)).alias("span_end"),
                 F.count(F.lit(1)).cast("long").alias("n_windows"),
                 F.max("_nw").alias("doc_words"))
            .drop("_g"))


def dup_substring_summary(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 8,
                          min_count: int = 2) -> DataFrame:
    """Per-doc rollup of :func:`dup_substring_spans`: span count and the
    fraction of the doc's words covered by duplicated substrings (spans
    are disjoint by construction, so coverage is a plain sum; the word
    count rides through the spans frame as ``doc_words``, so no second
    corpus scan/tokenization happens — review finding). Only docs with
    ≥ 1 duplicated span appear."""
    spans = dup_substring_spans(df, text_col, id_col, k, min_count)
    return (spans.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
                 F.sum(F.col("span_end") - F.col("span_start") + 1)
                 .cast("long").alias("_covered"),
                 F.max("doc_words").alias("_nw"))
            .select(F.col(id_col), F.col("n_dup_spans"),
                    F.round(F.col("_covered").cast("double")
                            / F.col("_nw"), 6).alias("dup_word_frac")))


def duckdb_dup_substring_summary_sql(table: str = "documents",
                                     text_col: str = "text",
                                     id_col: str = "doc_id", k: int = 8,
                                     min_count: int = 2) -> str:
    """Engine twin of :func:`dup_substring_summary` (identical md5-derived
    window hashes; DuckDB's parallel unnests zip, giving 0-based positions
    to match posexplode; window sum(bigint) cast off HUGEINT)."""
    hs = _hashed_seq(text_col, k, "duck")
    words = _words(text_col, "duck")
    return f"""
        with staged as (
            select {id_col}, len({words}) as nw, {hs} as hs from {table}
            where trim(coalesce({text_col}, '')) <> ''
        ), pos as (
            select {id_col}, nw,
                   unnest(generate_series(1, len(hs))) - 1 as pos,
                   unnest(hs) as h
            from staged
        ), dup as (
            select h from pos group by h having count(*) >= {min_count}
        ), dp as (
            select p.* from pos p join dup using (h)
        ), marked as (
            select {id_col}, nw, pos,
                   case when pos - lag(pos) over (partition by {id_col}
                                                  order by pos) > {k - 1}
                        then 1 else 0 end as nw_isl
            from dp
        ), isl as (
            select {id_col}, nw, pos,
                   sum(nw_isl) over (partition by {id_col} order by pos
                                     rows unbounded preceding) as g
            from marked
        ), spans as (
            select {id_col}, min(nw) as nw, min(pos) as span_start,
                   least(max(pos) + {k - 1}, min(nw) - 1) as span_end
            from isl group by {id_col}, g
        )
        select {id_col},
               count(*)::bigint as n_dup_spans,
               round((sum(span_end - span_start + 1))::double
                     / min(nw), 6) as dup_word_frac
        from spans group by {id_col}
    """

"""Gopher-style repetition signals: the char-mass family.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", App. A1.1) filter
web documents on repetition: the fraction of *characters* occupied by the
most frequent n-gram (n = 2..4) and by duplicated n-grams (n = 5..10),
plus the duplicate-word fraction. The occurrence-based cousins
(``dup_{2,3,4}gram_frac``) already live in functions/text_heuristics and
feed the scoring UDF; this module adds the char-mass family as a
distributed operator whose one shuffle carries 8-byte packed keys, never
gram text.

The reference repo has no analogue (its quality rules are tabular
null/outlier checks); this is part of the LLM-data-pipeline surface the
builder brief asks for beyond reference parity.

Definitions (documented deviations from the paper, deterministic in both
engines):

- words: the shared ASCII-whitespace tokenizer (dedup._words).
- char base ``norm_len``: length of the whitespace-normalized text
  (words joined by single spaces) — NOT the raw text length, so the
  signal is invariant to whitespace style.
- ``dup_word_frac``: (total words - distinct words) / total words.
- ``top_{n}gram_char_frac`` (n=2..4): occurrences(most frequent n-gram)
  × chars(that n-gram) / norm_len, capped at 1 (overlapping occurrences
  can over-count). Tie-break: shortest gram, then smallest 48-bit md5
  prefix — OUR deterministic rule, identical in both engines.
- ``dup_{n}gram_char_frac`` (n=5..10): Σ over grams occurring ≥2 times of
  occurrences × chars / norm_len, capped at 1.

Key packing: each gram becomes ONE bigint
``(n * 1024 + min(glen, 1023)) * 2^48 + h48`` where ``h48`` is the first
12 md5 hex chars — pure integer arithmetic, bit-identical in Spark and
DuckDB, and any md5-prefix collision merges the same two grams in BOTH
engines, so oracle parity is exact by construction. Gram char length caps
at 1023 (10 bits); a >1023-char 10-gram under-counts its char mass —
irrelevant for natural text, documented here.

Scale shape: ONE explode of packed keys (8 B each; ~10× word count rows
per doc), hash-aggregate with map-side combine on (doc, key), a window on
(doc, n) for the tie-broken top gram, and a left join back to the pruned
source for the char base. No gram text ever crosses an exchange.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _words
from ..functions.text_heuristics import _duck_ngrams, _spark_ngrams

_POW48 = 1 << 48
_GLEN_CAP = 1023
NS_TOP = (2, 3, 4)
NS_DUP = (5, 6, 7, 8, 9, 10)
_ALL_NS = (1,) + NS_TOP + NS_DUP


def _keys_for_n(n: int, engine: str, words_col: str) -> str:
    """Packed-key array for one gram order (n=1 → the words themselves)."""
    if n == 1:
        grams = words_col
    elif engine == "spark":
        grams = _spark_ngrams(words_col, n)
    else:
        grams = _duck_ngrams(words_col, n)
    pack = f"({n} * 1024 + least(length(g), {_GLEN_CAP})) * {_POW48}"
    if engine == "spark":
        h = "cast(conv(substring(md5(g), 1, 12), 16, 10) as bigint)"
        return f"transform({grams}, g -> {pack} + {h})"
    h = "('0x' || substr(md5(g), 1, 12))::bigint"
    return f"list_transform({grams}, g -> {pack} + {h})"


def _all_keys(engine: str, words_col: str) -> str:
    parts = ", ".join(_keys_for_n(n, engine, words_col) for n in _ALL_NS)
    if engine == "spark":
        return f"flatten(array({parts}))"
    return f"flatten([{parts}])"


def _norm_len(engine: str, words_col: str) -> str:
    if engine == "spark":
        return f"length(concat_ws(' ', {words_col}))"
    # DuckDB array_to_string of an EMPTY list is NULL (CLAUDE.md)
    return f"coalesce(length(array_to_string({words_col}, ' ')), 0)"


def _final_exprs() -> list[tuple[str, str]]:
    """(alias, SQL) for the output columns — engine-identical strings
    (floor/least/case/cast-double/1e6 parse the same in Spark and DuckDB);
    6dp HALF_UP via floor(x*1e6 + 0.5)."""
    cols = [(
        "dup_word_frac",
        "case when coalesce(total_occ_1, 0) > 0 then "
        "floor((total_occ_1 - n_distinct_1) / cast(total_occ_1 as double) "
        "* 1e6 + 0.5) / 1e6 else cast(0 as double) end",
    )]
    for n in NS_TOP:
        cols.append((
            f"top_{n}gram_char_frac",
            f"case when norm_len > 0 and top_cnt_{n} is not null then "
            f"floor(least(cast(1 as double), top_cnt_{n} * top_glen_{n} "
            f"/ cast(norm_len as double)) * 1e6 + 0.5) / 1e6 "
            f"else cast(0 as double) end",
        ))
    for n in NS_DUP:
        cols.append((
            f"dup_{n}gram_char_frac",
            f"case when norm_len > 0 then "
            f"floor(least(cast(1 as double), coalesce(dup_chars_{n}, 0) "
            f"/ cast(norm_len as double)) * 1e6 + 0.5) / 1e6 "
            f"else cast(0 as double) end",
        ))
    return cols


def _pivot_cells() -> list[tuple[str, str, int]]:
    """(output column, per-n aggregate column, n) for the doc-level pivot."""
    cells = [("total_occ_1", "total_occ", 1), ("n_distinct_1", "n_distinct", 1)]
    for n in NS_TOP:
        cells += [(f"top_cnt_{n}", "top_cnt", n), (f"top_glen_{n}", "top_glen", n)]
    for n in NS_DUP:
        cells.append((f"dup_chars_{n}", "dup_chars", n))
    return cells


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals (see module docstring).

    Returns (id, dup_word_frac, top_{2,3,4}gram_char_frac,
    dup_{5..10}gram_char_frac), one row per input row; blank/null docs
    score 0 everywhere."""
    base = (df.withColumn("_w", F.expr(_words(text_col, "spark")))
              .selectExpr(id_col,
                          f"{_norm_len('spark', '_w')} as norm_len",
                          f"{_all_keys('spark', '_w')} as _keys"))
    # explode_OUTER + null filter ABOVE the Generate: plain explode triggers
    # InferFiltersFromGenerate, which inlines the whole key expression into
    # a size()>0 filter below the staging (the CLAUDE.md 16x gotcha)
    ex = (base.select(id_col, F.explode_outer("_keys").alias("k"))
              .where(F.col("k").isNotNull()))
    cnts = ex.groupBy(id_col, "k").agg(F.count(F.lit(1)).alias("cnt"))
    parsed = cnts.selectExpr(
        id_col,
        f"(k div {_POW48}) div 1024 as nn",
        f"(k div {_POW48}) % 1024 as glen",
        "cnt", "k")
    win = Window.partitionBy(id_col, "nn").orderBy(F.desc("cnt"), F.asc("k"))
    per_n = (parsed.withColumn("rn", F.row_number().over(win))
             .groupBy(id_col, "nn")
             .agg(F.sum("cnt").alias("total_occ"),
                  F.count(F.lit(1)).alias("n_distinct"),
                  F.sum(F.expr("case when cnt > 1 then cnt * glen else 0 end"))
                  .alias("dup_chars"),
                  F.max(F.expr("case when rn = 1 then cnt end")).alias("top_cnt"),
                  F.max(F.expr("case when rn = 1 then glen end")).alias("top_glen")))
    pivot = per_n.groupBy(id_col).agg(
        *[F.max(F.expr(f"case when nn = {n} then {src} end")).alias(out)
          for out, src, n in _pivot_cells()])
    return (base.select(id_col, "norm_len").join(pivot, id_col, "left")
            .selectExpr(id_col,
                        *[f"{sql} as {alias}" for alias, sql in _final_exprs()]))


def duckdb_gopher_repetition_sql(table: str, text_col: str = "text",
                                 id_col: str = "doc_id") -> str:
    """Engine twin of :func:`gopher_repetition` (same packed keys, same
    integer arithmetic, same tie-break — parity exact by construction)."""
    w = _words(text_col, "duck")
    nn = f"(k // {_POW48}) // 1024"
    pivot_cells = ", ".join(
        f"max(case when nn = {n} then {src} end) as {out}"
        for out, src, n in _pivot_cells())
    final = ", ".join(f"{sql} as {alias}" for alias, sql in _final_exprs())
    return f"""
        with base as (
            select {id_col},
                   {_norm_len('duck', w)} as norm_len,
                   {_all_keys('duck', w)} as keys
            from {table}
        ), ex as (
            select {id_col}, unnest(keys) as k from base
        ), cnts as (
            select {id_col}, k, count(*)::bigint as cnt
            from ex group by {id_col}, k
        ), parsed as (
            select {id_col}, {nn} as nn, (k // {_POW48}) % 1024 as glen,
                   cnt, k,
                   row_number() over (partition by {id_col}, {nn}
                                      order by cnt desc, k asc) as rn
            from cnts
        ), per_n as (
            select {id_col}, nn,
                   sum(cnt)::bigint as total_occ,
                   count(*)::bigint as n_distinct,
                   sum(case when cnt > 1 then cnt * glen else 0 end)::bigint
                       as dup_chars,
                   max(case when rn = 1 then cnt end) as top_cnt,
                   max(case when rn = 1 then glen end) as top_glen
            from parsed group by {id_col}, nn
        ), piv as (
            select {id_col}, {pivot_cells} from per_n group by {id_col}
        )
        select b.{id_col}, {final}
        from base b left join piv p using ({id_col})
    """

"""C4-style rule-based line and page cleaning (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning" §2.2 — the public C4 corpus
recipe; reference repo has no analogue, this is LLM-pipeline surface).

Rules, applied to newline-split lines of a document:

- a line is KEPT iff its trimmed text ends in a terminal punctuation
  mark (``. ! ? "``), contains at least ``MIN_LINE_WORDS`` (5) words,
  and does not contain the word "javascript" (case-insensitive);
- the PAGE is dropped iff the raw text contains "lorem ipsum"
  (case-insensitive), contains a curly brace ``{``, or fewer than
  ``MIN_KEPT_LINES`` (3) lines survive the line filter. Pages are
  flagged, never deleted — the caller cuts on ``page_keep``.

Scale shape (100 TB): a pure per-document projection — ZERO exchanges at
any scale, whole-stage-codegen end to end. The line array is staged as a
column and referenced twice (size + filter) so CollapseProject cannot
inline the split back into each lambda (see CLAUDE.md); every per-line
predicate references only the lambda element, never an outer expression.

Engine-identical by construction: the same rule fragments render to
Spark SQL and DuckDB SQL (regex portable across Java regex / RE2 /
Python re — no lookarounds, no escapes inside classes), so the DuckDB
twin is hash-comparable. DuckDB ``array_to_string`` on an EMPTY list is
NULL — the twin coalesces rebuilt text to ''.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_LINE_WORDS = 5
MIN_KEPT_LINES = 3

# terminal punctuation per C4: period, exclamation, question, close-quote
_TERMINAL_RE = '[.!?"]$'


def _word_count(engine: str, x: str) -> str:
    """Whitespace word count of a (possibly padded) line; 0 for blank."""
    if engine == "spark":
        return (f"case when trim({x}) = '' then 0 "
                f"else size(split(trim({x}), ' +')) end")
    return (f"case when trim({x}) = '' then 0 "
            f"else len(string_split_regex(trim({x}), ' +')) end")


def line_keep_pred(engine: str, x: str) -> str:
    """The C4 per-line keep predicate over a lambda element ``x``."""
    if engine == "spark":
        ends = f"trim({x}) rlike '{_TERMINAL_RE}'"
    else:
        ends = f"regexp_matches(trim({x}), '{_TERMINAL_RE}')"
    words = f"{_word_count(engine, x)} >= {MIN_LINE_WORDS}"
    no_js = f"lower({x}) not like '%javascript%'"
    return f"({ends}) and ({words}) and ({no_js})"


def page_reason_case(engine: str, t: str, kept_n: str) -> str:
    """Page-level drop reason (NULL = kept); precedence lorem > brace >
    too_few_lines, identical in both engines."""
    return (f"case when lower({t}) like '%lorem ipsum%' then 'lorem_ipsum' "
            f"when contains({t}, '{{') then 'brace' "
            f"when {kept_n} < {MIN_KEPT_LINES} then 'too_few_lines' "
            f"else null end")


def with_c4(df: DataFrame, text_col: str = "text",
            prefix: str = "c4_") -> DataFrame:
    """Append the C4 columns ``{prefix}n_lines``, ``{prefix}n_lines_kept``,
    ``{prefix}text_clean``, ``{prefix}drop_reason`` and
    ``{prefix}page_keep`` while preserving every input column — the form
    the filter pipeline composes with. Flag-never-drop: every input row
    survives; the caller cuts on ``{prefix}page_keep``."""
    cols = df.columns
    staged = df.selectExpr(
        "*", f"coalesce({text_col}, '') as _c4t")
    staged = staged.selectExpr("*", "split(_c4t, chr(10)) as _c4ls")
    pred = line_keep_pred("spark", "x")
    out = staged.selectExpr(
        "*",
        f"filter(_c4ls, x -> {pred}) as _c4keep")
    reason = page_reason_case("spark", "_c4t", "size(_c4keep)")
    return out.selectExpr(
        *cols,
        f"cast(size(_c4ls) as bigint) as {prefix}n_lines",
        f"cast(size(_c4keep) as bigint) as {prefix}n_lines_kept",
        f"array_join(_c4keep, chr(10)) as {prefix}text_clean",
        f"coalesce({reason}, 'kept') as {prefix}drop_reason",
        f"({reason}) is null as {prefix}page_keep")


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Apply the C4 line + page rules. Returns
    ``(id, n_lines, n_lines_kept, text_clean, drop_reason, page_keep)`` —
    every input doc survives (flag-never-drop); ``text_clean`` is the
    surviving lines rejoined in original order ('' when none)."""
    out = with_c4(df.select(id_col, text_col), text_col, prefix="c4_")
    return out.select(
        id_col,
        F.col("c4_n_lines").alias("n_lines"),
        F.col("c4_n_lines_kept").alias("n_lines_kept"),
        F.col("c4_text_clean").alias("text_clean"),
        F.col("c4_drop_reason").alias("drop_reason"),
        F.col("c4_page_keep").alias("page_keep"))


def duckdb_c4_sql(table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`c4_clean` over ``table`` (may be a
    parenthesised subquery)."""
    pred = line_keep_pred("duck", "x")
    reason = page_reason_case("duck", "_t", "len(_keep)")
    return f"""
        with _b as (select {id_col}, coalesce({text_col}, '') as _t
                    from {table}),
        _l as (select {id_col}, _t, string_split(_t, chr(10)) as _ls
               from _b),
        _k as (select {id_col}, _t, len(_ls)::bigint as n_lines,
                      list_filter(_ls, x -> {pred}) as _keep
               from _l)
        select {id_col}, n_lines, len(_keep)::bigint as n_lines_kept,
               coalesce(array_to_string(_keep, chr(10)), '') as text_clean,
               coalesce({reason}, 'kept') as drop_reason,
               ({reason}) is null as page_keep
        from _k
    """

"""Main-content HTML extraction: block-scored boilerplate removal
(VERDICT r05 #4).

Public-method lineage: jusText / Readability-style block scoring
(Pomikálek 2011; Arc90 Readability) — segment the page into text blocks at
block-level tag boundaries, drop chrome subtrees outright
(nav/header/footer/aside/script/style/form), then keep blocks that look
like prose: at least ``MIN_WORDS`` words and link density ≤ 1/3 (link
density = non-space chars inside ``<a>`` / non-space chars of the block).
Reference parity note: the reference has no HTML pipeline at all
(driver-side tabular system); this serves the WARC front edge
(sources/warc.py:176 kept nav/footer chrome in every downstream signal).

Two implementations, deliberately paired:

- ``main_text_from_html`` — an html.parser state machine (proper nesting,
  malformed-input tolerant). The SCALE path: batched per partition behind
  ONE Arrow crossing (``with_main_text``), like the scoring UDF.
- ``spark_main_text_expr`` / ``duckdb_main_text_expr`` — an
  engine-paired pure-SQL twin (regex subtree drop -> regex block split ->
  lambda filter/transform) used by the oracle-checked
  ``main_content_extract`` query. Simplified contract: well-formed,
  non-nested chrome (each drop-tag subtree closes before the next opens)
  and the 6-entity decode set of warc.html_payload_text.
  tests/test_html_extract.py pins parser ≡ twin on well-formed pages.

Link-density compare is integer-only (``3 * link_chars <= text_chars``),
so there is no float boundary to disagree on between engines.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_WORDS = 5  # a kept block has >= MIN_WORDS words (>= MIN_WORDS-1 spaces)

# subtrees removed wholesale (chrome / non-content)
DROP_TAGS = ("script", "style", "noscript", "nav", "header", "footer",
             "aside", "form", "head")
# tags whose open OR close ends the current text block
_BLOCK_ALT = ("p|div|li|h[1-6]|td|th|tr|table|ul|ol|article|section|main"
              "|blockquote|br|body|html")
_BLOCK_TAGS = {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td",
               "th", "tr", "table", "ul", "ol", "article", "section",
               "main", "blockquote", "br", "body", "html"}

# same decode set + order as warc.html_payload_text
_ENTITIES = ((r"&amp;", "&"), (r"&lt;", "<"), (r"&gt;", ">"),
             (r"&quot;", '"'), (r"&#39;", "'"), (r"&nbsp;", " "))


# ---------------------------------------------------------------------------
# Parser path (scale path: batched Python, proper nesting, malformed-safe)
# ---------------------------------------------------------------------------


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._link_chars = 0

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._buf)).strip()
        if text:
            self.blocks.append((text, self._link_chars))
        self._buf, self._link_chars = [], 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self.drop_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self.link_depth += 1

    def handle_startendtag(self, tag, attrs):  # <br/>
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self.link_depth = max(0, self.link_depth - 1)

    def handle_data(self, data):
        if self.drop_depth:
            return
        self._buf.append(data)
        if self.link_depth:
            self._link_chars += len(re.sub(r"\s", "", data))


def main_text_from_html(html: str, min_words: int = MIN_WORDS) -> str:
    """Kept prose blocks joined by newline. Never raises on malformed
    input — html.parser recovers, and a page that is all chrome returns
    ''."""
    p = _BlockParser()
    p.feed(html or "")
    p._flush()
    kept = []
    for text, link_chars in p.blocks:
        if text.count(" ") < min_words - 1:
            continue
        if 3 * link_chars > len(text.replace(" ", "")):
            continue
        kept.append(text)
    return "\n".join(kept)


def with_main_text(df: DataFrame, html_col: str = "html",
                   out_col: str = "main_text",
                   min_words: int = MIN_WORDS) -> DataFrame:
    """Batched extraction behind one Arrow crossing; html may be binary
    (UTF-8, invalid bytes replaced) or string. ``.asNondeterministic()``
    per the filter-pushdown UDF-cloning rule (CLAUDE.md)."""
    @F.pandas_udf("string")
    def _extract(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield pd.Series([
                main_text_from_html(
                    (bytes(v).decode("utf-8", "replace")
                     if isinstance(v, (bytes, bytearray)) else v),
                    min_words)
                if v is not None else None
                for v in s],
                index=s.index)

    _extract = _extract.asNondeterministic()
    return df.withColumn(out_col, _extract(F.col(html_col)))


# ---------------------------------------------------------------------------
# Engine-paired SQL twin (oracle-checkable; simplified flat-chrome contract)
# ---------------------------------------------------------------------------

def _sql_main_text(engine: str, html: str) -> str:
    """Expression (string SQL) computing the main text of ``html`` (an
    expression) under the block-scoring rules. ``engine`` in
    {'spark', 'duck'}; both emitted from this one builder so the dialects
    cannot drift."""
    if engine == "spark":
        ws = r"\\s"                 # Spark SQL literals eat one backslash

        def rere(x, pat, rep):
            return f"regexp_replace({x}, '{pat}', '{rep}')"

        def xform(arr, var, body):
            return f"transform({arr}, {var} -> {body})"

        def filt(arr, var, body):
            return f"filter({arr}, {var} -> {body})"

        join_ = "array_join({}, chr(10))"
    else:
        ws = r"\s"

        def rere(x, pat, rep):
            return f"regexp_replace({x}, '{pat}', '{rep}', 'g')"

        def xform(arr, var, body):
            return f"list_transform({arr}, {var} -> {body})"

        def filt(arr, var, body):
            return f"list_filter({arr}, {var} -> {body})"

        # array_to_string on an all-filtered (empty) list is NULL in
        # DuckDB; an all-chrome page must extract to '' in both engines
        join_ = "coalesce(array_to_string({}, chr(10)), '')"

    block_split = rf"(?i)</?(?:{_BLOCK_ALT})(?:{ws}[^>]*)?/?>"
    # 1) drop chrome subtrees + comments from the whole page
    cleaned = html
    for tag in DROP_TAGS:
        cleaned = rere(cleaned,
                       rf"(?is)<{tag}(?:{ws}[^>]*)?>.*?</{tag}{ws}*>", " ")
    cleaned = rere(cleaned, r"(?s)<!--.*?-->", " ")
    blocks = (f"string_split_regex(({cleaned}), '{block_split}')"
              if engine == "duck"
              else f"split(({cleaned}), '{block_split}')")

    # 2) per-block collapsed visible text (tags stripped, entities decoded)
    def text_of(x):
        t = rere(x, "<[^>]*>", " ")
        for pat, rep in _ENTITIES:
            t = rere(t, pat, rep.replace("'", "''"))
        return f"trim({rere(t, ws + '+', ' ')})"

    # 3) per-block link text length (non-space chars inside <a>..</a>)
    def linklen(x):
        links = (f"regexp_extract_all({x}, '(?is)<a[^>]*>(.*?)</a>', 1)")
        # DuckDB's array_to_string returns NULL for EMPTY lists (CLAUDE.md
        # gotcha) — a linkless block would NULL the whole keep predicate
        joined = (f"coalesce(array_to_string({links}, ''), '')"
                  if engine == "duck"
                  else f"array_join({links}, '')")
        return f"length({rere(joined, '<[^>]*>|' + ws, '')})"

    # keep: >= MIN_WORDS words (>= MIN_WORDS-1 single spaces after
    # collapse) and integer link-density bound 3*link <= nonspace chars
    def keep(x):
        t = text_of(x)
        return (f"(length({t}) - length(replace({t}, ' ', ''))"
                f" >= {MIN_WORDS - 1}"
                f" and 3 * {linklen(x)}"
                f" <= length(replace({t}, ' ', '')))")

    kept = filt(blocks, "x", keep("x"))
    texts = xform(kept, "y", text_of("y"))
    return join_.format(texts)


def spark_main_text_expr(html: str) -> str:
    return _sql_main_text("spark", html)


def duckdb_main_text_expr(html: str) -> str:
    return _sql_main_text("duck", html)


# deterministic chrome used by the oracle query to wrap the documents
# table's plain text into a realistic page (nav + linkfarm + article +
# footer); single-quoted SQL-literal safe
CHROME_PREFIX = (
    '<html><head><title>doc</title>'
    '<style>p { color: #222 }</style></head><body>'
    '<nav><a href="/">Home</a> <a href="/tags">Tags</a> '
    '<a href="/feed">Feed</a></nav>'
    '<div><ul><li><a href="/one">First related link</a></li>'
    '<li><a href="/two">Second related link</a></li>'
    '<li><a href="/three">Third related link here</a></li></ul></div>'
    '<article><p>')
CHROME_SUFFIX = (
    '</p></article>'
    '<footer>Copyright 2026 <a href="/tos">Terms</a> '
    '<a href="/privacy">Privacy</a></footer></body></html>')


def chrome_wrap_sql(text_expr: str) -> str:
    """Engine-neutral SQL wrapping ``text_expr`` in the fixed chrome."""
    return (f"('{CHROME_PREFIX}' || coalesce({text_expr}, '') "
            f"|| '{CHROME_SUFFIX}')")

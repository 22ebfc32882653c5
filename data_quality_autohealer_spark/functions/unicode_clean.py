"""Unicode hygiene: NFC normalization + C0 control-char stripping.

The standard pre-dedup/pre-tokenization cleanup every web corpus pipeline
runs (CCNet, Dolma, RefinedWeb all NFC- or NFKC-normalize): without it,
``café`` (precomposed U+00E9) and ``café`` (e + combining U+0301) hash to
different shingles, splitting duplicate clusters and inflating vocab.

No reference analogue (the reference is tabular). Two stages:

1. **Control strip** — remove C0 controls and DEL except ``\\t \\n \\r``
   (the C4 convention): a native regexp_replace, engine-paired, stays in
   whole-stage codegen.
2. **NFC normalization** — Spark has no native NFC; this is the sanctioned
   pandas-UDF slot (ONE Arrow crossing, iterator form so nothing
   re-initializes per batch, ``.asNondeterministic()`` against the
   filter-pushdown cloning gotcha). The oracle twin uses DuckDB's
   ``nfc_normalize``; both implement the same Unicode spec and are
   verified char-for-char in tests (Latin combiners, Hangul jamo,
   ligatures, fullwidth forms).

NFC (not NFKC) deliberately: NFC is lossless canonical composition; NFKC
folds compatibility forms (ﬁ→fi, fullwidth→ASCII) — a policy choice that
destroys information, left to callers via ``form='NFKC'``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# C0 controls + DEL, keeping \t \n \r. Valid in Java regex, RE2 and
# Python re (plain \xNN escapes in a class; no portability exceptions).
_CTRL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def strip_controls_sql(text: str, engine: str) -> str:
    """Engine-paired control-strip expression (null-preserving)."""
    if engine == "spark":
        # Spark SQL string literals eat one level of backslashes
        cls = _CTRL_CLASS.replace("\\", "\\\\")
        return f"regexp_replace({text}, '{cls}', '')"
    return f"regexp_replace({text}, '{_CTRL_CLASS}', '', 'g')"


def _nfc_udf(form: str):
    import unicodedata

    @F.pandas_udf(returnType=StringType())
    def _norm(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: unicodedata.normalize(form, t)
                        if t is not None else None)

    return _norm.asNondeterministic()


def with_unicode_clean(df: DataFrame, text_col: str = "text",
                       out_col: str = "text_clean",
                       form: str = "NFC") -> DataFrame:
    """Attach ``out_col`` = NFC(control-stripped ``text_col``). One native
    projection + one Arrow crossing; every other column passes through."""
    stripped = strip_controls_sql(text_col, "spark")
    return df.withColumn(out_col, _nfc_udf(form)(F.expr(stripped)))


def duckdb_unicode_clean_sql(text: str, engine: str = "duck") -> str:
    """Oracle-twin expression: DuckDB's utf8proc NFC over the same
    control-stripped input. (Named for symmetry; only the duck form is
    needed — the Spark side is the pandas UDF above.)"""
    return f"nfc_normalize({strip_controls_sql(text, 'duck')})"

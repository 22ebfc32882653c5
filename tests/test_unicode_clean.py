"""Unicode hygiene (functions/unicode_clean.py): NFC pandas-UDF ≡ DuckDB
utf8proc ≡ Python unicodedata on adversarial inputs, control-strip
semantics, null preservation, single Arrow crossing."""
from __future__ import annotations

import io
import unicodedata
from contextlib import redirect_stdout

import duckdb
import pandas as pd

from data_quality_autohealer_spark.functions import unicode_clean as uc

NASTY = [
    "café naïve",                   # combining accents
    "Ångström",                     # ring + diaeresis
    "각 stack",                 # Hangul jamo -> syllable
    "é́ double",                     # stacked combiners
    "ｆｕｌｌ width",           # fullwidth (NFC keeps)
    "ﬁle ligature",                        # fi ligature (NFC keeps)
    "bell\x07 null\x00 esc\x1b kept\t\n\r end",  # controls: strip vs keep
    "",
    None,
    "plain ascii stays put",
]


def _py_clean(t):
    if t is None:
        return None
    import re
    stripped = re.sub(uc._CTRL_CLASS, "", t)
    return unicodedata.normalize("NFC", stripped)


def test_parity_spark_duckdb_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NASTY)], "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in uc.with_unicode_clean(df).collect()}
    con = duckdb.connect()
    con.register("t_in", pd.DataFrame(
        {"doc_id": range(len(NASTY)), "text": NASTY}))
    duck = dict(con.execute(
        f"select doc_id, {uc.duckdb_unicode_clean_sql('text')} from t_in"
    ).fetchall())
    for i, t in enumerate(NASTY):
        want = _py_clean(t)
        assert got[i] == want, (i, t)
        assert duck[i] == want, (i, t)


def test_control_strip_keeps_tab_nl_cr(spark):
    df = spark.createDataFrame([(0, "a\tb\nc\rd\x00e\x07f\x7fg")],
                               "doc_id long, text string")
    out = uc.with_unicode_clean(df).collect()[0]["text_clean"]
    assert out == "a\tb\nc\rdefg"


def test_nfc_merges_duplicate_forms(spark):
    # the reason the op exists: composed and decomposed forms of the same
    # text must hash identically after cleaning
    df = spark.createDataFrame(
        [(0, "café"), (1, "café")], "doc_id long, text string")
    vals = {r["doc_id"]: r["text_clean"]
            for r in uc.with_unicode_clean(df).collect()}
    assert vals[0] == vals[1] == "café"


def test_single_arrow_crossing(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        uc.with_unicode_clean(df).explain("formatted")
    plan = buf.getvalue()
    # formatted explain prints each node twice (tree line + detail
    # section): one physical ArrowEvalPython == exactly 2 mentions
    assert plan.count("ArrowEvalPython") == 2, plan


def test_nfkc_option(spark):
    df = spark.createDataFrame([(0, "ﬁle ｆull")],
                               "doc_id long, text string")
    out = uc.with_unicode_clean(df, form="NFKC").collect()[0]["text_clean"]
    assert out == "file full"

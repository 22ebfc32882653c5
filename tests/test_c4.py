"""C4 rule-based line + page cleaning (functions/c4.py): every rule on a
crafted page, flag-never-drop, DuckDB twin parity, zero-Exchange plan."""
from __future__ import annotations

import duckdb
import pandas as pd

from data_quality_autohealer_spark.functions import c4

GOOD = "the quick brown fox jumps over the lazy dog."          # kept
BANG = "what a fine day this turned out to be!"                # kept
QUOTE = 'he said the words and then he left the "room."'       # kept
NO_PUNCT = "this line has plenty of words but no terminal mark"
SHORT = "too few words."
JS = "please enable JavaScript to view the comments powered here."
NAV = "home | products | about | contact"

PAGES = [
    # 0: clean page, 3 good lines -> kept
    (0, "\n".join([GOOD, NAV, BANG, QUOTE])),
    # 1: only 2 surviving lines -> too_few_lines
    (1, "\n".join([GOOD, NO_PUNCT, BANG, SHORT])),
    # 2: lorem ipsum anywhere kills the page (case-insensitive)
    (2, "\n".join([GOOD, "Lorem Ipsum dolor sit amet.", BANG, QUOTE])),
    # 3: curly brace kills the page
    (3, "\n".join([GOOD, "var x = { a: 1 };", BANG, QUOTE])),
    # 4: javascript line dropped but page survives on the other three
    (4, "\n".join([GOOD, JS, BANG, QUOTE])),
    # 5: empty text
    (5, ""),
    # 6: NULL text
    (6, None),
]


def _run(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, text string")
    return {r["doc_id"]: r for r in c4.c4_clean(df).collect()}


def test_line_rules(spark):
    got = _run(spark)
    assert got[0]["n_lines_kept"] == 3 and got[0]["page_keep"]
    assert got[0]["text_clean"] == "\n".join([GOOD, BANG, QUOTE])
    assert got[0]["drop_reason"] == "kept"
    # terminal punct + >=5 words both enforced
    assert got[1]["n_lines_kept"] == 2
    assert not got[1]["page_keep"]
    assert got[1]["drop_reason"] == "too_few_lines"
    # javascript line dropped, page survives
    assert got[4]["n_lines_kept"] == 3 and got[4]["page_keep"]
    assert JS not in got[4]["text_clean"]


def test_page_rules_precedence(spark):
    got = _run(spark)
    assert got[2]["drop_reason"] == "lorem_ipsum" and not got[2]["page_keep"]
    # the lorem line itself ends in '.' with >=5 words — it survives the
    # LINE filter; the PAGE flag is what kills it
    assert got[2]["n_lines_kept"] == 4
    assert got[3]["drop_reason"] == "brace" and not got[3]["page_keep"]


def test_flag_never_drop(spark):
    got = _run(spark)
    assert len(got) == len(PAGES)          # every input doc survives
    for i in (5, 6):                       # empty and NULL
        assert got[i]["n_lines_kept"] == 0
        assert got[i]["text_clean"] == ""
        assert got[i]["drop_reason"] == "too_few_lines"


def test_duckdb_twin_parity(spark):
    rows = [r.asDict() for r in sorted(
        _run(spark).values(), key=lambda r: r["doc_id"])]
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(
        {"doc_id": [i for i, _ in PAGES], "text": [t for _, t in PAGES]}))
    duck = con.execute(
        c4.duckdb_c4_sql("pages") + " order by doc_id").fetchall()
    cols = ["doc_id", "n_lines", "n_lines_kept", "text_clean",
            "drop_reason", "page_keep"]
    for want, got in zip(rows, duck):
        assert tuple(want[c] for c in cols) == got, want["doc_id"]


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, text string")
    plan = (c4.c4_clean(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# run_filter(c4=True) integration: pre-clean + c4.page decision merge
# ---------------------------------------------------------------------------

NAV_LINE = "home | products | about | contact"
LOREM_LINE = "lorem ipsum dolor sit amet."


def test_run_filter_c4_integration(spark, tmp_path):
    import pyspark.sql.functions as F

    from data_quality_autohealer_spark import synth
    from data_quality_autohealer_spark.plans.pipeline import run_filter
    from data_quality_autohealer_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), num_buckets=4)
    pages = synth.gen_pages_df(spark, 300, num_partitions=2)
    # synth text is one unterminated line — re-line it into three
    # punctuated chunks so good pages survive the C4 line filter
    relined = (
        "concat(substring(text, 1, 120), '.', chr(10), "
        "substring(text, 121, 120), '.', chr(10), "
        "substring(text, 241, 4000), '.')")
    urls = [r["url"] for r in pages.select("url").limit(2).collect()]
    u_nav, u_lorem = urls
    pages = pages.withColumn(
        "text",
        F.when(F.col("url") == u_nav,
               F.expr(f"concat({relined}, chr(10), '{NAV_LINE}')"))
        .when(F.col("url") == u_lorem,
              F.expr(f"concat({relined}, chr(10), '{LOREM_LINE}')"))
        .otherwise(F.expr(relined)))
    wh.write_pages(pages)

    summary = run_filter(wh, "c4run", c4=True)
    assert summary["docs_in"] == 300 and summary["docs_kept"] > 0
    clean = {r["url"]: r for r in wh.read_clean().collect()}
    # lorem page flagged c4.page and dropped
    assert u_lorem not in clean
    # nav page survives with the nav line cleaned out
    assert u_nav in clean
    assert NAV_LINE not in clean[u_nav]["text"]
    hits = (wh.read_metrics().where(F.col("run_id") == "c4run")
            .select(F.explode("rule_hits").alias("rule", "n"))
            .where(F.col("rule") == "c4.page")
            .agg(F.sum("n").alias("n")).collect()[0]["n"])
    assert hits and hits >= 1

    # same corpus WITHOUT c4: the lorem page passes (no other rule fires
    # on it), proving the flag is gated on the option
    summary2 = run_filter(wh, "plainrun", clean_table="clean2")
    assert summary2["docs_in"] == 300
    clean2 = {r["url"] for r in wh.read_clean("clean2").collect()}
    assert u_lorem in clean2

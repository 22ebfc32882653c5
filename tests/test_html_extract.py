"""Main-content extraction: the html.parser scale path and the
engine-paired SQL twin must agree on well-formed pages, the parser must
survive malformed input, and block scoring must drop chrome while keeping
prose."""

import duckdb
import pytest

from data_quality_autohealer_spark.functions import html_extract as hx

ARTICLE = ("This is a long enough paragraph of genuine article prose that "
           "block scoring should definitely keep around for training data.")

WELL_FORMED = [
    # chrome-wrapped article (exactly what synth/oracle pages look like)
    hx.CHROME_PREFIX + ARTICLE + hx.CHROME_SUFFIX,
    # short blocks dropped, entity decoding, linkfarm div dropped
    ('<html><body><nav><a href="/">Home</a> menu of links</nav>'
     '<p>Short one.</p>'
     '<p>A second real paragraph with more than five words in it &amp; '
     'an entity.</p>'
     '<div><a href="/x">a linkfarm block with many many words</a> '
     '<a href="/y">entirely made of anchors and yet more anchors</a></div>'
     '<footer>Copyright</footer></body></html>'),
    # prose with an inline link under the 1/3 density bound stays kept
    ('<body><p>Prose with an inline <a href="/ref">reference link</a> '
     'embedded in a much longer run of ordinary sentence text that '
     'keeps the link density low.</p></body>'),
    # all chrome -> empty extraction
    ('<body><nav>only navigation words here</nav>'
     '<footer>and footer text only</footer></body>'),
    '',
]


def test_parser_keeps_prose_drops_chrome():
    out = hx.main_text_from_html(WELL_FORMED[0])
    assert out == ARTICLE  # nav, linkfarm ul, footer all gone
    out2 = hx.main_text_from_html(WELL_FORMED[1])
    assert out2 == ("A second real paragraph with more than five words "
                    "in it & an entity.")
    assert "Short one" not in out2 and "linkfarm" not in out2
    assert "Home" not in out2 and "Copyright" not in out2


def test_parser_link_density_bound():
    kept = hx.main_text_from_html(WELL_FORMED[2])
    assert kept.startswith("Prose with an inline reference link")
    # a linky block of the same length is dropped
    linky = ('<body><p><a href="/a">Prose with an inline reference link '
             'embedded in a much longer run of ordinary sentence text '
             'that keeps the link density low.</a></p></body>')
    assert hx.main_text_from_html(linky) == ""


def test_parser_malformed_never_raises():
    pages = [
        "<p>unclosed paragraph with at least five words here",
        "<div><nav>nested <div>inside nav with words</div></nav>"
        "<p>real paragraph content with enough words to keep</p>",
        "</p></div>stray closers then a run of six plain words",
        "<a href='x'>" * 50 + "deep anchor nesting with many words",
        "<p>" + "word " * 10000 + "</p>",  # large block
    ]
    for p in pages:
        out = hx.main_text_from_html(p)  # must not raise
        assert isinstance(out, str)
    assert ("real paragraph content with enough words to keep"
            in hx.main_text_from_html(pages[1]))
    # chrome nested inside a dropped subtree stays dropped
    assert "inside nav" not in hx.main_text_from_html(pages[1])


def test_sql_twins_match_parser_and_each_other(spark):
    con = duckdb.connect()
    con.execute(
        "create table t as select * from (values "
        + ", ".join(f"({i}, {p!r})" for i, p in enumerate(WELL_FORMED))
        + ") v(i, h)")
    duck = dict(con.execute(
        f"select i, {hx.duckdb_main_text_expr('h')} from t").fetchall())
    df = spark.createDataFrame(list(enumerate(WELL_FORMED)),
                               "i long, h string")
    sp = {r["i"]: r["m"] for r in df.selectExpr(
        "i", f"{hx.spark_main_text_expr('h')} as m").collect()}
    for i, p in enumerate(WELL_FORMED):
        want = hx.main_text_from_html(p)
        assert sp[i] == duck[i] == want, (i, sp[i], duck[i], want)


def test_with_main_text_batched_udf(spark):
    rows = [(i, p.encode("utf-8")) for i, p in enumerate(WELL_FORMED)]
    df = spark.createDataFrame(rows, "i long, html binary")
    got = {r["i"]: r["main_text"]
           for r in hx.with_main_text(df).collect()}
    for i, p in enumerate(WELL_FORMED):
        assert got[i] == hx.main_text_from_html(p)


def test_warc_to_pages_main_mode_strips_synth_chrome(spark):
    """End-to-end: synth pages (chrome-wrapped html) -> WARC segment ->
    warc_to_pages default 'main' extraction recovers the article text
    without nav/footer chrome."""
    import numpy as np

    from data_quality_autohealer_spark import synth
    from data_quality_autohealer_spark.sources.warc import (
        read_warc, warc_to_pages, write_warc_file,
    )
    pdf = synth.gen_pages_pdf(np.arange(5))
    recs = []
    for i, r in enumerate(pdf.itertuples(index=False)):
        html = bytes(r.html)
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"Content-Length: %d\r\n\r\n" % len(html)) + html
        recs.append({"warc_type": "response", "url": r.url,
                     "warc_date": "2026-01-01T00:00:0%dZ" % i,
                     "record_id": f"<urn:uuid:{i}>",
                     "content_type": "application/http; msgtype=response",
                     "payload": payload})
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/seg.warc"
        write_warc_file(recs, path)
        got = {r["url"]: r["text"]
               for r in warc_to_pages(read_warc(spark, path)).collect()}
    for r in pdf.itertuples(index=False):
        extracted = got[r.url]
        assert "First related link" not in extracted      # linkfarm gone
        assert "Copyright 2026" not in extracted          # footer gone
        assert "Home" not in extracted.split("\n")[0][:20]
        # article text recovered (modulo whitespace collapse)
        want = " ".join(str(r.text).split())
        assert extracted == want, (r.url, extracted[:80], want[:80])


@pytest.mark.parametrize("bad", ["tagz", "", "parser"])
def test_warc_to_pages_rejects_unknown_mode(spark, bad):
    from data_quality_autohealer_spark.sources.warc import warc_to_pages
    df = spark.createDataFrame(
        [], "url string, warc_date string, payload binary")
    with pytest.raises(ValueError, match="text_extract"):
        warc_to_pages(df, text_extract=bad)

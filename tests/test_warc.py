"""WARC source round-trips: exact Content-Length parsing (adversarial
payloads), gzip-member concatenation, pages adaptation into the filter."""

import gzip

import pytest

from data_quality_autohealer_spark.sources.warc import (
    parse_warc_bytes, read_warc, warc_to_pages, write_warc_file,
)

_HTML = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         b"<html><head><style>p{color:red}</style>"
         b"<script>var x = '<p>not text</p>';</script></head>"
         b"<body><h1>Hello &amp; welcome</h1><p>plain  text</p></body></html>")

# payload containing the record delimiter AND blank lines: a naive
# split-on-"WARC/1.0" reader corrupts this; Content-Length parsing must not
_EVIL = (b"HTTP/1.1 200 OK\r\n\r\n"
         b"quoting a warc: WARC/1.0\r\nWARC-Type: response\r\n\r\n"
         b"Content-Length: 999\r\n\r\n trailing")


def _recs():
    return [
        {"warc_type": "warcinfo", "url": "", "warc_date":
         "2024-01-01T00:00:00Z", "record_id": "<urn:uuid:0>",
         "content_type": "application/warc-fields",
         "payload": b"software: test\r\n"},
        {"warc_type": "response", "url": "http://a.example/1",
         "warc_date": "2024-01-01T00:00:01Z", "record_id": "<urn:uuid:1>",
         "content_type": "application/http; msgtype=response",
         "payload": _HTML},
        {"warc_type": "response", "url": "http://a.example/2",
         "warc_date": "2024-01-01T00:00:02Z", "record_id": "<urn:uuid:2>",
         "content_type": "application/http; msgtype=response",
         "payload": _EVIL},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_exact(tmp_path, gz):
    path = str(tmp_path / ("seg.warc.gz" if gz else "seg.warc"))
    assert write_warc_file(_recs(), path, gzip_per_record=gz) == 3
    raw = open(path, "rb").read()
    if gz:
        # multi-member decompress handled inside the reader; do it by hand
        out, g = b"", gzip.GzipFile
        import io
        f = g(fileobj=io.BytesIO(raw))
        out = f.read()
        raw = out
    got = list(parse_warc_bytes(raw, "seg"))
    assert [r["warc_type"] for r in got] == ["warcinfo", "response",
                                             "response"]
    # byte-exact payloads, including the adversarial one
    assert got[2]["payload"] == _EVIL
    assert got[1]["url"] == "http://a.example/1"


def test_truncated_record_fails_loudly(tmp_path):
    path = str(tmp_path / "bad.warc")
    write_warc_file(_recs()[:1], path)
    raw = open(path, "rb").read()[:-10]
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(raw, "bad"))


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    for i in range(3):
        write_warc_file(_recs(), str(d / f"seg{i}.warc.gz"),
                        gzip_per_record=True)
    df = read_warc(spark, str(d))
    rows = df.collect()
    # warcinfo filtered out by default; 2 responses x 3 segments
    assert len(rows) == 6
    assert {r["warc_type"] for r in rows} == {"response"}
    assert len({r["src_file"] for r in rows}) == 3  # per-file rows tagged
    evil = [r for r in rows if r["url"].endswith("/2")][0]
    assert bytes(evil["payload"]) == _EVIL


def test_warc_to_pages_feeds_filter(spark, tmp_path):
    from data_quality_autohealer_spark.plans.pipeline import score_pages
    from data_quality_autohealer_spark.synth import PAGES_SCHEMA_DDL

    path = str(tmp_path / "seg.warc")
    write_warc_file([r for r in _recs() if r["warc_type"] == "response"],
                    path)
    pages = warc_to_pages(read_warc(spark, path), text_extract="tags")
    want = spark.createDataFrame([], PAGES_SCHEMA_DDL).schema
    assert [(f.name, f.dataType) for f in pages.schema] == [
        (f.name, f.dataType) for f in want]  # lit('und') is non-nullable
    rows = {r["url"]: r for r in pages.collect()}
    # tags mode: header block, tags, script/style bodies gone; entities
    # decoded; whitespace collapsed (chrome text retained)
    assert rows["http://a.example/1"]["text"] == "Hello & welcome plain text"
    assert rows["http://a.example/1"]["warc_ts"] is not None
    # main mode (the default): every block on this page is under the
    # 5-word prose floor, so block scoring extracts nothing — the
    # sub-heading fragments are exactly what the legacy strip leaked
    main = {r["url"]: r["text"]
            for r in warc_to_pages(read_warc(spark, path)).collect()}
    assert main["http://a.example/1"] == ""
    # the full scoring pipeline runs over WARC-derived pages unchanged
    scored = score_pages(pages)
    assert scored.count() == 2 and "keep" in scored.columns


def test_warc_ingest_cli_end_to_end(spark, tmp_path):
    """Crawl directory -> run_warc_ingest -> warehouse pages table -> the
    standard scorer; the full front edge of the pipeline in one pass."""
    import jobs.run_warc_ingest as ingest
    from data_quality_autohealer_spark.plans.pipeline import score_pages
    from data_quality_autohealer_spark.warehouse import Warehouse

    crawl = str(tmp_path / "crawl")
    wh_dir = str(tmp_path / "wh")
    summary = ingest.main([
        "--warc", crawl, "--warehouse", wh_dir, "--num-buckets", "4",
        "--synth-segments", "3", "--docs-per-segment", "40",
    ])
    assert summary["synth_records"] == 120
    assert summary["pages_written"] == 120
    wh = Warehouse(spark, wh_dir, num_buckets=4)
    scored = score_pages(wh.read_pages())
    kept = scored.where("keep").count()
    assert 0 < kept <= 120  # extracted text flows through the real filter

    # run the full filter: the clean table must ADOPT predicted languages
    # for the 'und'-claimed WARC pages (per-lang curation depends on it)
    from data_quality_autohealer_spark.plans.pipeline import run_filter
    run_filter(wh, "warc-r1")
    langs = {r["lang"] for r in wh.read_clean().select("lang").collect()}
    assert langs and "und" not in langs


def test_fractional_second_dates_and_html_is_body(spark, tmp_path):
    """WARC 1.1 fractional-second dates parse (truncated, not NULL) and
    the html column holds the HTTP BODY, not the header block."""
    path = str(tmp_path / "frac.warc")
    rec = dict(_recs()[1])
    rec["warc_date"] = "2024-01-01T00:00:01.123456Z"
    write_warc_file([rec], path)
    row = warc_to_pages(read_warc(spark, path)).collect()[0]
    assert row["warc_ts"] is not None
    assert row["warc_ts"].second == 1
    html = bytes(row["html"])
    assert html.startswith(b"<html>")      # header block stripped
    assert b"HTTP/1.1" not in html


def test_validate_after_warc_run_stays_ok(spark, tmp_path):
    """Adopted languages must not destabilize validation: re-scoring the
    clean table (which now carries predicted langs, so the en-stopword and
    langid rules CAN newly apply) keeps the re-drop rate at ~0."""
    import jobs.run_warc_ingest as ingest
    from data_quality_autohealer_spark.plans.pipeline import (
        run_filter, validate_run,
    )
    from data_quality_autohealer_spark.warehouse import Warehouse

    ingest.main(["--warc", str(tmp_path / "crawl"),
                 "--warehouse", str(tmp_path / "wh"), "--num-buckets", "4",
                 "--synth-segments", "2", "--docs-per-segment", "150"])
    wh = Warehouse(spark, str(tmp_path / "wh"), num_buckets=4)
    run_filter(wh, "w1")
    v = validate_run(wh, "w1")
    assert v["status"] == "ok" and v["revalidation_drop_rate"] <= 0.02


def test_write_warc_file_byte_deterministic(tmp_path):
    """Fixture stability: identical records must produce byte-identical
    .warc.gz files across runs (gzip member mtime pinned to 0) — the
    executor-side synth_segments writer relies on this."""
    from data_quality_autohealer_spark.sources.warc import write_warc_file

    recs = [{"warc_type": "response", "url": "http://e.com/a",
             "warc_date": "2026-01-01T00:00:00Z",
             "record_id": "<urn:uuid:0-0>",
             "content_type": "application/http; msgtype=response",
             "payload": b"HTTP/1.1 200 OK\r\n\r\nhello"}]
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc_file(recs, p1, gzip_per_record=True)
    write_warc_file(recs, p2, gzip_per_record=True)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_robots_noindex_detection_and_drop(spark, tmp_path):
    """noindex opt-outs (meta tag either attribute order, X-Robots-Tag
    header) drop at ingest by default; 'index,follow' and plain pages
    stay; keep_noindex retains everything."""
    from data_quality_autohealer_spark.sources.warc import robots_noindex

    def rec(i, payload):
        return {"warc_type": "response", "url": f"http://r.example/{i}",
                "warc_date": "2024-01-01T00:00:01Z",
                "record_id": f"<urn:uuid:r{i}>",
                "content_type": "application/http; msgtype=response",
                "payload": payload}

    body = b"<body><p>the quick brown fox jumps over the dog.</p></body>"
    recs = [
        rec(0, b"HTTP/1.1 200 OK\r\n\r\n<html><head>"
               b'<meta name="robots" content="noindex, nofollow">'
               b"</head>" + body + b"</html>"),
        rec(1, b"HTTP/1.1 200 OK\r\n\r\n<html><head>"
               b"<meta content='NOINDEX' name=robots>"     # reversed attrs
               b"</head>" + body + b"</html>"),
        rec(2, b"HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n\r\n"
               b"<html>" + body + b"</html>"),
        rec(3, b"HTTP/1.1 200 OK\r\n\r\n<html><head>"
               b'<meta name="robots" content="index, follow">'
               b"</head>" + body + b"</html>"),
        rec(4, b"HTTP/1.1 200 OK\r\n\r\n<html>" + body + b"</html>"),
        # 'noindex' as PROSE, not a directive: must not trigger
        rec(5, b"HTTP/1.1 200 OK\r\n\r\n<html><body>"
               b"<p>how to noindex a page properly.</p></body></html>"),
    ]
    path = str(tmp_path / "robots.warc")
    write_warc_file(recs, path)
    records = read_warc(spark, path)
    import pyspark.sql.functions as F
    flags = {r["url"]: r["f"] for r in records.select(
        "url", robots_noindex(F.col("payload")).alias("f")).collect()}
    assert [flags[f"http://r.example/{i}"] for i in range(6)] == [
        True, True, True, False, False, False]

    kept = {r["url"] for r in warc_to_pages(records).collect()}
    assert kept == {f"http://r.example/{i}" for i in (3, 4, 5)}
    all_pages = {r["url"]
                 for r in warc_to_pages(records,
                                        drop_noindex=False).collect()}
    assert len(all_pages) == 6

    # CLI surfaces the opt-out count
    import jobs.run_warc_ingest as ingest
    s = ingest.main(["--warc", path,
                     "--warehouse", str(tmp_path / "wh")])
    assert s["noindex_dropped"] == 3 and s["pages_written"] == 3

"""WARC source: the canonical web-crawl ingest format (Common Crawl ships
~1 GB ``.warc.gz`` segments), absent from the reference (its edges are CSV,
quality_service.py:65) but mandatory for a web-text pipeline.

Scale design — per-FILE parallelism, exact per-RECORD parsing:

- ``spark.read.format("binaryFile")`` lists files distributively; each
  executor task parses its whole file. This is how real Spark WARC jobs
  run: gzip'd WARC is NOT byte-splittable (records are concatenated gzip
  members), so the unit of parallelism at 100 TB is the file — thousands
  of ~1 GB segments saturate a 1000-executor cluster without any custom
  InputFormat.
- Parsing is Content-Length-driven (the only correct way): a delimiter
  split on ``WARC/1.0`` corrupts records whose HTTP payload contains that
  byte string. The parser walks header → declared body length → next
  record, so adversarial payloads round-trip exactly (tested).
- Records stream out of ``mapInPandas`` in bounded Arrow batches — a file
  never has to fit in one batch, only one record at a time.
- ``spark.sql.files.maxPartitionBytes`` does not split binaryFile rows;
  cap per-task memory by capping segment size at write time (the crawler
  convention) — documented here, enforced by ``write_warc_file`` callers.

``warc_to_pages`` + ``html_payload_text`` adapt response records to the
pipeline's pages schema (synth.PAGES_SCHEMA_DDL) with a JVM-side,
whole-stage-codegen HTML tag stripper — no Python in that hot path.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA_DDL = (
    "warc_type string, url string, warc_date string, record_id string, "
    "content_type string, payload binary, src_file string"
)

_CRLF = b"\r\n"


def parse_warc_bytes(data: bytes, src_file: str = "") -> Iterator[dict]:
    """Exact WARC parser over one (decompressed) file's bytes.

    Walks ``WARC/1.0`` header blocks and consumes exactly
    ``Content-Length`` payload bytes per record — payloads containing
    ``WARC/1.0`` or blank lines cannot desynchronize it. Yields one dict
    per record; unparseable trailing garbage raises ValueError (a truncated
    segment should fail the task loudly, not silently drop records).
    """
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"{src_file}: expected WARC version header at byte {pos}")
        hdr_end = data.index(_CRLF + _CRLF, pos)
        headers = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace")
        body_start = hdr_end + 4
        length = int(headers["content-length"])
        if body_start + length > n:
            raise ValueError(f"{src_file}: truncated record at byte {pos}")
        yield {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_type": headers.get("content-type", ""),
            "payload": data[body_start:body_start + length],
            "src_file": src_file,
        }
        pos = body_start + length


def _decompress(raw: bytes) -> bytes:
    """gzip-member-concatenation aware (the .warc.gz layout: one gzip
    member per record); plain bytes pass through."""
    if raw[:2] != b"\x1f\x8b":
        return raw
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(raw)) as g:  # reads ALL members
        while True:
            chunk = g.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",),
              batch_rows: int = 256) -> DataFrame:
    """Distributed WARC scan: one row per record of the given types.

    binaryFile gives (path, content) rows; mapInPandas parses each file and
    emits records in ``batch_rows``-bounded Arrow batches so a large
    segment never materializes as one giant batch.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    types = set(record_types)

    def _parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        buf: list[dict] = []
        for pdf in batches:
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(_decompress(bytes(raw)),
                                            src_file=fpath):
                    if types and rec["warc_type"] not in types:
                        continue
                    buf.append(rec)
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf)
                        buf = []
        if buf:
            yield pd.DataFrame(buf)

    return files.select("path", "content").mapInPandas(
        _parse, schema=WARC_SCHEMA_DDL)


def write_warc_file(records: Iterable[dict], path: str,
                    gzip_per_record: bool = False) -> int:
    """WARC sink for one segment file (driver-side; callers shard records
    across segment files to bound size — the crawler convention).
    ``gzip_per_record=True`` writes the Common Crawl .warc.gz layout (one
    gzip member per record). Returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            payload = rec["payload"]
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {rec.get('warc_type', 'response')}\r\n"
                f"WARC-Target-URI: {rec.get('url', '')}\r\n"
                f"WARC-Date: {rec.get('warc_date', '')}\r\n"
                f"WARC-Record-ID: {rec.get('record_id', '')}\r\n"
                f"Content-Type: {rec.get('content_type', '')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("utf-8")
            blob = head + payload + b"\r\n\r\n"
            # mtime=0: gzip otherwise stamps wall-clock time into the
            # member header, making byte-identical records produce
            # different files on every run (breaks fixture determinism)
            f.write(gzip.compress(blob, mtime=0) if gzip_per_record
                    else blob)
            n += 1
    return n


def http_body(payload: Column) -> Column:
    """HTTP-response payload -> the body (header block stripped), as a
    UTF-8-decoded string (invalid bytes replaced; binary substring isn't
    expressible JVM-side, and downstream consumers of the html column are
    text-oriented). Non-HTTP payloads pass through unchanged."""
    s = payload.cast("string")
    return F.regexp_replace(s, r"(?s)^HTTP/[^\r\n]*\r\n.*?\r\n\r\n", "")


# robots directives: <meta name=robots> with either attribute order, and
# the X-Robots-Tag HTTP response header (checked on the RAW payload, i.e.
# before http_body strips the header block). Java-regex-only (no oracle
# twin — ingest is a Spark-side source adapter), but RE2-safe by the
# repo's portability rule anyway: no backreferences, separate
# alternations per attribute order.
_ROBOTS_META_A = (r"(?is)<meta[^>]*name[ \t]*=[ \t]*[\"']?robots[\"']?"
                  r"[^>]*content[ \t]*=[ \t]*[\"']?([^\"'>]*)")
_ROBOTS_META_B = (r"(?is)<meta[^>]*content[ \t]*=[ \t]*[\"']?([^\"'>]*)"
                  r"[\"']?[^>]*name[ \t]*=[ \t]*[\"']?robots")
_XROBOTS_HDR = r"(?im)^x-robots-tag:[^\r\n]*"


def _robots_directive_hit(joined: Column) -> Column:
    """'noindex', or 'none' (which per the robots-meta spec implies
    noindex — ADVICE r06) as a whole directive token."""
    low = F.lower(joined)
    return low.contains("noindex") | low.rlike(
        r"(^|[ \t,;:])none([ \t,;:]|$)")


def robots_noindex(payload: Column) -> Column:
    """True when the page asks not to be used: a robots meta tag whose
    content says ``noindex`` (or ``none``, either attribute order) or an
    ``X-Robots-Tag`` response header saying so. Pure JVM regexps — one
    projection, no Python in the hot path.

    The header check runs ONLY on the pre-``\\r\\n\\r\\n`` HTTP header
    block (ADVICE r06: a body line quoting the header — common in web
    docs ABOUT the header — must not flag the page); the meta regexes run
    on the body."""
    s = payload.cast("string")
    header = F.regexp_extract(s, r"(?s)^(HTTP/.*?)\r\n\r\n", 1)
    body = http_body(s)
    joined = F.concat_ws(
        " ",
        F.regexp_extract(body, _ROBOTS_META_A, 1),
        F.regexp_extract(body, _ROBOTS_META_B, 1),
        F.regexp_extract(header, _XROBOTS_HDR, 0))
    return _robots_directive_hit(joined)


def html_payload_text(body: Column) -> Column:
    """HTML string -> visible text, entirely JVM-side (regexp chain inside
    whole-stage codegen — no Python in the hot path): drop script/style
    subtrees, strip tags, decode the common entities, collapse whitespace.
    Patterns follow CLAUDE.md's portability rule (no backreferences —
    script and style are separate alternations, RE2-safe)."""
    no_script = body
    for tag in ("script", "style"):
        no_script = F.regexp_replace(
            no_script, rf"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]*>", " ")
    ent = no_tags
    for pat, rep in ((r"&amp;", "&"), (r"&lt;", "<"), (r"&gt;", ">"),
                     (r"&quot;", '"'), (r"&#39;", "'"), (r"&nbsp;", " ")):
        ent = F.regexp_replace(ent, pat, rep)
    return F.trim(F.regexp_replace(ent, r"\s+", " "))


def warc_to_pages(records: DataFrame,
                  text_extract: str = "main",
                  drop_noindex: bool = True) -> DataFrame:
    """Adapt response records to the pipeline's pages schema
    (synth.PAGES_SCHEMA_DDL: url, warc_ts, html, text, lang) so a crawl
    segment feeds the quality filter directly.

    - ``html`` is the HTTP BODY (status line + headers stripped), matching
      the synth pages contract where html holds markup only.
    - ``text_extract``: ``'main'`` (default, VERDICT r05 #4) runs the
      block-scored boilerplate remover (functions/html_extract.py —
      nav/footer/linkfarm chrome dropped, prose kept; one Arrow
      crossing); ``'tags'`` is the legacy JVM-side tag strip that keeps
      chrome text (html_payload_text).
    - ``warc_ts``: WARC 1.1 allows fractional seconds; the fraction is
      truncated before parsing (whole-second precision) rather than
      silently yielding NULL on '...T00:00:00.123456Z'.
    - ``lang`` arrives unknown ('und') and is assigned by the langid stage
      downstream (the decision rule exempts an 'und' claim).
    - ``drop_noindex`` (default True): respect ``noindex`` robots
      directives (meta tag or X-Robots-Tag header) by excluding those
      pages at ingest — the publisher opted out; the ingest CLI surfaces
      the dropped count so the exclusion is never silent.
    """
    if text_extract not in ("main", "tags"):
        raise ValueError(f"text_extract must be 'main' or 'tags', "
                         f"got {text_extract!r}")
    if drop_noindex:
        records = records.where(~robots_noindex(F.col("payload")))
    ts = F.to_timestamp(
        F.regexp_replace(F.col("warc_date"), r"[.][0-9]+", ""),
        "yyyy-MM-dd'T'HH:mm:ssX")
    # body staged as a column (referenced twice) so the header-strip regex
    # runs once per row (CLAUDE.md CollapseProject gotcha)
    staged = records.withColumn("_body", http_body(F.col("payload")))
    if text_extract == "main":
        from ..functions.html_extract import with_main_text
        staged = with_main_text(staged, html_col="_body", out_col="_text")
        text_col = F.col("_text")
    else:
        text_col = html_payload_text(F.col("_body"))
    return staged.select(
        F.col("url"),
        ts.alias("warc_ts"),
        F.col("_body").cast("binary").alias("html"),
        text_col.alias("text"),
        F.lit("und").alias("lang"),
    )

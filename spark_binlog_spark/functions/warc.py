"""Dependency-free WARC (Web ARChive, ISO 28500) ingest + HTML text
extraction — the entry format of web-scale corpus curation (Common
Crawl ships WARC; every public LLM corpus pipeline starts here).

What's real here (stdlib only):
- WARC record parse: ``WARC/1.0``/``1.1`` version line, header block,
  ``Content-Length``-delimited payload, CRLF CRLF record separator —
  over PLAIN and GZIPPED inputs.  The WARC spec's storage
  recommendation is one gzip MEMBER per record, which is exactly what
  makes a .warc.gz streamable record-by-record: zlib's
  ``decompressobj(wbits=31)`` + ``unused_data`` walks the member
  chain without loading the decompressed whole.
- HTTP response split: status line + headers + body from ``response``
  record payloads.
- HTML -> text: stdlib ``html.parser`` extraction — script/style/head
  dropped, body text nodes whitespace-collapsed, <title> captured
  separately.  This is the boilerplate-strip INPUT stage; quality
  scoring/cleaning downstream is functions/text.py.

Scale shape: WARC files are read whole-file per task (Spark's
``binaryFile`` source; Common Crawl segments are ~1 GB, sized for
exactly this) and fan out to one row per record inside Arrow-batched
``mapInPandas`` — gzip members decode streamingly so peak memory is
one record, not one file.  Downstream text ops see an ordinary
(doc-per-row) DataFrame.  The reference has no web-ingest surface
(binlog/WAL CDC only); this module is part of the training-data
extension layer, like dedup/similarity/text.

Untrusted-input contract (same as the media decoders): malformed
bytes yield fewer records or flagged rows, never an exception.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAX_HEADER_BLOCK = 1 << 20  # defensive bound on a single header block
# per-member decompressed-size ceiling (ADVICE r11): WARC bytes are
# explicitly untrusted, and a whole-file single-member .warc.gz (legal
# per ISO 28500) or a crafted gzip bomb would otherwise inflate the
# entire stream in one decompress() call.  64 MiB comfortably holds any
# real record-per-member archive while bounding executor peak memory.
_MAX_MEMBER_BYTES = 64 << 20


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member's decompressed bytes (multi-member =
    record-per-member .warc.gz).  Truncated/corrupt members end the
    walk with what decoded so far.  Each member is inflated
    incrementally (``max_length``) and truncated at _MAX_MEMBER_BYTES;
    an oversized member yields its capped prefix and ENDS the walk
    (the next member boundary is unreachable without decompressing
    through the bomb), so peak memory stays bounded per record."""
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out = bytearray()
        try:
            out += d.decompress(rest, _MAX_MEMBER_BYTES)
            while (
                not d.eof and d.unconsumed_tail and len(out) < _MAX_MEMBER_BYTES
            ):
                out += d.decompress(
                    d.unconsumed_tail, _MAX_MEMBER_BYTES - len(out)
                )
        except zlib.error:
            return
        if not d.eof:
            yield bytes(out)  # truncated member OR capped bomb prefix
            return
        yield bytes(out + d.flush())
        rest = d.unused_data


def _parse_header_block(data: bytes, pos: int) -> tuple[dict, int] | None:
    """Parse a CRLF-terminated header block starting at ``pos``;
    returns ({lower-name: value}, payload_start) or None."""
    end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BLOCK)
    if end < 0:
        return None
    headers: dict[str, str] = {}
    for line in data[pos:end].split(b"\r\n"):
        if b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1", "replace"
        )
    return headers, end + 4


def parse_warc(data: bytes) -> list[dict]:
    """All WARC records in ``data`` (plain or gzipped).  Each record:
    warc_type, target_uri, warc_date, record_id, content_type (the
    WARC block's), content_length, payload (bytes)."""
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _gunzip_members(data)
    else:
        chunks = iter((data,))
    records: list[dict] = []
    for chunk in chunks:
        pos = 0
        n = len(chunk)
        while pos < n:
            # tolerate inter-record CRLF padding
            while chunk[pos : pos + 2] == b"\r\n":
                pos += 2
            if not chunk[pos : pos + 5] == b"WARC/":
                break
            line_end = chunk.find(b"\r\n", pos)
            if line_end < 0:
                break
            parsed = _parse_header_block(chunk, line_end + 2)
            if parsed is None:
                break
            headers, payload_start = parsed
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break
            if length < 0 or payload_start + length > n:
                break  # truncated record: keep the valid prefix
            records.append(
                {
                    "warc_type": headers.get("warc-type", ""),
                    "target_uri": headers.get("warc-target-uri"),
                    "warc_date": headers.get("warc-date"),
                    "record_id": headers.get("warc-record-id"),
                    "content_type": headers.get("content-type"),
                    "content_length": length,
                    "payload": chunk[payload_start : payload_start + length],
                }
            )
            pos = payload_start + length
    return records


def split_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """(status, headers, body) from an HTTP response payload; a payload
    without an HTTP status line comes back as (None, {}, payload)."""
    if not payload[:5] == b"HTTP/":
        return None, {}, payload
    line_end = payload.find(b"\r\n")
    if line_end < 0:
        return None, {}, payload
    parts = payload[:line_end].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    parsed = _parse_header_block(payload, line_end + 2)
    if parsed is None:
        return status, {}, b""
    headers, body_start = parsed
    return status, headers, payload[body_start:]


class _TextExtractor(HTMLParser):
    """Body text with script/style/head dropped and whitespace
    collapsed; <title> captured separately."""

    _SKIP = {"script", "style", "head", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_title = False
        self._text: list[str] = []
        self._title: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self._title.append(data)
        elif not self._skip_depth:
            self._text.append(data)

    @property
    def result(self) -> tuple[str, str]:
        return (
            " ".join(" ".join(self._text).split()),
            " ".join(" ".join(self._title).split()),
        )


def html_to_text(html: str) -> tuple[str, str]:
    """(text, title); parser errors degrade to empty strings, never
    raise (untrusted input)."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return "", ""
    return p.result


RECORD_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("record_idx", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("n_payload_bytes", LongType()),
    ]
)


def warc_extract(df: DataFrame, id_col: str = "file_id", content_col: str = "content") -> DataFrame:
    """One row per WARC record across the input blobs — response
    records get their HTTP payload split and (when HTML) body text +
    title extracted; non-response records carry type/URI metadata with
    empty text.  Arrow-batched mapInPandas; column pruning keeps
    non-content columns out of the transfer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, content in zip(pdf[id_col], pdf[content_col]):
                for idx, rec in enumerate(parse_warc(bytes(content))):
                    status, hh, body = (
                        split_http_response(rec["payload"])
                        if rec["warc_type"] == "response"
                        else (None, {}, b"")
                    )
                    ctype = hh.get("content-type")
                    text = title = ""
                    if status is not None and (ctype or "").startswith("text/html"):
                        text, title = html_to_text(body.decode("utf-8", "replace"))
                    rows.append(
                        {
                            "file_id": int(fid),
                            "record_idx": idx,
                            "warc_type": rec["warc_type"],
                            "target_uri": rec["target_uri"],
                            "http_status": status,
                            "http_content_type": ctype,
                            "title": title,
                            "text": text,
                            "n_payload_bytes": rec["content_length"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(run, RECORD_SCHEMA)


def read_warc_files(spark, path: str) -> DataFrame:
    """Ingest a directory of .warc / .warc.gz files as (file_id,
    content) via Spark's binaryFile source — one task per file, which
    matches how the format is sized (Common Crawl segments ~1 GB).
    file_id is a deterministic 48-bit hash of the path so downstream
    joins/dedup have a stable key without a driver-side listing."""
    from pyspark.sql import functions as F

    from spark_binlog_spark.functions.hashing import h48

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select(h48(F.col("path")).alias("file_id"), F.col("content"))
    )

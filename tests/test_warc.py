"""Batteries for the WARC ingest layer (functions/warc.py): an
independent spec-correct writer builds WARC files (plain and
member-per-record gzip, ISO 28500 layout), the parser must recover
every record, the HTTP/HTML extraction must produce exactly the
planted text, and mutation fuzz enforces never-raises."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_binlog_spark.functions.warc import (
    html_to_text,
    parse_warc,
    split_http_response,
)


def warc_record(warc_type, payload, uri=None, date="2026-01-01T00:00:00Z"):
    h = [f"WARC/1.0", f"WARC-Type: {warc_type}", f"WARC-Date: {date}",
         "WARC-Record-ID: <urn:uuid:0>", f"Content-Length: {len(payload)}"]
    if uri:
        h.insert(2, f"WARC-Target-URI: {uri}")
    return ("\r\n".join(h) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def http_response(body, status=200, ctype="text/html; charset=utf-8"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def html_page(title, text):
    return (
        f"<html><head><title>{title}</title><script>var x=1;</script>"
        f"</head><body>\n  <p>{text}</p>\n</body></html>"
    ).encode()


def warc_file(n_pages=3, gzipped=False):
    recs = [warc_record("warcinfo", b"software: test\r\n")]
    for i in range(n_pages):
        recs.append(
            warc_record(
                "response",
                http_response(html_page(f"page {i}", f"body text number {i}")),
                uri=f"http://example.com/{i}",
            )
        )
        recs.append(warc_record("request", b"GET / HTTP/1.1\r\n", uri=f"http://example.com/{i}"))
    if gzipped:
        return b"".join(gzip.compress(r) for r in recs)  # member per record
    return b"".join(recs)


class TestWarcParse:
    @pytest.mark.parametrize("gzipped", [False, True])
    def test_full_file_recovery(self, gzipped):
        recs = parse_warc(warc_file(n_pages=3, gzipped=gzipped))
        assert [r["warc_type"] for r in recs] == (
            ["warcinfo"] + ["response", "request"] * 3
        )
        responses = [r for r in recs if r["warc_type"] == "response"]
        assert [r["target_uri"] for r in responses] == [
            f"http://example.com/{i}" for i in range(3)
        ]
        status, hh, body = split_http_response(responses[1]["payload"])
        assert status == 200 and hh["content-type"].startswith("text/html")
        text, title = html_to_text(body.decode())
        assert text == "body text number 1" and title == "page 1"

    def test_truncated_tail_keeps_prefix(self):
        data = warc_file(n_pages=2)
        recs = parse_warc(data[:-60])  # cut into the last record
        assert len(recs) == 4  # warcinfo + (resp, req) + resp

    def test_truncated_gzip_member_keeps_prefix(self):
        data = warc_file(n_pages=2, gzipped=True)
        recs = parse_warc(data[:-30])
        assert 1 <= len(recs) < 5

    def test_binary_payload_and_non_http(self):
        recs = parse_warc(warc_record("resource", bytes(range(256)) * 4))
        assert len(recs) == 1 and recs[0]["content_length"] == 1024
        status, _, body = split_http_response(recs[0]["payload"])
        assert status is None and body == recs[0]["payload"]

    def test_html_extractor_drops_script_style_head(self):
        text, title = html_to_text(
            "<html><head><title>T</title><style>p{}</style></head>"
            "<body>keep <b>this</b><script>drop()</script> and  that</body></html>"
        )
        assert text == "keep this and that" and title == "T"

    @settings(max_examples=100, deadline=None)
    @given(pos=st.integers(0, 5000), val=st.integers(0, 255))
    def test_mutation_fuzz_plain_never_raises(self, pos, val):
        data = bytearray(warc_file(n_pages=2))
        data[pos % len(data)] = val
        recs = parse_warc(bytes(data))
        assert isinstance(recs, list)

    @settings(max_examples=100, deadline=None)
    @given(pos=st.integers(0, 5000), val=st.integers(0, 255))
    def test_mutation_fuzz_gzip_never_raises(self, pos, val):
        data = bytearray(warc_file(n_pages=2, gzipped=True))
        data[pos % len(data)] = val
        recs = parse_warc(bytes(data))
        assert isinstance(recs, list)


class TestWarcSparkOps:
    def test_warc_extract_and_file_reader(self, spark, tmp_path):
        from spark_binlog_spark.functions.warc import read_warc_files, warc_extract

        plain = warc_file(n_pages=2)
        gz = warc_file(n_pages=1, gzipped=True)
        (tmp_path / "a.warc").write_bytes(plain)
        (tmp_path / "b.warc.gz").write_bytes(gz)
        (tmp_path / "ignore.txt").write_bytes(b"not a warc")

        files = read_warc_files(spark, str(tmp_path))
        assert files.count() == 2

        out = warc_extract(files).collect()
        resp = [r for r in out if r["warc_type"] == "response"]
        assert len(resp) == 3
        assert {r["text"] for r in resp} == {
            "body text number 0", "body text number 1"
        } | {"body text number 0"}
        assert all(r["http_status"] == 200 for r in resp)
        # non-response records carry metadata, empty text
        reqs = [r for r in out if r["warc_type"] == "request"]
        assert len(reqs) == 3 and all(r["text"] == "" for r in reqs)


class TestGzipMemberCap:
    def test_oversized_member_truncated_at_cap(self, monkeypatch):
        """ADVICE r11: a single gzip member must never inflate
        unboundedly (whole-file single-member .warc.gz / gzip bomb).
        With the cap patched small, an oversized member yields its
        capped prefix and ENDS the walk; peak memory stays one cap."""
        from spark_binlog_spark.functions import warc as warc_mod

        monkeypatch.setattr(warc_mod, "_MAX_MEMBER_BYTES", 1 << 16)
        bomb = gzip.compress(b"\x00" * (1 << 22))  # 4 MiB member, 64 KiB cap
        tail = gzip.compress(warc_record("warcinfo", b"x: y\r\n"))
        members = list(warc_mod._gunzip_members(bomb + tail))
        assert len(members) == 1  # walk ends at the capped member
        assert len(members[0]) == 1 << 16

    def test_normal_members_unaffected_by_cap(self):
        """Record-per-member files far under the cap round-trip whole."""
        from spark_binlog_spark.functions import warc as warc_mod

        recs = [warc_record("warcinfo", b"a: 1\r\n"), warc_record("warcinfo", b"b: 2\r\n")]
        blob = b"".join(gzip.compress(r) for r in recs)
        assert list(warc_mod._gunzip_members(blob)) == recs

    def test_bomb_never_raises_through_parse(self, monkeypatch):
        from spark_binlog_spark.functions import warc as warc_mod

        monkeypatch.setattr(warc_mod, "_MAX_MEMBER_BYTES", 1 << 12)
        bomb = gzip.compress(b"A" * (1 << 20))
        assert parse_warc(bomb) == []  # capped prefix parses to no records

"""End-to-end web-corpus ingest: WARC files -> record extraction ->
URL canonicalization dedup -> exact text dedup — batch AND streaming
(file-watch binaryFile source + foreachBatch admission), asserting the
streamed store equals the batch computation.  This is the CommonCrawl
-> training-corpus front half; the back half (near-dedup,
decontaminate, prune, pack) is graded by q_curation_e2e."""

from __future__ import annotations

import gzip
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.test_warc import html_page, http_response, warc_record


def _warc_gz(pages):
    """pages: list of (uri, title, text) -> member-per-record .warc.gz"""
    recs = [warc_record("warcinfo", b"software: test\r\n")]
    for uri, title, text in pages:
        recs.append(warc_record("response", http_response(html_page(title, text)), uri=uri))
    return b"".join(gzip.compress(r) for r in recs)


PAGES_A = [
    # same page fetched under two tracking-parameterized URLs -> URL dedup
    ("http://A.io:80/x?utm_source=feed&k=1", "one", "alpha beta gamma"),
    ("http://a.io/x?k=1", "one", "alpha beta gamma"),
    ("http://a.io/y", "two", "delta epsilon zeta"),
]
PAGES_B = [
    # same TEXT under a genuinely different URL -> text dedup, not URL dedup
    ("http://b.io/copy", "copy", "alpha beta gamma"),
    ("http://b.io/new", "three", "eta theta iota"),
]


def _batch_survivors(spark, docs):
    """URL-canonical first-copy, then exact-text first-copy (both by
    smallest doc_id) — the reference computation both paths must match."""
    from spark_binlog_spark.functions.text import fingerprint
    from spark_binlog_spark.functions.url_ops import canonicalize_urls

    c = canonicalize_urls(docs, "target_uri")
    w_url = Window.partitionBy("canonical").orderBy("doc_id")
    url_kept = (
        c.withColumn("rn", F.row_number().over(w_url)).filter("rn = 1").drop("rn")
    )
    fp = fingerprint(url_kept)
    w_txt = Window.partitionBy("fp_md5").orderBy("doc_id")
    kept = (
        url_kept.join(
            fp.withColumn("rn", F.row_number().over(w_txt)).filter("rn = 1").select("doc_id"),
            "doc_id",
            "semi",
        )
    )
    return {r["text"] for r in kept.select("text").collect()}


class TestWebIngestPipeline:
    def _write_warcs(self, d):
        (d / "seg-a.warc.gz").write_bytes(_warc_gz(PAGES_A))
        (d / "seg-b.warc.gz").write_bytes(_warc_gz(PAGES_B))

    def _extract_docs(self, files_df):
        """records -> (doc_id, target_uri, text): response rows only,
        doc_id = deterministic order key (file, record)."""
        from spark_binlog_spark.functions.warc import warc_extract

        recs = warc_extract(files_df)
        return recs.filter("warc_type = 'response'").select(
            (F.col("file_id") * 1000 + F.col("record_idx")).alias("doc_id"),
            "target_uri",
            "text",
        )

    def test_batch_ingest_url_then_text_dedup(self, spark, tmp_path):
        from spark_binlog_spark.functions.warc import read_warc_files

        d = tmp_path / "warcs"
        d.mkdir()
        self._write_warcs(d)
        docs = self._extract_docs(read_warc_files(spark, str(d)))
        assert docs.count() == 5
        survivors = _batch_survivors(spark, docs)
        # URL dedup drops one of the two a.io/x fetches; text dedup
        # drops b.io/copy (same text, different URL)
        assert survivors == {"alpha beta gamma", "delta epsilon zeta", "eta theta iota"}

    def test_streaming_ingest_matches_batch(self, spark, tmp_path):
        """File-watch topology: the second WARC segment lands AFTER the
        stream starts; foreachBatch extracts records and admits into
        DedupIngestSink keyed on (canonical-URL fingerprint first, then
        text) — final store text set == the batch computation."""
        from spark_binlog_spark.functions.text import fingerprint
        from spark_binlog_spark.functions.url_ops import canonicalize_urls
        from spark_binlog_spark.functions.warc import read_warc_files
        from spark_binlog_spark.streaming.dedup_sink import DedupIngestSink

        d = tmp_path / "warcs"
        d.mkdir()
        (d / "seg-a.warc.gz").write_bytes(_warc_gz(PAGES_A))

        url_sink = DedupIngestSink(spark, str(tmp_path / "url_store"))
        txt_sink = DedupIngestSink(spark, str(tmp_path / "txt_store"))
        admitted_texts = {}  # doc_id -> text, driver-side capture for assert

        def admit(batch_df, batch_id):
            docs = self._extract_docs(batch_df).localCheckpoint()
            # stage 1: URL-level dedup — fingerprint the CANONICAL URL
            # (text col swapped for the url), admit first copies
            urls = canonicalize_urls(docs, "target_uri").select(
                "doc_id", F.col("canonical").alias("text")
            )
            before = {r["doc_id"] for r in url_sink.accepted().select("doc_id").collect()}
            url_sink(urls, batch_id)
            fresh_ids = {
                r["doc_id"] for r in url_sink.accepted().select("doc_id").collect()
            } - before
            # stage 2: text-level dedup over the URL survivors
            survivors = docs.filter(F.col("doc_id").isin([int(x) for x in fresh_ids]))
            t_before = {r["doc_id"] for r in txt_sink.accepted().select("doc_id").collect()}
            txt_sink(survivors, batch_id)
            t_after = {r["doc_id"] for r in txt_sink.accepted().select("doc_id").collect()}
            for r in survivors.collect():
                if r["doc_id"] in t_after - t_before:
                    admitted_texts[r["doc_id"]] = r["text"]

        from spark_binlog_spark.functions.hashing import h48

        stream = (
            spark.readStream.format("binaryFile")
            .option("pathGlobFilter", "*.warc*")
            .schema("path string, modificationTime timestamp, length long, content binary")
            .load(str(d))
            .select(h48(F.col("path")).alias("file_id"), "content")
        )
        q = (
            stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline and len(admitted_texts) < 2:
                time.sleep(0.3)
            # second segment lands mid-stream
            (d / "seg-b.warc.gz").write_bytes(_warc_gz(PAGES_B))
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline and len(admitted_texts) < 3:
                time.sleep(0.3)
        finally:
            q.stop()

        batch_docs = self._extract_docs(read_warc_files(spark, str(d)))
        assert set(admitted_texts.values()) == _batch_survivors(spark, batch_docs)

"""Streaming NEAR-duplicate admission sink: per micro-batch, LSH band
join the batch's MinHash signatures against a banded signature index of
everything admitted so far; drop batch docs that agree with any
admitted doc (or an earlier doc in their own batch) on >= ``min_agree``
of ``n_hashes`` bands; append the survivors' bands to the index.

The streaming counterpart of the batch MinHash-LSH pair query
(functions/dedup.py ``minhash_candidate_pairs``), with the same
linear-permutation signature family — and the near-dup sibling of the
exact-fingerprint ``DedupIngestSink``.  Identical texts agree on all
bands, so near-dup admission subsumes exact admission.

Admission semantics (the spec the oracle mirrors) — batch-sequential:
  * the index holds ONLY previously-ADMITTED docs' signatures;
  * a batch doc is rejected iff (a) some single index doc agrees with
    it on >= min_agree bands, or (b) some smaller-doc_id doc IN ITS OWN
    BATCH agrees on >= min_agree bands (deterministic in-batch tie
    rule — compared against all smaller ids, admitted or not);
  * survivors' signature rows are appended, becoming the index for the
    next batch.

Exactly-once: foreachBatch is at-least-once.  Publication is ATOMIC
PER BATCH — the batch's signature rows are written into an aside dir
and published with ONE ``os.replace`` directory rename (unique name
per attempt), so a crash mid-publish leaves nothing visible and the
replay recomputes the identical admitted set.  A replayed
already-published batch self-matches the index on all n_hashes bands
(n_hashes >= min_agree) and admits nothing.  The index-side agree
count uses countDistinct(seed) so even duplicate signature rows (two
successful publishes of one attempt can't happen, but belt+braces)
never inflate agreement.

Scale — the index is banded AND bucketed: rows live under
``d_b<batch>_<attempt>/bucket=K`` with ``K = minhash % n_buckets``,
and the admission join reads ONLY the bucket dirs the batch's own
band values hash into (the probe key IS the bucket key).  Per-batch
read I/O is O(index ∩ batch buckets), write I/O O(admitted batch);
nothing is ever rewritten.  The batch side of the band join is
micro-batch-sized and broadcast, so the index slice is never shuffled.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.functions.dedup import N_MINHASH, minhash_signatures
from spark_binlog_spark.streaming.swap import remove_with_checksum

SIG_COLS = ["doc_id", "seed", "minhash"]
SIG_SCHEMA = "doc_id long, seed int, minhash long"


class NearDupIngestSink:
    """foreachBatch sink: admit only documents that are not MinHash
    near-duplicates of anything admitted so far (reference-free
    training-data-pipeline machinery, like DedupIngestSink)."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        min_agree: int = 2,
        n_hashes: int = N_MINHASH,
        n_buckets: int = 16,
        compact_threshold: int = 8,
    ):
        if min_agree > n_hashes:
            raise ValueError("min_agree must be <= n_hashes for replay idempotence")
        self.spark = spark
        self.store_dir = store_dir
        self.min_agree = min_agree
        self.n_hashes = n_hashes
        self.n_buckets = n_buckets
        self.compact_threshold = compact_threshold
        self.admitted_batches: list[tuple[int, int]] = []  # (batch_id, n_admitted)
        # (batch_id, buckets_scanned, files_scanned) — the pruning receipt
        self.scan_stats: list[tuple[int, int, int]] = []
        self.n_compactions = 0
        os.makedirs(store_dir, exist_ok=True)
        # a crash before the publish rename leaves only an aside dir;
        # nothing of that attempt is visible — drop the debris
        for leftover in [p for p in os.listdir(store_dir) if p.startswith("_aside")]:
            shutil.rmtree(os.path.join(store_dir, leftover), ignore_errors=True)
        # ...and a crashed compaction leaves only a hidden .tmp file
        for tmp in glob.glob(os.path.join(store_dir, "d_*", "bucket=*", "_*.tmp")):
            os.remove(tmp)
        # a crash between a compaction's file deletes and its dir prune
        # leaves empty dirs — sweep them on resume
        self._prune_empty_dirs()

    @property
    def admitted_rows(self) -> int:
        return sum(n for _, n in self.admitted_batches)

    def index(self) -> DataFrame:
        """Full signature index (every admitted doc × n_hashes bands)."""
        return (
            self.spark.read.schema(SIG_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self.store_dir)
        )

    def accepted(self) -> DataFrame:
        """Admitted doc_ids (distinct over the signature index)."""
        return self.index().select("doc_id").distinct()

    def _index_for(self, buckets: list[int], batch_id: int) -> DataFrame:
        """Index slice for the admission band join: only the bucket
        dirs this batch's band values hash into, across all published
        batch deltas."""
        paths = sorted(
            p
            for b in buckets
            for p in glob.glob(os.path.join(self.store_dir, "d_*", f"bucket={b}"))
        )
        n_files = sum(len(glob.glob(os.path.join(p, "*.parquet"))) for p in paths)
        self.scan_stats.append((batch_id, len(paths), n_files))
        if not paths:
            return self.spark.createDataFrame([], SIG_SCHEMA)
        return self.spark.read.schema(SIG_SCHEMA).parquet(*paths)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        sig = minhash_signatures(batch_df, n_hashes=self.n_hashes).persist()
        try:
            # ≤ n_buckets scalars to the driver — a plan step, not data
            buckets = sorted(
                r[0]
                for r in sig.select(
                    F.pmod(F.col("minhash"), F.lit(self.n_buckets)).cast("int").alias("b")
                )
                .distinct()
                .collect()
            )
            index_slice = self._index_for(buckets, batch_id)
            # (a) reject: some single INDEX doc agrees on >= min_agree
            # bands.  Batch side broadcast — the index slice never
            # shuffles; countDistinct(seed) so duplicate index rows
            # can never inflate agreement.
            idx_reject = (
                index_slice.join(
                    F.broadcast(sig.select(F.col("doc_id").alias("b_doc"), "seed", "minhash")),
                    ["seed", "minhash"],
                )
                .groupBy("b_doc", "doc_id")
                .agg(F.countDistinct("seed").alias("n_agree"))
                .filter(F.col("n_agree") >= self.min_agree)
                .select(F.col("b_doc").alias("doc_id"))
                .distinct()
            )
            # (b) reject: some smaller-doc_id doc in the SAME batch
            # agrees on >= min_agree bands (deterministic tie rule)
            a, b = sig.alias("a"), sig.alias("b")
            inb_reject = (
                a.join(
                    b,
                    (F.col("a.seed") == F.col("b.seed"))
                    & (F.col("a.minhash") == F.col("b.minhash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
                .agg(F.count("*").alias("n_agree"))
                .filter(F.col("n_agree") >= self.min_agree)
                .select(F.col("db").alias("doc_id"))
                .distinct()
            )
            admitted = (
                sig.join(idx_reject, "doc_id", "left_anti")
                .join(inb_reject, "doc_id", "left_anti")
                .withColumn(
                    "bucket", F.pmod(F.col("minhash"), F.lit(self.n_buckets)).cast("int")
                )
                .persist()
            )
            try:
                n_docs = admitted.select("doc_id").distinct().count()
                if n_docs == 0:
                    self.admitted_batches.append((batch_id, 0))
                    return
                # atomic publish: bucket-partitioned aside dir, then ONE
                # directory rename (unique per attempt — never collides)
                attempt = uuid.uuid4().hex[:8]
                aside = os.path.join(self.store_dir, f"_aside_b{batch_id}_{attempt}")
                # repartition by bucket first: ONE file per touched
                # bucket per batch, not one per task × bucket pair
                admitted.select(*SIG_COLS, "bucket").repartition("bucket").write.partitionBy(
                    "bucket"
                ).mode("overwrite").parquet(aside)
                # Spark leaves a _SUCCESS marker file; recursiveFileLookup
                # would try to read it as parquet — drop it before publish
                for marker in glob.glob(os.path.join(aside, "_*")):
                    os.remove(marker)
                os.replace(aside, os.path.join(self.store_dir, f"d_b{batch_id}_{attempt}"))
                self.admitted_batches.append((batch_id, n_docs))
                # only the buckets this batch touched can have grown
                self._maybe_compact(buckets)
            finally:
                admitted.unpersist()
        finally:
            sig.unpersist()

    def _maybe_compact(self, buckets: list[int]) -> None:
        """Per-bucket compaction (same contract as DedupIngestSink's):
        once a bucket's band rows are spread over ``compact_threshold``
        delta files, merge them into one — this bounds the band join's
        file opens over a long-running ingest.

        DISTRIBUTED merge: every over-threshold bucket's files are read
        as ONE Spark job (per-bucket file lists unioned with a literal
        ``bucket`` column — the ``d_*`` delta level isn't hive-style, so
        no basePath inference), ``repartition("bucket")`` gives one
        task and one output file per bucket, and executors do all the
        reading/re-encoding.  The driver only lists names and performs
        ONE directory rename: no data row moves through it, matching
        the reference's server-side flush maintenance
        (OriginalSourceServerInExecutor.scala:132-147).

        Crash-safe, same protocol as batch publish: the job writes an
        ``_aside*`` dir (swept at restart), published atomically with
        one ``os.replace`` as a ``d_compact_*`` delta BEFORE the olds
        are deleted; a crash leaves duplicate rows at worst, which
        countDistinct(seed) in admission and accepted()'s distinct both
        absorb."""
        to_merge: dict[int, list[str]] = {}
        for b in buckets:
            files = sorted(
                glob.glob(os.path.join(self.store_dir, "d_*", f"bucket={b}", "*.parquet"))
            )
            if len(files) >= self.compact_threshold:
                to_merge[b] = files
        if not to_merge:
            return
        merged = None
        for b, files in sorted(to_merge.items()):
            part = (
                self.spark.read.schema(SIG_SCHEMA)
                .parquet(*files)
                .withColumn("bucket", F.lit(b).cast("int"))
            )
            merged = part if merged is None else merged.unionByName(part)
        token = uuid.uuid4().hex[:8]
        aside = os.path.join(self.store_dir, f"_aside_compact_{token}")
        merged.repartition("bucket").write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(aside)
        for marker in glob.glob(os.path.join(aside, "_*")):
            os.remove(marker)
        os.replace(aside, os.path.join(self.store_dir, f"d_compact_{token}"))
        for b, files in sorted(to_merge.items()):
            for f in files:
                remove_with_checksum(f)
            self.n_compactions += 1
        self._prune_empty_dirs()

    def _prune_empty_dirs(self) -> None:
        """Remove bucket/delta directories DRAINED by compaction —
        without this the store accrues one dead dir per batch and per
        compaction FOREVER, and every _index_for glob and recursive
        index() listing walks the graveyard (re-introducing the
        O(batches) planning cost compaction exists to bound).

        'Drained' = no ``*.parquet`` left: the local committer leaves
        hidden ``.*.crc``/``._SUCCESS.crc`` checksum debris behind the
        data files (invisible to Spark reads, which skip dot/underscore
        files), so a plain rmdir would never fire.  Only dirs with zero
        parquet files are removed — pruning can never drop data."""
        for bdir in glob.glob(os.path.join(self.store_dir, "d_*", "bucket=*")):
            if not glob.glob(os.path.join(bdir, "*.parquet")):
                shutil.rmtree(bdir, ignore_errors=True)
        for ddir in glob.glob(os.path.join(self.store_dir, "d_*")):
            if not glob.glob(os.path.join(ddir, "bucket=*")):
                shutil.rmtree(ddir, ignore_errors=True)


def run_neardup_ingest(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
    min_agree: int = 2,
    max_files_per_trigger: int = 1,
    n_buckets: int = 16,
) -> NearDupIngestSink:
    """Stream a directory of document files (one micro-batch per file
    by default) through the near-dup admission sink via availableNow;
    returns the sink whose ``accepted()`` is the admitted doc set."""
    sink = NearDupIngestSink(spark, store_dir, min_agree=min_agree, n_buckets=n_buckets)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink

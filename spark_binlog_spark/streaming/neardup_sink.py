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
PER BATCH via the shared ``BucketedDeltaStore`` (aside write + one
``os.replace`` dir rename, unique name per attempt), so a crash
mid-publish leaves nothing visible and the replay recomputes the
identical admitted set.  A replayed already-published batch
self-matches the index on all n_hashes bands (n_hashes >= min_agree)
and admits nothing.  The index-side agree count uses
countDistinct(seed) so even duplicate signature rows (two successful
publishes of one attempt can't happen, but belt+braces) never inflate
agreement.

Scale — the index is banded AND bucketed: rows live under
``d_b<batch>_<attempt>/bucket=K`` with ``K = minhash % n_buckets``,
and the admission join reads ONLY the bucket dirs the batch's own
band values hash into (the probe key IS the bucket key).  Per-batch
read I/O is O(index ∩ batch buckets), write I/O O(admitted batch);
nothing is ever rewritten.  The batch side of the band join is
micro-batch-sized and broadcast, so the index slice is never shuffled.
Compaction is a distributed Spark job (see banded_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.functions.dedup import N_MINHASH, minhash_signatures
from spark_binlog_spark.streaming.banded_store import BucketedDeltaStore

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
        self.store = BucketedDeltaStore(
            spark, store_dir, SIG_SCHEMA, n_buckets, compact_threshold
        )
        self.admitted_batches: list[tuple[int, int]] = []  # (batch_id, n_admitted)

    @property
    def admitted_rows(self) -> int:
        return sum(n for _, n in self.admitted_batches)

    @property
    def scan_stats(self) -> list[tuple[int, int, int]]:
        return self.store.scan_stats

    @property
    def n_compactions(self) -> int:
        return self.store.n_compactions

    def index(self) -> DataFrame:
        """Full signature index (every admitted doc × n_hashes bands)."""
        return self.store.read_all()

    def accepted(self) -> DataFrame:
        """Admitted doc_ids (distinct over the signature index)."""
        return self.index().select("doc_id").distinct()

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
            index_slice = self.store.slice_for(buckets, batch_id)
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
                self.store.publish(admitted, SIG_COLS, batch_id)
                self.admitted_batches.append((batch_id, n_docs))
                # only the buckets this batch touched can have grown
                self.store.maybe_compact(buckets)
            finally:
                admitted.unpersist()
        finally:
            sig.unpersist()


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

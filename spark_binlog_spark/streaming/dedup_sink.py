"""Streaming ingest-dedup sink: admit each micro-batch's documents
only if their normalized-content fingerprint is new.

The streaming counterpart of the batch ``q_incremental_dedup`` shape
(anti-join against a fingerprint index): the ACCEPTED STORE *is* the
index — admitted docs are stored with their fingerprint column, so one
relation serves both roles and the whole admission step is one
anti-join + one in-batch first-copy window per micro-batch.  No
full-corpus rescan ever happens.

Exactly-once: foreachBatch is at-least-once under hard crashes.  The
sink is idempotent because admission anti-joins against the SWAPPED-IN
store: a replayed batch finds its own fingerprints already present and
admits nothing.  The store update is a single crash-safe directory
swap (``swap.safe_swap`` — a complete copy exists at every instant;
``recover_dir`` repairs any crash point at construction), so there is
no window where the docs landed but their fingerprints did not.

Scale: the batch side is small (one micro-batch); the store side is
the corpus-so-far.  The anti-join's shuffle is bounded by the batch —
at 100 TB keep the store bucketed by ``fp48 % N`` so the join prunes to
matching buckets (same layout note as the batch query); the fixture
store stays a flat parquet dir for container-freedom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_binlog_spark.functions.text import fingerprint
from spark_binlog_spark.streaming.swap import recover_dir, safe_swap

ACCEPTED_COLS = ["doc_id", "fp_md5", "fp48"]


class DedupIngestSink:
    """foreachBatch sink: dedup a document stream against everything
    accepted so far (reference-free — this is pipeline machinery the
    training-data extensions add on top of the CDC engine)."""

    def __init__(self, spark: SparkSession, store_dir: str):
        import os

        self.spark = spark
        self.store_dir = store_dir
        self.admitted_batches: list[tuple[int, int]] = []  # (batch_id, n_admitted)
        recover_dir(store_dir)
        if not os.path.isdir(store_dir):
            empty = spark.createDataFrame([], "doc_id long, fp_md5 string, fp48 long")
            empty.write.mode("overwrite").parquet(store_dir)

    @property
    def admitted_rows(self) -> int:
        return sum(n for _, n in self.admitted_batches)

    def accepted(self) -> DataFrame:
        return self.spark.read.schema("doc_id long, fp_md5 string, fp48 long").parquet(
            self.store_dir
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        fp = fingerprint(batch_df).persist()
        try:
            # in-batch first copy (smallest doc_id per fingerprint)...
            w = Window.partitionBy("fp_md5").orderBy("doc_id")
            firsts = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
            # ...then anti-join the store-so-far; replayed batches find
            # their own fingerprints and admit nothing (idempotence)
            fresh = firsts.join(self.accepted(), "fp_md5", "left_anti").select(*ACCEPTED_COLS)
            n = fresh.count()
            if n == 0:
                self.admitted_batches.append((batch_id, 0))
                return
            tmp = self.store_dir + f".b{batch_id}"
            self.accepted().select(*ACCEPTED_COLS).unionByName(fresh).write.mode(
                "overwrite"
            ).parquet(tmp)
            safe_swap(self.store_dir, tmp)
            self.admitted_batches.append((batch_id, n))
        finally:
            fp.unpersist()


def run_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DedupIngestSink:
    """Stream a directory of document files (one micro-batch per file
    by default) through the dedup sink via availableNow; returns the
    sink whose ``accepted()`` is the deduplicated corpus."""
    sink = DedupIngestSink(spark, store_dir)
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

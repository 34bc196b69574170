"""Streaming ingest-dedup sink: admit each micro-batch's documents
only if their normalized-content fingerprint is new.

The streaming counterpart of the batch ``q_incremental_dedup`` shape
(anti-join against a fingerprint index): the ACCEPTED STORE *is* the
index — admitted docs are stored with their fingerprint column, so one
relation serves both roles and the whole admission step is one
anti-join + one in-batch first-copy window per micro-batch.  No
full-corpus rescan ever happens.

Exactly-once: foreachBatch is at-least-once under hard crashes.  The
sink is idempotent because admission anti-joins against the published
store: a replayed batch finds its own fingerprints already present and
admits nothing.  Publication is APPEND-ONLY and per-fingerprint
convergent: each batch's fresh rows are written aside and then moved
into the store one ``os.replace`` at a time (atomic per file — a
half-written file is never visible), so a crash mid-publish leaves a
prefix of the batch in the store and the replay re-admits exactly the
missing remainder.

Scale: the batch side is small (one micro-batch); the store side is
the corpus-so-far but is only ever SCANNED for the anti-join, never
rewritten — per-batch write I/O is O(admitted batch), not O(corpus)
(an earlier draft rewrote the whole store per batch; at B batches
that is quadratic and unusable for a long-running ingest).  At 100 TB
keep the store bucketed by ``fp48 % N`` so the anti-join prunes to
matching buckets (same layout note as the batch query); the fixture
store stays a flat parquet dir for container-freedom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_binlog_spark.functions.text import fingerprint

ACCEPTED_COLS = ["doc_id", "fp_md5", "fp48"]
ACCEPTED_SCHEMA = "doc_id long, fp_md5 string, fp48 long"


class DedupIngestSink:
    """foreachBatch sink: dedup a document stream against everything
    accepted so far (reference-free — this is pipeline machinery the
    training-data extensions add on top of the CDC engine)."""

    def __init__(self, spark: SparkSession, store_dir: str):
        import os
        import shutil

        self.spark = spark
        self.store_dir = store_dir
        self.admitted_batches: list[tuple[int, int]] = []  # (batch_id, n_admitted)
        os.makedirs(store_dir, exist_ok=True)
        # a crashed publish leaves only a write-aside dir; its moved
        # prefix is already live and the replay re-admits the rest
        for leftover in [p for p in os.listdir(store_dir) if p.startswith("_aside")]:
            shutil.rmtree(os.path.join(store_dir, leftover), ignore_errors=True)

    @property
    def admitted_rows(self) -> int:
        return sum(n for _, n in self.admitted_batches)

    def accepted(self) -> DataFrame:
        return self.spark.read.schema(ACCEPTED_SCHEMA).parquet(self.store_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import glob
        import os
        import shutil

        # in-batch first copy (smallest doc_id per fingerprint)...
        fp = fingerprint(batch_df)
        w = Window.partitionBy("fp_md5").orderBy("doc_id")
        firsts = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        # ...then anti-join the store-so-far; replayed batches find
        # their own fingerprints and admit nothing (idempotence).
        # persist: counted once AND published once below
        fresh = (
            firsts.join(self.accepted(), "fp_md5", "left_anti")
            .select(*ACCEPTED_COLS)
            .persist()
        )
        try:
            n = fresh.count()
            if n == 0:
                self.admitted_batches.append((batch_id, 0))
                return
            # append-only publish: write aside (inside the store dir so
            # os.replace stays same-filesystem; Spark's reader skips
            # underscore-prefixed dirs), then move each part file into
            # place atomically
            aside = os.path.join(self.store_dir, f"_aside_b{batch_id}")
            fresh.write.mode("overwrite").parquet(aside)
            # publish names are unique PER ATTEMPT (uuid): a replay
            # after a crash mid-publish admits only the remainder, and
            # reusing attempt-0's names would os.replace-overwrite the
            # already-published prefix and lose its fingerprints
            import uuid

            attempt = uuid.uuid4().hex[:8]
            for i, part in enumerate(sorted(glob.glob(os.path.join(aside, "part-*")))):
                os.replace(
                    part,
                    os.path.join(self.store_dir, f"b{batch_id}-{attempt}-{i:05d}.parquet"),
                )
            shutil.rmtree(aside, ignore_errors=True)
            self.admitted_batches.append((batch_id, n))
        finally:
            fresh.unpersist()


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

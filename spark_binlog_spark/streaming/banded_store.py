"""Bucketed append-only delta store shared by the streaming admission
sinks (MinHash text near-dup, sign-LSH embedding near-dup).

Layout: signature rows live under ``d_<delta>/bucket=K`` where K is the
sink's probe-key hash mod ``n_buckets`` — the probe key IS the bucket
key, so per-batch admission reads ONLY the bucket dirs the batch's own
signatures hash into (read I/O O(index ∩ batch buckets), write I/O
O(admitted batch); nothing is ever rewritten).

Publish protocol (exactly-once under foreachBatch's at-least-once):
the batch's rows are written bucket-partitioned into an ``_aside*``
dir and published with ONE ``os.replace`` directory rename (unique
name per attempt), so a crash mid-publish leaves nothing visible and
the replay recomputes the identical admitted set.  ``_aside*`` debris
and crashed-compaction ``.tmp`` files are swept at construction.

Compaction is a DISTRIBUTED Spark job — every over-threshold bucket's
files are read as one DataFrame, ``repartition("bucket")`` gives one
task and one output file per bucket, and the result is published with
the same aside-rename protocol before the olds are deleted.  The
driver only lists names and renames: no data row moves through it,
matching the reference keeping flush-time maintenance on the server
side (OriginalSourceServerInExecutor.scala:132-147).  A crash leaves
duplicate rows at worst, which the sinks' admission joins and
``accepted()`` distincts absorb.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.streaming.swap import remove_with_checksum


class BucketedDeltaStore:
    """The store machinery behind a banded/bucketed admission index;
    the owning sink supplies the row schema (WITHOUT the ``bucket``
    partition column) and decides what the probe key means."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        schema: str,
        n_buckets: int,
        compact_threshold: int,
    ):
        self.spark = spark
        self.store_dir = store_dir
        self.schema = schema
        self.n_buckets = n_buckets
        self.compact_threshold = compact_threshold
        # (batch_id, buckets_scanned, files_scanned) — the pruning receipt
        self.scan_stats: list[tuple[int, int, int]] = []
        self.n_compactions = 0
        os.makedirs(store_dir, exist_ok=True)
        # a crash before a publish rename leaves only an aside dir;
        # nothing of that attempt is visible — drop the debris
        for leftover in [p for p in os.listdir(store_dir) if p.startswith("_aside")]:
            shutil.rmtree(os.path.join(store_dir, leftover), ignore_errors=True)
        # ...and a crashed legacy compaction leaves a hidden .tmp file
        for tmp in glob.glob(os.path.join(store_dir, "d_*", "bucket=*", "_*.tmp")):
            os.remove(tmp)
        # a crash between a compaction's file deletes and its dir prune
        # leaves empty dirs — sweep them on resume
        self.prune_empty_dirs()

    def all_files(self) -> list[str]:
        """Every live parquet fragment — the compaction-effectiveness
        observable (soak batteries assert this stays bounded)."""
        return glob.glob(
            os.path.join(self.store_dir, "d_*", "bucket=*", "*.parquet")
        )

    def read_all(self) -> DataFrame:
        """Every signature row across all published deltas."""
        return (
            self.spark.read.schema(self.schema)
            .option("recursiveFileLookup", "true")
            .parquet(self.store_dir)
        )

    def slice_for(self, buckets: list[int], batch_id: int) -> DataFrame:
        """Index slice for an admission join: only the bucket dirs the
        batch's own signatures hash into, across all published deltas."""
        paths = sorted(
            p
            for b in buckets
            for p in glob.glob(os.path.join(self.store_dir, "d_*", f"bucket={b}"))
        )
        n_files = sum(len(glob.glob(os.path.join(p, "*.parquet"))) for p in paths)
        self.scan_stats.append((batch_id, len(paths), n_files))
        if not paths:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*paths)

    def delta_exists(self, delta_name: str) -> bool:
        return os.path.isdir(os.path.join(self.store_dir, delta_name))

    def publish(
        self,
        rows: DataFrame,
        cols: list[str],
        batch_id: int,
        delta_name: str | None = None,
    ) -> None:
        """Atomically publish one batch's rows (must carry an int
        ``bucket`` column) as a new delta dir.

        Default naming is unique PER ATTEMPT (admission sinks: replay
        recomputes against the published state, so a second publish of
        the same batch must never collide).  ``delta_name`` pins a
        DETERMINISTIC name instead — append-only sinks use
        publish-if-absent (``delta_exists`` + this) for exactly-once
        without any admission self-match."""
        if delta_name is not None and self.delta_exists(delta_name):
            return
        attempt = uuid.uuid4().hex[:8]
        aside = os.path.join(self.store_dir, f"_aside_b{batch_id}_{attempt}")
        # repartition by bucket first: ONE file per touched bucket per
        # batch, not one per task × bucket pair (a small-file explosion
        # that makes later admission scans open hundreds of fragments)
        rows.select(*cols, "bucket").repartition("bucket").write.partitionBy(
            "bucket"
        ).mode("overwrite").parquet(aside)
        # Spark leaves a _SUCCESS marker; recursiveFileLookup would try
        # to read it as parquet — drop it before publish
        for marker in glob.glob(os.path.join(aside, "_*")):
            os.remove(marker)
        dest = delta_name if delta_name is not None else f"d_b{batch_id}_{attempt}"
        try:
            os.rename(aside, os.path.join(self.store_dir, dest))
        except OSError:
            if delta_name is None or not self.delta_exists(delta_name):
                raise
            # deterministic-name race with a concurrent replay: the
            # delta is fully published (rename is atomic) — drop ours
            shutil.rmtree(aside, ignore_errors=True)

    def maybe_compact(self, buckets: list[int]) -> None:
        """Distributed per-bucket compaction: once a bucket's rows are
        spread over ``compact_threshold`` delta files, merge them into
        one — this bounds the admission join's file opens over a
        long-running ingest (see module docstring for the protocol)."""
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
                self.spark.read.schema(self.schema)
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
        self.prune_empty_dirs()

    def prune_empty_dirs(self) -> None:
        """Remove bucket/delta directories DRAINED by compaction —
        without this the store accrues one dead dir per batch and per
        compaction FOREVER, and every slice_for glob and recursive
        read_all listing walks the graveyard (re-introducing the
        O(batches) planning cost compaction exists to bound).

        'Drained' = no ``*.parquet`` left: the local committer leaves
        hidden ``.*.crc`` checksum debris behind the data files
        (invisible to Spark reads, which skip dot/underscore files), so
        a plain rmdir would never fire.  Only dirs with zero parquet
        files are removed — pruning can never drop data."""
        for bdir in glob.glob(os.path.join(self.store_dir, "d_*", "bucket=*")):
            if not glob.glob(os.path.join(bdir, "*.parquet")):
                shutil.rmtree(bdir, ignore_errors=True)
        for ddir in glob.glob(os.path.join(self.store_dir, "d_*")):
            if not glob.glob(os.path.join(ddir, "bucket=*")):
                shutil.rmtree(ddir, ignore_errors=True)

"""Streaming corpus-mixture monitoring: per-source token budgets
maintained incrementally as documents are ingested.

The streaming companion to ``text.source_mixing_weights``: a training
pipeline wants to know its mixture (and the rebalancing rates) AS the
corpus grows, not from a nightly full scan.  The stats are purely
additive and kept at (source, token-length-bin) grain — len_bin =
floor(log2(n_tokens)), computed as ``length(bin(n)) - 1`` so both
engines agree without libm — which makes the table a MERGEABLE LENGTH
HISTOGRAM: coarse mixture totals roll up from it exactly, and
length-distribution monitoring (the truncation/percentile checks a
data pipeline watches) falls out of the same additive state.  Each
micro-batch costs ONE tiny aggregation of the batch plus a
|sources × bins|-sized merge — the corpus is read once, at ingest,
and never re-scanned (at 100 TB a per-batch recompute would re-read
the world; the delta form touches only the batch).

Exactly-once: foreachBatch is at-least-once under hard crashes and an
additive merge is NOT idempotent, so the stats parquet carries the
last applied batch_id and a replayed batch is skipped — the same
batch-id ratchet as ``IncrementalAggSink`` (streaming/mv.py), which in
turn mirrors the reference's monotonic offset guard
(OriginalSourceServerInExecutor.scala:164-171).  Crash-safety of the
swap itself comes from ``safe_swap``/``recover_dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from spark_binlog_spark.streaming.swap import recover_dir, safe_swap


class CorpusStatsSink:
    """foreachBatch sink maintaining per-``by`` corpus statistics.

    ``current()`` -> (by, n_docs, n_tokens); ``mixture()`` additionally
    derives ``sample_rate4`` (floor(min_tokens * 10000 / n_tokens)) —
    the same contract as the batch ``source_mixing_weights``, so a
    stream ingested to completion hash-matches the batch oracle.
    """

    def __init__(
        self,
        spark: SparkSession,
        stats_dir: str,
        by: str = "source",
        text_col: str = "text",
        resume: bool = True,
    ):
        self.spark = spark
        self.stats_dir = stats_dir
        self.by = by
        self.text_col = text_col
        self._schema = StructType(
            [
                StructField(by, StringType()),
                StructField("len_bin", LongType()),
                StructField("n_docs", LongType()),
                StructField("n_tokens", LongType()),
                StructField("batch_id", LongType()),
            ]
        )
        # last-batch delta store (feeds drift()): same swap machinery,
        # written BEFORE the totals swap each batch so a crash between
        # the two converges on replay (totals ratchet re-applies and
        # rewrites the identical delta)
        self.delta_dir = f"{stats_dir}_last_delta"
        self._delta_schema = StructType(
            [
                StructField(by, StringType()),
                StructField("len_bin", LongType()),
                StructField("d_docs", LongType()),
                StructField("d_tokens", LongType()),
                StructField("batch_id", LongType()),
            ]
        )
        ok = recover_dir(stats_dir)
        dok = recover_dir(self.delta_dir)
        if not (resume and dok):
            self.spark.createDataFrame([], self._delta_schema).write.mode(
                "overwrite"
            ).parquet(self.delta_dir)
        if not (resume and ok):
            self.spark.createDataFrame([], self._schema).write.mode(
                "overwrite"
            ).parquet(stats_dir)
        else:
            # store-format mismatch must FAILFAST (same rule as the
            # floorDir scalar/map check): resuming an old-schema store
            # under the new schema would fill the missing columns with
            # NULL join keys that never merge — silent corruption
            actual = set(self.spark.read.parquet(stats_dir).schema.names)
            expected = set(self._schema.names)
            if actual != expected:
                raise ValueError(
                    f"stats store {stats_dir} has columns {sorted(actual)} but this "
                    f"sink expects {sorted(expected)} — rebuild the store (its source "
                    "stream is replayable) or resume with the matching sink version"
                )

    def _stats(self) -> DataFrame:
        return self.spark.read.schema(self._schema).parquet(self.stats_dir)

    def _last_batch_id(self) -> int:
        row = self._stats().agg(F.max("batch_id")).collect()[0]
        return row[0] if row[0] is not None else -1

    def current(self) -> DataFrame:
        # coarse per-source totals roll up EXACTLY from the bin grain
        return (
            self._stats()
            .groupBy(self.by)
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("n_tokens"),
            )
        )

    def length_histogram(self) -> DataFrame:
        """(by, len_bin, n_docs): doc counts per power-of-two token
        bucket — the live length-distribution monitor."""
        return self._stats().select(self.by, "len_bin", "n_docs")

    def mixture(self) -> DataFrame:
        from spark_binlog_spark.functions.text import mixing_rates

        return mixing_rates(self.current(), self.by)

    def token_budget(
        self, max_epochs: int = 2, budget_num: int = 3, budget_den: int = 2
    ) -> DataFrame:
        """UniMax token-budget allocation (Chung et al. 2023) served
        LIVE off the streamed per-``by`` token totals: a continuous
        ingest pipeline re-plans its budget split each batch from this
        |groups|-row store — the corpus is never re-read.  Identical
        waterfill (and oracle) as the batch ``unimax_allocation``; the
        sink counts tokens with the same whitespace split."""
        from spark_binlog_spark.functions.text import unimax_waterfill

        per = self.current().select(F.col(self.by).alias("grp"), "n_tokens")
        return unimax_waterfill(
            per, group_col=self.by, max_epochs=max_epochs,
            budget_num=budget_num, budget_den=budget_den,
        )

    def drift(self) -> DataFrame:
        """Per-``by`` DISTRIBUTION-DRIFT tripwire: the L1 distance
        (×10^4, range 0..20000) between the LAST ingested batch's
        length-bin distribution and the PRIOR corpus's — the check a
        continuous-ingestion pipeline alarms on when a source suddenly
        ships truncated or concatenated documents.

        drift4 = floor(10^4 · Σ_bins |prev_b/P − last_b/L|), computed
        as ONE exact integer division of Σ|prev_b·L − last_b·P| by P·L
        (decimal(38,0) products — no float sums, so any engine agrees
        bit-for-bit).  A ``by`` group with no prior corpus scores the
        maximal 20000 (a brand-new source IS maximal drift); a group
        absent from the last batch scores 0 (no new evidence).

        Cost: the |groups × bins| stats table only — the corpus is
        never re-read.
        """
        from pyspark.sql import Window

        totals = self._stats().select(self.by, "len_bin", "n_docs")
        delta = self.spark.read.schema(self._delta_schema).parquet(self.delta_dir)
        j = totals.join(
            delta.select(self.by, "len_bin", "d_docs"),
            [self.by, "len_bin"],
            "full_outer",
        ).select(
            F.col(self.by),
            (
                F.coalesce(F.col("n_docs"), F.lit(0))
                - F.coalesce(F.col("d_docs"), F.lit(0))
            )
            .cast("long")
            .alias("prev"),
            F.coalesce(F.col("d_docs"), F.lit(0)).cast("long").alias("last"),
        )
        w = Window.partitionBy(self.by)
        dec = "decimal(38,0)"
        j2 = (
            j.withColumn("prev_docs", F.sum("prev").over(w))
            .withColumn("last_docs", F.sum("last").over(w))
        )
        per = j2.groupBy(self.by).agg(
            F.max("prev_docs").cast("long").alias("prev_docs"),
            F.max("last_docs").cast("long").alias("last_docs"),
            F.sum(
                F.abs(
                    F.col("prev").cast(dec) * F.col("last_docs").cast(dec)
                    - F.col("last").cast(dec) * F.col("prev_docs").cast(dec)
                )
            ).alias("numer"),
        )
        drift4 = (
            F.when(F.col("last_docs") == 0, F.lit(0))
            .when(F.col("prev_docs") == 0, F.lit(20000))
            .otherwise(
                F.expr(
                    "(numer * 10000) div "
                    "(CAST(prev_docs AS DECIMAL(38,0)) * CAST(last_docs AS DECIMAL(38,0)))"
                )
            )
        )
        return per.select(
            self.by,
            "prev_docs",
            "last_docs",
            drift4.cast("long").alias("drift4"),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # replay guard: an already-applied batch (crash between the
        # swap and the checkpoint commit) must not double-count
        if batch_id <= self._last_batch_id():
            return
        delta = (
            batch_df.select(
                F.col(self.by),
                F.size(F.split(F.col(self.text_col), "\\s+")).cast("long").alias("t"),
            )
            .select(
                F.col(self.by),
                (F.length(F.bin(F.col("t"))) - 1).cast("long").alias("len_bin"),
                F.col("t"),
            )
            .groupBy(self.by, "len_bin")
            .agg(
                F.count("*").cast("long").alias("d_docs"),
                F.sum("t").cast("long").alias("d_tokens"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        # publish the delta FIRST (drift()'s last-batch view), then the
        # totals: a crash between the swaps replays the batch (totals
        # ratchet still behind), rewriting the identical delta
        dtmp = f"{self.delta_dir}.b{batch_id}"
        delta.write.mode("overwrite").parquet(dtmp)
        safe_swap(self.delta_dir, dtmp)
        # merge FROM the published delta so totals reflect exactly the
        # bytes drift() will read (and the batch agg runs once)
        delta = self.spark.read.schema(self._delta_schema).parquet(self.delta_dir)
        old = self._stats()
        merged = (
            old.join(delta, [self.by, "len_bin"], "full_outer")
            .select(
                F.col(self.by),
                F.col("len_bin"),
                (F.coalesce(F.col("n_docs"), F.lit(0)) + F.coalesce(F.col("d_docs"), F.lit(0)))
                .cast("long")
                .alias("n_docs"),
                (
                    F.coalesce(F.col("n_tokens"), F.lit(0))
                    + F.coalesce(F.col("d_tokens"), F.lit(0))
                )
                .cast("long")
                .alias("n_tokens"),
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
        )
        tmp = f"{self.stats_dir}.b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        safe_swap(self.stats_dir, tmp)


def run_corpus_stats(
    spark: SparkSession,
    docs_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    schema,
    by: str = "source",
    max_files_per_trigger: int = 1,
) -> CorpusStatsSink:
    """Stream a directory of document files (one micro-batch per file by
    default) through the stats sink via availableNow; returns the sink
    whose ``mixture()`` is the live rebalancing table."""
    sink = CorpusStatsSink(spark, stats_dir, by=by)
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

"""Offset algebra as columnar expressions (O1, O3, O4, O5, O6).

Pure-Python scalar versions live in ``spark_binlog_spark.offsets``; these
are the DataFrame-level equivalents, all built-in expressions (no UDFs —
everything stays inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_binlog_spark import POW13


def pack_offset(file_id: Column, pos: Column) -> Column:
    """O1 — fileId * 10^13 + pos (protocols.scala:24-26)."""
    return (file_id.cast("long") * F.lit(POW13) + pos.cast("long")).alias("packed_offset")


def unpack_offset(packed: Column) -> tuple[Column, Column]:
    """O1 inverse (protocols.scala:7-13)."""
    return (packed / POW13).cast("long").alias("file_id"), (packed % POW13).cast("long").alias("pos")


def file_name(file_id: Column, prefix: str = "mysql-bin") -> Column:
    """protocols.scala:15-17 — '%s.%06d'."""
    return F.format_string(f"{prefix}.%06d", file_id).alias("file_name")


def offset_range(df: DataFrame, start: int, end: int, offset_col: str = "cdc_offset") -> DataFrame:
    """O3 — the micro-batch contract: half-open [start, end) scan predicate.

    Reference: WAL replay filter BinLogSocketServerInExecutor.scala:436-447.
    As a literal range predicate this pushes down to the parquet scan
    (shows in PushedFilters), so at 100 TB only matching row-groups are
    read — the incremental-read fast path.
    """
    c = F.col(offset_col)
    return df.filter((c >= F.lit(start)) & (c < F.lit(end)))


def max_offset_per_key(df: DataFrame, key_col: str, offset_col: str = "cdc_offset") -> DataFrame:
    """O5 — committedOffsets recovery: max offset per partition key.

    Reference: OriginalSourceServerInExecutor.scala:56-79.  Partial
    aggregation (map-side max) makes this one light shuffle of one row
    per key per task.
    """
    return df.groupBy(key_col).agg(F.max(offset_col).alias("max_offset"))


def monotonic_dedup(df: DataFrame, key_col: str, offset_col: str = "cdc_offset") -> DataFrame:
    """O6 — drop replayed events: at-least-once -> effectively-once.

    Reference guard: ``offset <= uncommittedOffsets(key)`` skip
    (OriginalSourceServerInExecutor.scala:164-171).  Batch equivalent:
    distinct on (key, offset) — replays are byte-identical so distinct
    is exactly the monotonic guard's fixpoint.  Streaming equivalent:
    ``dropDuplicates([key, offset])`` with a watermark.
    """
    return df.dropDuplicates([key_col, offset_col])


def partition_ranges(
    from_map: DataFrame,
    until_map: DataFrame,
    partition_col: str = "partition",
    new_partition_start: int = -1,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """O4 — per-partition offset ranges from (from, until) offset maps.

    Reference: MLSQLHBaseWALDataSource.scala:220-241 — full alignment of
    two region->offset maps; a region present only in ``until`` is new
    and starts at -1.  ``until < from`` is data loss: the reference
    raises (and Kafka's source calls it failOnDataLoss) — here a lazy
    ``raise_error`` branch inside the projection, so the check runs
    distributed at execution time with no extra action.  Expressed as a
    full outer join — broadcast by the planner since offset maps are
    tiny (one row per region).
    """
    f = from_map.withColumnRenamed("offset", "from_offset")
    u = until_map.withColumnRenamed("offset", "until_offset")
    joined = f.join(u, on=partition_col, how="full_outer")
    from_resolved = F.coalesce(F.col("from_offset"), F.lit(new_partition_start))
    until = F.col("until_offset")
    if fail_on_data_loss:
        until = F.when(
            until < from_resolved,
            F.raise_error(
                F.concat(
                    F.lit("offset data loss on partition '"),
                    F.col(partition_col),
                    F.lit("': until < from (pass fail_on_data_loss=False to continue)"),
                )
            ).cast("long"),
        ).otherwise(F.col("until_offset"))
    return joined.select(
        F.col(partition_col),
        from_resolved.alias("from_offset"),
        until.alias("until_offset"),
    )

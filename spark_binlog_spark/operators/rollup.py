"""P5 — HBase cell-run grouping (HBaseWALClient.scala:157-203).

The reference folds *consecutive* WAL cells with the same (rowkey, type)
into one Put/Delete row event; the run break condition is at :173-194.
This is order-sensitive sessionization: in DataFrame-land we make the
order explicit (sort key = offset), derive a run id with ``lag`` +
running sum, then aggregate per run.

Scale note: a single global ``Window.orderBy`` serializes on one
partition.  The reference's own order is only *per region* (each region's
WAL is read sequentially), so the scalable form partitions the window by
the region/partition key — ``partition_cols`` — which shards state across
executors exactly like the reference shards by region.  The global form
(partition_cols=None) exists for small fixtures and oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cell_run_rollup(
    cells: DataFrame,
    rowkey_col: str = "pk",
    op_col: str = "op",
    order_col: str = "cdc_offset",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Group adjacent same-(rowkey, op) cells into one row event.

    Returns one row per run: run_id, rowkey, op, n_cells,
    from_offset/to_offset bounds.
    """
    if partition_cols:
        order_w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col))
    else:
        order_w = Window.orderBy(F.col(order_col))

    brk = (
        F.when(
            F.lag(rowkey_col).over(order_w).isNull()
            | (F.lag(rowkey_col).over(order_w) != F.col(rowkey_col))
            | (F.lag(op_col).over(order_w) != F.col(op_col)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__brk")
    )
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_run = cells.withColumn("__brk", brk).withColumn("run_id", F.sum("__brk").over(run_w))

    group_cols = (partition_cols or []) + ["run_id"]
    return (
        with_run.groupBy(*group_cols)
        .agg(
            F.first(rowkey_col).alias("rowkey"),
            F.first(op_col).alias("op"),
            F.count("*").alias("n_cells"),
            F.min(order_col).alias("from_offset"),
            F.max(order_col).alias("to_offset"),
        )
    )

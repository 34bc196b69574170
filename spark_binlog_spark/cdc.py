"""Deterministic CDC change-stream derivation from the driver's ``events`` table.

FIXTURES.md §5: the synthetic ``events`` table
(event_id, ts, user_id, event_type, value, props) stands in for the
binlog stream.  The mapping below is THE shared contract between every
Spark query and its DuckDB oracle — both sides derive the exact same
``changes`` relation:

  cdc_offset    = event_id                (monotonic offset, O1/O3)
  pk            = user_id                 (primary key / idCols)
  op            = signup->insert, error->delete, else update
  database_name = 'db_' || pk % 2         (multi-db routing, F1/D2)
  table_name    = 't_'  || pk % 4         (multi-table routing)
  ts, value, props pass through           (event-time, payload)

Keep ``changes_df`` and ``CHANGES_SQL`` in lock-step; the correctness
gate hash-compares their downstream results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["changes_df", "CHANGES_SQL", "load_table"]

# DuckDB CTE body — identical semantics to changes_df() below.
CHANGES_SQL = """
  SELECT event_id AS cdc_offset,
         user_id AS pk,
         CASE event_type WHEN 'signup' THEN 'insert'
                         WHEN 'error'  THEN 'delete'
                         ELSE 'update' END AS op,
         'db_' || CAST(user_id % 2 AS VARCHAR) AS database_name,
         't_'  || CAST(user_id % 4 AS VARCHAR) AS table_name,
         ts, value, props
  FROM events
"""


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver's parquet stores nanosecond timestamps, which Spark
    # rejects by default; read them as long ns-since-epoch and convert
    # where needed (see changes_df).  Session TZ pinned to UTC so wall
    # times agree with DuckDB's naive timestamps.  AQE on so shuffle
    # partition counts adapt to the (small-to-huge) per-query data
    # volume regardless of the caller's session defaults.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def changes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical change stream as a DataFrame (mirror of CHANGES_SQL)."""
    ev = load_table(spark, sf_dir, "events")
    # ts arrives as long ns-since-epoch for ns-precision parquet
    # (nanosAsLong) but as a real timestamp for us/ms-precision files —
    # dispatch on the resolved type
    if dict(ev.dtypes)["ts"] == "bigint":
        ts_col = F.timestamp_micros(F.expr("ts div 1000")).alias("ts")
    else:
        ts_col = F.col("ts")
    return ev.select(
        F.col("event_id").alias("cdc_offset"),
        F.col("user_id").alias("pk"),
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.concat(F.lit("db_"), (F.col("user_id") % 2).cast("string")).alias("database_name"),
        F.concat(F.lit("t_"), (F.col("user_id") % 4).cast("string")).alias("table_name"),
        ts_col,
        F.col("value"),
        F.col("props"),
    )

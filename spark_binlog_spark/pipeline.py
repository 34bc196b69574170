"""The flagship end-to-end CDC slice (SURVEY.md §7 Phase 1).

Replays the derived change stream through the full reference dataflow —
envelope JSON encode (P4), parse (D1), table-pattern filter (F1), row
flatten (P3), latest-image (D3), CDC apply (D4) — producing "the current
state of the table after the change stream", entirely as one Catalyst
plan (to_json/from_json round-trip included, as the reference's wire
format demands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from spark_binlog_spark.cdc import changes_df, load_table
from spark_binlog_spark.envelope import encode_envelope, envelope_schema, flatten_rows
from spark_binlog_spark.operators import cdc_apply, table_pattern_filter

ROW_SCHEMA = StructType(
    [
        StructField("pk", LongType()),
        StructField("value", DoubleType()),
        StructField("op", StringType()),
        StructField("cdc_offset", LongType()),
    ]
)


def wire_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's wire format: single-column ``value: string`` of
    envelope JSON (MLSQLBinLogDataSource.scala:41-43)."""
    ch = changes_df(spark, sf_dir)
    return ch.select(
        encode_envelope(
            op=F.col("op"),
            timestamp_ms=F.col("cdc_offset"),
            database_name=F.col("database_name"),
            table_name=F.col("table_name"),
            rows=F.array(
                F.struct(
                    F.col("pk").alias("pk"),
                    F.col("value").alias("value"),
                    F.col("op").alias("op"),
                    F.col("cdc_offset").alias("cdc_offset"),
                )
            ),
        ).alias("value")
    )


def flagship_cdc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wire = wire_stream(spark, sf_dir)

    # single from_json into a struct, fields extracted in a second
    # projection (multi-referencing the parse expression would re-parse
    # the JSON once per extracted field)
    env = F.from_json(F.col("value"), envelope_schema(ROW_SCHEMA))
    parsed = wire.select(env.alias("env")).select(
        F.col("env.type").alias("op"),
        F.col("env.databaseName").alias("database_name"),
        F.col("env.tableName").alias("table_name"),
        F.col("env.rows").alias("rows"),
    )
    filtered = table_pattern_filter(parsed, "^db_[01]$", "^t_.*$")
    flat = flatten_rows(filtered).select(
        F.col("row.pk").alias("pk"),
        F.col("row.value").alias("value"),
        F.col("row.op").alias("op"),
        F.col("row.cdc_offset").alias("cdc_offset"),
    )
    base = load_table(spark, sf_dir, "customer")
    return cdc_apply(base, flat, key_col="c_custkey", set_cols={"c_acctbal": "value"})

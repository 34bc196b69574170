"""Change-event envelope (reference: mysql-binlog io/AbstractEventWriter.java:16-47).

Every record the reference emits is ONE JSON string:

    {"type": "insert|update|delete",
     "timestamp": <ms epoch>,
     "databaseName": "...", "tableName": "...",
     "schema": "<StructType.json or null>",
     "rows": [ {col: val, ...}, ... ]}

Update events carry after-images only (UpdateRowsWriter.java:54-57);
null column values are omitted from ``rows`` (InsertRowsWriter.java:51-53);
HBase events have a null schema (hbase-wal AbstractEventWriter.java:39).

Spark-side: the envelope is a nested StructType; encode with
``to_json(struct(...))`` (the reference's P4 operator), decode with
``from_json`` (the implied D1 operator).  Both stay entirely inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "envelope_schema",
    "encode_envelope",
    "parse_envelope",
    "flatten_rows",
]


def envelope_schema(row_schema: StructType) -> StructType:
    """Envelope StructType for a given per-table row payload schema.

    Field order mirrors AbstractEventWriter.java:22-46 exactly:
    type, timestamp, databaseName, tableName, schema, rows.
    """
    return StructType(
        [
            StructField("type", StringType()),
            StructField("timestamp", LongType()),
            StructField("databaseName", StringType()),
            StructField("tableName", StringType()),
            StructField("schema", StringType()),
            StructField("rows", ArrayType(row_schema)),
        ]
    )


def encode_envelope(
    op: Column,
    timestamp_ms: Column,
    database_name: Column,
    table_name: Column,
    rows: Column,
    schema_json: Column | None = None,
) -> Column:
    """P4 — JSON-encode one change event (AbstractEventWriter.java:16-56).

    ``rows`` must be an array<struct> column (the after-images).  Returns a
    single string column, the reference's ``value`` wire format.
    """
    if schema_json is None:
        schema_json = F.lit(None).cast("string")  # HBase null-schema case
    return F.to_json(
        F.struct(
            op.alias("type"),
            timestamp_ms.alias("timestamp"),
            database_name.alias("databaseName"),
            table_name.alias("tableName"),
            schema_json.alias("schema"),
            rows.alias("rows"),
        )
    )


def parse_envelope(df: DataFrame, row_schema: StructType, value_col: str = "value") -> DataFrame:
    """D1 — parse the single-column ``value: string`` stream into typed columns.

    Mirrors what every downstream consumer of the reference does first
    (BinlogSuite.scala:208-216 parses the emitted JSON).  Catalyst prunes
    the ``from_json`` projection to only the fields actually consumed.
    """
    # parse once into a struct column, extract in a second projection —
    # referencing the from_json expression per field would re-run the
    # JSON parser once per extracted field
    env = F.from_json(F.col(value_col), envelope_schema(row_schema))
    return df.select(env.alias("env")).select(
        F.col("env.type").alias("type"),
        F.col("env.timestamp").alias("timestamp"),
        F.col("env.databaseName").alias("databaseName"),
        F.col("env.tableName").alias("tableName"),
        F.col("env.schema").alias("schema"),
        F.col("env.rows").alias("rows"),
    )


def flatten_rows(df: DataFrame, rows_col: str = "rows") -> DataFrame:
    """P3 — one event with N rows -> N records (InsertRowsWriter.java:32-39).

    ``explode`` is Catalyst-native (Generate node inside codegen); the
    reference's per-event rows loop becomes a generator expression.
    """
    other = [c for c in df.columns if c != rows_col]
    return df.select(*other, F.explode(F.col(rows_col)).alias("row"))

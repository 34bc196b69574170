"""P1 type/charset decode helpers (MySQLCDCUtils.java:28-84, SchemaTool.scala:9-51).

The reference receives CHAR/VARCHAR/BINARY values as raw bytes
(deserializer compat mode CHAR_AND_BINARY_AS_BYTE_ARRAY) and decodes
them per column charset, configured as ``binlog.field.decode.<col>``
with a ``*`` wildcard default of utf-8 (SchemaTool.scala:43-50; option
plumbing MLSQLBinLogDataSource.scala:158-159).  Spark equivalents, all
codegen-able built-ins:

- bytes -> string per charset: ``decode(col, charset)``
- BIT(1) -> boolean: bit 0 of the value (MySQLCDCUtils.java:39-43)
- BIT(n) -> long: little-endian bit assembly (MySQLCDCUtils.java:45-53)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHARSET = "utf-8"


def charset_for(column: str, options: dict[str, str]) -> str:
    """Resolve the per-column decode charset from source options —
    ``binlog.field.decode.<col>`` with ``binlog.field.decode.*`` wildcard
    (SchemaTool.scala:43-50)."""
    return options.get(
        f"binlog.field.decode.{column}",
        options.get("binlog.field.decode.*", DEFAULT_CHARSET),
    )


def decode_binary_columns(df: DataFrame, binary_cols: list[str], options: dict[str, str]) -> DataFrame:
    """Decode raw-byte columns to strings per configured charset."""
    out = df
    for col in binary_cols:
        out = out.withColumn(col, F.decode(F.col(col), charset_for(col, options)))
    return out


def bit1_to_bool(col: Column) -> Column:
    """BIT(1) -> BooleanType: bitset.get(0) (MySQLCDCUtils.java:39-43)."""
    return (col.bitwiseAND(F.lit(1)) == 1)


def bitn_to_long(col: Column) -> Column:
    """BIT(n>1) -> LongType.  The wire value already arrives as a long
    bit pattern column-side; the reference's BitSet little-endian
    assembly (MySQLCDCUtils.java:45-53) is the identity on it."""
    return col.cast("long")

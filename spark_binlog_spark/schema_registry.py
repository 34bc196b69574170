"""Per-(database, table) payload schema registry.

The reference ships the payload schema INSIDE every event (`schema`
field = StructType.json, io/AbstractEventWriter.java:35-39), resolved at
ingest from the live database (JDBCRDD.resolveTable,
BinLogSocketServerInExecutor.scala:264-275) and cached per
(db, table, tableId) (TableInfo.java:8-53; cache at
BinLogSocketServerInExecutor.scala:88,228-236).

Spark-side we keep a driver-side dict (broadcast-sized: one StructType
per table), resolve ``from_json`` against it before parsing, and fall
back to ``MAP<STRING,STRING>`` for schema-less sources — the HBase case,
whose events carry a null schema (hbase-wal AbstractEventWriter.java:39)
and dynamic ``family:qualifier`` string columns (PutWriter.java:29-36).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

# HBase-style schema-less payload: rowkey + family:qualifier -> string
HBASE_FALLBACK = MapType(StringType(), StringType())


class SchemaRegistry:
    """Mutable per-(db, table) StructType catalog with a map fallback."""

    def __init__(self) -> None:
        self._schemas: dict[tuple[str, str], StructType] = {}

    @staticmethod
    def key(database: str, table: str) -> tuple[str, str]:
        return (database, table)

    def register(self, database: str, table: str, schema: StructType) -> None:
        self._schemas[self.key(database, table)] = schema

    def register_json(self, database: str, table: str, schema_json: str) -> None:
        """Accepts the reference's wire form: StructType.json string."""
        self.register(database, table, StructType.fromJson(json.loads(schema_json)))

    def resolve_from_jdbc(self, spark, url: str, database: str, table: str, **options) -> StructType:
        """S3 — infer the source table's schema from the live database,
        the Spark-native equivalent of JDBCRDD.resolveTable
        (BinLogSocketServerInExecutor.scala:264-275).  ``load()`` of a
        JDBC reader resolves the schema without scanning rows.

        Needs a JDBC driver on the classpath.  Against MySQL that is the
        connector jar; the test battery exercises the identical code path
        against the embedded Derby engine Spark already ships
        (tests/test_schema_registry.py::TestJdbcResolution).
        """
        reader = spark.read.format("jdbc").option("url", url).option(
            "dbtable", f"{database}.{table}"
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        schema = reader.load().schema
        self.register(database, table, schema)
        return schema

    def get(self, database: str, table: str) -> StructType | None:
        return self._schemas.get(self.key(database, table))

    def parse_rows(self, df: DataFrame, database: str, table: str, rows_json_col: str = "rows_json") -> DataFrame:
        """Parse a JSON rows-array column using the registered schema, or
        the HBase map fallback when the table is unregistered."""
        schema = self.get(database, table)
        payload = schema if schema is not None else HBASE_FALLBACK
        from pyspark.sql.types import ArrayType

        return df.withColumn("rows", F.from_json(F.col(rows_json_col), ArrayType(payload)))


    def parse_rows_cells(
        self,
        df: DataFrame,
        database: str,
        table: str,
        rows_json_col: str = "rows_json",
        kernel: bool = True,
    ) -> DataFrame:
        """Fused parse + cell-explode for the schema-LESS (HBase map
        fallback) path: one row per cell — carry columns + (rowkey,
        qualifier, cell_value).

        Equivalent by construction to
        ``explode_hbase_cells(parse_rows(df, ...).drop(rows_json_col))``
        — the ``kernel=False`` reference — but runs as ONE Arrow batch
        pass (r15, guide §4.2): the Catalyst form pays Jackson
        ``from_json`` into ARRAY<MAP> (allocating per-row map objects)
        plus two generators, ~650 ns/row of the sf10 CDC feed; the
        kernel parses each rows-array with orjson and emits the cell
        columns directly (measured 14.9 → 5.6 s on the 10M-event sf10
        feed, output verified row-identical).  Registered (schema-ful)
        tables and ``kernel=False`` take the Catalyst path unchanged.

        Exactness envelope (pinned by
        tests/test_schema_registry.py::TestParseRowsCellsKernel): the
        kernel matches from_json for the wire shapes the HBase fallback
        carries — string / null / bool / int cell values, absent
        rowkey, duplicate keys (last wins), empty objects, non-object
        array elements, invalid JSON (row dropped, as PERMISSIVE
        from_json yields null and explode drops it).  Float cell
        values re-serialize through orjson, so a NON-canonical numeric
        literal (``1e5``) would come back canonical (``100000.0``)
        where Jackson preserves the literal text; the PutWriter wire
        (PutWriter.java:28-36) only ever emits string cells, so this
        is outside the fallback's input envelope.

        Only valid for schema-LESS tables (cells are a map-fallback
        concept; a registered StructType row has named fields, not
        dynamic qualifiers) — a registered (db, table) raises."""
        if self.get(database, table) is not None:
            raise ValueError(
                f"parse_rows_cells is the map-fallback path; "
                f"({database}, {table}) has a registered schema — use parse_rows"
            )
        if not kernel:
            parsed = self.parse_rows(df, database, table, rows_json_col)
            return explode_hbase_cells(parsed.drop(rows_json_col))

        carry = [c for c in df.columns if c != rows_json_col]
        carry_schema = [df.schema[c] for c in carry]

        def cells_kernel(batches):
            import orjson
            import pyarrow as pa

            loads = orjson.loads
            dumps = orjson.dumps
            for batch in batches:
                js = batch.column(rows_json_col).to_pylist()
                idx: list[int] = []
                rks: list[str | None] = []
                qs: list[str] = []
                vs: list[str | None] = []
                app_i, app_r, app_q, app_v = idx.append, rks.append, qs.append, vs.append
                for i, s in enumerate(js):
                    if s is None:
                        continue
                    try:
                        rows = loads(s)
                    except orjson.JSONDecodeError:
                        continue
                    if not isinstance(rows, list):
                        continue
                    for row in rows:
                        if not isinstance(row, dict):
                            continue
                        rk = row.get("rowkey")
                        if rk is not None and not isinstance(rk, str):
                            rk = dumps(rk).decode()
                        for k, v in row.items():
                            if k == "rowkey":
                                continue
                            if v is not None and not isinstance(v, str):
                                v = dumps(v).decode()
                            app_i(i)
                            app_r(rk)
                            app_q(k)
                            app_v(v)
                ind = pa.array(idx, pa.int64())
                arrs = [batch.column(c).take(ind) for c in carry] + [
                    pa.array(rks, pa.string()),
                    pa.array(qs, pa.string()),
                    pa.array(vs, pa.string()),
                ]
                yield pa.RecordBatch.from_arrays(
                    arrs, carry + ["rowkey", "qualifier", "cell_value"]
                )

        out_schema = StructType(
            list(carry_schema)
            + [
                StructField("rowkey", StringType()),
                # non-nullable to match the Catalyst reference exactly:
                # a map KEY can never be null in from_json output
                StructField("qualifier", StringType(), nullable=False),
                StructField("cell_value", StringType()),
            ]
        )
        return df.mapInArrow(cells_kernel, out_schema)


def hbase_cells_to_row(rows_map: Column) -> Column:
    """HBase dynamic-column payload: one Put event's cells as a map.

    The reference builds ``{"rowkey": ..., "family:qualifier": value}``
    objects cell-by-cell (PutWriter.java:28-36); with a map-typed payload
    the row image IS the map — extraction is ``element_at``.
    """
    return rows_map


def explode_hbase_cells(df: DataFrame, rows_col: str = "rows") -> DataFrame:
    """(event) -> one row per cell: rowkey, qualifier, cell_value.

    map_entries + explode is the columnar inverse of the reference's
    cell loop; rowkey is carried from the map's 'rowkey' entry."""
    one_row = F.explode(F.col(rows_col)).alias("row_map")
    exploded = df.select("*", one_row).drop(rows_col)
    return (
        exploded.select(
            "*",
            F.element_at(F.col("row_map"), "rowkey").alias("rowkey"),
            F.explode(F.map_entries(F.col("row_map"))).alias("cell"),
        )
        .filter(F.col("cell.key") != "rowkey")
        .select(
            *[c for c in df.columns if c != rows_col],
            "rowkey",
            F.col("cell.key").alias("qualifier"),
            F.col("cell.value").alias("cell_value"),
        )
    )

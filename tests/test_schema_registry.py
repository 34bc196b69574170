"""SchemaRegistry: wire-form registration, typed parse, map fallback."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from spark_binlog_spark.schema_registry import HBASE_FALLBACK, SchemaRegistry, explode_hbase_cells


SCRIPT_FILE = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("has_caret", IntegerType()),  # tinyint(1) -> int (BinlogSuite.scala:208-216)
    ]
)


class TestRegistry:
    def test_register_json_wire_form(self):
        # the reference ships StructType.json inside every event
        reg = SchemaRegistry()
        reg.register_json("mbcj_test", "script_file", SCRIPT_FILE.json())
        got = reg.get("mbcj_test", "script_file")
        assert got == SCRIPT_FILE
        assert got.fields[2].dataType.simpleString() == "int"  # tinyint(1) assertion

    def test_unregistered_returns_none(self):
        assert SchemaRegistry().get("nope", "nope") is None

    def test_typed_parse_with_registered_schema(self, spark):
        reg = SchemaRegistry()
        reg.register("db", "t", SCRIPT_FILE)
        df = spark.createDataFrame(
            [('[{"id": 1, "name": "jack2", "has_caret": 1}]',)], ["rows_json"]
        )
        out = reg.parse_rows(df, "db", "t").select(F.explode("rows").alias("r"))
        row = out.collect()[0]["r"]
        assert row["id"] == 1 and row["name"] == "jack2" and row["has_caret"] == 1

    def test_map_fallback_for_unknown_table(self, spark):
        reg = SchemaRegistry()
        df = spark.createDataFrame(
            [('[{"rowkey": "rk1", "cf:a": "x", "cf:b": "y"}]',)], ["rows_json"]
        )
        parsed = reg.parse_rows(df, "hbase", "unknown", "rows_json")
        assert parsed.schema["rows"].dataType.elementType == HBASE_FALLBACK
        cells = explode_hbase_cells(parsed.drop("rows_json"))
        got = {(r["rowkey"], r["qualifier"], r["cell_value"]) for r in cells.collect()}
        assert got == {("rk1", "cf:a", "x"), ("rk1", "cf:b", "y")}

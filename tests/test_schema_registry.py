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


class TestParseRowsCellsKernel:
    """r15: the fused Arrow parse+explode must be row-identical to the
    Catalyst reference (parse_rows + explode_hbase_cells) across the
    fallback's input envelope — including the malformed shapes
    PERMISSIVE from_json silently drops."""

    ROWS = [
        (1, '[{"rowkey": "rk1", "cf:a": "x", "cf:b": "y"}]'),
        (2, '[{"rowkey": "rk2", "cf:a": null}]'),           # null cell value
        (3, '[{"cf:only": "no-rowkey"}]'),                  # absent rowkey
        (4, '[{"rowkey": "rk4"}]'),                         # rowkey-only: no cells
        (5, "[{}]"),                                        # empty object
        (6, "[]"),                                          # empty array
        (7, None),                                           # null json
        (8, "{not json"),                                   # invalid -> dropped
        (9, '{"rowkey": "obj-not-array"}'),                 # non-array root
        (10, '[{"rowkey": "rk10", "cf:b": true, "cf:i": 7}]'),  # bool/int cells
        (11, '[{"rowkey": "rk11", "cf:a": "1"}, {"rowkey": "rk11b", "cf:a": "2"}]'),
        (12, '[null, {"rowkey": "rk12", "cf:a": "z"}]'),    # null array element
    ]

    def _both(self, spark, rows):
        reg = SchemaRegistry()
        df = spark.createDataFrame(rows, ["cdc_offset", "rows_json"])
        kern = reg.parse_rows_cells(df, "hbase", "unknown", "rows_json", kernel=True)
        ref = reg.parse_rows_cells(df, "hbase", "unknown", "rows_json", kernel=False)
        return kern, ref

    def test_kernel_matches_catalyst_reference(self, spark):
        kern, ref = self._both(spark, self.ROWS)
        assert kern.schema == ref.schema
        k = sorted(map(tuple, kern.collect()))
        r = sorted(map(tuple, ref.collect()))
        assert k == r
        # and the reference itself produces what the map fallback promises
        assert (1, "rk1", "cf:a", "x") in r

    def test_registered_schema_rejected(self, spark):
        reg = SchemaRegistry()
        reg.register("db", "t", SCRIPT_FILE)
        df = spark.createDataFrame(
            [(1, '[{"id": 1, "name": "n", "has_caret": 0}]')],
            ["cdc_offset", "rows_json"],
        )
        with pytest.raises(ValueError, match="registered schema"):
            reg.parse_rows_cells(df, "db", "t", "rows_json")


class TestJdbcResolution:
    def test_resolve_from_live_derby(self, spark, tmp_path):
        """S3 live-JDBC schema resolution: create a table over JDBC in
        the embedded Derby engine (ships with Spark), then resolve its
        schema through the registry exactly as the reference does
        against MySQL (JDBCRDD.resolveTable,
        BinLogSocketServerInExecutor.scala:264-275)."""
        from pyspark.sql import Row

        from spark_binlog_spark.schema_registry import SchemaRegistry

        url = f"jdbc:derby:{tmp_path}/derby_db;create=true"
        driver = "org.apache.derby.jdbc.EmbeddedDriver"
        (
            spark.createDataFrame([Row(id=1, name="a", score=1.5)])
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", "db1.users")
            .option("driver", driver)
            .save()
        )

        reg = SchemaRegistry()
        schema = reg.resolve_from_jdbc(spark, url, "db1", "users", driver=driver)
        assert [f.name.lower() for f in schema.fields] == ["id", "name", "score"]
        assert [f.dataType.simpleString() for f in schema.fields] == [
            "bigint", "string", "double",
        ]
        # resolution registers the schema for downstream from_json parsing
        assert reg.get("db1", "users") == schema

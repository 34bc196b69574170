"""Charset decode + bit decode operators (P1 corners)."""

from pyspark.sql import functions as F

from spark_binlog_spark.operators.decode import (
    bit1_to_bool,
    bitn_to_long,
    charset_for,
    decode_binary_columns,
)


def test_charset_option_resolution():
    opts = {"binlog.field.decode.name": "latin1", "binlog.field.decode.*": "utf-8"}
    assert charset_for("name", opts) == "latin1"
    assert charset_for("other", opts) == "utf-8"
    assert charset_for("other", {}) == "utf-8"


def test_decode_binary_per_charset(spark):
    # 'café' in latin1 vs utf-8 — the decode must honor the per-column option
    df = spark.createDataFrame(
        [("café".encode("latin-1"), "café".encode("utf-8"))], ["name_latin1", "name_utf8"]
    )
    out = decode_binary_columns(
        df,
        ["name_latin1", "name_utf8"],
        {"binlog.field.decode.name_latin1": "iso-8859-1"},
    )
    row = out.collect()[0]
    assert row["name_latin1"] == "café"
    assert row["name_utf8"] == "café"


def test_bit_decodes(spark):
    df = spark.range(4).select(
        F.col("id"),
        bit1_to_bool(F.col("id")).alias("b1"),
        bitn_to_long(F.col("id") * 3).alias("bn"),
    )
    rows = {r["id"]: (r["b1"], r["bn"]) for r in df.collect()}
    assert rows[0] == (False, 0)
    assert rows[1] == (True, 3)
    assert rows[2] == (False, 6)
    assert rows[3] == (True, 9)


def test_partitioned_cell_rollup_matches_global_within_region(spark):
    """P5 scale path: per-region rollup == global rollup restricted to
    one region's events (the reference's per-region WAL order)."""
    from spark_binlog_spark.cdc import changes_df
    from spark_binlog_spark.operators import cell_run_rollup
    from tests.conftest import SF_TEST

    ch = changes_df(spark, SF_TEST).withColumn(
        "region", (F.col("pk") % 4).cast("int")
    ).select("region", "cdc_offset", "pk", "op")

    partitioned = cell_run_rollup(ch, partition_cols=["region"])
    # compare per region against a global rollup over that region only
    for region in [0, 1]:
        only = ch.filter(F.col("region") == region).drop("region")
        glob = cell_run_rollup(only)
        a = sorted(
            (r["rowkey"], r["op"], r["n_cells"], r["from_offset"], r["to_offset"])
            for r in partitioned.filter(F.col("region") == region).collect()
        )
        b = sorted(
            (r["rowkey"], r["op"], r["n_cells"], r["from_offset"], r["to_offset"])
            for r in glob.collect()
        )
        assert a == b and len(a) > 0

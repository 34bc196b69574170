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


class TestProjectDecodeKernel:
    """r15: the fused Arrow decode projection must be value-identical to
    the Catalyst reference over the wire envelope, including the
    byte-length edge semantics of the hex/conv BIT assembly (length 0 ->
    all-null, length 1 -> b0 only, length >= 2 -> first two bytes) and
    null rows in every column."""

    def _wire(self, spark):
        import datetime

        rows = [
            # (cdc_offset, pk, props, ts, op_raw, hi_raw, bits_raw)
            (1, 7, '{"k": 87}', datetime.datetime(2024, 1, 1, 0, 0, 1, 393525), b"insert", b"\xc7", b"\x05\x07"),
            (2, 128, '{"k": 0}', datetime.datetime(2024, 6, 30, 23, 59, 59), b"update", b"\x80", b"\x00\xff"),
            (3, 0, "{}", datetime.datetime(2024, 1, 2), b"delete", b"\xff", b"\x01"),   # missing k, 1-byte bits
            (4, 3, None, None, None, None, b""),                                         # nulls + empty bits
            (5, 9, "{not json", datetime.datetime(2024, 3, 1), b"x", b"\xa0", None),    # invalid json, null bits
            (6, 11, '{"k": null}', datetime.datetime(2024, 3, 1), b"caf\xc3\xa9", b"\xb1", b"\x05\x07\x09"),  # 3-byte bits, multibyte utf8
        ]
        return spark.createDataFrame(
            rows,
            "cdc_offset long, pk long, props string, ts timestamp, "
            "op_raw binary, hi_raw binary, bits_raw binary",
        )

    def test_kernel_matches_catalyst(self, spark):
        from spark_binlog_spark.queries_cdc import project_decode_wire_projection

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        wire = self._wire(spark)
        kern = project_decode_wire_projection(wire, kernel=True)
        ref = project_decode_wire_projection(wire, kernel=False)
        assert [(f.name, f.dataType) for f in kern.schema.fields] == [
            (f.name, f.dataType) for f in ref.schema.fields
        ]
        k = sorted(map(tuple, kern.collect()))
        r = sorted(map(tuple, ref.collect()))
        assert k == r
        # spot-pin the measured Catalyst edge semantics so a Spark
        # behavior change surfaces as THIS assertion, not a silent drift
        by_off = {t[0]: t for t in r}
        assert by_off[3][3] is True and by_off[3][4] is None   # 1-byte: bit1 ok, bitn null
        assert by_off[4][3] is None and by_off[4][4] is None   # empty: all null

    def test_kernel_plan_is_one_arrow_node(self, spark):
        from spark_binlog_spark.queries_cdc import project_decode_wire_projection

        plan = (
            project_decode_wire_projection(self._wire(spark), kernel=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "MapInArrow" in plan


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


def test_parallel_global_rollup_matches_single_window(spark):
    """r14: the bucketed parallel global-run fold must equal the
    single-partition window form on layouts engineered to stress the
    cross-bucket corrections — runs crossing bucket boundaries, sparse
    and dense offset regions, and single-row runs at bucket edges."""
    import random

    from spark_binlog_spark.operators import rollup as rollup_mod

    random.seed(14)
    rows, off = [], 0
    pk_cycle = ["a", "a", "a", "b", "b", "c", "a", "c", "c", "c"]
    for i in range(5000):
        rows.append((off, pk_cycle[i % len(pk_cycle)], "put" if (i // 7) % 2 == 0 else "del"))
        off += random.choice([1, 1, 1, 3, 10])  # dense + sparse regions
    cells = spark.createDataFrame(rows, "cdc_offset long, pk string, op string").repartition(7)

    saved = rollup_mod.GLOBAL_RUN_PARALLEL_MIN_ROWS
    try:
        rollup_mod.GLOBAL_RUN_PARALLEL_MIN_ROWS = 10**12
        ref = {tuple(r) for r in rollup_mod.cell_run_rollup(cells).collect()}
        rollup_mod.GLOBAL_RUN_PARALLEL_MIN_ROWS = 1
        par = {tuple(r) for r in rollup_mod.cell_run_rollup(cells).collect()}
    finally:
        rollup_mod.GLOBAL_RUN_PARALLEL_MIN_ROWS = saved
    assert len(ref) > 100
    assert ref == par

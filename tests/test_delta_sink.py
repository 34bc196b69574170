"""DeltaMergeSink: MERGE semantics must equal batch cdc_apply, replays
must converge.  The whole battery skips when delta-spark is absent (this
container); the import-gate test below always runs."""

import pytest
from pyspark.sql import Row


def _base(spark):
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"n{k}", c_acctbal=float(k * 10)) for k in range(6)]
    )


def _changes(spark):
    rows = [
        Row(cdc_offset=0, pk=0, op="update", value=15.0),
        Row(cdc_offset=1, pk=2, op="delete", value=0.0),
        Row(cdc_offset=2, pk=9, op="insert", value=99.0),
        Row(cdc_offset=3, pk=1, op="update", value=21.0),
        Row(cdc_offset=4, pk=1, op="update", value=22.0),
    ]
    return spark.createDataFrame(rows)


class TestImportGate:
    def test_clear_error_without_delta(self, spark, tmp_path):
        from spark_binlog_spark.streaming import delta_sink

        if delta_sink.HAS_DELTA:
            pytest.skip("delta installed — gate not reachable")
        with pytest.raises(ImportError, match="delta-spark is not installed"):
            delta_sink.DeltaMergeSink(
                spark, str(tmp_path / "t"), _base(spark), "c_custkey", {"c_acctbal": "value"}
            )


@pytest.fixture(scope="module")
def delta():
    return pytest.importorskip("delta")


class TestDeltaMerge:
    def test_merge_equals_cdc_apply(self, spark, tmp_path, delta):
        from spark_binlog_spark.operators import cdc_apply
        from spark_binlog_spark.streaming.delta_sink import DeltaMergeSink

        base, ch = _base(spark), _changes(spark)
        sink = DeltaMergeSink(
            spark, str(tmp_path / "t"), base, "c_custkey", {"c_acctbal": "value"}
        )
        sink(ch, 0)
        got = {
            (r["c_custkey"], r["c_acctbal"]) for r in sink.current().collect()
        }
        expected = {
            (r["c_custkey"], r["c_acctbal"])
            for r in cdc_apply(
                base, ch, key_col="c_custkey", set_cols={"c_acctbal": "value"}
            ).collect()
        }
        assert got == expected

    def test_replay_converges(self, spark, tmp_path, delta):
        from spark_binlog_spark.streaming.delta_sink import DeltaMergeSink

        base, ch = _base(spark), _changes(spark)
        sink = DeltaMergeSink(
            spark, str(tmp_path / "t"), base, "c_custkey", {"c_acctbal": "value"}
        )
        sink(ch, 0)
        once = {tuple(r) for r in sink.current().collect()}
        sink(ch, 0)  # at-least-once redelivery
        assert {tuple(r) for r in sink.current().collect()} == once

    def test_resume_keeps_table(self, spark, tmp_path, delta):
        from spark_binlog_spark.streaming.delta_sink import DeltaMergeSink

        base = _base(spark)
        s1 = DeltaMergeSink(spark, str(tmp_path / "t"), base, "c_custkey", {"c_acctbal": "value"})
        s1(_changes(spark), 0)
        mid = {tuple(r) for r in s1.current().collect()}
        s2 = DeltaMergeSink(
            spark, str(tmp_path / "t"), base, "c_custkey", {"c_acctbal": "value"}, resume=True
        )
        assert {tuple(r) for r in s2.current().collect()} == mid
        s2(spark.createDataFrame([Row(cdc_offset=9, pk=3, op="update", value=77.0)]), 1)
        got = {r["c_custkey"]: r["c_acctbal"] for r in s2.current().collect()}
        assert got[3] == 77.0

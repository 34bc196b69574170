"""Incremental materialized-view maintenance (streaming/mv.py):
the per-key-delta aggregate must equal a full recompute over the
maintained state at every batch boundary, survive replayed batches
(at-least-once foreachBatch), and track deletes / new keys / the NULL
group exactly like the batch cdc_apply + groupBy."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Row
from pyspark.sql import functions as F

T0 = 1_700_000_000_000_000_000  # ns


def _write_events(path, rows):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


def _base(spark):
    # two groups + one group that empties entirely (pk 6 in group C)
    rows = [
        Row(c_custkey=0, c_mktsegment="A", c_acctbal=10.0),
        Row(c_custkey=1, c_mktsegment="A", c_acctbal=20.0),
        Row(c_custkey=2, c_mktsegment="B", c_acctbal=30.0),
        Row(c_custkey=3, c_mktsegment="B", c_acctbal=40.0),
        Row(c_custkey=6, c_mktsegment="C", c_acctbal=60.0),
    ]
    return spark.createDataFrame(rows)


def _recompute(state_df):
    return state_df.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total"),
    )


def _as_set(df):
    return {(r[0], r[1], str(r[2])) for r in df.collect()}


class TestIncrementalAgg:
    def test_deltas_match_full_recompute_every_batch(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mv import IncrementalAggSink
        from spark_binlog_spark.streaming.pipeline import parse_stream, read_stream

        # update pk0, delete pk2, insert new pk 9 (NULL group), double-
        # update pk1 (latest wins), delete pk6 (group C empties),
        # delete absent pk 11 (no-op)
        events = [
            (0, T0 + 0, 0, "click", 15.0, "{}"),
            (1, T0 + 1, 2, "error", 0.0, "{}"),
            (2, T0 + 2, 9, "signup", 99.0, "{}"),
            (3, T0 + 3, 1, "click", 21.0, "{}"),
            (4, T0 + 4, 1, "click", 22.0, "{}"),
            (5, T0 + 5, 6, "error", 0.0, "{}"),
            (6, T0 + 6, 11, "error", 0.0, "{}"),
            (7, T0 + 7, 3, "click", 44.0, "{}"),
        ]
        path = str(tmp_path / "ev.parquet")
        _write_events(path, events)
        sink = IncrementalAggSink(
            spark,
            str(tmp_path / "state"),
            str(tmp_path / "agg"),
            _base(spark),
            key_col="c_custkey",
            group_col="c_mktsegment",
            val_col="c_acctbal",
        )
        # bootstrap invariant
        assert _as_set(sink.current_agg()) == _as_set(_recompute(sink.current()))

        wire = read_stream(spark, path, numPartitions=2, maxEventsPerTrigger=3)
        changes = parse_stream(wire)

        def check_and_apply(batch_df, batch_id):
            sink(batch_df, batch_id)
            # the invariant at EVERY batch boundary, not just the end
            assert _as_set(sink.current_agg()) == _as_set(_recompute(sink.current()))

        from spark_binlog_spark.streaming.pipeline import await_stream

        q = (
            changes.writeStream.foreachBatch(check_and_apply)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        assert await_stream(q, lambda: sink.applied_rows >= len(events))

        final = {r[0]: (r[1], str(r[2])) for r in sink.current_agg().collect()}
        # A: pk0 15.0 + pk1 22.0; B: pk3 44.0 only (pk2 deleted);
        # C gone (emptied); NULL: new pk9
        assert final["A"] == (2, "37.00")
        assert final["B"] == (1, "44.00")
        assert "C" not in final
        assert final[None] == (1, "99.00")

    def test_replayed_batch_skipped_for_agg(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mv import IncrementalAggSink

        events = [
            (0, T0 + 0, 0, "click", 15.0, "{}"),
            (1, T0 + 1, 9, "signup", 99.0, "{}"),
        ]
        path = str(tmp_path / "ev.parquet")
        _write_events(path, events)
        batch = spark.read.parquet(path).select(
            F.col("event_id").alias("cdc_offset"),
            F.col("user_id").alias("pk"),
            F.when(F.col("event_type") == "signup", "insert")
            .when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("op"),
            F.col("value"),
        )
        sink = IncrementalAggSink(
            spark,
            str(tmp_path / "state"),
            str(tmp_path / "agg"),
            _base(spark),
            key_col="c_custkey",
            group_col="c_mktsegment",
            val_col="c_acctbal",
        )
        sink(batch, 0)
        after_first = _as_set(sink.current_agg())
        # at-least-once: the same batch id redelivered after a crash —
        # the non-idempotent delta must NOT run again; the state merge
        # reapplies idempotently
        sink(batch, 0)
        assert _as_set(sink.current_agg()) == after_first
        assert _as_set(sink.current_agg()) == _as_set(_recompute(sink.current()))

"""Merge-on-read sink (streaming/mor.py): O(batch) writes + window-merge
reads must equal the copy-on-write ParquetUpsertSink / batch cdc_apply
at every point, replays must converge (overwrite-by-name), compaction
must preserve content, and the read plan must never shuffle the base."""

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
    return spark.createDataFrame(
        [Row(c_custkey=k, c_name=f"n{k}", c_acctbal=float(k * 10)) for k in range(6)]
    )


def _changes(spark, path):
    return spark.read.parquet(path).select(
        F.col("event_id").alias("cdc_offset"),
        F.col("user_id").alias("pk"),
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("value"),
    )


def _rows(df):
    return {(r["c_custkey"], r["c_name"], r["c_acctbal"]) for r in df.collect()}


EVENTS = [
    (0, T0 + 0, 0, "click", 15.0, "{}"),     # update pk0
    (1, T0 + 1, 2, "error", 0.0, "{}"),      # delete pk2
    (2, T0 + 2, 9, "signup", 99.0, "{}"),    # new pk9
    (3, T0 + 3, 1, "click", 21.0, "{}"),     # update pk1 ...
    (4, T0 + 4, 1, "click", 22.0, "{}"),     # ... twice (latest wins)
    (5, T0 + 5, 9, "error", 0.0, "{}"),      # delete the new key again
    (6, T0 + 6, 3, "click", 44.0, "{}"),
    (7, T0 + 7, 4, "error", 0.0, "{}"),      # delete pk4
]


class TestMergeOnRead:
    def test_stream_equals_batch_apply(self, spark, tmp_path):
        from spark_binlog_spark.operators import cdc_apply
        from spark_binlog_spark.streaming.mor import MergeOnReadSink
        from spark_binlog_spark.streaming.pipeline import (
            await_stream,
            parse_stream,
            read_stream,
        )

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark)
        sink = MergeOnReadSink(
            spark, str(tmp_path / "state"), base, "c_custkey", {"c_acctbal": "value"},
            compact_every=100,  # no auto-compaction: pure MOR read path
        )
        wire = read_stream(spark, path, numPartitions=2, maxEventsPerTrigger=3)
        q = (
            parse_stream(wire).writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        assert await_stream(q, lambda: sink.applied_rows >= len(EVENTS))
        assert len(sink._delta_files()) >= 2  # genuinely multi-delta read

        expected = _rows(
            cdc_apply(base, _changes(spark, path), key_col="c_custkey",
                      set_cols={"c_acctbal": "value"})
        )
        assert _rows(sink.current()) == expected

        # compaction folds deltas into the base without changing content
        sink.compact()
        assert sink._delta_files() == []
        assert _rows(sink.current()) == expected

    def test_replay_converges_by_overwrite(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark)
        sink = MergeOnReadSink(
            spark, str(tmp_path / "state"), base, "c_custkey", {"c_acctbal": "value"},
            compact_every=100,
        )
        batch = _changes(spark, path)
        sink(batch, 0)
        once = _rows(sink.current())
        sink(batch, 0)  # at-least-once redelivery: same file overwritten
        assert _rows(sink.current()) == once
        assert len(sink._delta_files()) == 1

    def test_read_plan_never_shuffles_base(self, spark, tmp_path):
        """The 100 TB property: current()'s joins against the base are
        all BroadcastHashJoin (delta side built); no SortMergeJoin, so
        the base is never exchanged."""
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        sink = MergeOnReadSink(
            spark, str(tmp_path / "state"), _base(spark), "c_custkey",
            {"c_acctbal": "value"}, compact_every=100,
        )
        sink(_changes(spark, path), 0)
        plan = sink.current()._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 3

    def test_auto_compaction_threshold(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark)
        sink = MergeOnReadSink(
            spark, str(tmp_path / "state"), base, "c_custkey", {"c_acctbal": "value"},
            compact_every=2,
        )
        ch = _changes(spark, path)
        sink(ch.filter(F.col("cdc_offset") < 4), 0)
        assert len(sink._delta_files()) == 1
        sink(ch.filter(F.col("cdc_offset") >= 4), 1)  # hits the threshold
        assert sink._delta_files() == []  # compacted into base
        from spark_binlog_spark.operators import cdc_apply

        assert _rows(sink.current()) == _rows(
            cdc_apply(base, ch, key_col="c_custkey", set_cols={"c_acctbal": "value"})
        )


class TestMorResume:
    def test_resume_keeps_state_and_continues(self, spark, tmp_path):
        """resume=True must keep base + deltas intact (crash recovery:
        the restarted query's checkpoint decides what replays) and new
        batches must continue the (batch_id, offset) total order."""
        from spark_binlog_spark.operators import cdc_apply
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark)
        ch = _changes(spark, path)
        first, second = ch.filter(F.col("cdc_offset") < 4), ch.filter(F.col("cdc_offset") >= 4)

        s1 = MergeOnReadSink(spark, str(tmp_path / "st"), base, "c_custkey",
                             {"c_acctbal": "value"}, compact_every=100)
        s1(first, 0)
        mid = _rows(s1.current())

        s2 = MergeOnReadSink(spark, str(tmp_path / "st"), base, "c_custkey",
                             {"c_acctbal": "value"}, compact_every=100, resume=True)
        assert _rows(s2.current()) == mid  # state survived the "restart"
        s2(second, 1)
        expected = _rows(cdc_apply(base, ch, key_col="c_custkey",
                                   set_cols={"c_acctbal": "value"}))
        assert _rows(s2.current()) == expected


class TestCompoundOrdering:
    def test_packed_offsets_beyond_2_40_still_ordered(self, spark, tmp_path):
        """Reference-style packed offsets (fileId*10^13 + pos) exceed 2^40:
        a packed (batch_id << 40) + offset ordering would let an old
        batch's huge offset outrank a newer batch — the compound
        (batch_id, offset) sort key must not."""
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        base = _base(spark)
        sink = MergeOnReadSink(spark, str(tmp_path / "st"), base, "c_custkey",
                               {"c_acctbal": "value"}, compact_every=100)
        big = 7 * 10**13 + 123  # > 2^40
        b0 = spark.createDataFrame([Row(cdc_offset=big, pk=1, op="update", value=111.0)])
        b1 = spark.createDataFrame([Row(cdc_offset=5, pk=1, op="update", value=222.0)])
        sink(b0, 0)
        sink(b1, 1)  # newer batch, small offset — must win
        got = {r["c_custkey"]: r["c_acctbal"] for r in sink.current().collect()}
        assert got[1] == 222.0


class TestCrashRecovery:
    def _interrupt_swap(self, live):
        """Simulate a crash between safe_swap's two moves: live moved
        aside, finished tmp not yet moved in."""
        import shutil

        shutil.copytree(live, live + ".b999")  # a finished tmp (_SUCCESS inside)
        shutil.move(live, live + ".old")

    def test_mor_resume_recovers_interrupted_compact(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mor import MergeOnReadSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark)
        s1 = MergeOnReadSink(spark, str(tmp_path / "st"), base, "c_custkey",
                             {"c_acctbal": "value"}, compact_every=100)
        s1(_changes(spark, path), 0)
        s1.compact()
        before = _rows(s1.current())
        self._interrupt_swap(str(tmp_path / "st" / "base"))

        s2 = MergeOnReadSink(spark, str(tmp_path / "st"), base, "c_custkey",
                             {"c_acctbal": "value"}, compact_every=100, resume=True)
        # recovery restored the compacted base — NOT a silent re-bootstrap
        assert _rows(s2.current()) == before

    def test_mv_resume_recovers_interrupted_swap(self, spark, tmp_path):
        from spark_binlog_spark.streaming.mv import IncrementalAggSink

        path = str(tmp_path / "ev.parquet")
        _write_events(path, EVENTS)
        base = _base(spark).withColumn("c_mktsegment", (F.col("c_custkey") % 2).cast("string"))
        s1 = IncrementalAggSink(spark, str(tmp_path / "state"), str(tmp_path / "agg"),
                                base, key_col="c_custkey", group_col="c_mktsegment",
                                val_col="c_acctbal")
        s1(_changes(spark, path), 0)
        agg_before = {tuple(r) for r in s1.current_agg().collect()}
        self._interrupt_swap(str(tmp_path / "agg"))

        s2 = IncrementalAggSink(spark, str(tmp_path / "state"), str(tmp_path / "agg"),
                                base, key_col="c_custkey", group_col="c_mktsegment",
                                val_col="c_acctbal", resume=True)
        assert {tuple(r) for r in s2.current_agg().collect()} == agg_before

"""Stateful streaming latest-image vs the batch D3 operator."""

from pyspark.sql import functions as F

from tests.conftest import SF_TEST
from tests.test_streaming import T0, _write_events


def test_stateful_latest_image_matches_batch(spark, tmp_path):
    from spark_binlog_spark.streaming.pipeline import await_stream, parse_stream, read_stream
    from spark_binlog_spark.streaming.stateful import latest_image_stateful

    rows = [
        (i, T0 + i, i % 7, ["signup", "click", "view", "purchase", "error"][i % 5],
         float(i * 10), '{"k": 1}')
        for i in range(60)
    ]
    path = str(tmp_path / "ev.parquet")
    _write_events(path, rows)

    changes = parse_stream(read_stream(spark, path, numPartitions=2, maxEventsPerTrigger=25))
    updates = latest_image_stateful(changes.select("pk", "cdc_offset", "op", "value"))
    q = (
        updates.writeStream.format("memory")
        .queryName("li_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    # caught up when some emitted row carries the final offset
    ok = await_stream(
        q,
        lambda: spark.sql("SELECT max(last_offset) AS m FROM li_updates").collect()[0]["m"] == 59,
    )
    assert ok, "stream did not reach the last offset"

    # latest emitted update per key == batch latest_image over the file
    from pyspark.sql import Window

    emitted = spark.table("li_updates")
    w = Window.partitionBy("pk").orderBy(F.col("last_offset").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pk", "last_offset", "last_op", "last_value")
    )
    got = {(r["pk"], r["last_offset"], r["last_op"], r["last_value"]) for r in final.collect()}

    from spark_binlog_spark.operators import latest_image

    ev = spark.read.parquet(path)
    batch = latest_image(
        ev.select(
            F.col("user_id").alias("pk"),
            F.col("event_id").alias("cdc_offset"),
            F.when(F.col("event_type") == "signup", "insert")
            .when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("op"),
            F.col("value"),
        ),
        ["pk"],
    )
    want = {
        (r["pk"], r["cdc_offset"], r["op"], r["value"])
        for r in batch.collect()
    }
    assert got == want
    # multiple micro-batches actually happened (state crossed batches)
    assert emitted.count() > batch.count()


def test_tws_gate_without_protobuf(spark):
    """Without the protobuf package the Spark-4 transformWithState form
    must fail fast with a clear error, not a worker crash."""
    import importlib.util

    import pytest

    from spark_binlog_spark.streaming.stateful import latest_image_tws

    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            pytest.skip("protobuf installed - gate not reachable")
    except ModuleNotFoundError:
        pass
    changes = spark.createDataFrame([], "pk long, cdc_offset long, op string, value double")
    with pytest.raises(ImportError, match="protobuf"):
        latest_image_tws(changes)


def test_tws_latest_image_matches_batch(spark, tmp_path):
    """transformWithState (Spark 4 successor API) must land on the same
    final images as the batch D3 operator; requires the RocksDB state
    store provider AND the protobuf package (skips when absent)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from spark_binlog_spark.streaming.pipeline import parse_stream, read_stream
    from spark_binlog_spark.streaming.stateful import latest_image_tws

    rows = [
        (i, T0 + i, i % 7, ["signup", "click", "view", "purchase", "error"][i % 5],
         float(i * 10), '{"k": 1}')
        for i in range(60)
    ]
    path = str(tmp_path / "ev.parquet")
    _write_events(path, rows)

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        changes = parse_stream(read_stream(spark, path, numPartitions=2))
        updates = latest_image_tws(changes.select("pk", "cdc_offset", "op", "value"))
        q = (
            updates.writeStream.format("memory")
            .queryName("tws_updates")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old)

    from pyspark.sql import Window

    emitted = spark.table("tws_updates")
    w = Window.partitionBy("pk").orderBy(F.col("last_offset").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pk", "last_offset", "last_op", "last_value")
    )
    got = {tuple(r) for r in final.collect()}

    from spark_binlog_spark.operators import latest_image

    ev = spark.read.parquet(path)
    batch = latest_image(
        ev.select(
            F.col("user_id").alias("pk"),
            F.col("event_id").alias("cdc_offset"),
            F.when(F.col("event_type") == "signup", "insert")
            .when(F.col("event_type") == "error", "delete")
            .otherwise("update")
            .alias("op"),
            F.col("value"),
        ),
        ["pk"],
    )
    want = {(r["pk"], r["cdc_offset"], r["op"], r["value"]) for r in batch.collect()}
    assert got == want

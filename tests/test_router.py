"""D2 routing: partitioned write fan-out + partition-pruned read-back."""

import os

from pyspark.sql import functions as F

from spark_binlog_spark.cdc import changes_df
from spark_binlog_spark.operators.router import read_routed_table, route_to_tables
from tests.conftest import SF_TEST


def test_route_and_read_back(spark, tmp_path):
    out = str(tmp_path / "routed")
    ch = changes_df(spark, SF_TEST).select(
        "cdc_offset", "pk", "op", "database_name", "table_name"
    )
    route_to_tables(ch, out)

    # one directory per (db, table)
    dbs = {d for d in os.listdir(out) if d.startswith("database_name=")}
    assert dbs == {"database_name=db_0", "database_name=db_1"}
    tables = {t for t in os.listdir(f"{out}/database_name=db_0") if t.startswith("table_name=")}
    assert tables == {"table_name=t_0", "table_name=t_2"}  # pk%2=0 -> pk%4 in {0,2}

    # read-back equals the filtered source
    got = read_routed_table(spark, out, "db_1", "t_3")
    want = ch.filter((F.col("database_name") == "db_1") & (F.col("table_name") == "t_3"))
    assert got.count() == want.count() > 0
    assert {r["pk"] % 4 for r in got.select("pk").distinct().collect()} == {3}

    # partition pruning reaches the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "database_name" in plan.split("PartitionFilters")[1][:200]


def test_streaming_routing_sink(spark, tmp_path):
    from spark_binlog_spark.operators.router import RoutingSink
    from spark_binlog_spark.streaming.pipeline import parse_stream, read_stream

    out = str(tmp_path / "routed_stream")
    wire = read_stream(spark, f"{SF_TEST}/events.parquet", numPartitions=2)
    sink = RoutingSink(out)
    q = (
        parse_stream(wire)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.read.parquet(out).count()
    expected = spark.read.parquet(f"{SF_TEST}/events.parquet").count()
    assert total == expected

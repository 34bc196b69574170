"""Bucketed co-located join (no exchange) + routed-table compaction."""

import os

from pyspark.sql import functions as F

from spark_binlog_spark.cdc import changes_df, load_table
from spark_binlog_spark.operators.bucketing import (
    bucketed_join,
    compact_routed_table,
    save_bucketed,
)
from spark_binlog_spark.operators.router import route_to_tables
from tests.conftest import SF_TEST


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    ch = changes_df(spark, SF_TEST).select("cdc_offset", "pk", "op", "value")
    cust = load_table(spark, SF_TEST, "customer").select(
        F.col("c_custkey").alias("pk"), "c_mktsegment"
    )
    save_bucketed(ch, "b_changes", "pk", n_buckets=8)
    save_bucketed(cust, "b_customer", "pk", n_buckets=8)
    try:
        joined = bucketed_join(spark, "b_changes", "b_customer", "pk")
        # disable broadcast so the co-located property is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # buckets align: no shuffle
            n = joined.count()
            plain = ch.join(cust, "pk").count()
            assert n == plain > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_changes")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_compaction_preserves_content(spark, tmp_path):
    out = str(tmp_path / "routed")
    ch = changes_df(spark, SF_TEST).select("cdc_offset", "pk", "database_name", "table_name")
    # three appends -> many small files
    for _ in range(3):
        route_to_tables(ch, out)
    before = spark.read.parquet(out)
    n_before = before.count()
    files_before = sum(len(fs) for _, _, fs in os.walk(out))

    compact_routed_table(spark, out, target_files_per_partition=1)
    after = spark.read.parquet(out)
    assert after.count() == n_before
    files_after = sum(len(fs) for _, _, fs in os.walk(out))
    assert files_after < files_before
    # per-partition-dir parquet count is now 1
    for db in [d for d in os.listdir(out) if d.startswith("database_name=")]:
        for t in os.listdir(f"{out}/{db}"):
            if t.startswith("table_name="):
                pq_files = [f for f in os.listdir(f"{out}/{db}/{t}") if f.endswith(".parquet")]
                assert len(pq_files) == 1

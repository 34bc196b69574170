"""Salted join == plain join (skew mitigation must not change results)."""

from pyspark.sql import functions as F

from spark_binlog_spark.cdc import changes_df, load_table
from spark_binlog_spark.operators.skew import salted_join
from tests.conftest import SF_TEST


def test_salted_join_equals_plain_join(spark):
    ch = changes_df(spark, SF_TEST)
    cust = load_table(spark, SF_TEST, "customer").select("c_custkey", "c_mktsegment")

    plain = ch.join(cust, ch["pk"] == cust["c_custkey"], "inner").select(
        "cdc_offset", "pk", "c_mktsegment"
    )
    salted = salted_join(ch, cust, "pk", "c_custkey", salt_source="cdc_offset", n_salts=8).select(
        "cdc_offset", "pk", "c_mktsegment"
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_salt_spreads_hot_key(spark):
    # a pathological stream: 90% of rows share one key — the salted side
    # must distribute it over n_salts distinct shuffle keys
    ch = changes_df(spark, SF_TEST).withColumn(
        "pk", F.when(F.col("cdc_offset") % 10 != 0, F.lit(1)).otherwise(F.col("pk"))
    )
    salted = ch.withColumn("__salt", (F.col("cdc_offset") % 8).cast("int"))
    spread = (
        salted.filter(F.col("pk") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread == 8

#!/usr/bin/env python
"""Interleaved A/B for the 16-bit simhash near-dup plan change (round
12): the banded self-join moved from id-level ("direct") to
distinct-signature-value ("distinct") — see
dedup.hamming_near_dup_pairs.  Both shapes live behind the `strategy`
parameter, so this is a true same-session, same-tree A/B: alternating
order, 5 reps each, q_simhash60_near_dups interleaved as the load
calibrator (its plan is untouched by the change).  Run on an idle
host; loadavg is recorded.

    python scripts/simhash16_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("simhash16-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg_start", [round(x, 2) for x in os.getloadavg()])

    from pyspark.sql import functions as F

    from spark_binlog_spark.functions import dedup
    from spark_binlog_spark.registry import queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def plan(strategy):
        sig = dedup.simhash(docs, "text", 16)
        return dedup.hamming_near_dup_pairs(
            sig, id_col="doc_id", sig_col="simhash16", bits=16, bands=4,
            max_hamming=2, strategy=strategy,
        ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming")

    cal = queries()["q_simhash60_near_dups"](spark, sf_dir)
    arms = {"distinct": plan("distinct"), "direct": plan("direct"), "calibrator_60bit": cal}
    for df in arms.values():  # warm
        df.write.format("noop").mode("overwrite").save()
    runs = {k: [] for k in arms}
    for _ in range(5):
        for k, df in arms.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs[k].append(round(time.perf_counter() - t0, 3))
    for k, r in runs.items():
        print(f"{k}: {r}  min {min(r)}  med {sorted(r)[len(r) // 2]}")
    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Same-session interleaved A/B of the kernel spread_small_input
mitigation: arm A = spread disabled (identity), arm B = spread enabled.
Alternates A,B,A,B,A,B per query and reports the min of each arm's 3
timed runs — host drift hits both arms equally.

  python scripts/ab_spread.py q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-spread")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_binlog_spark import registry
    from spark_binlog_spark.functions import dedup

    real_spread = dedup.spread_small_input
    queries = registry.queries()
    out = {}
    for name in names:
        dedup.spread_small_input = lambda df: df
        df_a = queries[name](spark, sf_dir)
        dedup.spread_small_input = real_spread
        df_b = queries[name](spark, sf_dir)
        # warm both
        df_a.write.format("noop").mode("overwrite").save()
        df_b.write.format("noop").mode("overwrite").save()
        a_runs, b_runs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df_a.write.format("noop").mode("overwrite").save()
            a_runs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df_b.write.format("noop").mode("overwrite").save()
            b_runs.append(time.perf_counter() - t0)
        out[name] = {"no_spread": round(min(a_runs), 3), "spread": round(min(b_runs), 3)}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

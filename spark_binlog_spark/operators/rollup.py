"""P5 — HBase cell-run grouping (HBaseWALClient.scala:157-203).

The reference folds *consecutive* WAL cells with the same (rowkey, type)
into one Put/Delete row event; the run break condition is at :173-194.
This is order-sensitive sessionization: in DataFrame-land we make the
order explicit (sort key = offset), derive a run id with ``lag`` +
running sum, then aggregate per run.

Scale note: the reference's own order is only *per region* (each
region's WAL is read sequentially), so the production form partitions
the window by the region/partition key — ``partition_cols`` — which
shards state across executors exactly like the reference shards by
region.  The GLOBAL form (partition_cols=None) used to serialize on one
partition (``Exchange SinglePartition`` + two windows over the full
relation — guide §2.5's self-inflicted one-task stage); r14 makes it
scale-adaptive: above ``GLOBAL_RUN_PARALLEL_MIN_ROWS`` rows the order
key is bucketed into contiguous ranges (one cheap min/max/count bounds
job at construction), runs are folded per bucket in parallel, and the
cross-bucket corrections — whether a bucket's first local run continues
the previous bucket's last, and each bucket's global run-id offset —
are a lag + prefix-sum window over the TINY per-bucket stats relation
(<= n_buckets rows, broadcast back).  Identical output to the
single-window form at any bucketing (property-tested); small inputs
keep the one-window plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# below this row count the single-partition window is already sub-second
# and the parallel form's extra bounds job + stats window is pure
# overhead (measured sf0.1, 100k rows: 0.75 s single-window vs 1.06 s
# parallel); above it the one-task sort dominates (measured sf10, 10M
# rows: 23.5 s single-window vs 3.0 s parallel).  Scale-adaptive, not
# tuned to local[32]: the bucket count follows defaultParallelism.
GLOBAL_RUN_PARALLEL_MIN_ROWS = 262144

# free pre-gate on the optimizer's sizeInBytes estimate (plan metadata,
# no job): clearly-small inputs skip even the bounds job (measured
# +0.10 s on q_cell_rollup's sf0.1 timed region otherwise).  Set BELOW
# the row gate's equivalent (~11 estimated bytes/row on the events
# relation → 262144 rows ≈ 2.9 MB) so the bytes gate only ever skips
# inputs the row gate would also have skipped; large or unknown-size
# inputs fall through to the exact row-count gate, which stays
# authoritative.
GLOBAL_RUN_PARALLEL_MIN_BYTES = 2 << 20


def _maybe_parallel(cells: DataFrame, order_col: str) -> bool:
    """Gate for the parallel global fold.  Note: a True verdict costs
    one construction-time driver job (the exact min/max/count bounds
    collect in ``_global_bounds``) — callers building DataFrames lazily
    pay it before any action, like the repo's other bounded
    construction-job gates.

    The parallel fold buckets on ``CAST(order_col AS BIGINT)``
    arithmetic, so a non-integral order key (string offsets,
    timestamps) must keep the single-window form: the CAST would yield
    NULLs (collapsing rows into one NULL bucket) or ``int(lo)`` would
    raise at construction (ADVICE r14)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    try:
        dt = cells.schema[order_col].dataType
    except Exception:  # unresolvable column: let the window form raise
        return False
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return False
    try:
        est = int(cells._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable: fall through to the row gate
        est = 1 << 62
    if est < GLOBAL_RUN_PARALLEL_MIN_BYTES:
        return False
    return _global_rows(cells, order_col) >= GLOBAL_RUN_PARALLEL_MIN_ROWS


def _run_break(rowkey_col: str, op_col: str, order_w) -> F.Column:
    return (
        F.when(
            F.lag(rowkey_col).over(order_w).isNull()
            | (F.lag(rowkey_col).over(order_w) != F.col(rowkey_col))
            | (F.lag(op_col).over(order_w) != F.col(op_col)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )


def cell_run_rollup(
    cells: DataFrame,
    rowkey_col: str = "pk",
    op_col: str = "op",
    order_col: str = "cdc_offset",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Group adjacent same-(rowkey, op) cells into one row event.

    Returns one row per run: run_id, rowkey, op, n_cells,
    from_offset/to_offset bounds.  Global-order runs (partition_cols =
    None) assume the order key is unique — the same precondition the
    single-window form and the oracle's ``OVER (ORDER BY ...)`` carry.
    """
    if partition_cols:
        order_w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col))
    elif _maybe_parallel(cells, order_col):
        return _parallel_global_rollup(cells, rowkey_col, op_col, order_col)
    else:
        order_w = Window.orderBy(F.col(order_col))

    brk = _run_break(rowkey_col, op_col, order_w).alias("__brk")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_run = cells.withColumn("__brk", brk).withColumn("run_id", F.sum("__brk").over(run_w))

    group_cols = (partition_cols or []) + ["run_id"]
    return (
        with_run.groupBy(*group_cols)
        .agg(
            F.first(rowkey_col).alias("rowkey"),
            F.first(op_col).alias("op"),
            F.count("*").alias("n_cells"),
            F.min(order_col).alias("from_offset"),
            F.max(order_col).alias("to_offset"),
        )
    )


# per-DataFrame bounds memo: cell_run_rollup can be invoked twice on the
# same relation in one session (construction + plan capture); the bounds
# job is cheap but not free
def _global_rows(cells: DataFrame, order_col: str) -> int:
    bounds = _global_bounds(cells, order_col)
    return bounds[2]


def _global_bounds(cells: DataFrame, order_col: str) -> tuple[int, int, int]:
    cached = getattr(cells, "_cell_rollup_bounds", None)
    if cached is not None:
        return cached
    row = cells.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    bounds = (row["lo"] or 0, row["hi"] or 0, row["n"])
    try:
        cells._cell_rollup_bounds = bounds
    except Exception:
        pass
    return bounds


def _parallel_global_rollup(
    cells: DataFrame, rowkey_col: str, op_col: str, order_col: str
) -> DataFrame:
    """Global-order run fold without a single-partition window.

    Buckets = contiguous order-key ranges (deterministic arithmetic on
    the key, not sampling — retried tasks re-derive the same bucket,
    guide §2.5).  Per bucket: local breaks + local run prefix (one
    window, parallel across buckets).  Cross-bucket: a bucket's first
    row locally counts as a break; it is a TRUE break only when the
    previous non-empty bucket ends on a different (rowkey, op).  With
    C_b = local break count and adj_b in {0,1} that correction,
    global run_id = (local prefix) - adj_b + sum over earlier buckets
    of (C_c - adj_c) — both terms from one lag + running-sum window
    over the per-bucket stats relation (<= n_buckets rows).
    """
    from pyspark.storagelevel import StorageLevel

    from spark_binlog_spark.cache_util import release, swap_caches

    spark = cells.sparkSession
    lo, hi, n = _global_bounds(cells, order_col)
    n_buckets = max(2, spark.sparkContext.defaultParallelism)
    width = max(1, -(-(hi - lo + 1) // n_buckets))  # ceil
    # integer `div`, not `/`: double division loses exactness on large keys
    bucket = F.expr(f"(CAST({order_col} AS BIGINT) - {int(lo)}) div {int(width)}")

    wp = Window.partitionBy("__b").orderBy(F.col(order_col))
    run_wp = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    release("rollup.cell_run_rollup")
    local = (
        cells.withColumn("__b", bucket)
        .withColumn("__brk", _run_break(rowkey_col, op_col, wp))
        .withColumn("__lp", F.sum("__brk").over(run_wp))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    swap_caches("rollup.cell_run_rollup", [local])

    stats = local.groupBy("__b").agg(
        F.max("__lp").alias("__cnt"),
        F.min_by(F.struct(F.col(rowkey_col), F.col(op_col)), F.col(order_col)).alias("__first"),
        F.max_by(F.struct(F.col(rowkey_col), F.col(op_col)), F.col(order_col)).alias("__last"),
    )
    sw = Window.orderBy("__b")  # <= n_buckets rows: a one-task window is fine here
    prev_last = F.lag("__last").over(sw)
    adj = (
        F.when(
            prev_last.isNotNull()
            & (prev_last[rowkey_col] == F.col("__first")[rowkey_col])
            & (prev_last[op_col] == F.col("__first")[op_col]),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    off_w = sw.rowsBetween(Window.unboundedPreceding, -1)
    offmap = (
        stats.withColumn("__adj", adj)
        .withColumn(
            "__off",
            F.coalesce(F.sum(F.col("__cnt") - F.col("__adj")).over(off_w), F.lit(0)),
        )
        .select("__b", "__adj", "__off")
    )
    run_id = (F.col("__lp") - F.col("__adj") + F.col("__off")).cast("long")
    return (
        local.join(F.broadcast(offmap), "__b")
        .withColumn("run_id", run_id)
        .groupBy("run_id")
        .agg(
            F.first(rowkey_col).alias("rowkey"),
            F.first(op_col).alias("op"),
            F.count("*").alias("n_cells"),
            F.min(order_col).alias("from_offset"),
            F.max(order_col).alias("to_offset"),
        )
    )

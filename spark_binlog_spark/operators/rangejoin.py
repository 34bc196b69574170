"""Grid-bucketed range join — large × large interval containment.

``q_range_band`` covers the dimension-sized case (broadcast the bands).
When BOTH sides are big — points vs millions of intervals — neither
broadcasts, and a naive theta-join is a per-key cross product.  The
standard fix (used by every distributed interval-join engine) maps both
sides onto a fixed grid:

  interval [lo, hi)  ->  one row per covered grid cell
  point p            ->  exactly ONE cell, floor(p / g)

and equi-joins on (key, cell) with the exact containment predicate as a
post-filter.  Shuffle volume is O(points + Σ interval-cells); because a
point owns exactly one cell, matched pairs are produced once — no
dedup pass.  Cell width trades replication (wide intervals explode to
more cells) against candidate precision; choose g ≈ typical interval
width so intervals cover ~1-2 cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_interval_overlap(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    grid: float,
) -> DataFrame:
    """Interval×interval overlap join (a.lo < b.hi AND b.lo < a.hi),
    both sides large.

    Overlapping intervals share EVERY cell of their intersection, so a
    naive cell join emits duplicates; the standard dedup-free trick is
    CELL OWNERSHIP — a pair is emitted only in the first cell of the
    intersection, ``max(floor(lo_a/g), floor(lo_b/g))`` — turning the
    distinct into a cheap filter.  Shuffle stays O(Σ interval-cells).
    """
    # caller contract: outside ``on``, the two sides use DISJOINT column
    # names (rename before calling), so the name-list join dedups the
    # keys and every other column stays unambiguous
    def celled(df: DataFrame, lo: str, hi: str) -> DataFrame:
        cells = F.sequence(
            F.floor(F.col(lo) / grid).cast("long"),
            F.floor(F.col(hi) / grid).cast("long"),
        )
        return df.withColumn("__cell", F.explode(cells))

    joined = celled(a, lo_a, hi_a).join(celled(b, lo_b, hi_b), on + ["__cell"])
    owner = F.greatest(
        F.floor(F.col(lo_a) / grid).cast("long"),
        F.floor(F.col(lo_b) / grid).cast("long"),
    )
    return (
        joined.filter(
            (F.col(lo_a) < F.col(hi_b))
            & (F.col(lo_b) < F.col(hi_a))
            & (F.col("__cell") == owner)
        )
        .drop("__cell")
    )


def grid_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
) -> DataFrame:
    """Inner join of points to the [lo, hi) intervals containing them.

    Both inputs may be arbitrarily large; the join is an equi shuffle on
    (``on``…, cell).  The interval's last cell is floor(hi/g) even when
    hi sits exactly on a boundary — a harmless extra candidate the
    exact filter removes.
    """
    cell_seq = F.sequence(
        F.floor(F.col(lo_col) / grid).cast("long"),
        F.floor(F.col(hi_col) / grid).cast("long"),
    )
    iv = intervals.withColumn("__cell", F.explode(cell_seq))
    pt = points.withColumn("__cell", F.floor(F.col(point_col) / grid).cast("long"))
    return (
        pt.join(iv, on + ["__cell"])
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__cell")
    )


def interval_overlap_count(
    intervals: DataFrame,
    on: list[str],
    lo_col: str,
    hi_col: str,
    grid: float,
    out_col: str = "n_overlaps",
) -> DataFrame:
    """#overlapping unordered pairs (a.lo < b.hi AND b.lo < a.hi) per
    key WITHOUT materializing the pairs (r14 — the grid_range_count
    lesson applied to the self-overlap query): TRUE-overlap volume
    grows ~n² with density, so at the sf10 events fixture
    q_interval_overlap's pair stream was the slowest sweep survivor
    (110 s) and no grid width can fix a pair relation that size.  A
    per-key COUNT needs no pairs:

      overlaps = C(n, 2) - disjoint

    and a disjoint unordered pair (hi_a <= lo_b OR hi_b <= lo_a) has
    exactly ONE ordering with hi_a <= lo_b when widths are positive,
    so ``disjoint = Σ_x #(y: hi_y <= lo_x)`` — a prefix count of hi
    values at each lo endpoint, distributed exactly like
    grid_range_count: per-(key, cell) hi counts + a cells-bounded
    per-key prefix window, then in-cell <=-counts via ONE union window
    partitioned by (key, cell) where hi POINTS sort BEFORE
    equal-valued lo ENDPOINTS (<= must count ties).  Shuffle volume
    is O(n) at any density; cells are grid-balanced so no window
    partition is corpus-sized.

    Caller contract: every interval has hi > lo (a pair of zero-width
    intervals at one point is disjoint in BOTH orders and would
    double-subtract).  Returns (*on, ``out_col``) for keys with at
    least one overlapping pair — the same relation as the pair join's
    ``groupBy(key).count()``."""
    from pyspark.sql import Window

    def cell_of(c):
        return F.floor(c / grid).cast("long")

    pts = intervals.select(
        *on, F.col(hi_col).alias("__v"), cell_of(F.col(hi_col)).alias("__cell")
    )
    ends = intervals.select(
        *on, F.col(lo_col).alias("__v"), cell_of(F.col(lo_col)).alias("__cell")
    )
    # 1. per-cell hi counts + per-key prefix over cells (cells-bounded)
    cellcnt = pts.groupBy(*on, "__cell").agg(F.count("*").alias("__c"))
    allcells = (
        cellcnt.select(*on, "__cell")
        .unionByName(ends.select(*on, "__cell"))
        .distinct()
    )
    wcum = Window.partitionBy(*on).orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = (
        allcells.join(cellcnt, [*on, "__cell"], "left")
        .select(*on, "__cell", F.coalesce(F.col("__c"), F.lit(0)).alias("__c"))
        .select(
            *on,
            "__cell",
            F.coalesce(F.sum("__c").over(wcum), F.lit(0)).alias("__before"),
        )
    )
    # 2. in-cell <=-counts: hi points sort BEFORE equal-valued lo
    # endpoints (desc on __isp), so the running point count read off an
    # endpoint row is exactly #(hi <= lo) within the cell
    u = pts.select(*on, "__cell", "__v", F.lit(1).alias("__isp")).unionByName(
        ends.select(*on, "__cell", "__v", F.lit(0).alias("__isp"))
    )
    wcell = Window.partitionBy(*on, "__cell").orderBy(
        "__v", F.desc("__isp")
    ).rowsBetween(Window.unboundedPreceding, 0)
    le = (
        u.withColumn("__le", F.sum("__isp").over(wcell))
        .filter(F.col("__isp") == 0)
        .select(*on, "__cell", "__le")
    )
    # 3. endpoint total = in-cell + before-cell; C(n,2) - Σ totals
    disjoint = (
        le.join(F.broadcast(prefix), [*on, "__cell"])
        .groupBy(*on)
        .agg(F.sum(F.col("__le") + F.col("__before")).alias("__disjoint"))
    )
    n = intervals.groupBy(*on).agg(F.count("*").alias("__n"))
    return (
        n.join(disjoint, on)
        .select(
            *on,
            (F.expr("__n * (__n - 1) div 2") - F.col("__disjoint")).alias(out_col),
        )
        .filter(F.col(out_col) > 0)
    )


def grid_range_count(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    id_cols: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
) -> DataFrame:
    """#points in [lo, hi) per interval WITHOUT materializing the
    containment pairs (r14, found by the CDC sf10 rung): when the
    value distribution is dense, the number of TRUE containments grows
    ~points x intervals-per-cell — at the sf10 events fixture
    q_grid_range_join's pair relation was ~10^10 rows and no grid
    width can fix an output that size.  When the caller only needs the
    COUNT (as q_grid_range_join's aggregate did), the answer is a
    prefix-count difference: #[lo, hi) = #(v < hi) - #(v < lo), and
    prefix counts distribute:

      1. per-(key, cell) point counts -> a cells-per-key-bounded
         relation; one small per-key window gives each cell's
         points-in-earlier-cells prefix (boundary cells unioned in so
         every endpoint finds its row);
      2. in-cell strict-below counts via ONE union window partitioned
         by (key, cell): endpoints sort BEFORE equal-valued points
         (tie column), so a running point-count read off an endpoint
         row is exactly #(v < b) within the cell — cells are
         grid-balanced, so no partition is corpus-sized;
      3. endpoint total = cell prefix (broadcast join — the prefix
         relation is O(cells)) + in-cell count; per interval,
         n_inside = total(hi) - total(lo).

    Shuffle volume is O(points + endpoints) — linear at any density.
    ``id_cols`` must uniquely identify an interval within its key.
    Returns (*on, *id_cols, n_inside) INCLUDING zero-count intervals
    (filter n_inside > 0 for inner-join semantics)."""
    from pyspark.sql import Window

    def cell_of(c):
        return F.floor(c / grid).cast("long")

    pts = points.select(
        *on, F.col(point_col).alias("__v"), cell_of(F.col(point_col)).alias("__cell")
    )
    bounds = (
        intervals.select(
            *on, *id_cols, F.col(lo_col).alias("__v"), F.lit(0).alias("__side")
        )
        .unionByName(
            intervals.select(
                *on, *id_cols, F.col(hi_col).alias("__v"), F.lit(1).alias("__side")
            )
        )
        .withColumn("__cell", cell_of(F.col("__v")))
    )
    # 1. per-cell counts + per-key prefix over cells (cells-bounded)
    cellcnt = pts.groupBy(*on, "__cell").agg(F.count("*").alias("__c"))
    allcells = (
        cellcnt.select(*on, "__cell")
        .unionByName(bounds.select(*on, "__cell"))
        .distinct()
    )
    wcum = Window.partitionBy(*on).orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = (
        allcells.join(cellcnt, [*on, "__cell"], "left")
        .select(*on, "__cell", F.coalesce(F.col("__c"), F.lit(0)).alias("__c"))
        .select(
            *on,
            "__cell",
            F.coalesce(F.sum("__c").over(wcum), F.lit(0)).alias("__before"),
        )
    )
    # 2. in-cell strict-below counts: one union window on (key, cell)
    u = pts.select(
        *on,
        "__cell",
        "__v",
        F.lit(1).alias("__isp"),
        *[F.lit(None).cast(t.dataType).alias(c) for c, t in
          zip(id_cols, (bounds.schema[c] for c in id_cols))],
        F.lit(None).cast("int").alias("__side"),
    ).unionByName(
        bounds.select(*on, "__cell", "__v", F.lit(0).alias("__isp"), *id_cols, "__side")
    )
    wcell = Window.partitionBy(*on, "__cell").orderBy("__v", "__isp").rowsBetween(
        Window.unboundedPreceding, 0
    )
    incell = (
        u.withColumn("__below", F.sum("__isp").over(wcell) - F.col("__isp"))
        .filter(F.col("__isp") == 0)
        .select(*on, *id_cols, "__side", "__cell", "__below")
    )
    # 3. totals + the per-interval difference
    totals = incell.join(F.broadcast(prefix), [*on, "__cell"]).select(
        *on,
        *id_cols,
        "__side",
        (F.col("__below") + F.col("__before")).alias("__total"),
    )
    return totals.groupBy(*on, *id_cols).agg(
        (
            F.sum(F.when(F.col("__side") == 1, F.col("__total")).otherwise(0))
            - F.sum(F.when(F.col("__side") == 0, F.col("__total")).otherwise(0))
        )
        .cast("long")
        .alias("n_inside")
    )

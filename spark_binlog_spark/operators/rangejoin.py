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

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

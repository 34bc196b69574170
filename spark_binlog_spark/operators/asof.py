"""As-of join — the temporal operator Spark lacks natively.

Join each left row to the most recent right row with
``right_time <= left_time`` per key (market-data "last known rate",
config-as-of-event, feature-freshness joins).  Naive range joins
explode to O(left × right) per key; the scalable form is the classic
union + last-value trick:

  1. union left and right into one relation tagged by side,
  2. ONE window per key ordered by (time, side) computing
     ``last(value, ignorenulls=True)`` over rows unbounded-preceding,
  3. keep the left rows — each now carries the latest preceding
     right-side values.

Cost: one shuffle on the key (the same partitioning both inputs would
need anyway), zero row multiplication, AQE-skew-splittable.  Right rows
sort BEFORE left rows at equal timestamps, giving inclusive
(<=) semantics — matching DuckDB's ``ASOF JOIN`` which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` values at-or-before each left row.

    ``on``: equi-key columns present in both sides; ``value_cols``:
    right-side columns to carry; left columns all pass through.  Left
    rows with no preceding right row keep nulls (left-outer semantics).

    ``value_cols`` must not collide with left column names (asserted —
    the output would otherwise contain duplicate names and make every
    downstream reference ambiguous); prefix/rename on the right side
    first if they do.  Ties: when multiple right rows share the same
    (key, time), ``tie_break`` (a right-side column, e.g. an offset)
    makes the winner deterministic — the LARGEST value wins; without it
    the winner among equal timestamps is partition-order-dependent.
    """
    overlap = set(value_cols) & set(left.columns)
    if overlap:  # not an assert: must survive python -O
        raise ValueError(
            f"value_cols {sorted(overlap)} collide with left columns — "
            "rename/prefix them on the right side before the as-of join"
        )
    tb_type = dict(right.dtypes)[tie_break] if tie_break else "long"
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c)
          for c in left.columns],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tie_break) if tie_break else F.lit(None)).cast(tb_type).alias("__tb"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*on)
        # right rows (side 0) sort before left at equal time (inclusive
        # <=); among equal-(key, time) right rows the largest tie_break
        # sorts last, so last(ignorenulls) picks it
        .orderBy(F.col("__t"), F.col("__side"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")

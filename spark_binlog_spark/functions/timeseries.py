"""Time-series subsequence pattern search over keyed event streams —
"find the k windows most similar to this motif" (the distributed
streaming-similarity problem of EDBT'19-style systems; the natural
downstream of a CDC/event engine once changes are flowing).

Representation: per-key sliding windows of length ``w`` over the
quantized value series (floor(value*100) — both engines compute the
same IEEE double product, so results are integer-exact against the
DuckDB oracle).  Two distances per window, both integer-only:

- ``dist``  — squared Euclidean to the query pattern.
- ``cdist`` — SHIFT-INVARIANT squared Euclidean: each side is centered
  by its own window sum using the w-scaled trick
  (w·x_i − Σx vs w·p_i − Σp), i.e. w²·Σ((x_i−x̄)−(p_i−p̄))² computed
  entirely in integers — the translation half of z-normalization
  without a lossy division.

Plan shape (scales linearly in events, factor w): row_number per key
(keyed window — partitions by key, no global sort), each row explodes
into the ≤w windows it participates in, ONE keyed partial agg rebuilds
each window's vector (array_sort of (pos,val) structs — deterministic),
distances are zip_with/aggregate expressions against the BROADCAST
literal pattern (w scalars), and top-k is Spark's TakeOrdered (no full
sort materialization).  Zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 100  # value -> floor(value*QUANT) as long, both engines identical


def quantized_series(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, rn, qv): per-key 1-based positions in event order."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    return df.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).alias("rn"),
        F.floor(F.col(value_col) * QUANT).cast("long").alias("qv"),
    )


def sliding_windows(series: DataFrame, w: int) -> DataFrame:
    """(key, win_start, vec array<long>): complete length-``w`` windows.
    Explode-then-regroup: each row lands in the ≤w windows containing
    it; the regroup is a keyed partial agg (map-side combine), and
    array_sort on (pos, value) structs makes the rebuilt vector order
    deterministic without an ordered-collect assumption."""
    exploded = series.select(
        "key",
        F.explode(
            F.sequence(F.greatest(F.col("rn") - (w - 1), F.lit(1)), F.col("rn"))
        ).alias("win_start"),
        F.struct(F.col("rn"), F.col("qv")).alias("s"),
    )
    return (
        exploded.groupBy("key", "win_start")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .filter(F.size("ss") == w)
        .select(
            "key",
            "win_start",
            F.transform(F.col("ss"), lambda x: x["qv"]).alias("vec"),
        )
    )


def pattern_topk(
    df: DataFrame,
    pattern: list[int],
    k: int = 10,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Top-k windows by raw squared-Euclidean distance to ``pattern``
    (already quantized ints), with the shift-invariant cdist carried
    alongside; ties break on (key, win_start) so results are total-
    ordered and replayable."""
    w = len(pattern)
    pat = F.array(*[F.lit(int(p)).cast("long") for p in pattern])
    psum = sum(int(p) for p in pattern)
    wins = sliding_windows(
        quantized_series(df, key_col, order_col, value_col), w
    )
    zero = F.lit(0).cast("long")
    dist = F.aggregate(
        F.zip_with(F.col("vec"), pat, lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )
    vsum = F.aggregate(F.col("vec"), zero, lambda acc, x: acc + x)
    cdist = F.aggregate(
        F.zip_with(
            F.col("vec"),
            pat,
            lambda a, b: (
                (a * w - F.col("vsum")) - (b * w - F.lit(psum))
            )
            * ((a * w - F.col("vsum")) - (b * w - F.lit(psum))),
        ),
        zero,
        lambda acc, x: acc + x,
    )
    return (
        wins.withColumn("vsum", vsum)
        .select(
            F.col("key"),
            F.col("win_start").cast("long").alias("win_start"),
            dist.alias("dist"),
            cdist.alias("cdist"),
        )
        .orderBy("dist", "key", "win_start")
        .limit(k)
    )

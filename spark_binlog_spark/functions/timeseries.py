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
into the ≤w windows it participates in and scores itself against the
BROADCAST literal pattern at its in-window position, ONE keyed
sum/count hash aggregate (map-side partial agg) folds the per-member
squared terms into each window's distance — the window vector is never
materialized — and top-k is Spark's TakeOrdered (no full sort
materialization).  Zero Python anywhere.
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
    ordered and replayable.

    r14 plan: the distances are DISTRIBUTIVE over window members, so
    the window vectors are never materialized.  Each exploded member
    row knows its in-window position (rn - win_start + 1) and scores
    itself against the broadcast literal pattern; the regroup is then
    a plain sum/count hash aggregate — map-side partial agg applies,
    where the old collect_list(struct) ObjectHashAggregate shipped
    every member through the exchange and paid interpreted
    zip_with/aggregate HOF evaluation per element afterwards (guide
    §2.3 "aggregate before you shuffle", §4 on HOF eval).  The
    shift-invariant distance folds algebraically onto the raw one:
    with c = vsum - psum,  cdist = w^2*dist - w*c^2  (expand
    ((a_i - b_i)*w - c)^2 and use sum(a_i - b_i) = c) — integer-exact,
    same int64 envelope as the old per-element form."""
    w = len(pattern)
    pat = F.array(*[F.lit(int(p)).cast("long") for p in pattern])
    psum = sum(int(p) for p in pattern)
    series = quantized_series(df, key_col, order_col, value_col)
    pos = (F.col("rn") - F.col("win_start") + 1).cast("int")
    diff = F.col("qv") - F.element_at(pat, pos)
    member = series.select(
        "key",
        F.explode(
            F.sequence(F.greatest(F.col("rn") - (w - 1), F.lit(1)), F.col("rn"))
        ).alias("win_start"),
        "rn",
        "qv",
    ).select("key", "win_start", F.col("qv"), (diff * diff).alias("d2"))
    agg = (
        member.groupBy("key", "win_start")
        .agg(
            F.sum("d2").alias("dist"),
            F.sum("qv").alias("vsum"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") == w)
    )
    c = F.col("vsum") - F.lit(psum).cast("long")
    cdist = F.lit(w * w).cast("long") * F.col("dist") - F.lit(w).cast("long") * c * c
    return (
        agg.select(
            F.col("key"),
            F.col("win_start").cast("long").alias("win_start"),
            F.col("dist"),
            cdist.alias("cdist"),
        )
        .orderBy("dist", "key", "win_start")
        .limit(k)
    )

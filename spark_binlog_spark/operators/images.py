"""Latest-image and CDC-apply — the reference's downstream value proposition.

The reference delegates these to delta-plus (README.md:88-99 ``idCols``,
``syncType=binlog``); they are the D3/D4 operators of SURVEY.md §2.B and
the heart of "binlog -> queryable table".

Scale notes (100 TB):
- ``latest_image`` is one shuffle on the primary key (window w/
  partitionBy); with AQE on, skewed keys are split automatically.  At
  1000 executors this is the same plan Delta/Iceberg MERGE uses for its
  dedup stage.
- ``cdc_apply`` broadcasts the (small) latest-image side when it fits
  (changed keys per micro-batch << base table); the base table is
  scanned once, no shuffle on the base side for the anti-join when the
  changes side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_image(
    df: DataFrame,
    key_cols: list[str],
    offset_col: str | list[str] = "cdc_offset",
) -> DataFrame:
    """D3 — keep the last change event per primary key, by offset order.

    Offset total order per protocols.scala:24-26 makes ``row_number``
    over (key, offset desc) deterministic — offsets are unique.

    ``offset_col`` may be a LIST of columns for a lexicographic order
    (e.g. ``["batch_id", "cdc_offset"]``): packing multiple dimensions
    into one integer (``a * 2^40 + b``) silently inverts the order once
    ``b`` outgrows the shift, so compound orders are expressed as
    compound sort keys instead.
    """
    order_cols = [offset_col] if isinstance(offset_col, str) else list(offset_col)
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    change_key_col: str = "pk",
    op_col: str = "op",
    set_cols: dict[str, str] | None = None,
    broadcast_changes: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """D4 — apply a change stream onto a base snapshot (upsert + delete).

    Semantics of the delta-plus contract (README.md:45,88-99): reduce
    changes to latest-image per key first; keys whose last op is
    ``delete`` disappear; other keys are upserted.  Updates carry
    after-images only (UpdateRowsWriter.java:54-57) so an upsert row is
    the change row's payload joined with the base row for columns the
    change does not set.

    ``set_cols`` maps base-column -> changes-column for the payload the
    stream overwrites; unset base columns are carried from the snapshot
    (or take the change side's value via coalesce for brand-new keys).
    """
    set_cols = set_cols or {}
    latest = latest_image(changes, [change_key_col])
    if materialize:
        # latest is referenced THREE times below (merge join, key probe,
        # insert anti-join); without materialization Catalyst replays the
        # entire upstream changes pipeline — including its window
        # shuffle — once per reference.  The latest-image set is small
        # (<= one row per changed key per batch), so cache it.
        from pyspark.storagelevel import StorageLevel

        latest = latest.persist(StorageLevel.MEMORY_AND_DISK)
    maybe_bc = F.broadcast if broadcast_changes else (lambda df: df)

    # Pass 1 — ONE full scan of base, LEFT JOIN broadcast(latest): Spark
    # builds the hash table on the small right side (BuildRight is the
    # only broadcastable shape for a left outer join), the base side
    # streams with zero shuffle.  Matched+deleted rows drop, matched
    # rows take the change payload, unmatched pass through.
    b, c = base.alias("b"), maybe_bc(latest).alias("c")
    ck = F.col(f"c.{change_key_col}")
    joined = b.join(c, F.col(f"b.{key_col}") == ck, "left")
    kept = joined.filter(ck.isNull() | (F.col(f"c.{op_col}") != "delete"))
    out_cols = []
    for col in base.columns:
        if col in set_cols:
            out_cols.append(
                F.when(ck.isNotNull(), F.col(f"c.{set_cols[col]}"))
                .otherwise(F.col(f"b.{col}"))
                .alias(col)
            )
        else:
            out_cols.append(F.col(f"b.{col}").alias(col))
    merged = kept.select(*out_cols)

    # Pass 2 — brand-new keys (in changes, absent from base).  Detect
    # them with a key-column-pruned base scan INNER JOIN broadcast(change
    # keys) -> matched_keys (small), then a small-vs-small anti join.
    # The base table is never shuffled in either pass.
    change_keys = latest.select(F.col(change_key_col).alias("__ck"))
    matched_keys = (
        base.select(F.col(key_col).alias("__bk"))
        .join(maybe_bc(change_keys), F.col("__bk") == F.col("__ck"), "inner")
        .select("__ck")
    )
    inserts = latest.filter(F.col(op_col) != "delete").join(
        maybe_bc(matched_keys), F.col(change_key_col) == F.col("__ck"), "left_anti"
    )
    base_types = dict(base.dtypes)
    ins_cols = []
    for col in base.columns:
        if col == key_col:
            ins_cols.append(F.col(change_key_col).cast(base_types[col]).alias(col))
        elif col in set_cols:
            ins_cols.append(F.col(set_cols[col]).alias(col))
        else:
            ins_cols.append(F.lit(None).cast(base_types[col]).alias(col))
    return merged.unionByName(inserts.select(*ins_cols))


def scd2_history(
    df: DataFrame,
    key_col: str = "pk",
    offset_col: str = "cdc_offset",
    value_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) materialization of a change
    stream: one VERSION row per non-delete change, valid over the
    offset interval [its own offset, the key's next change of any
    kind); the open-ended latest version is flagged ``is_current``.
    A delete event emits no version — it only closes the previous one
    (its offset becomes that version's ``valid_to``).

    The audit-trail counterpart of ``latest_image`` (which this
    generalizes: the is_current rows ARE the latest non-deleted
    images) — the downstream "how did this row look at offset X"
    surface CDC users materialize next to the live table.

    Scale: ONE shuffle on the key (the lead window partitions by
    ``key_col``, never globally) — the same plan shape and skew story
    as latest_image.
    """
    value_cols = value_cols or ["value"]
    w = Window.partitionBy(key_col).orderBy(offset_col)
    return (
        df.withColumn("valid_to", F.lead(offset_col).over(w))
        .filter(F.col(op_col) != "delete")
        .select(
            key_col,
            *value_cols,
            F.col(offset_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )

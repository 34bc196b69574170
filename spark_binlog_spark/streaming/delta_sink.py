"""Delta Lake MERGE sink — the sink a production deployment uses.

The reference's documented pipeline upserts the change stream into
delta-plus with ``idCols`` / ``syncType=binlog`` (README.md:88-99); on
open-source Spark the equivalent is a ``foreachBatch`` that MERGEs each
micro-batch's latest-image rows into a Delta table:

    MERGE INTO target t USING latest_image(batch) s ON t.key = s.pk
      WHEN MATCHED AND s.op = 'delete' THEN DELETE
      WHEN MATCHED THEN UPDATE SET <set_cols>
      WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT <set_cols>

Plan shape: the source side is one micro-batch reduced to latest-image
(D3) and broadcast; Delta rewrites only the files containing matched
keys — the base is never shuffled, the same property cdc_apply and
MergeOnReadSink maintain by hand.

Replay (foreachBatch is at-least-once): re-MERGING the same
latest-image rows is convergent — matched updates set the values they
already have, a replayed delete no longer matches and its insert arm is
gated on op != 'delete' — so a crash-replay lands on the same state
rather than double-applying.

``delta-spark`` is not installed in this container, so the import is
gated: constructing the sink without the package raises a clear
ImportError; the full test battery (tests/test_delta_sink.py) skips
itself via ``pytest.importorskip``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.operators import latest_image

try:  # import-try: delta-spark is an optional dependency
    from delta.tables import DeltaTable

    HAS_DELTA = True
except ImportError:  # pragma: no cover - exercised where delta is installed
    DeltaTable = None
    HAS_DELTA = False


def require_delta() -> None:
    if not HAS_DELTA:
        raise ImportError(
            "delta-spark is not installed; DeltaMergeSink needs the 'delta' "
            "package and a Spark session built with "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension. "
            "Use MergeOnReadSink/ParquetUpsertSink for a dependency-free sink."
        )


class DeltaMergeSink:
    """foreachBatch sink: MERGE each micro-batch into a Delta table.

    Same parameter contract as MergeOnReadSink: ``key_col`` names the
    base key, ``set_cols`` maps base column -> change column, and the
    change-stream column names are parameters (default pk/op/cdc_offset).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        base: DataFrame,
        key_col: str,
        set_cols: dict[str, str],
        change_key_col: str = "pk",
        op_col: str = "op",
        offset_col: str = "cdc_offset",
        resume: bool = False,
    ):
        require_delta()
        self.spark = spark
        self.table_path = table_path
        self.key_col = key_col
        self.set_cols = set_cols
        self.change_key_col = change_key_col
        self.op_col = op_col
        self.offset_col = offset_col
        if not (resume and DeltaTable.isDeltaTable(spark, table_path)):
            # bootstrap = S4 full-sync; Delta's log makes this atomic
            base.write.format("delta").mode("overwrite").save(table_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        latest = latest_image(batch_df, [self.change_key_col], offset_col=self.offset_col)
        tgt = DeltaTable.forPath(self.spark, self.table_path)
        update_set = {b: f"s.{c}" for b, c in self.set_cols.items()}
        insert_vals = dict(update_set)
        insert_vals[self.key_col] = f"s.{self.change_key_col}"
        # columns the stream doesn't carry stay NULL on insert, exactly
        # like cdc_apply's insert arm (full after-images make this moot)
        (
            tgt.alias("t")
            .merge(
                F.broadcast(latest).alias("s"),
                f"t.{self.key_col} = s.{self.change_key_col}",
            )
            .whenMatchedDelete(condition=f"s.{self.op_col} = 'delete'")
            .whenMatchedUpdate(set=update_set)
            .whenNotMatchedInsert(
                condition=f"s.{self.op_col} != 'delete'", values=insert_vals
            )
            .execute()
        )

    def current(self) -> DataFrame:
        return self.spark.read.format("delta").load(self.table_path)

"""JDBC MERGE upsert sink: apply a CDC stream onto a LIVE relational
table (embedded Derby in this container; any MERGE-capable JDBC
database — MySQL, Postgres — in production by swapping url/driver).

The reference ships its change stream into downstream stores the same
way (README's binlog → queryable-table pipelines); this sink is the
JDBC member of the S5 family beside the parquet COW/MOR/Delta sinks.

Per micro-batch, SET-BASED and two-phase — never a driver-side row
loop:
  1. reduce the batch to its per-key latest image (one window over the
     micro-batch, batch-sized);
  2. distributed ``DataFrame.write.jdbc`` append into a STAGING table
     (each task opens its own connection — Spark's standard JDBC
     write path);
  3. ONE ``MERGE INTO target USING staging`` statement executed in the
     DATABASE (set-based upsert+delete; the only driver-side work is
     issuing the statement).

Effectively-once under foreachBatch's at-least-once: the staging
table is cleared at batch start, the replayed batch recomputes the
identical latest-image rows, and re-MERGing them is idempotent
(update to the same values; delete of an absent key matches nothing;
insert of a now-present key becomes an update to the same values).
The same idempotent-merge argument as ParquetUpsertSink
(test_streaming::TestCrashRecovery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_DDL_TYPES = {
    "bigint": "BIGINT",
    "int": "INT",
    "double": "DOUBLE",
    "float": "REAL",
    "string": "VARCHAR(255)",
    "timestamp": "TIMESTAMP",
    "boolean": "BOOLEAN",
}


def _ddl_type(spark_type: str) -> str:
    try:
        return _DDL_TYPES[spark_type]
    except KeyError:
        raise ValueError(f"no JDBC DDL mapping for spark type {spark_type!r}")


class JdbcUpsertSink:
    """foreachBatch sink MERGE-ing per-key latest images into a JDBC
    table.  ``key_col`` is the primary key; ``val_cols`` the payload
    columns carried over; rows with ``op == 'delete'`` delete the key.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        key_col: str,
        val_cols: dict[str, str],
        order_col: str = "cdc_offset",
        op_col: str = "op",
        driver: str = DERBY_DRIVER,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.staging = f"{table}_staging"
        self.key_col = key_col
        self.val_cols = val_cols  # target column -> source column
        self.order_col = order_col
        self.op_col = op_col
        self.driver = driver
        self.applied_batches: list[tuple[int, int]] = []
        self._types: dict[str, str] | None = None

    # -- plain JDBC statement execution via the driver JVM (DDL + MERGE
    # are single set-based statements; all row traffic goes through the
    # distributed write.jdbc path, never through here)
    def _exec(self, sql: str, ignore: tuple[str, ...] = ()) -> None:
        jvm = self.spark._sc._jvm
        jvm.java.lang.Class.forName(self.driver)
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            stmt = conn.createStatement()
            try:
                stmt.execute(sql)
            except Exception as e:  # py4j wraps SQLException
                if not any(tag in str(e) for tag in ignore):
                    raise
            finally:
                stmt.close()
        finally:
            conn.close()

    def _ensure_tables(self, latest: DataFrame) -> None:
        if self._types is not None:
            return
        types = {f.name: _ddl_type(f.dataType.simpleString()) for f in latest.schema.fields}
        cols = [self.key_col, *self.val_cols]
        body = ", ".join(f"{c} {types[c]}" for c in cols)
        # X0Y32 = Derby's table-already-exists SQLSTATE (resume) — match
        # the state code, not free text, so unrelated errors whose
        # message merely mentions existence still raise; PK makes the
        # merge's ON clause an index lookup
        self._exec(
            f"CREATE TABLE {self.table} ({body}, PRIMARY KEY ({self.key_col}))",
            ignore=("X0Y32",),
        )
        self._exec(
            f"CREATE TABLE {self.staging} ({body}, {self.op_col} VARCHAR(16))",
            ignore=("X0Y32",),
        )
        self._types = types

    def current(self) -> DataFrame:
        try:
            return (
                self.spark.read.format("jdbc")
                .option("url", self.url)
                .option("dbtable", self.table)
                .option("driver", self.driver)
                .load()
            )
        except Exception as e:
            # tables are created lazily on the first non-empty batch
            # (their DDL types come from the batch schema) — make the
            # before-first-batch read a clear error, not a raw SQLState
            if self._types is None and "does not exist" in str(e):
                raise RuntimeError(
                    f"JdbcUpsertSink.current(): no batch has created {self.table} "
                    "yet (tables are derived from the first non-empty batch)"
                ) from e
            raise

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        # per-key latest image WITHIN the batch (cross-batch ordering is
        # the merge itself: later batches re-merge the same keys).
        # PERSISTED: the count below and the staging write must not each
        # re-execute the window over the batch (one materialization, two
        # cheap reads).
        w = Window.partitionBy(self.key_col).orderBy(F.col(self.order_col).desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col(self.key_col),
                *[F.col(src).alias(dst) for dst, src in self.val_cols.items()],
                F.col(self.op_col),
            )
            .persist()
        )
        try:
            n = latest.count()
            if n == 0:
                self.applied_batches.append((batch_id, 0))
                return
            self._ensure_tables(latest)
            # phase 1: clear staging (makes the whole batch replayable)
            self._exec(f"DELETE FROM {self.staging}")
            # phase 2: DISTRIBUTED append into staging (reads the cache)
            (
                latest.write.format("jdbc")
                .option("url", self.url)
                .option("dbtable", self.staging)
                .option("driver", self.driver)
                .mode("append")
                .save()
            )
            # phase 3: one set-based MERGE inside the database
            sets = ", ".join(f"{c} = s.{c}" for c in self.val_cols)
            cols = ", ".join([self.key_col, *self.val_cols])
            vals = ", ".join(f"s.{c}" for c in [self.key_col, *self.val_cols])
            self._exec(
                f"MERGE INTO {self.table} t USING {self.staging} s "
                f"ON t.{self.key_col} = s.{self.key_col} "
                f"WHEN MATCHED AND s.{self.op_col} = 'delete' THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED AND s.{self.op_col} <> 'delete' "
                f"THEN INSERT ({cols}) VALUES ({vals})"
            )
            self.applied_batches.append((batch_id, n))
        finally:
            latest.unpersist()

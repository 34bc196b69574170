"""Ingest-side predicates F1/F2 as Catalyst filters.

The reference evaluates these row-at-a-time inside the binlog event
callback (BinLogSocketServerInExecutor.scala:219-257); here they are
declarative ``filter`` nodes, so Catalyst pushes them into the scan
(PushedFilters for literal predicates; rlike stays a codegen'd filter
directly above it) and prunes unmatched data before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WRITE_OPS = ("insert", "update", "delete")  # MySQL write kinds (README.md:38-41)


def table_pattern_filter(
    df: DataFrame,
    database_pattern: str,
    table_pattern: str,
    db_col: str = "database_name",
    table_col: str = "table_name",
) -> DataFrame:
    """F1 — keep events whose (db, table) match both regexes.

    Reference: databaseNamePattern/tableNamePattern compiled once and
    matched on TABLE_MAP events (BinLogSocketServerInExecutor.scala:219-237,
    277-281; HBase variant HBaseWALSocketServerInExecutor.scala:131-137).
    """
    return df.filter(F.col(db_col).rlike(database_pattern) & F.col(table_col).rlike(table_pattern))


def event_type_filter(df: DataFrame, ops: tuple[str, ...] = WRITE_OPS, op_col: str = "op") -> DataFrame:
    """F2 — keep only row-change event kinds; everything else is dropped.

    Reference: isWrite/isUpdate/isDelete dispatch
    (BinLogSocketServerInExecutor.scala:239-257); HBase Put/Delete only
    (HBaseWALClient.scala:173-199).  ``isin`` compiles to an In predicate
    that Spark pushes to the parquet scan when the column is stored.
    """
    return df.filter(F.col(op_col).isin(*ops))


def write_op_predicate(op_col: Column) -> Column:
    return op_col.isin(*WRITE_OPS)

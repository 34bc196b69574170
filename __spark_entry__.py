"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC pipeline (envelope encode ->
parse -> flatten -> latest-image -> apply onto the snapshot) at
sf0.001.  ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions,
each with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from spark_binlog_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC slice on /root/testdata/sf0.001.

    events -> envelope JSON (P4) -> from_json parse (D1) -> table filter
    (F1) -> flatten (P3) -> latest-image per key (D3) -> apply onto the
    customer snapshot (D4): "the current state of the table after
    replaying the change stream"."""
    from spark_binlog_spark.pipeline import flagship_cdc_pipeline

    return flagship_cdc_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()

"""Central query registry: name -> (spark_fn, oracle_sql | None).

``__spark_entry__.py`` re-exports this; tests iterate it to check every
query against DuckDB locally exactly like the driver does.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_binlog_spark import queries_cdc, queries_ext

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect(module) -> dict[str, QueryFn]:
    return {
        name: fn
        for name, fn in inspect.getmembers(module, inspect.isfunction)
        if name.startswith("q_")
    }


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(_collect(queries_cdc))
    out.update(_collect(queries_ext))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(queries_cdc.ORACLE)
    out.update(queries_ext.ORACLE)
    return out

"""Stateful streaming latest-image (D3 as a *streaming-native* operator).

The foreachBatch MERGE sink (pipeline.py) re-applies each micro-batch to
stored state; this operator instead keeps the per-key latest image IN
Spark's state store via ``applyInPandasWithState`` and emits updates as
they happen — the shape you want when downstream is another stream (no
storage round-trip, state sharded per key across executors, checkpointed
by Structured Streaming).

State per key: (last_offset, last_op, last_value).  An event replays
idempotently because the monotonic offset guard (O6,
OriginalSourceServerInExecutor.scala:164-171) is the state transition:
only a strictly greater offset wins.

Scale: state volume = one tuple per live key, hash-partitioned by pk;
Arrow batches carry groups, so the Python stage is vectorized per batch,
not per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "pk LONG, last_offset LONG, last_op STRING, last_value DOUBLE"
STATE_SCHEMA = "last_offset LONG, last_op STRING, last_value DOUBLE"


def latest_image_stateful(changes: DataFrame) -> DataFrame:
    """changes(pk, cdc_offset, op, value) stream -> update stream of the
    per-key latest image."""

    def update_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mo, mop, mv = state.get
        else:
            mo, mop, mv = -1, None, None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf["cdc_offset"].idxmax()
            off = int(pdf["cdc_offset"][idx])
            if off > mo:  # monotonic guard: replays never regress state
                mo = off
                mop = str(pdf["op"][idx])
                mv = float(pdf["value"][idx])
        state.update((mo, mop, mv))
        yield pd.DataFrame(
            [{"pk": int(key[0]), "last_offset": mo, "last_op": mop, "last_value": mv}]
        )

    return changes.groupBy("pk").applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_image_tws(changes: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Same operator on Spark 4's ``transformWithState`` — the successor
    API (SPARK-49564): typed per-key state handles, optional TTL, and the
    RocksDB state store (required by the API; set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider before starting the query).

    ``ttl_ms`` expires idle keys' state — the knob a 100 TB deployment
    uses to stop dead keys from growing state without bound (the
    applyInPandasWithState form above would need manual timeout
    bookkeeping for the same behavior).

    Extra dependency (import-gated): the transformWithState Python
    state-server protocol speaks protobuf, so the ``protobuf`` package
    must be installed — it is not in this container, where the
    applyInPandasWithState form is the runnable path.
    """
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        has_protobuf = False
    if not has_protobuf:
        raise ImportError(
            "transformWithState requires the 'protobuf' package (its state "
            "server protocol is protobuf-based) — not installed here; use "
            "latest_image_stateful (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class LatestImageProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            if ttl_ms is None:
                self._state = handle.getValueState("latest", STATE_SCHEMA)
            else:
                self._state = handle.getValueState("latest", STATE_SCHEMA, ttl_ms)

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            mo, mop, mv = -1, None, None
            if self._state.exists():
                mo, mop, mv = self._state.get()
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                idx = pdf["cdc_offset"].idxmax()
                off = int(pdf["cdc_offset"][idx])
                if off > mo:  # same monotonic replay guard as update_fn
                    mo = off
                    mop = str(pdf["op"][idx])
                    mv = float(pdf["value"][idx])
            self._state.update((mo, mop, mv))
            yield pd.DataFrame(
                [{"pk": int(key[0]), "last_offset": mo, "last_op": mop, "last_value": mv}]
            )

        def close(self) -> None:
            pass

    return changes.groupBy("pk").transformWithStateInPandas(
        statefulProcessor=LatestImageProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        # TTL state is only legal under ProcessingTime time mode —
        # Spark rejects getValueState(..., ttl) with timeMode="None"
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )

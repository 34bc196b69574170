"""Bounded lifetime for caches that must outlive their function call.

Some query builders persist an intermediate relation that the RETURNED
lazy DataFrame still references (e.g. ``bm25_topk``'s (doc, term) tf
relation feeds tf, dl and dfreq).  Unpersisting before return would
silently triple the corpus scans; never unpersisting leaks the cache
across repeated invocations (bench times each query three times, the
parity suite runs all registered queries in one session).

``release(key)`` frees the PREVIOUS invocation's cached relations for
``key``; ``swap_caches(key, dfs)`` does the same and then records the
new ones — at most one live cache set per call site, while the
current result's plan stays lazy (plan gates in tests/test_plans.py
inspect it).

ORDERING MATTERS: call ``release(key)`` BEFORE persisting the new
relations.  Spark's cache manager keys entries by logical plan, so a
repeat invocation over the same input produces the SAME plan — if the
new persist lands first, unpersisting the old handle drops the shared
entry and silently un-caches the new invocation too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: dict[str, list[DataFrame]] = {}


def swap_caches(key: str, dfs: list[DataFrame]) -> None:
    for old in _live.get(key, []):
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old cache may already be stopped
    _live[key] = list(dfs)


def release(key: str) -> None:
    swap_caches(key, [])
    _live.pop(key, None)

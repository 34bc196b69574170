"""Skew mitigation for hot-key joins.

A CDC stream is naturally skewed (one hot row/key can dominate a
micro-batch).  Three tiers, in order of preference:

1. ``broadcast`` the small side — no shuffle at all (cdc_apply does this).
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
   default) — splits oversized partitions at runtime.
3. Explicit salting (this module) — when the big side must shuffle-join
   a medium side that is too big to broadcast AND keys are pathological:
   fan the dim side out ×N salts so one hot key spreads over N reducers.

Salts are derived deterministically from a data column (offset), not
rand(), so retries/replays stay stable — important under speculative
execution and streaming replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join facts⋈dim on key, spreading each key over ``n_salts``
    reducers.  ``salt_source`` is a facts column with per-row variation
    (e.g. the offset) — salt = salt_source % n_salts, replicated on the
    dim side with an explode.  Output = plain join output (salt dropped).
    """
    f = facts.withColumn("__salt", (F.col(salt_source) % n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    joined = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return joined.drop("__salt")

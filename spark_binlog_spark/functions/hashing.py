"""Cross-engine deterministic hashing primitives.

Everything downstream (minhash, simhash, fingerprints, LSH buckets) needs
a hash that Spark and the DuckDB oracle compute IDENTICALLY.  Spark's
``hash()`` is murmur3 and DuckDB's ``hash()`` is its own — they disagree.
md5 agrees everywhere, so our integer hash is:

    h48(s) = int(md5(s)[:12], 16)            # 48 bits, fits signed 64

Spark:  conv(substr(md5(s), 1, 12), 16, 10) :: bigint
DuckDB: ('0x' || substr(md5(s), 1, 12)) :: BIGINT

Seeded variants append '#<seed>' to the input.  48 bits keeps every
intermediate (including sums over 64 dims and band concatenations) inside
signed-long range in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h48(col: Column, seed: int | None = None) -> Column:
    """48-bit md5-derived integer hash; optionally seeded."""
    s = col.cast("string")
    if seed is not None:
        s = F.concat(s, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def h48_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB rendering of the same hash, for oracle SQL strings."""
    s = f"CAST({expr} AS VARCHAR)"
    if seed is not None:
        s = f"({s} || '#{seed}')"
    return f"CAST('0x' || substr(md5({s}), 1, 12) AS BIGINT)"


def h16(col: Column) -> Column:
    """16-bit variant (simhash bit width)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


def h16_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4) AS BIGINT)"

#!/usr/bin/env python
"""Generate the sf1 (10x sf0.1) documents/embeddings fixtures for the
scale ladder (VERDICT r10 ask #3).

/root/testdata is read-only, so the driver's generator cannot be rerun
at 10x; this reproduces the same distributional shape measured off
sf0.1 (31-word tech vocab, 10-100 words/doc, 5 langs at the observed
proportions, 20 sources, ~0.16% exact-dup rate, ~4.7% near-dup rewrite
rate, unit-norm 64-dim embeddings in 10 clusters) at 50,000 docs /
20,000 vectors.  Deterministic (seed 4242).  Output is gitignored —
regenerate on demand:

    python scripts/gen_scale_fixtures.py [out_dir]  # default scale_fixtures/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "the", "spark", "fast", "customer", "batch", "data", "sort", "value",
    "hash", "filter", "big", "dup", "part", "scan", "slow", "agg", "key",
    "window", "table", "merge", "join", "column", "order", "a", "vector",
    "line", "small", "group", "query", "row", "stream",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_CLUSTERS = 10
EXACT_DUP_RATE = 0.0016
NEAR_DUP_RATE = 0.047


def gen_documents(rng: np.random.Generator, n_docs: int = N_DOCS) -> pa.Table:
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_RATE:
            # light rewrite of an earlier doc: mutate ~8% of word slots
            words = texts[int(rng.integers(0, i))].split(" ")
            n_mut = max(1, int(len(words) * 0.08))
            for pos in rng.integers(0, len(words), n_mut):
                words[int(pos)] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(words))
            continue
        n_words = int(rng.integers(10, 101))
        texts.append(" ".join(VOCAB[int(w)] for w in rng.integers(0, len(VOCAB), n_words)))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n_vecs: int = N_VECS) -> pa.Table:
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    labels = rng.integers(0, N_CLUSTERS, n_vecs)
    pts = centers[labels] * 0.35 + rng.normal(0, 1, (n_vecs, DIM))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in pts], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


N_EVENTS = 1_000_000  # sf1 (10x the 100k sf0.1 log); sf10 -> 10M
N_USERS = 15_000
EVENT_TYPES = ["signup", "click", "view", "purchase", "error"]


def gen_events(rng: np.random.Generator, n_events: int = N_EVENTS,
               n_users: int = N_USERS) -> pa.Table:
    """CDC event log at scale (VERDICT r13 ask #3 — the reference's
    ACTUAL surface deserves the same 100x hunting as the extensions):
    same shape as the driver's sf0.1 events.parquet — sequential
    event_id, ts monotone over a 30-day window, uniform event types,
    user keys scaled with the log so latest-image/upsert cardinalities
    scale too, numeric value and a small JSON props payload."""
    event_id = np.arange(n_events, dtype=np.int64)
    # monotone timestamps: cumulative exponential gaps scaled to 30 days
    gaps = rng.exponential(1.0, n_events)
    ts_us = (np.cumsum(gaps) / gaps.sum() * (30 * 86_400 * 1_000_000)).astype(
        np.int64
    ) + np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC
    user_id = rng.integers(0, n_users, n_events)
    etype = rng.integers(0, len(EVENT_TYPES), n_events)
    value = np.round(rng.exponential(80.0, n_events), 2)
    props_k = rng.integers(0, 100, n_events)
    return pa.table(
        {
            "event_id": pa.array(event_id),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user_id.astype(np.int64)),
            "event_type": pa.array([EVENT_TYPES[i] for i in etype], pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in props_k], pa.string()),
        }
    )


# ------------------------------------------------------------- TPC-H-ish
# Snapshot-analytics tables at scale (r14: the last 10 sweep
# skip-missing-table rows all read customer/orders/lineitem/nation —
# q_cdc_apply, q_snapshot_union, q_bootstrap_snapshot, q_ship_priority,
# q_pricing_summary, ... — so the stock join/agg surface gets the same
# 100x rung as documents/embeddings/events).  Shapes mirror the
# driver's sf0.1 testdata, which is uniform-random (NOT rule-linked
# TPC-H: flags are independent of dates, shipdate independent of the
# order date, linenumber random in 1..7): measured off
# /root/testdata/sf0.1 with duckdb — segments/statuses/priorities
# uniform over the observed domains, dates uniform over the observed
# windows, acctbal/totalprice/extendedprice uniform over the observed
# ranges.  Separate seed stream so these can regenerate without
# touching the byte-identical documents/embeddings/events outputs.

TPCH_SEED = 7337
N_CUSTOMER = 150_000       # sf1 (10x the 15k sf0.1 table); sf10 -> 1.5M
N_ORDERS = 1_500_000       # sf1; sf10 -> 15M
N_LINEITEM = 6_000_000     # sf1; sf10 -> 60M
MKTSEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
ORDERSTATUS = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["N", "A", "R"]
LINESTATUS = ["O", "F"]

_EPOCH_US = {  # date window endpoints, microseconds since epoch (UTC)
    "1995-01-01": 788_918_400_000_000,
    "2001-08-01": 996_624_000_000_000,
    "1995-01-02": 789_004_800_000_000,
    "2001-11-04": 1_004_832_000_000_000,
}


def _pick(rng: np.random.Generator, values: list[str], n: int) -> pa.Array:
    """n uniform draws from ``values`` as a plain string column
    (C-side dictionary take — no 60M-element Python list)."""
    import pyarrow.compute as pc

    idx = pa.array(rng.integers(0, len(values), n).astype(np.int32))
    return pc.take(pa.array(values, pa.string()), idx)


def _day_us(rng: np.random.Generator, lo: str, hi: str, n: int) -> pa.Array:
    """Uniform midnight-aligned timestamps in [lo, hi] (the testdata
    dates are whole days)."""
    day = 86_400_000_000
    lo_d, hi_d = _EPOCH_US[lo] // day, _EPOCH_US[hi] // day
    return pa.array(
        rng.integers(lo_d, hi_d + 1, n).astype(np.int64) * day,
        pa.timestamp("us"),
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-1000.0, 10000.0, n), 2)),
            "c_mktsegment": _pick(rng, MKTSEGMENTS, n),
        }
    )


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n).astype(np.int64)),
            "o_orderstatus": _pick(rng, ORDERSTATUS, n),
            "o_totalprice": pa.array(np.round(rng.uniform(1000.0, 500000.0, n), 2)),
            "o_orderdate": _day_us(rng, "1995-01-01", "2001-08-01", n),
            "o_orderpriority": _pick(rng, PRIORITIES, n),
        }
    )


def gen_lineitem(rng: np.random.Generator, n: int, n_orders: int) -> pa.Table:
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, n).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, max(1, n // 30), n).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, max(1, n // 600), n).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105000.0, n), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n) * 0.01, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n) * 0.01, 2)),
            "l_returnflag": _pick(rng, RETURNFLAGS, n),
            "l_linestatus": _pick(rng, LINESTATUS, n),
            "l_shipdate": _day_us(rng, "1995-01-02", "2001-11-04", n),
        }
    )


def gen_nation() -> pa.Table:
    return pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
            "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
        }
    )


# split-friendly layout (r14, guide §6): pyarrow's default writes ONE
# row group per table, so Spark byte-range splits all resolve to a
# single task and every sf10 scan ran single-threaded regardless of
# cores (measured: the 500k-doc table planned 15 splits but only one
# carried rows).  32k-row groups give the scan real parallelism at
# every rung while keeping groups well above the small-files floor.
ROW_GROUP_ROWS = 32768


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_fixtures", "sf1",
    )
    # optional 2nd arg: multiplier on the sf1 sizes (10 -> sf10:
    # 500k docs / 200k vecs, two decades above the sf0.1 rung)
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_docs, n_vecs = N_DOCS * scale, N_VECS * scale
    os.makedirs(out, exist_ok=True)
    n_events, n_users = N_EVENTS * scale, N_USERS * scale
    rng = np.random.default_rng(4242)
    pq.write_table(gen_documents(rng, n_docs), os.path.join(out, "documents.parquet"), row_group_size=ROW_GROUP_ROWS)
    pq.write_table(gen_embeddings(rng, n_vecs), os.path.join(out, "embeddings.parquet"), row_group_size=ROW_GROUP_ROWS)
    pq.write_table(gen_events(rng, n_events, n_users), os.path.join(out, "events.parquet"), row_group_size=ROW_GROUP_ROWS)
    trng = np.random.default_rng(TPCH_SEED)
    n_cust, n_orders, n_li = N_CUSTOMER * scale, N_ORDERS * scale, N_LINEITEM * scale
    pq.write_table(gen_customer(trng, n_cust), os.path.join(out, "customer.parquet"), row_group_size=ROW_GROUP_ROWS)
    pq.write_table(gen_orders(trng, n_orders, n_cust), os.path.join(out, "orders.parquet"), row_group_size=ROW_GROUP_ROWS)
    pq.write_table(gen_lineitem(trng, n_li, n_orders), os.path.join(out, "lineitem.parquet"), row_group_size=ROW_GROUP_ROWS)
    pq.write_table(gen_nation(), os.path.join(out, "nation.parquet"), row_group_size=ROW_GROUP_ROWS)
    print(
        f"wrote {out}/documents.parquet ({n_docs} docs), embeddings.parquet "
        f"({n_vecs} vecs), events.parquet ({n_events} events), "
        f"customer/orders/lineitem ({n_cust}/{n_orders}/{n_li}), nation (25)"
    )


if __name__ == "__main__":
    main()

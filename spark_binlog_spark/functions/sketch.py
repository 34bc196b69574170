"""Mergeable frequency / cardinality sketches for corpus monitoring.

A 100 TB ingest pipeline cannot afford exact term-frequency or
distinct-count state: the exact answers need |vocabulary|-sized tables
that grow with the corpus.  The two classic bounded-state answers are

- COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005, "An improved data
  stream summary: the count-min sketch and its applications"): a d x w
  counter grid; every term increments one counter per row (col =
  hash_r(term) mod w) and a point query reads the MIN over its d
  counters — an overestimate with error <= 2N/w at probability
  1 - (1/2)^d.  The grid is PURELY ADDITIVE, so micro-batches merge by
  summing cells and two corpora merge the same way (the property the
  streaming sink exploits).

- HYPERLOGLOG (Flajolet et al. 2007, "HyperLogLog: the analysis of a
  near-optimal cardinality estimation algorithm"): m = 2^p registers,
  each holding the max leading-zero rank seen among hashes routed to
  it; cardinality ~= alpha_m * m^2 / sum_j 2^(-M_j).  Registers merge
  by MAX, so the sketch is a bounded-size distributed-union monoid.

Everything is integer-exact cross-engine: the hash is the repo's
md5-derived ``h48``; rho comes from ``length(bin(x))`` (no libm); the
HLL estimate is one HUGEINT/DECIMAL(38) floor division, never a
floating-point sum of 2^-M (whose summation ORDER differs between
engines).  The small-range linear-counting correction (raw estimate
<= 2.5m with empty registers left) IS applied — but through the
precomputed integer table ``_HLL_LC`` (m*ln(m/v) evaluated once in
Python per possible empty-register count v, baked into BOTH engines'
expressions as literals), never a runtime ln(), which would not be
bit-stable across engines.

Scale shape: one map-side-combinable term-count aggregation over the
corpus (the only corpus-sized shuffle), then every sketch relation is
bounded — d*w cells for CMS, m registers per group for HLL — and every
join against them broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_binlog_spark.functions.hashing import h48, h48_sql
from spark_binlog_spark.functions.text import words

# Sketch geometry — shared with the oracles.  w a power of two keeps
# `mod` cheap; d=4 rows put the union bound at (1/2)^4.
CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_SEED = 77

HLL_P = 8                      # m = 256 registers
HLL_M = 1 << HLL_P
HLL_SUFFIX_BITS = 48 - HLL_P   # h48 bits below the register index
# alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128, scaled to 7 digits.
HLL_ALPHA7 = 7182726
# Numerator of the estimate: alpha7 * m^2 * 2^suffix_bits+1 —
# precomputed so the in-plan arithmetic is ONE decimal floor division.
_HLL_NUM = HLL_ALPHA7 * HLL_M * HLL_M * (1 << (HLL_SUFFIX_BITS + 1))

# Small-range (linear counting) correction, Flajolet et al. §4: when
# the raw estimate is <= 2.5m and empty registers remain, the better
# estimator is m * ln(m / V_empty).  ln() is NOT bit-stable across
# engines — but V_empty only takes m integer values, so the whole
# branch is a PRECOMPUTED integer lookup evaluated once here in
# Python; both engines then index the same literal table.
import math as _math

_HLL_LC = [0] + [
    int(round(HLL_M * _math.log(HLL_M / v))) for v in range(1, HLL_M + 1)
]
_HLL_LC_GATE = 5 * HLL_M // 2  # 2.5m


def term_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, cnt) exact term frequencies — the ONE corpus-sized
    aggregation every sketch builder shares (map-side combinable; at
    100 TB this is a standard skew-tolerant hash agg)."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------- count-min
def _cms_col(term: Column, row: Column) -> Column:
    """Column index of `term` in sketch row `row`: the row-seeded h48
    (seed rides the hashed string, '<term>#<CMS_SEED + row>') mod w."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(term.cast("string"), F.lit("#"),
                           (F.lit(CMS_SEED) + row).cast("string"))),
            1, 12), 16, 10).cast("long")
    return h % CMS_WIDTH


def cms_build(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the d x w count-min grid over a document corpus:
    (row, col, cnt), at most CMS_DEPTH * CMS_WIDTH rows.

    Two shuffles: the corpus term agg (unavoidable, combinable) and a
    <= d * |vocab|-row regroup onto the 4096-cell grid."""
    tc = term_counts(df, text_col)
    rows = F.array(*[F.lit(r) for r in range(CMS_DEPTH)])
    return (
        tc.select("term", "cnt", F.explode(rows).alias("row"))
        .select("row", _cms_col(F.col("term"), F.col("row")).alias("col"), "cnt")
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_hash_sql(term_expr: str, row_expr: str) -> str:
    """DuckDB rendering of the per-row CMS column hash."""
    s = f"(CAST({term_expr} AS VARCHAR) || '#' || CAST(({CMS_SEED} + {row_expr}) AS VARCHAR))"
    return f"(CAST('0x' || substr(md5({s}), 1, 12) AS BIGINT) % {CMS_WIDTH})"


def cms_estimate(sketch: DataFrame, terms: DataFrame) -> DataFrame:
    """Point-query a (row, col, cnt) grid for a small term relation:
    (term, est_cnt) with est_cnt = min over the d rows.

    Both relations are bounded (grid <= 4096 cells, terms are the
    caller's query set), so the join broadcasts the GRID — |terms| * d
    probe rows, never a corpus shuffle."""
    probes = terms.select("term", F.explode(
        F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("row"))
    probes = probes.select(
        "term", "row", _cms_col(F.col("term"), F.col("row")).alias("col")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# --------------------------------------------------------------- hyperloglog
def _rho(suffix: Column) -> Column:
    """Leading-zero rank of a HLL_SUFFIX_BITS-wide suffix, in
    [1, HLL_SUFFIX_BITS + 1].

    r14: pure-integer descending WHEN chain instead of
    length(conv(x, 10, 2)) — the old form allocated a 40-char binary
    STRING per term instance and was the single most expensive
    operator of the register pass (sf10 profile: ~20 s of the 46 s est
    side; the chain is ~2 integer compares per row in expectation for
    uniform hash suffixes, no allocation).  Value-identical: suffix in
    [2^(S-k), 2^(S-k+1)) has bit length S-k+1, hence rho = k; the
    DuckDB oracle keeps its len(bin()) rendering, so parity tests pin
    the equivalence over the whole range."""
    chain = F.when(suffix >= (1 << (HLL_SUFFIX_BITS - 1)), F.lit(1))
    for k in range(2, HLL_SUFFIX_BITS + 1):
        chain = chain.when(suffix >= (1 << (HLL_SUFFIX_BITS - k)), F.lit(k))
    return chain.otherwise(F.lit(HLL_SUFFIX_BITS + 1)).cast("long")


def hll_registers(
    df: DataFrame, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """(by, idx, m_rho): the per-group HLL register table — at most
    m rows per group, merged by MAX.

    No ``.distinct()`` before the register aggregation (r14): the MAX
    merge is idempotent over repeated terms — max(rho) over all term
    instances equals max(rho) over distinct terms — so the old
    distinct-term pre-pass was a full corpus-sized (by, term) string
    shuffle bought for nothing.  Hashing per instance instead lets the
    register groupBy's map-side partial max reduce each task to at most
    m rows per group BEFORE the exchange: the only shuffle left carries
    ~m x groups x tasks tiny long rows.  Same registers, one corpus
    shuffle removed (optimization guide: aggregate before you shuffle /
    shuffle keys, not payloads)."""
    terms = df.select(
        F.col(by), F.explode(words(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    h = h48(F.col("term"))
    idx = F.shiftright(h, HLL_SUFFIX_BITS)  # top p bits (h48 >= 0)
    suffix = h.bitwiseAND(F.lit((1 << HLL_SUFFIX_BITS) - 1))
    return (
        terms.select(F.col(by), idx.alias("idx"), _rho(suffix).alias("rho"))
        .groupBy(by, "idx")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_estimate(registers: DataFrame, by: str = "source") -> DataFrame:
    """(by, n_registers, est_distinct) from a register table.

    est = alpha_m * m^2 / (sum over ALL m registers of 2^-M_j), with
    empty registers contributing 2^0 = 1.  Computed as ONE
    DECIMAL(38,0) floor division: scaling by 2^(suffix_bits+1) makes
    every addend integral (max rho = suffix_bits + 1), and the
    numerator constant absorbs alpha — bit-identical to the DuckDB
    HUGEINT rendering, no float summation order in sight."""
    shift = HLL_SUFFIX_BITS + 1
    per = registers.groupBy(by).agg(
        F.count("*").alias("v"),
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({shift} - m_rho AS INT))"
        )).alias("denom_present"),
    )
    denom = (
        (F.lit(HLL_M).cast("long") - F.col("v"))
        * F.lit(1 << shift).cast("long")
        + F.col("denom_present")
    )
    lc = ",".join(str(x) for x in _HLL_LC[1:])
    return per.select(
        F.col(by),
        F.col("v").alias("n_registers"),
        denom.alias("_denom"),
    ).selectExpr(
        by,
        "n_registers",
        f"CAST('{_HLL_NUM}' AS DECIMAL(38,0)) div (CAST(_denom AS DECIMAL(38,0)) * 10000000) AS raw_est",
    ).selectExpr(
        by,
        "n_registers",
        # linear-counting branch: raw <= 2.5m and empty registers left
        f"CAST(CASE WHEN {HLL_M} - n_registers > 0 AND raw_est <= {_HLL_LC_GATE}"
        f" THEN element_at(array({lc}), CAST({HLL_M} - n_registers AS INT))"
        " ELSE raw_est END AS BIGINT) AS est_distinct",
    )


# ----------------------------------------------------- log-bin histogram
# Quantile sketch: an HDR-histogram-style log-binned counter table
# (Masson et al. 2019's DDSketch is the float-gamma variant; the
# base-2 sub-bucket form here is the integer-exact one).  A value v
# lands in bin_id = shift * 2^(m+1) + (v >> shift) with
# shift = max(0, bitlen(v) - 1 - m): values below 2^m get EXACT bins,
# larger values keep their top m+1 bits, so the reported quantile's
# relative error is <= 2^-m.  Bin counts are PURELY ADDITIVE — the
# same micro-batch / cross-corpus merge monoid as the CMS grid — and
# the whole per-group state is <= (bitlen_max - m) * 2^(m+1) ~ 2^11
# rows.  bitlen comes from length(bin(v)) (both engines agree, no
# libm); everything downstream is integer windows over a bounded
# relation.
HIST_M = 5                     # sub-bucket bits: rel-err <= 1/32 ~ 3%
_HIST_BASE = 1 << (HIST_M + 1)

# The served quantiles: (name, numerator, denominator).
HIST_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def logbin_id(v: str) -> str:
    """Spark SQL expr string: log-bin id of integer expression `v`."""
    s = f"greatest(0, length(bin({v})) - 1 - {HIST_M})"
    return f"(CAST({s} AS BIGINT) * {_HIST_BASE} + shiftright({v}, CAST({s} AS INT)))"


def logbin_lower(b: str) -> str:
    """Spark SQL expr string: lower edge (representative value) of a
    bin id — exact for v < 2^m, a <= 2^-m undercount above."""
    return f"shiftleft({b} % {_HIST_BASE}, CAST({b} DIV {_HIST_BASE} AS INT))"


def logbin_id_sql(v: str) -> str:
    """DuckDB rendering of logbin_id."""
    s = f"greatest(0, length(bin({v})) - 1 - {HIST_M})"
    return f"(CAST({s} AS BIGINT) * {_HIST_BASE} + ({v} >> ({s})))"


def logbin_lower_sql(b: str) -> str:
    """DuckDB rendering of logbin_lower."""
    return f"(({b} % {_HIST_BASE}) << CAST({b} // {_HIST_BASE} AS BIGINT))"


def token_count_expr(text_col: str = "text") -> str:
    """Per-document token count, shared by builder and oracle: split
    on single spaces, empties dropped (the corpus `words` convention)."""
    return f"size(filter(split({text_col}, ' '), x -> x != ''))"


def token_count_sql(text_col: str = "text") -> str:
    return f"len(list_filter(string_split({text_col}, ' '), x -> x <> ''))"


def hist_build(
    df: DataFrame, by: str = "source", value_expr: str | None = None
) -> DataFrame:
    """(by, bin_id, cnt): the additive log-bin histogram of an integer
    per-row value (default: token count) per group.  ONE combinable
    corpus aggregation; the result is bounded at |groups| * ~2^11."""
    v = value_expr or token_count_expr()
    return (
        df.select(F.col(by), F.expr(logbin_id(f"({v})")).alias("bin_id"))
        .groupBy(by, "bin_id")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame, by: str = "source", exact: bool = False
) -> DataFrame:
    """(by, total, p50, p90, p99) from a (by, bin_id, cnt) histogram.

    The quantile convention (shared with the oracle): the reported
    value is the LOWER EDGE of the first bin whose cumulative count
    reaches ceil(q * total) — for an exact histogram (bin_id = value,
    ``exact=True``) that IS the discrete lower quantile.  Pure integer
    windows over the bounded histogram; the corpus never reappears."""
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(by)
        .orderBy("bin_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(by)
    val = F.col("bin_id") if exact else F.expr(logbin_lower("bin_id"))
    cur = hist.select(
        F.col(by),
        val.alias("val"),
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    aggs = [F.max("total").alias("total")]
    for name, num, den in HIST_QS:
        # integer `div`, never floor(double /): a correctly-rounded
        # double quotient can cross an integer boundary near 2^53/den
        # and disagree with the oracle's exact `//` (ADVICE r9; same
        # hazard priority_sample documents)
        rank = F.expr(f"(total * {num} + {den - 1}) div {den}")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("val"))).alias(name)
        )
    return cur.groupBy(by).agg(*aggs)


def hist_quantiles_sql_ctes(
    by: str = "source", exact: bool = False, prefix: str = "hq"
) -> str:
    """DuckDB CTE block: ``{prefix}_hist`` (by, bin_id, cnt) must be
    defined upstream; exposes ``{prefix}_q`` (by, total, p50, p90,
    p99) with the hist_quantiles convention."""
    val = "bin_id" if exact else logbin_lower_sql("bin_id")
    qcols = ", ".join(
        f"CAST(min(CASE WHEN cum >= (total * {num} + {den - 1}) // {den}"
        f" THEN val END) AS BIGINT) AS {name}"
        for name, num, den in HIST_QS
    )
    return f"""
{prefix}_cum AS (
  SELECT {by}, {val} AS val,
         sum(cnt) OVER (PARTITION BY {by} ORDER BY bin_id
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY {by}) AS total
  FROM {prefix}_hist),
{prefix}_q AS (
  SELECT {by}, CAST(max(total) AS BIGINT) AS total, {qcols}
  FROM {prefix}_cum GROUP BY {by})"""


# --------------------------------------------------------------- KMV bottom-k
# K-minimum-values sketch (Bar-Yossef et al. 2002; Beyer et al. 2007
# "On synopses for distinct-value estimation under multiset
# operations"): per group, keep the k SMALLEST distinct term hashes.
# Bottom-k sets merge by union-then-retake — an idempotent monoid —
# and, unlike HLL, support SET operations: the k smallest of A ∪ B
# are computable from the two sketches alone, and the fraction of
# them present in both sketches estimates Jaccard(A, B) (the min-wise
# coherence Broder 1997 uses for resemblance).  Hash values are
# DISTINCT within a group by construction (the sketch stores the hash
# set, not the terms), so ranks are tie-free and cross-engine
# deterministic.
KMV_K = 256
KMV_SALTS = 64  # phase-1 fan-out: bounds any one task's sort slice


def bottom_k(
    df: DataFrame,
    by: str,
    order_cols: list[str],
    k: int,
    salt: Column | None = None,
) -> DataFrame:
    """Generic salted two-phase bottom-k: the k order-smallest rows
    per group with no task ever sorting a whole group.

    Phase 1 ranks within (group, salt % SALTS) — WindowGroupLimit
    keeps only k rows per slice during the sort — phase 2 re-ranks the
    <= SALTS * k survivors per group.  Correct for ANY row->salt
    assignment (every global bottom-k member is bottom-k within its
    slice); pass a uniform salt so the slices are even."""
    from pyspark.sql.window import Window

    salt = (F.col(order_cols[0]) if salt is None else salt) % KMV_SALTS
    w1 = Window.partitionBy(by, salt).orderBy(*order_cols)
    cand = (
        df.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    w2 = Window.partitionBy(by).orderBy(*order_cols)
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_sketch(df: DataFrame, by: str = "source", text_col: str = "text") -> DataFrame:
    """(by, h): the k smallest distinct term hashes per group, via the
    salted two-phase ``bottom_k`` (uniform hashes make the salt slices
    even, so no task sorts a whole group's vocabulary)."""
    hashes = (
        df.select(F.col(by), F.explode(words(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
        .select(F.col(by), h48(F.col("term")).alias("h"))
        .distinct()
    )
    return bottom_k(hashes, by, ["h"], KMV_K)


# --------------------------------------------------------- priority sampling
# Weighted sampling without replacement at corpus scale (Duffield,
# Lund & Thorup 2007, "Priority sampling"): each row draws priority
# u/w with u uniform — here the fixed-point integer h48(id) div w, so
# the draw is deterministic, cross-engine exact, and tie-free after
# the id tie-break — and the k smallest priorities per group form the
# sample.  Heavier rows get smaller priorities proportionally, the
# bottom-k set is the same union-retake monoid as KMV, and the salted
# two-phase rank keeps every task's sort slice bounded.
PRIORITY_K = 64


def priority_sample(
    df: DataFrame,
    by: str = "source",
    weight: Column | None = None,
    id_col: str = "doc_id",
    k: int = PRIORITY_K,
) -> DataFrame:
    """(by, id, weight, priority): the k lowest-priority rows per
    group, priority = h48(id) div max(1, weight).  One corpus scan,
    two bounded rank windows, no shuffle of anything group-sized."""
    w = (F.lit(1) if weight is None else weight).cast("long")
    scored = (
        df.select(
            F.col(by),
            F.col(id_col),
            F.greatest(F.lit(1), w).alias("weight"),
            h48(F.col(id_col)).alias("_h"),
        )
        # integer div, not float /: a correctly-rounded double quotient
        # can round UP across an integer boundary and disagree with the
        # oracle's exact // on ~1-ulp cases
        .withColumn("priority", F.expr("_h div weight"))
        .drop("_h")
    )
    return bottom_k(
        scored, by, ["priority", id_col], k, salt=h48(F.col(id_col), seed=1)
    )


def kmv_jaccard(sk: DataFrame, by: str = "source") -> DataFrame:
    """(src_a, src_b, kk, inter, jacc4) for every unordered group pair:
    take the kk = min(k, |A ∪ B|) smallest values of the sketch union
    and count those present in BOTH sketches; jacc4 = floor(1e4 *
    inter / kk).  Every relation here is sketch-sized (|groups| * k),
    so the pair fan-out broadcasts — the corpus is long gone.

    The sketch is persisted only WITHIN this call: four plan branches
    reference it (group list, A side, B side), and without a cache
    each branch re-runs the whole corpus-distinct + two-phase rank
    that built it — a ~6x corpus recompute the plan audit caught at
    round 9.  The bounded result (one row per group pair) is then
    eagerly localCheckpointed and the sketch cache RELEASED before
    returning: persist() entries are never auto-evicted from the
    CacheManager, so the previous leave-it-cached form leaked one
    entry per invocation for the session lifetime (ADVICE r9) —
    checkpoint blocks, by contrast, are ContextCleaner-collected with
    the DataFrame, and re-executions read the materialized pairs
    instead of replaying the corpus scan."""
    from pyspark.sql.window import Window

    sk = sk.persist()
    srcs = sk.select(F.col(by).alias("_s")).distinct()
    pairs = (
        srcs.select(F.col("_s").alias("src_a"))
        .join(F.broadcast(srcs.select(F.col("_s").alias("src_b"))))
        .where(F.col("src_a") < F.col("src_b"))
    )
    a = sk.select(F.col(by).alias("src_a"), "h")
    b = sk.select(F.col(by).alias("src_b"), "h")
    both = (
        pairs.join(F.broadcast(a), "src_a")
        .select("src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(F.broadcast(b), "src_b").select(
                "src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    top = both.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KMV_K)
    out = top.groupBy("src_a", "src_b").agg(
        F.max("rn").cast("long").alias("kk"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("inter"),
    ).select(
        "src_a",
        "src_b",
        "kk",
        "inter",
        F.floor(F.col("inter") * 10000 / F.col("kk")).cast("long").alias("jacc4"),
    )
    out = out.localCheckpoint(eager=True)
    sk.unpersist()
    return out


def kmv_sql_ctes(by: str = "source") -> str:
    """DuckDB CTE block recomputing the per-group bottom-k sketch and
    the pairwise union-rank Jaccard; SELECT from ``kmv_jac``
    downstream.  The salt phase is physical-only, so the oracle ranks
    each group directly."""
    h = h48_sql("term")
    return f"""
kmv_hashes AS (
  SELECT DISTINCT {by}, {h} AS h
  FROM (SELECT {by}, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''),
kmv_sk AS (
  SELECT {by}, h FROM (
    SELECT {by}, h, row_number() OVER (PARTITION BY {by} ORDER BY h) AS rn
    FROM kmv_hashes) WHERE rn <= {KMV_K}),
kmv_pairs AS (
  SELECT a.{by} AS src_a, b.{by} AS src_b
  FROM (SELECT DISTINCT {by} FROM kmv_sk) a,
       (SELECT DISTINCT {by} FROM kmv_sk) b
  WHERE a.{by} < b.{by}),
kmv_both AS (
  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
    FROM kmv_pairs p JOIN kmv_sk s ON s.{by} = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, s.h, 0, 1
    FROM kmv_pairs p JOIN kmv_sk s ON s.{by} = p.src_b)
  GROUP BY 1, 2, 3),
kmv_top AS (
  SELECT * FROM (
    SELECT src_a, src_b, h, in_a, in_b,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
    FROM kmv_both) WHERE rn <= {KMV_K}),
kmv_jac AS (
  SELECT src_a, src_b, CAST(max(rn) AS BIGINT) AS kk,
         CAST(sum(in_a * in_b) AS BIGINT) AS inter,
         CAST(floor(sum(in_a * in_b) * 10000.0 / max(rn)) AS BIGINT) AS jacc4
  FROM kmv_top GROUP BY 1, 2)"""


def hll_sql_ctes(by: str = "source") -> str:
    """DuckDB CTE block recomputing registers + estimate from the
    ``documents`` view; SELECT from ``hll_est`` downstream."""
    shift = HLL_SUFFIX_BITS + 1
    h = h48_sql("term")
    return f"""
hll_terms AS (
  SELECT DISTINCT {by}, unnest(string_split(text, ' ')) AS term FROM documents),
hll_hashed AS (
  SELECT {by}, {h} AS h FROM hll_terms WHERE term <> ''),
hll_rho AS (
  SELECT {by}, h // {1 << HLL_SUFFIX_BITS} AS idx,
         CASE WHEN h % {1 << HLL_SUFFIX_BITS} = 0 THEN {HLL_SUFFIX_BITS + 1}
              ELSE {HLL_SUFFIX_BITS} - length(bin(h % {1 << HLL_SUFFIX_BITS})) + 1
         END AS rho
  FROM hll_hashed),
hll_regs AS (
  SELECT {by}, idx, max(rho) AS m_rho FROM hll_rho GROUP BY {by}, idx),
hll_raw AS (
  SELECT {by}, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(CAST('{_HLL_NUM}' AS HUGEINT) // (
           (({HLL_M} - count(*)) * CAST({1 << shift} AS HUGEINT)
            + sum(CAST(1 AS HUGEINT) * (1 << ({shift} - m_rho))))
           * 10000000) AS BIGINT) AS raw_est
  FROM hll_regs GROUP BY {by}),
hll_est AS (
  SELECT {by}, n_registers,
         CAST(CASE WHEN {HLL_M} - n_registers > 0 AND raw_est <= {_HLL_LC_GATE}
              THEN [{",".join(str(x) for x in _HLL_LC[1:])}][{HLL_M} - n_registers]
              ELSE raw_est END AS BIGINT) AS est_distinct
  FROM hll_raw)"""

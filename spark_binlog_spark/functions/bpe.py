"""Distributed BPE vocabulary induction (tokenizer training).

Byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") learns a subword
vocabulary by repeatedly merging the most frequent adjacent symbol
pair.  The classic algorithm runs on the WORD-FREQUENCY table, not the
raw corpus — the exact split a 100 TB pipeline needs: ONE corpus scan
builds (word, count), and every merge iteration after that touches
only the vocabulary relation (~1e8 rows at web scale, distributed and
combinable), never the corpus again.

Per iteration, three bounded steps:
  1. pair counting — explode each word's current segmentation into
     adjacent symbol pairs weighted by word count; the shuffle key
     space is the PAIR vocabulary (|alphabet|^2 + merges so far),
     tiny and skew-free relative to the corpus;
  2. argmax — one 1-row collect (count desc, then lexicographic pair
     for cross-engine determinism): a scalar plan step, the same
     class as a k-means centroid pull;
  3. merge application — a JVM-side higher-order fold
     (``aggregate``): scan each word's symbols left to right, gluing
     (a, b) -> ab greedily exactly as the reference algorithm's
     non-overlapping replace does.  No Python touches a row.

The greedy left-fold is replicated verbatim in the DuckDB oracle via
``list_reduce`` over single-element lists (the fold's initial
accumulator is the first symbol — equivalent to Spark's empty-array
start), so the learned merge table is bit-identical cross-engine.

Words are restricted to lowercase-ASCII runs so character splitting
is unambiguous in both engines (unicode grapheme splitting is not a
portable operation); each word carries the classic ``</w>``
end-of-word sentinel so merges cannot cross word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_binlog_spark.functions.text import words

BPE_STEPS = 6
EOW = "</w>"
WORD_RE = "^[a-z]+$"


def bpe_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms): the word-frequency table with each word's
    initial segmentation (characters + the end-of-word sentinel).
    The ONE corpus-sized aggregation; everything iterative runs on
    this relation."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .where(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.expr(
                f"concat(filter(split(word, ''), x -> x != ''), array('{EOW}'))"
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-pair frequencies over the current
    segmentations, weighted by word count.  Shuffles on the PAIR
    vocabulary only."""
    # a fully-merged word has ONE symbol and contributes no pairs; the
    # guard matters because Spark's sequence(1, 0) is DESCENDING [1, 0]
    # (DuckDB's generate_series(1, 0) is empty), so the unguarded
    # transform would index past a 1-element array
    pairs = F.expr(
        "CASE WHEN size(syms) < 2"
        " THEN CAST(array() AS array<struct<a: string, b: string>>)"
        " ELSE transform(sequence(1, size(syms) - 1),"
        " j -> struct(element_at(syms, j) AS a, element_at(syms, j + 1) AS b))"
        " END"
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("c"))
    )


def _q(s: str) -> str:
    return s.replace("'", "''")


def _merge_expr(a: str, b: str) -> str:
    """The greedy left-fold applying merge (a, b) -> ab to `syms`."""
    return (
        "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{_q(a)}'"
        f" AND s = '{_q(b)}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{_q(a + b)}'))"
        " ELSE concat(acc, array(s)) END)"
    )


BPE_DRIVER_MAX_WORDS = 200_000  # bounded collect gate, like a broadcast side


def _bpe_learn_driver(spark: SparkSession, rows, steps: int) -> DataFrame:
    """Driver-side merge loop over a BOUNDED collected vocabulary —
    semantics identical to the distributed loop: pair counts weighted
    by word count, argmax by (count desc, lhs asc, rhs asc), greedy
    left-fold application (the already-merged accumulator tail is what
    the next pair matches against).  String tie-breaks are ASCII-safe
    here because WORD_RE restricts symbols to [a-z] + the EOW
    sentinel, so Python code-point order == the JVM's UTF-16 order."""
    words = [(int(r["cnt"]), list(r["syms"])) for r in rows]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for cnt, syms in words:
            for ab in zip(syms, syms[1:]):
                counts[ab] = counts.get(ab, 0) + cnt
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        if step < steps:
            for i, (cnt, syms) in enumerate(words):
                acc: list[str] = []
                for s in syms:
                    if acc and acc[-1] == a and s == b:
                        acc[-1] = a + b
                    else:
                        acc.append(s)
                words[i] = (cnt, acc)
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, merged string, pair_cnt long"
    )


def bpe_learn(
    spark: SparkSession,
    vocab: DataFrame,
    steps: int = BPE_STEPS,
    driver_max_words: int | None = None,
) -> DataFrame:
    """Learn `steps` BPE merges; returns the merge table
    (step, lhs, rhs, merged, pair_cnt) — the tokenizer-training
    artifact.

    ADAPTIVE (r11): the merge loop runs on the VOCABULARY relation,
    which is bounded by distinct-word count, not corpus size — when it
    is under ``driver_max_words`` (default 200k rows, a bounded
    collect like a broadcast build side) the whole loop runs on the
    driver in one job + createDataFrame instead of paying
    several Spark jobs of pure scheduling latency per merge step.
    Larger vocabularies take the distributed loop unchanged, where
    each iteration persists the re-segmented vocabulary so lineage
    (and recompute) stays O(1) per step.  Both branches are
    property-tested equal."""
    gate = BPE_DRIVER_MAX_WORDS if driver_max_words is None else driver_max_words
    cur = vocab.persist()
    n_words = cur.count()
    if n_words <= gate:
        try:
            rows = cur.select("cnt", "syms").collect()  # bounded by the gate
        finally:
            cur.unpersist()
        return _bpe_learn_driver(spark, rows, steps)
    # distributed path: ONE job per iteration — the argmax over pair
    # counts doubles as the materializer of the current segmentation's
    # cache (persist is lazy), so no separate count() pass runs.  The
    # previous iteration stays persisted until the argmax has filled
    # the current cache, then unpersists; the final re-segmentation is
    # never built.
    prev = None
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, steps + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("c"), "a", "b")
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
            merges.append((step, a, b, a + b, c))
            if step < steps:
                nxt = cur.withColumn("syms", F.expr(_merge_expr(a, b))).persist()
                prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, merged string, pair_cnt long"
    )


def _bpe_ctes(steps: int, table: str, final_v: bool) -> list[str]:
    """The shared chained-CTE body: v0 (initial segmentation), then
    per iteration the argmax m{i} and — when another iteration or the
    tokenize path needs it — the re-segmentation v{i}.

    Every m{i} carries a NULL sentinel row (c = -1) so it is NEVER
    empty: when the corpus yields fewer than `steps` learnable merges
    (all words fully merged), the real pair-count subquery goes empty
    and the sentinel wins the argmax instead.  A NULL-lhs merge is a
    no-op inside the folds (`acc[-1] = m.a` is NULL → ELSE branch), so
    v{i} = v{p} — exactly bpe_learn's early-stop freeze — and the
    downstream CROSS JOINs keep their cardinality instead of
    annihilating the vocabulary (the silent zero-rows divergence this
    guards against).  The learn output filters sentinels out.

    Every chained CTE is ``AS MATERIALIZED``: DuckDB may inline a CTE
    per reference, and each m{i} references the whole v{0..i-1} chain
    — inlined, the plan re-derives every earlier re-segmentation per
    step, going EXPONENTIAL in `steps` (measured: 6 steps 0.64 s,
    12 steps 446 s at sf0.001).  Materialization restores the linear
    cost the chain is written for (12 steps: 0.21 s), which is what
    makes >6-merge configurations oracle-checkable at all."""
    ctes = [
        f"""v0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         list_append(string_split(word, ''), '{EOW}') AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {table})
  WHERE regexp_matches(word, '{WORD_RE}') GROUP BY word)"""
    ]
    for i in range(1, steps + 1):
        p = i - 1
        ctes.append(
            f"""m{i} AS MATERIALIZED (
  SELECT a, b, c FROM (
    SELECT syms[j] AS a, syms[j + 1] AS b, sum(cnt) AS c
    FROM v{p}, unnest(generate_series(1, len(syms) - 1)) AS t(j)
    GROUP BY 1, 2
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(-1 AS BIGINT))
  ORDER BY c DESC, a, b LIMIT 1)"""
        )
        if i < steps or final_v:
            ctes.append(
                f"""v{i} AS MATERIALIZED (
  SELECT word, cnt,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                       THEN list_append(acc[:len(acc) - 1], m.a || m.b)
                       ELSE list_concat(acc, x) END) AS syms
  FROM v{p} CROSS JOIN m{i} m)"""
            )
    return ctes


def bpe_sql(steps: int = BPE_STEPS, table: str = "documents") -> str:
    """DuckDB rendering of the whole induction: `steps` chained CTE
    pairs (pair-count argmax m{i}, re-segmentation v{i}), identical
    greedy-fold semantics."""
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, a AS lhs, b AS rhs,"
        f" a || b AS merged, CAST(c AS BIGINT) AS pair_cnt FROM m{i}"
        f" WHERE a IS NOT NULL"  # sentinel = no learnable merge this step
        for i in range(1, steps + 1)
    )
    return "WITH " + ",\n".join(_bpe_ctes(steps, table, False)) + "\n" + selects


def bpe_segment(
    vocab: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list to a (word, cnt, syms) vocabulary —
    the PRODUCTION tokenizer path: chained greedy folds, all JVM-side,
    no join and no shuffle (the merge list rides in the expressions)."""
    out = vocab
    for a, b in merges:
        out = out.withColumn("syms", F.expr(_merge_expr(a, b)))
    return out


def bpe_tokenize_stats(
    spark: SparkSession, df: DataFrame, steps: int = BPE_STEPS,
    text_col: str = "text", by: str = "source",
) -> DataFrame:
    """Learn `steps` merges on the corpus vocabulary, then tokenize by
    group: (by, n_words, n_subwords, subwords_per_word4).

    Scale split: learning runs on the GLOBAL word-frequency table;
    application runs on the (group, word) frequency table — segment
    each distinct (group, word) ONCE and weight by its count, instead
    of folding every occurrence (the vocabulary is ~1000x smaller than
    the corpus).  Both relations are word-keyed combinable aggregates;
    the corpus is scanned once per side and never joined."""
    merge_rows = bpe_learn(spark, bpe_vocab(df, text_col), steps).collect()
    merges = [(r["lhs"], r["rhs"]) for r in merge_rows]
    wf = (
        df.select(F.col(by), F.explode(words(F.col(text_col))).alias("word"))
        .where(F.col("word").rlike(WORD_RE))
        .groupBy(by, "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.expr(
                f"concat(filter(split(word, ''), x -> x != ''), array('{EOW}'))"
            ),
        )
    )
    seg = bpe_segment(wf, merges)
    return seg.groupBy(by).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.size("syms")).alias("n_subwords"),
    ).select(
        by,
        "n_words",
        "n_subwords",
        F.floor(F.col("n_subwords") * 10000 / F.col("n_words"))
        .cast("long")
        .alias("subwords_per_word4"),
    )


def bpe_tokenize_sql(
    steps: int = BPE_STEPS, table: str = "documents", by: str = "source"
) -> str:
    """DuckDB rendering of learn-then-tokenize: the induction CTEs,
    then the per-group (group, word) table folded with every learned
    merge in sequence.  The m{i} rows ride in via CROSS JOIN (DuckDB
    lambdas reference row columns, not subqueries); each fold's output
    is re-wrapped to single-element lists for the next fold, so the
    final len() counts symbols.  The _bpe_ctes sentinel guarantees
    every m{i} is exactly one row, so the CROSS JOIN chain preserves
    gwf's cardinality even when the corpus runs out of learnable
    merges before `steps` (a NULL merge folds as a no-op)."""
    fold = "list_transform(string_split(word, ''), s -> [s])"
    fold = f"list_concat({fold}, [['{EOW}']])"
    for i in range(1, steps + 1):
        fold = f"""list_transform(list_reduce({fold},
           (acc, x) -> CASE WHEN acc[-1] = mm{i}.a AND x[1] = mm{i}.b
                       THEN list_append(acc[:len(acc) - 1], mm{i}.a || mm{i}.b)
                       ELSE list_concat(acc, x) END), s -> [s])"""
    joins = " ".join(f"CROSS JOIN m{i} mm{i}" for i in range(1, steps + 1))
    ctes = ",\n".join(_bpe_ctes(steps, table, False))
    return f"""WITH {ctes},
gwf AS (
  SELECT {by}, word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT {by}, unnest(string_split(text, ' ')) AS word FROM {table})
  WHERE regexp_matches(word, '{WORD_RE}') GROUP BY 1, 2),
gseg AS (
  SELECT {by}, cnt, len({fold}) AS n_syms FROM gwf {joins})
SELECT {by}, CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(sum(cnt * n_syms) AS BIGINT) AS n_subwords,
       CAST(floor(sum(cnt * n_syms) * 10000.0 / sum(cnt)) AS BIGINT)
         AS subwords_per_word4
FROM gseg GROUP BY {by}"""

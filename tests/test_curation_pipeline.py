"""End-to-end LLM-data curation journey over the documents table —
the user-facing composition the individual operators exist for:

    gopher rule filter -> line dedup (boilerplate strip + rebuild)
    -> exact dedup -> CCNet LM terciles (keep head+middle)
    -> sequence packing layout -> UniMax token budget

Each stage consumes the previous stage's OUTPUT relation (not the raw
table), so this asserts the operators actually compose: schemas line
up, doc identity survives rebuilds, and the invariants hold end to end.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_TEST


class TestCurationPipeline:
    def test_full_journey_invariants(self, spark):
        from spark_binlog_spark.functions.dedup import exact_dedup, line_dedup_rebuild
        from spark_binlog_spark.functions.text import (
            ccnet_cut_buckets,
            gopher_rules,
            lm_familiarity,
            sequence_pack,
            unimax_allocation,
        )

        docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
        n0 = docs.count()

        # 1. Gopher battery: gate on the structural rules.  The
        # synthetic corpus contains no English stopwords at all, so the
        # stopword rule (separately graded via q_gopher_rules) would
        # empty the pipeline; a real run keeps the conjunctive `keep`.
        g = gopher_rules(docs)
        kept_ids = g.filter(
            "word_count_ok and mean_word_len_ok and hash_ratio_ok "
            "and ellipsis_ratio_ok and bullet_lines_ok and "
            "ellipsis_lines_ok and alpha_words_ok"
        ).select("doc_id")
        stage1 = docs.join(kept_ids, "doc_id")
        n1 = stage1.count()
        assert 0 < n1 <= n0

        # 2. line-level dedup + document rebuild (boilerplate strip)
        rebuilt = line_dedup_rebuild(stage1)
        assert rebuilt.count() == n1  # every doc survives, possibly shorter
        stage2 = stage1.drop("text").join(
            rebuilt.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )

        # 3. exact dedup on the REBUILT text: keep each hash's winner
        survivors = exact_dedup(stage2).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        stage3 = stage2.join(survivors, "doc_id")
        n3 = stage3.count()
        assert 0 < n3 <= n1
        assert stage3.select("doc_id").distinct().count() == n3

        # 4. CCNet terciles on the surviving corpus; keep head+middle
        fam = lm_familiarity(stage3)
        buckets = ccnet_cut_buckets(
            stage3.select("doc_id", "lang").join(fam, "doc_id")
        )
        assert buckets.count() == n3
        stage4 = stage3.join(
            buckets.filter(F.col("bucket") != "tail").select("doc_id"), "doc_id"
        )
        n4 = stage4.count()
        # head+middle is at least two thirds per language by construction
        assert 3 * n4 >= 2 * n3

        # 5. sequence-packing layout over the curated corpus
        packed = sequence_pack(stage4)
        assert packed.count() == n4
        per_src = packed.groupBy("source").agg(
            F.sum("n_tokens").alias("t"), F.max("pack_last").alias("last_pack")
        )
        for r in per_src.collect():
            # packs cover the tokens: last pack index >= ceil(tokens/2048)-1
            assert (r["last_pack"] + 1) * 2048 >= r["t"]

        # 6. UniMax budget over the same curated corpus
        alloc = unimax_allocation(stage4)
        rows = alloc.collect()
        assert rows
        total = sum(r["n_tokens"] for r in rows)
        assert sum(r["alloc_tokens"] for r in rows) <= total * 3 // 2
        for r in rows:
            assert r["alloc_tokens"] <= r["cap_tokens"]

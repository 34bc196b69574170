"""Property-based tests (hypothesis) — a strict upgrade over the
reference's purely-manual test strategy (SURVEY §5)."""

import json

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from spark_binlog_spark import POW13
from spark_binlog_spark.offsets import BinlogOffset


class TestOffsetProperties:
    # MySQL binlog file ids start at 1 (mysql-bin.000001) — the reference
    # asserts packed length >= 14 (MLSQLBinLogDataSource.scala:102-107),
    # which is exactly file_id >= 1
    @given(file_id=st.integers(1, 10**5), pos=st.integers(0, POW13 - 1))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, file_id, pos):
        o = BinlogOffset(file_id, pos)
        assert BinlogOffset.from_long(o.to_long()) == o

    @given(
        a=st.tuples(st.integers(1, 10**5), st.integers(0, POW13 - 1)),
        b=st.tuples(st.integers(1, 10**5), st.integers(0, POW13 - 1)),
    )
    @settings(max_examples=200, deadline=None)
    def test_packing_preserves_order(self, a, b):
        # the packed long must order exactly like (file_id, pos) — the
        # property the whole offset algebra (O2/O3/O6) rests on
        oa, ob = BinlogOffset(*a), BinlogOffset(*b)
        assert (oa.to_long() < ob.to_long()) == ((oa.file_id, oa.pos) < (ob.file_id, ob.pos))

    @given(file_id=st.integers(0, 999999))
    @settings(max_examples=100, deadline=None)
    def test_filename_roundtrip(self, file_id):
        assert BinlogOffset.from_file_name(BinlogOffset(file_id, 0).file_name()) == file_id


class TestEnvelopeJsonProperties:
    @given(
        db=st.text(min_size=0, max_size=20),
        table=st.text(min_size=0, max_size=20),
        pk=st.integers(-(2**62), 2**62),
    )
    @settings(max_examples=100, deadline=None)
    def test_wire_json_is_parseable_and_ordered(self, db, table, pk):
        from spark_binlog_spark.sources.binlog_fixture import _envelope_json

        s = _envelope_json(1, 1_000_000, pk, "signup", 1.5, json.dumps({"k": 3}))
        env = json.loads(s)
        # exact field order of AbstractEventWriter.java:22-46
        assert list(env.keys()) == ["type", "timestamp", "databaseName", "tableName", "schema", "rows"]
        assert env["rows"][0]["pk"] == pk
        # every MySQL event ships its row StructType (AbstractEventWriter.java:35-39)
        assert json.loads(env["schema"])["type"] == "struct"

    @given(props=st.one_of(st.none(), st.text(max_size=30)))
    @settings(max_examples=100, deadline=None)
    def test_wire_json_tolerates_garbage_props(self, props):
        from spark_binlog_spark.sources.binlog_fixture import _envelope_json

        env = json.loads(_envelope_json(0, 0, 1, "click", 0.0, props))
        assert "k" in env["rows"][0]  # malformed props -> k: null, never a crash


class TestMinhashProperties:
    @given(h=st.integers(0, (1 << 48) - 1), seed=st.integers(0, 7))
    @settings(max_examples=200, deadline=None)
    def test_permutation_stays_in_field(self, h, seed):
        from spark_binlog_spark.functions.dedup import MINHASH_A, MINHASH_B, MINHASH_P

        hp = h % MINHASH_P
        v = (hp * MINHASH_A[seed] + MINHASH_B[seed]) % MINHASH_P
        assert 0 <= v < MINHASH_P
        assert hp * MINHASH_A[seed] + MINHASH_B[seed] < 2**63  # no signed-64 overflow


class TestSimhashBandProperties:
    # the completeness argument q_simhash_near_dups rests on: any pair
    # within hamming distance < bands agrees exactly on >= 1 of the
    # equal-width bands (pigeonhole over the positions that differ)
    @given(a=st.integers(0, 65535), b=st.integers(0, 65535))
    @settings(max_examples=500, deadline=None)
    def test_pigeonhole_band_completeness(self, a, b):
        hamming = bin(a ^ b).count("1")
        band_match = any(((a >> (i * 4)) & 15) == ((b >> (i * 4)) & 15) for i in range(4))
        if hamming < 4:
            assert band_match


class TestSimhashKernelModel:
    def test_kernel_matches_catalyst(self, spark):
        """dedup.simhash's Arrow kernel (r14 default) vs the Catalyst
        reference form, bit-for-bit, across widths and the word-split
        edge cases the kernel mirrors by hand: empty text ([''] like
        Spark's split), NULL text (doc absent), consecutive / leading /
        trailing spaces (empty tokens kept), repeated words, unicode
        (BMP + astral)."""
        from spark_binlog_spark.functions import dedup

        rows = [
            (1, "the quick brown fox the the"),
            (2, ""),
            (3, None),
            (4, "single"),
            (5, "a  b   c "),
            (6, "unicode éé \U0001f600 word"),
            (7, "the quick brown fox the the"),
            (8, " leading"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for bits in (16, 60, 7):
            kern = sorted(dedup.simhash(df, bits=bits, kernel=True).collect())
            cata = sorted(dedup.simhash(df, bits=bits, kernel=False).collect())
            assert kern == cata, f"bits={bits}"


class TestComboBanding:
    def _clustered_sigs(self):
        import random

        rng = random.Random(7)
        sigs = set()
        for _ in range(40):  # clustered: the skew shape that motivates combos
            c = rng.getrandbits(60)
            sigs.add(c)
            for _ in range(rng.randint(0, 12)):
                s = c
                for b in rng.sample(range(60), rng.randint(0, 5)):
                    s ^= 1 << b
                sigs.add(s)
        for _ in range(200):
            sigs.add(rng.getrandbits(60))
        return sorted(sigs)

    def test_value_level_matches_bruteforce(self, spark):
        """near_signature_pairs with combination banding vs brute-force
        hamming over clustered + random 60-bit signatures: every
        <= max_hamming pair exactly once (the lowest-clean-combo
        emission must neither drop nor duplicate)."""
        import itertools

        from spark_binlog_spark.functions import dedup

        sigs = self._clustered_sigs()
        df = spark.createDataFrame([(s,) for s in sigs], "sg long")
        for max_h, blocks, r in [(3, 6, 3), (3, 5, 2), (2, 4, 2)]:
            got = {
                (row.sg_a, row.sg_b, row.hamming)
                for row in dedup.near_signature_pairs(
                    df, 60, 4, max_h, blocks=blocks, r=r
                ).collect()
            }
            want = {
                (min(a, b), max(a, b), bin(a ^ b).count("1"))
                for a, b in itertools.combinations(sigs, 2)
                if bin(a ^ b).count("1") <= max_h
            }
            assert got == want, f"max_h={max_h} blocks={blocks} r={r}"

    def test_id_level_and_summary_match_single_band(self, spark):
        """The id-level direct strategy and hamming_dedup_summary give
        identical output with and without combination banding
        (duplicate signatures seeded so equal-sig groups cross both
        paths)."""
        from spark_binlog_spark.functions import dedup

        sigs = self._clustered_sigs()
        rows = [(i, sigs[i % len(sigs)]) for i in range(len(sigs) + 150)]
        iddf = spark.createDataFrame(rows, "doc_id long, sg long")
        single = {
            (x.id_a, x.id_b, x.hamming)
            for x in dedup.hamming_near_dup_pairs(
                iddf, id_col="doc_id", sig_col="sg", bits=60, bands=4,
                max_hamming=3, strategy="direct",
            ).collect()
        }
        combo = {
            (x.id_a, x.id_b, x.hamming)
            for x in dedup.hamming_near_dup_pairs(
                iddf, id_col="doc_id", sig_col="sg", bits=60, bands=4,
                max_hamming=3, strategy="direct", blocks=6, r=3,
            ).collect()
        }
        assert single == combo
        s1 = sorted(
            dedup.hamming_dedup_summary(iddf, "doc_id", "sg", 60, 4, 3).collect()
        )
        s2 = sorted(
            dedup.hamming_dedup_summary(
                iddf, "doc_id", "sg", 60, 4, 3, blocks=6, r=3
            ).collect()
        )
        assert s1 == s2

    def test_scheme_contracts(self):
        """Combination-banding argument contracts hold under -O."""
        import pytest

        from spark_binlog_spark.functions.dedup import _combo_scheme

        with pytest.raises(ValueError):
            _combo_scheme(60, 3, 7, 3)  # blocks must divide bits
        with pytest.raises(ValueError):
            _combo_scheme(60, 3, 6, 4)  # r > blocks - max_hamming
        with pytest.raises(ValueError):
            _combo_scheme(60, 3, 6, 0)  # r < 1


class TestMinhashComponentEdges:
    def test_components_and_drop_set_match_pair_graph(self, spark):
        """minhash_component_edges (per-bucket star edges) must yield
        the SAME connected components and the same larger-side drop set
        as the full min_agree=2 candidate-pair graph — the structure
        claim q_dup_components / q_dedup_canonical / q_curation_e2e's
        near-dedup stage rest on (each r=2 bucket is a clique)."""
        import random

        from pyspark.sql import Row

        from spark_binlog_spark.functions import dedup

        words = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "iron"]
        rng = random.Random(29)
        docs = []
        for i in range(80):
            base = [rng.choice(words) for _ in range(rng.randint(3, 9))]
            docs.append(Row(doc_id=i, text=" ".join(base)))
            for rep in range(rng.randint(0, 3)):  # dup cliques of size up to 4
                mutated = list(base)
                if rng.random() < 0.5 and len(mutated) > 3:
                    mutated[rng.randrange(len(mutated))] = rng.choice(words)
                docs.append(Row(doc_id=1000 * (rep + 1) + i, text=" ".join(mutated)))
        df = spark.createDataFrame(docs)

        pairs = [
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_candidate_pairs(df, min_agree=2).collect()
        ]
        stars = [
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_component_edges(df).collect()
        ]
        # the star graph is a (strict at any clique size > 2) subset
        assert set(stars) <= set(pairs)
        # drop set (larger side of any pair) identical
        assert {b for _a, b in stars} == {b for _a, b in pairs}

        def components(edges):
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            return {x: find(x) for x in parent}

        assert components(pairs) == components(stars)


class TestMinhashCanonicalCombo:
    def test_matches_bruteforce_signature_model(self, spark):
        """minhash_candidate_pairs (r13 canonical-combo plan, no pair-
        dedup exchange) vs brute force over the SAME wide signatures:
        every doc pair agreeing on >= min_agree seeds appears exactly
        once with the exact n_agree/est_jaccard4."""
        import itertools
        import random

        from pyspark.sql import Row

        from spark_binlog_spark.functions import dedup

        words = ["red", "green", "blue", "cyan", "teal", "plum", "gold"]
        rng = random.Random(13)
        docs = []
        for i in range(50):
            base = [rng.choice(words) for _ in range(rng.randint(3, 9))]
            docs.append(Row(doc_id=i, text=" ".join(base)))
            if rng.random() < 0.5:  # near/exact dups to force k>2 cliques
                mutated = list(base)
                if rng.random() < 0.5 and len(mutated) > 3:
                    mutated[rng.randrange(len(mutated))] = rng.choice(words)
                docs.append(Row(doc_id=500 + i, text=" ".join(mutated)))
        df = spark.createDataFrame(docs)
        wide = {
            r["doc_id"]: [r[f"mh{i}"] for i in range(dedup.N_MINHASH)]
            for r in dedup.minhash_signatures_wide(df).collect()
        }
        for min_agree in (2, 4):
            got = {
                (r["doc_a"], r["doc_b"]): (r["n_agree"], r["est_jaccard4"])
                for r in dedup.minhash_candidate_pairs(df, min_agree=min_agree).collect()
            }
            want = {}
            for a, b in itertools.combinations(sorted(wide), 2):
                k = sum(x == y for x, y in zip(wide[a], wide[b]))
                if k >= min_agree:
                    want[(a, b)] = (k, k * 10000 // dedup.N_MINHASH)
            assert got == want, f"min_agree={min_agree}"


class TestIntMatmulKernel:
    """r14 (VERDICT r13 ask #1): the Arrow-batched integer-matmul
    kernel must be BIT-IDENTICAL to the interpreted Catalyst HOF plans
    it replaces — same assignments, same c4/L2 scores, same tie-breaks
    — on a corpus seeded with exact-duplicate vectors (argmax/argmin
    ties) and near-duplicates (semdedup drop verdicts)."""

    def _corpus(self, spark, n=80, dim=16):
        import random

        from pyspark.sql import Row

        rng = random.Random(41)
        rows = []
        base = [round(rng.uniform(-0.6, 0.6), 6) for _ in range(dim)]
        for i in range(n):
            if i == 1 or (i > 10 and rng.random() < 0.2):
                v = list(rows[rng.randrange(len(rows))].embedding)  # exact dup -> ties
            elif i > 10 and rng.random() < 0.2:
                v = [round(x + rng.uniform(-0.01, 0.01), 6) for x in base]  # near dup
            else:
                v = [round(rng.uniform(-0.6, 0.6), 6) for _ in range(dim)]
            rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
        return spark.createDataFrame(rows)

    def test_assignment_kernel_matches_catalyst(self, spark):
        from pyspark.sql import functions as F

        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark)
        base = S.with_quantized(df)
        cents = S.seed_centroids(base, 9)
        key = lambda r: (r["vec_id"], r["centroid_id"], r["c4"], tuple(r["q"]), r["norm"])
        got = sorted(map(key, S.assign_to_centroids(base, cents, kernel=True).collect()))
        want = sorted(map(key, S.assign_to_centroids(base, cents, kernel=False).collect()))
        assert got == want and len(got) == 80

    def test_pq_assign_kernel_matches_catalyst(self, spark):
        from pyspark.sql import functions as F

        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark)
        base = S.with_quantized(df)
        subv = S._pq_subvectors(base, 4, 4)
        cb = subv.filter(F.col("vec_id") < 8).select(
            "sub",
            F.col("vec_id").cast("int").alias("code"),
            F.col("v").alias("cv"),
            S.int_dot(F.col("v"), F.col("v")).alias("cnorm"),
        )
        key = lambda r: (r["vec_id"], r["sub"], r["code"], r["cnorm"], tuple(r["v"]))
        got = sorted(map(key, S._pq_assign(subv, cb, kernel=True).collect()))
        want = sorted(map(key, S._pq_assign(subv, cb, kernel=False).collect()))
        assert got == want and len(got) == 80 * 4

    def test_brute_force_topk_kernel_matches_catalyst(self, spark):
        """r14: the batch-local-top-k kernel must reproduce the
        Catalyst broadcast-cross-join + full window plan exactly —
        same members, ranks and scores under the (cosine4 desc,
        vec_id) total order.  The corpus seeds exact duplicates, so
        rank ties at equal cosine4 are exercised; repartition(7)
        forces multiple kernel batches so the partial-top-k merge
        path runs."""
        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark).repartition(7)
        for n_queries, k in ((5, 10), (3, 200), (1, 1)):
            key = lambda r: tuple(r)
            got = sorted(map(key, S.brute_force_topk(
                df, n_queries=n_queries, k=k, kernel=True).collect()))
            want = sorted(map(key, S.brute_force_topk(
                df, n_queries=n_queries, k=k, kernel=False).collect()))
            assert got == want and got

    def test_pq_assign_carry_matches_catalyst(self, spark):
        """r14: the ``carry`` passthrough (ivfadc rides the cell id
        through the encode argmin) must not perturb assignments on
        either path and must carry values verbatim."""
        from pyspark.sql import functions as F

        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark)
        base = S.with_quantized(df)
        subv = S._pq_subvectors(base, 4, 4).withColumn(
            "cell", (F.col("vec_id") % 5).cast("long")
        )
        cb = subv.filter(F.col("vec_id") < 8).select(
            "sub",
            F.col("vec_id").cast("int").alias("code"),
            F.col("v").alias("cv"),
            S.int_dot(F.col("v"), F.col("v")).alias("cnorm"),
        )
        key = lambda r: (r["vec_id"], r["sub"], r["code"], r["cnorm"], r["cell"], tuple(r["v"]))
        got = sorted(map(key, S._pq_assign(
            subv, cb, kernel=True, carry=("cell",)).collect()))
        want = sorted(map(key, S._pq_assign(
            subv, cb, kernel=False, carry=("cell",)).collect()))
        assert got == want and len(got) == 80 * 4
        assert all(r[0] % 5 == r[4] for r in got)

    def test_embedding_pairs_bucket_kernel_matches_catalyst(
        self, spark, monkeypatch
    ):
        """r14: the per-(tbl, bucket) group kernel (one matmul per
        bucket, threshold filter inside) must emit exactly the pairs
        of the Catalyst self-join + inline cosine4 plan — same
        members, same scores — for single- and multi-table settings.
        The block size shrinks to 7 so the row-block merge path runs;
        the corpus seeds exact duplicates (cosine ties at 10000)."""
        from spark_binlog_spark.functions import similarity as S

        monkeypatch.setattr(S, "PAIR_KERNEL_BLOCK_ROWS", 7)
        df = self._corpus(spark, n=120)
        for n_tables, planes in ((1, 2), (2, 3)):
            got = sorted(map(tuple, S.embedding_near_dup_pairs(
                df, min_cosine4=5000, planes=planes, n_tables=n_tables,
                kernel=True).collect()))
            want = sorted(map(tuple, S.embedding_near_dup_pairs(
                df, min_cosine4=5000, planes=planes, n_tables=n_tables,
                kernel=False).collect()))
            assert got == want and got

    def test_semdedup_pair_kernel_matches_catalyst(self, spark):
        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark)
        for thr in (5000, 9999):
            got = sorted(
                map(tuple, S.semdedup(df, n_centroids=None, threshold4=thr,
                                      pair_kernel=True).collect())
            )
            want = sorted(
                map(tuple, S.semdedup(df, n_centroids=None, threshold4=thr,
                                      pair_kernel=False).collect())
            )
            assert got == want and len(got) == 80
        # the dup seeding must actually exercise drop verdicts
        assert any(not k for (_, _, k) in got)

    def test_semantic_decontaminate_kernel_matches_catalyst(self, spark):
        """semantic_decontaminate (r14 late: the embedding-space
        decontamination sweep) — kernel vs broadcast-cross-join
        fallback, bit-identical incl. the smallest-bench-id tie-break
        (the corpus carries exact duplicates, so equal best_c4 against
        two benchmark vectors occurs); empty-benchmark edge returns
        zero rows on both paths."""
        from pyspark.sql import functions as F

        from spark_binlog_spark.functions import similarity as S

        df = self._corpus(spark)
        bench = df.filter(F.col("vec_id") % 7 == 0)
        corpus = df.filter(F.col("vec_id") % 7 != 0)
        for thr in (2500, 9999):
            key = lambda r: tuple(r)
            got = sorted(map(key, S.semantic_decontaminate(
                corpus, bench, min_cosine4=thr, kernel=True).collect()))
            want = sorted(map(key, S.semantic_decontaminate(
                corpus, bench, min_cosine4=thr, kernel=False).collect()))
            assert got == want
            if thr == 2500:
                assert got  # the dup seeding guarantees hits
        empty = bench.filter(F.col("vec_id") < 0)
        assert S.semantic_decontaminate(corpus, empty, kernel=True).count() == 0
        assert S.semantic_decontaminate(corpus, empty, kernel=False).count() == 0


class TestMinhashSummaryModel:
    def test_matches_bruteforce_one_hop_model(self, spark):
        """minhash_dedup_summary (r14 bounded canonical-survivor form)
        vs a brute-force one-hop model from the SAME wide signatures:
        canon_id = min doc_id among docs agreeing on >= min_agree
        seeds (self included), n_near = that neighborhood's size."""
        import random

        from pyspark.sql import Row

        from spark_binlog_spark.functions import dedup

        words = ["red", "green", "blue", "cyan", "teal", "plum", "gold"]
        rng = random.Random(29)
        docs = []
        for i in range(50):
            base = [rng.choice(words) for _ in range(rng.randint(3, 9))]
            docs.append(Row(doc_id=i, text=" ".join(base)))
            if rng.random() < 0.5:  # exact/near dups -> big cliques
                mutated = list(base)
                if rng.random() < 0.5 and len(mutated) > 3:
                    mutated[rng.randrange(len(mutated))] = rng.choice(words)
                docs.append(Row(doc_id=500 + i, text=" ".join(mutated)))
        df = spark.createDataFrame(docs)
        wide = {
            r["doc_id"]: tuple(r[f"mh{i}"] for i in range(dedup.N_MINHASH))
            for r in dedup.minhash_signatures_wide(df).collect()
        }
        for min_agree in (2, 4):
            got = {
                r["doc_id"]: (r["canon_id"], r["n_near"])
                for r in dedup.minhash_dedup_summary(df, min_agree=min_agree).collect()
            }
            assert set(got) == set(wide)
            for d, sig in wide.items():
                near = [
                    e
                    for e, t in wide.items()
                    if sum(x == y for x, y in zip(sig, t)) >= min_agree
                ]
                assert got[d] == (min(near), len(near)), (d, min_agree)


class TestSimhashSummaryModel:
    def test_matches_bruteforce_one_hop_model(self, spark):
        """simhash_dedup_summary (the r13 bounded reshape of the 16-bit
        near-dup query) vs a brute-force python one-hop model computed
        from the SAME signatures: canon_id = min doc_id within
        hamming <= 2, n_near = neighborhood size (self included)."""
        from pyspark.sql import Row

        from spark_binlog_spark.functions import dedup

        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        import random

        rng = random.Random(7)
        docs = []
        for i in range(60):
            base = [rng.choice(words) for _ in range(rng.randint(1, 6))]
            docs.append(Row(doc_id=i, text=" ".join(base)))
            if rng.random() < 0.4:  # exact dup cliques
                docs.append(Row(doc_id=1000 + i, text=" ".join(base)))
        df = spark.createDataFrame(docs)
        sigs = {r["doc_id"]: r["simhash16"] for r in dedup.simhash(df).collect()}
        got = {
            r["doc_id"]: (r["canon_id"], r["n_near"])
            for r in dedup.simhash_dedup_summary(df, max_hamming=2).collect()
        }
        assert set(got) == set(sigs)
        for d, s in sigs.items():
            near = [e for e, t in sigs.items() if bin(s ^ t).count("1") <= 2]
            assert got[d] == (min(near), len(near)), d


class TestRepetitionKernelModel:
    def test_matches_counter_model(self, spark):
        """repetition_signals (r14 Arrow kernel — replaced the two
        per-doc (doc, term) shuffles) vs a brute-force Counter model on
        seeded random texts plus the edge cases the old explode form
        defined: empty text ('' splits to one empty token), single
        word (no bigrams -> 0), consecutive/trailing spaces (empty
        tokens are real tokens), all-same-word docs (frac 10000), and
        a NULL text row (dropped, as explode dropped it)."""
        import random
        from collections import Counter
        from math import floor

        from pyspark.sql import Row

        from spark_binlog_spark.functions.text import repetition_signals

        rng = random.Random(77)
        vocab = ["a", "bb", "ccc", "é", "\U0001f600", ""]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
            for _ in range(120)
        ]
        texts += ["", "solo", "x x x x", "a  b ", "tie tie toe toe"]
        rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        rows.append(Row(doc_id=10_000, text=None))

        got = {
            r["doc_id"]: (r["n_words"], r["top_word_frac4"], r["top_bigram_frac4"])
            for r in repetition_signals(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }

        expected = {}
        for i, t in enumerate(texts):
            words = t.split(" ")
            n = len(words)
            wf = floor(max(Counter(words).values()) / n * 10000)
            bigrams = Counter(zip(words, words[1:]))
            bf = floor(max(bigrams.values()) / (n - 1) * 10000) if bigrams else 0
            expected[i] = (n, wf, bf)
        assert got == expected  # null-text row absent on both sides


class TestAsofJoinModel:
    def test_matches_python_reference_model_on_seeded_random(self, spark):
        """asof_join vs a brute-force python reference on one seeded
        random dataset (200 left x 60 right rows, 5 keys, duplicate
        timestamps included) — the windowed-union implementation must
        match exact latest-at-or-before semantics everywhere."""
        import random

        from pyspark.sql import Row

        from spark_binlog_spark.operators.asof import asof_join

        rng = random.Random(42)
        keys = ["k0", "k1", "k2", "k3", "k4"]
        left = [Row(k=rng.choice(keys), t=rng.randint(0, 100), lid=i) for i in range(200)]
        right = [
            Row(k=rng.choice(keys), rt=rng.randint(0, 100), v=i) for i in range(60)
        ]
        # unique (k, rt) on the right: the reference and the window agree
        # only when the right side has one row per timestamp per key
        seen, runiq = set(), []
        for r in right:
            if (r.k, r.rt) not in seen:
                seen.add((r.k, r.rt))
                runiq.append(r)

        ldf = spark.createDataFrame(left)
        rdf = spark.createDataFrame(runiq)
        out = asof_join(ldf, rdf, on=["k"], left_time="t", right_time="rt",
                        value_cols=["rt", "v"])
        got = {r["lid"]: (r["rt"], r["v"]) for r in out.collect()}

        by_key = {}
        for r in runiq:
            by_key.setdefault(r.k, []).append((r.rt, r.v))
        for rows in by_key.values():
            rows.sort()
        expected = {}
        for row in left:
            best = (None, None)
            for rt, v in by_key.get(row.k, []):
                if rt <= row.t:
                    best = (rt, v)
                else:
                    break
            expected[row.lid] = best
        assert got == expected


class TestMediaProbeProperties:
    @given(data=st.binary(max_size=256))
    @settings(max_examples=300, deadline=None)
    def test_probe_never_raises_on_arbitrary_bytes(self, data):
        """The header probe is a byte parser fed UNTRUSTED blobs — for
        ANY input it must return the 5-tuple, never raise (truncated
        headers, lying length fields, fill bytes, junk)."""
        from spark_binlog_spark.functions.multimodal import _probe_header

        fmt, w, h, rate, ch = _probe_header(data)
        assert fmt in ("png", "jpeg", "gif", "bmp", "pnm", "wav", "unknown")
        for v in (w, h, rate, ch):
            assert v is None or isinstance(v, int)

    @given(data=st.binary(max_size=64), prefix=st.sampled_from(
        [b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"BM", b"RIFF", b"P5", b"P6"]
    ))
    @settings(max_examples=200, deadline=None)
    def test_probe_never_raises_on_truncated_container_headers(self, data, prefix):
        """Adversarial variant: a real container magic followed by
        arbitrary (often truncated/inconsistent) bytes."""
        from spark_binlog_spark.functions.multimodal import _probe_header

        _probe_header(prefix + data)  # must not raise


class TestRpSignsProperties:
    @given(dim=st.integers(1, 96), out_dim=st.integers(1, 16), seed=st.integers(0, 5))
    @settings(max_examples=100, deadline=None)
    def test_matrix_shape_values_and_determinism(self, dim, out_dim, seed):
        """The JL sign matrix is exactly out_dim × dim of ±1 and
        bit-identical across calls (both engines bake the SAME
        literals — reproducibility is the whole contract)."""
        from spark_binlog_spark.functions.similarity import rp_signs

        m1 = rp_signs(dim, out_dim, seed)
        m2 = rp_signs(dim, out_dim, seed)
        assert m1 == m2
        assert len(m1) == out_dim and all(len(r) == dim for r in m1)
        assert all(v in (-1, 1) for r in m1 for v in r)

    def test_rows_differ_across_seed_and_index(self):
        from spark_binlog_spark.functions.similarity import rp_signs

        a = rp_signs(64, 4, 0)
        b = rp_signs(64, 4, 1)
        assert a != b  # seed changes the matrix
        assert len({tuple(r) for r in a}) == 4  # rows are distinct


class TestRegionSegmentIndexProperties:
    @given(
        spans=st.lists(
            st.tuples(st.integers(0, 500), st.integers(1, 40)), min_size=1, max_size=6
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_ordered_disjoint_spans_index_cleanly(self, spans, tmp_path_factory):
        """Any ordered, disjoint set of per-file event spans indexes
        without error and comes back sorted by file id with exact
        min/max; overlapping spans are rejected."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from spark_binlog_spark.sources.binlog_fixture import _region_segment_index

        d = tmp_path_factory.mktemp("region")
        # lay spans end-to-end with random gaps -> always disjoint+ordered
        cur = 0
        laid = []
        for i, (gap, width) in enumerate(spans):
            lo = cur + gap
            hi = lo + width - 1
            laid.append((i + 1, lo, hi))
            cur = hi + 1
        for fid, lo, hi in laid:
            tbl = pa.table({"event_id": pa.array(range(lo, hi + 1), pa.int64())})
            pq.write_table(tbl, str(d / f"wal.{fid:06d}"))
        idx = _region_segment_index(str(d))
        assert [(s["fid"], s["min"], s["max"]) for s in idx] == laid


class TestImageDecoderProperties:
    @given(data=st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_decoders_never_raise_on_arbitrary_bytes(self, data):
        """The BMP/PNM decoders parse UNTRUSTED blobs — for any input
        they must return pixels or None, never raise."""
        from spark_binlog_spark.functions.multimodal import (
            _bmp_pixels,
            _image_features_stdlib,
            _pnm_pixels,
        )

        for fn in (_bmp_pixels, _pnm_pixels):
            out = fn(data)
            assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)
        feats = _image_features_stdlib(data)
        assert feats is None or all(-1.0 <= x <= 1.0 for x in feats)

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        pix=st.integers(0, 2**32 - 1),
        maxval=st.integers(1, 255),
    )
    @settings(max_examples=150, deadline=None)
    def test_pnm_roundtrip_p5_and_p6(self, w, h, pix, maxval):
        """A generated PNM raster decodes back to exactly the written
        samples, rescaled by 255/maxval per the spec."""
        from spark_binlog_spark.functions.multimodal import _pnm_pixels

        vals = [(pix * (i + 13) * 2654435761) % (maxval + 1) for i in range(w * h)]
        pgm = f"P5 {w} {h} {maxval}\n".encode() + bytes(vals)
        got = _pnm_pixels(pgm)
        assert got is not None
        gw, gh, rows = got
        assert (gw, gh) == (w, h)
        flat = [px for row in rows for px in row]
        assert flat == [(v * 255 // maxval,) * 3 for v in vals]

        rgb = [x for v in vals for x in (v, (v * 3) % (maxval + 1), maxval - v)]
        ppm = f"P6\n{w} {h}\n{maxval}\n".encode() + bytes(rgb)
        got6 = _pnm_pixels(ppm)
        assert got6 is not None
        flat6 = [px for row in got6[2] for px in row]
        assert flat6 == [
            (
                vals[i] * 255 // maxval,
                ((vals[i] * 3) % (maxval + 1)) * 255 // maxval,
                (maxval - vals[i]) * 255 // maxval,
            )
            for i in range(w * h)
        ]

    @given(w=st.integers(1, 8), h=st.integers(1, 8), seed=st.integers(0, 2**31))
    @settings(max_examples=100, deadline=None)
    def test_bmp_roundtrip_bottom_up(self, w, h, seed):
        """A generated 24-bit BMP (bottom-up rows, BGR, padded stride)
        decodes back to the exact top-down RGB matrix."""
        import struct

        from spark_binlog_spark.functions.multimodal import _bmp_pixels

        rng = [(seed * (i + 7) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        stride = (w * 3 + 3) & ~3
        pix = bytearray()
        for r in reversed(range(h)):
            row = bytearray()
            for rgb in img[r]:
                row += bytes([rgb[2], rgb[1], rgb[0]])
            row += b"\x00" * (stride - len(row))
            pix += row
        header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
        got = _bmp_pixels(header + dib + bytes(pix))
        assert got is not None
        assert got[0] == w and got[1] == h
        assert got[2] == img


def _png_encode(img, color_type, filters, palette=None, depth=8, interlace=False):
    """Minimal spec-correct PNG writer for the tests: depth 8 or 16,
    chosen per-scanline filter types (the decoder must invert all
    five), interlace method 0 or 1 (Adam7: each pass filtered as an
    independent sub-image), zlib stream, proper chunk CRCs.  ``img``
    is top-down rows; samples per color type: 0=gray int, 2=(r,g,b),
    3=palette index, 4=(gray, a), 6=(r,g,b,a).  depth-16 samples carry
    the value in the HIGH byte and ``255 - v`` in the low byte so a
    decoder that truncates instead of taking the high byte fails."""
    import struct
    import zlib

    h = len(img)
    w = len(img[0])
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    sb = depth // 8
    bpp = ch * sb

    def flat(row):
        out = bytearray()
        for px in row:
            for v in px if isinstance(px, tuple) else (px,):
                out += bytes((v,)) if depth == 8 else bytes((v, (255 - v) & 0xFF))
        return out

    passes = (
        [(0, 0, 1, 1)]
        if not interlace
        else [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
    )
    raw = bytearray()
    fi = 0
    for x0, y0, dx, dy in passes:
        sub = [[img[y][x] for x in range(x0, w, dx)] for y in range(y0, h, dy)]
        if not sub or not sub[0]:
            continue
        prev = bytearray(len(sub[0]) * bpp)
        for rowpix in sub:
            line = flat(rowpix)
            ft = filters[fi % len(filters)]
            fi += 1
            enc = bytearray(line)
            if ft == 1:  # Sub
                for x in range(len(line) - 1, bpp - 1, -1):
                    enc[x] = (line[x] - line[x - bpp]) & 0xFF
            elif ft == 2:  # Up
                for x in range(len(line)):
                    enc[x] = (line[x] - prev[x]) & 0xFF
            elif ft == 3:  # Average
                for x in range(len(line)):
                    left = line[x - bpp] if x >= bpp else 0
                    enc[x] = (line[x] - ((left + prev[x]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(len(line)):
                    a = line[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (line[x] - pred) & 0xFF
            raw += bytes([ft]) + enc
            prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0),
    )
    if color_type == 3:
        out += chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def _gif_encode(w, h, indices, palette, interlace=False):
    """Minimal spec-correct GIF writer for the tests: global palette,
    one image block, a real variable-width LZW encoder emitting only
    literal codes but tracking table growth exactly like a decoder
    (each emitted code after the first adds one table entry, so the
    code width must widen at the same points)."""
    import struct

    pal_bits = max(2, (len(palette) - 1).bit_length())
    pal = list(palette) + [(0, 0, 0)] * ((1 << pal_bits) - len(palette))
    min_code = max(2, pal_bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    if interlace:
        # an interlaced GIF stores rows in PASS order (8/0, 8/4, 4/2,
        # 2/1) — reorder the natural-order rows before encoding
        rows = [indices[r * w : (r + 1) * w] for r in range(h)]
        indices = [
            v
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for r in range(start, h, step)
            for v in rows[r]
        ]

    codes = [clear]
    table_size = eoi + 1
    width = min_code + 1
    widths = []
    first = True
    for idx in indices:
        widths.append(width)
        codes.append(idx)
        if not first:
            table_size += 1
            # decoder grows width BEFORE reading the next code once the
            # table fills the current width
            if table_size == (1 << width) and width < 12:
                width += 1
        first = False
    widths.append(width)
    codes.append(eoi)
    widths.insert(0, min_code + 1)  # the leading CLEAR's width

    acc = bits = 0
    payload = bytearray()
    for code, cw in zip(codes, widths):
        acc |= code << bits
        bits += cw
        while bits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        payload.append(acc & 0xFF)

    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += b"".join(bytes(c) for c in pal)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0, min_code])
    for i in range(0, len(payload), 255):
        sub = payload[i : i + 255]
        out += bytes([len(sub)]) + sub
    return out + b"\x00\x3b"


def _jpeg_encode(img, subsample=False, restart_interval=0):
    """Minimal spec-correct baseline JPEG writer for the tests (ITU-T
    T.81): JFIF YCbCr conversion, orthonormal forward DCT, all-ones
    quant tables (near-lossless, so decode tolerance is bounded by
    coefficient rounding), canonical Huffman tables (12 DC symbols at
    4 bits, 256 AC symbols at 9 bits), byte stuffing, optional 4:2:0
    chroma subsampling (2x2 box mean) and restart intervals."""
    import math
    import struct

    import numpy as np

    h = len(img)
    w = len(img[0])
    arr = np.array(img, dtype=np.float64)  # (h, w, 3)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    m = np.zeros((8, 8))
    for k in range(8):
        ck = math.sqrt(0.5) if k == 0 else 1.0
        for j in range(8):
            m[k, j] = 0.5 * ck * math.cos((2 * j + 1) * k * math.pi / 16)

    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def pad_to(plane, mult):
        ph = -(-plane.shape[0] // mult) * mult
        pw = -(-plane.shape[1] // mult) * mult
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    if subsample:
        Yp = pad_to(Y, 16)
        Cbp = pad_to(Cb, 16)
        Crp = pad_to(Cr, 16)
        # 2x2 box mean to half resolution
        Cbs = Cbp.reshape(Cbp.shape[0] // 2, 2, Cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        Crs = Crp.reshape(Crp.shape[0] // 2, 2, Crp.shape[1] // 2, 2).mean(axis=(1, 3))
        comps = [(Yp, 2, 2), (Cbs, 1, 1), (Crs, 1, 1)]
    else:
        comps = [(pad_to(Y, 8), 1, 1), (pad_to(Cb, 8), 1, 1), (pad_to(Cr, 8), 1, 1)]

    def fdct_block(block):
        # natural-order 64-vector of rounded coefficients
        return np.rint(m @ (block - 128.0) @ m.T).astype(int).reshape(64)

    # canonical tables: DC symbols 0..11 at length 4; AC symbols 0..254
    # at length 9 plus symbol 255 at length 10 (a DHT count byte caps
    # at 255 symbols per code length)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_counts = [0] * 8 + [255, 1] + [0] * 6
    ac_syms = list(range(256))

    dc_code = {s: (4, s) for s in dc_syms}
    ac_code = {s: (9, s) for s in range(255)}
    ac_code[255] = (10, 255 << 1)  # canonical: (code after 254) << 1

    out_bits: list[tuple[int, int]] = []  # (nbits, value)

    def put(nbits, value):
        if nbits:
            out_bits.append((nbits, value))

    def category(v):
        return abs(v).bit_length()

    def encode_block(coef, pred):
        diff = int(coef[0]) - pred
        t = category(diff)
        ln, code = dc_code[t]
        put(ln, code)
        put(t, diff if diff >= 0 else diff + (1 << t) - 1)
        seq = [int(coef[zz[k]]) for k in range(64)]
        k = 1
        run = 0
        last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
        while k <= last_nz:
            v = seq[k]
            if v == 0:
                run += 1
                k += 1
                continue
            while run >= 16:
                ln, code = ac_code[0xF0]
                put(ln, code)
                run -= 16
            size = category(v)
            ln, code = ac_code[(run << 4) | size]
            put(ln, code)
            put(size, v if v >= 0 else v + (1 << size) - 1)
            run = 0
            k += 1
        if last_nz < 63:
            ln, code = ac_code[0x00]
            put(ln, code)
        return int(coef[0])

    def flush_bytes():
        data = bytearray()
        acc = bits = 0
        for nbits, value in out_bits:
            acc = (acc << nbits) | (value & ((1 << nbits) - 1))
            bits += nbits
            while bits >= 8:
                byte = (acc >> (bits - 8)) & 0xFF
                data.append(byte)
                if byte == 0xFF:
                    data.append(0x00)
                bits -= 8
                acc &= (1 << bits) - 1
        if bits:
            byte = ((acc << (8 - bits)) | ((1 << (8 - bits)) - 1)) & 0xFF
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
        out_bits.clear()
        return bytes(data)

    hmax = max(ch for _, ch, _ in comps)
    vmax = max(cv for _, _, cv in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = [0, 0, 0]
    entropy = bytearray()
    n_rst = 0
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                entropy += flush_bytes()
                entropy += bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
                pred = [0, 0, 0]
            for ci, (plane, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = encode_block(fdct_block(block), pred[ci])
            mcu_idx += 1
    entropy += flush_bytes()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # quant table 0: all ones
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (_, ch, cv) in zip((1, 2, 3), comps):
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(entropy) + b"\xff\xd9"
    return out


def _jpeg_encode_progressive(img, subsample=False, restart_interval=0,
                             sequential_multiscan=False):
    """Spec-correct PROGRESSIVE JPEG writer (ITU-T T.81 Annex G) for
    the tests: the same color/forward-DCT/all-ones-quant front end as
    ``_jpeg_encode``, then a ten-scan script exercising every
    progressive mode the decoder claims — interleaved DC first at
    Al=1, per-component AC first scans with spectral selection (Y
    split 1-5 / 6-63) at Al=1 incl. EOB-run coding, the raw-bit DC
    refinement, and AC refinement scans (buffered correction bits,
    ±1 insertions, EOB runs carrying buffered bits).  Because the
    quantized coefficients are IDENTICAL to the sequential encoder's,
    a correct decoder must produce byte-identical pixels for both
    files.  ``restart_interval`` plants RSTn markers in every scan.
    ``sequential_multiscan=True`` instead writes a SOF0 file with one
    COMPLETE (DC+AC) scan per component — the non-interleaved
    sequential layout some real encoders emit."""
    import math
    import struct

    import numpy as np

    h = len(img)
    w = len(img[0])
    arr = np.array(img, dtype=np.float64)
    r_, g_, b_ = arr[..., 0], arr[..., 1], arr[..., 2]
    Y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    Cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    Cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_

    m = np.zeros((8, 8))
    for k in range(8):
        ck = math.sqrt(0.5) if k == 0 else 1.0
        for j in range(8):
            m[k, j] = 0.5 * ck * math.cos((2 * j + 1) * k * math.pi / 16)
    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def pad_to(plane, mult):
        ph = -(-plane.shape[0] // mult) * mult
        pw = -(-plane.shape[1] // mult) * mult
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    if subsample:
        Yp, Cbp, Crp = pad_to(Y, 16), pad_to(Cb, 16), pad_to(Cr, 16)
        Cbs = Cbp.reshape(Cbp.shape[0] // 2, 2, Cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        Crs = Crp.reshape(Crp.shape[0] // 2, 2, Crp.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [(Yp, 2, 2), (Cbs, 1, 1), (Crs, 1, 1)]
    else:
        planes = [(pad_to(Y, 8), 1, 1), (pad_to(Cb, 8), 1, 1), (pad_to(Cr, 8), 1, 1)]

    hmax = max(ch for _, ch, _ in planes)
    vmax = max(cv for _, _, cv in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component ZIGZAG-order coefficient blocks, MCU-padded grid +
    # the true (non-interleaved) grid dims
    comps = []
    for plane, ch, cv in planes:
        pb_y, pb_x = mcuy * cv, mcux * ch
        # pad the plane out to the MCU grid (replicate edges)
        full = np.empty((pb_y * 8, pb_x * 8))
        full[: plane.shape[0], : plane.shape[1]] = plane
        full[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        full[:, plane.shape[1] :] = full[:, plane.shape[1] - 1 : plane.shape[1]]
        coef = np.zeros((pb_y, pb_x, 64), dtype=np.int64)
        for by in range(pb_y):
            for bx in range(pb_x):
                block = full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                nat = np.rint(m @ (block - 128.0) @ m.T).astype(int).reshape(64)
                coef[by, bx] = nat[zz]  # scan order
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        comps.append({"coef": coef, "h": ch, "v": cv,
                      "bw": -(-cw // 8), "bh": -(-chh // 8)})

    dc_code = {s: (4, s) for s in range(12)}
    ac_code = {s: (9, s) for s in range(255)}
    ac_code[255] = (10, 255 << 1)

    out_bits: list[tuple[int, int]] = []

    def put(nbits, value):
        if nbits:
            out_bits.append((nbits, value & ((1 << nbits) - 1)))

    def flush_bytes():
        data = bytearray()
        acc = bits = 0
        for nbits, value in out_bits:
            acc = (acc << nbits) | value
            bits += nbits
            while bits >= 8:
                byte = (acc >> (bits - 8)) & 0xFF
                data.append(byte)
                if byte == 0xFF:
                    data.append(0x00)
                bits -= 8
                acc &= (1 << bits) - 1
        if bits:
            byte = ((acc << (8 - bits)) | ((1 << (8 - bits)) - 1)) & 0xFF
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
        out_bits.clear()
        return bytes(data)

    def sig_bits(v, s):
        return v if v >= 0 else v + (1 << s) - 1

    # ---- scan emitters (each returns the scan's entropy bytes) -------
    def dc_first(scomps, Al):
        entropy = bytearray()
        pred = [0] * len(comps)
        n_rst = rst_ct = 0
        if len(scomps) > 1:
            units = [
                (ci, by, bx)
                for my in range(mcuy)
                for mx in range(mcux)
                for ci in scomps
                for by in range(comps[ci]["v"] * my, comps[ci]["v"] * my + comps[ci]["v"])
                for bx in range(comps[ci]["h"] * mx, comps[ci]["h"] * mx + comps[ci]["h"])
            ]
            per = sum(comps[ci]["v"] * comps[ci]["h"] for ci in scomps)
        else:
            ci = scomps[0]
            units = [(ci, by, bx) for by in range(comps[ci]["bh"])
                     for bx in range(comps[ci]["bw"])]
            per = 1
        for u, (ci, by, bx) in enumerate(units):
            if restart_interval and u and u % (restart_interval * per) == 0:
                entropy += flush_bytes() + bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
                pred = [0] * len(comps)
            v = int(comps[ci]["coef"][by, bx, 0]) >> Al  # arithmetic shift
            diff = v - pred[ci]
            pred[ci] = v
            t = abs(diff).bit_length()
            ln, code = dc_code[t]
            put(ln, code)
            put(t, sig_bits(diff, t))
        entropy += flush_bytes()
        return bytes(entropy)

    def dc_refine(scomps, Al):
        entropy = bytearray()
        n_rst = 0
        if len(scomps) > 1:
            units = [
                (ci, by, bx)
                for my in range(mcuy)
                for mx in range(mcux)
                for ci in scomps
                for by in range(comps[ci]["v"] * my, comps[ci]["v"] * my + comps[ci]["v"])
                for bx in range(comps[ci]["h"] * mx, comps[ci]["h"] * mx + comps[ci]["h"])
            ]
            per = sum(comps[ci]["v"] * comps[ci]["h"] for ci in scomps)
        else:
            ci = scomps[0]
            units = [(ci, by, bx) for by in range(comps[ci]["bh"])
                     for bx in range(comps[ci]["bw"])]
            per = 1
        for u, (ci, by, bx) in enumerate(units):
            if restart_interval and u and u % (restart_interval * per) == 0:
                entropy += flush_bytes() + bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
            put(1, (int(comps[ci]["coef"][by, bx, 0]) >> Al) & 1)
        entropy += flush_bytes()
        return bytes(entropy)

    def ac_first(ci, Ss, Se, Al):
        entropy = bytearray()
        c = comps[ci]
        eobrun = 0
        n_rst = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                ln, code = ac_code[rr << 4]
                put(ln, code)
                put(rr, eobrun - (1 << rr))
                eobrun = 0

        for u in range(c["bh"] * c["bw"]):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                entropy += flush_bytes() + bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
            blk = c["coef"][u // c["bw"], u % c["bw"]]
            t = [0] * 64
            last_nz = 0
            for k in range(Ss, Se + 1):
                v = int(blk[k])
                tv = (abs(v) >> Al) * (1 if v >= 0 else -1)
                t[k] = tv
                if tv:
                    last_nz = k
            if last_nz == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(Ss, last_nz + 1):
                v = t[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_code[0xF0]
                    put(ln, code)
                    run -= 16
                s = abs(v).bit_length()
                ln, code = ac_code[(run << 4) | s]
                put(ln, code)
                put(s, sig_bits(v, s))
                run = 0
            if last_nz < Se:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        entropy += flush_bytes()
        return bytes(entropy)

    def ac_refine(ci, Ss, Se, Al):
        entropy = bytearray()
        c = comps[ci]
        eobrun = 0
        ebits: list[int] = []  # correction bits riding the EOB run
        n_rst = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                ln, code = ac_code[rr << 4]
                put(ln, code)
                put(rr, eobrun - (1 << rr))
                eobrun = 0
            for b in ebits:
                put(1, b)
            ebits.clear()

        for u in range(c["bh"] * c["bw"]):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                entropy += flush_bytes() + bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
            blk = c["coef"][u // c["bw"], u % c["bw"]]
            absv = [0] * 64
            eobk = Ss - 1  # last NEWLY-nonzero index (T.81 G.1.2.3)
            for k in range(Ss, Se + 1):
                absv[k] = abs(int(blk[k])) >> Al
                if absv[k] == 1:
                    eobk = k
            run = 0
            br: list[int] = []  # correction bits since last symbol
            for k in range(Ss, Se + 1):
                temp = absv[k]
                if temp == 0:
                    run += 1
                    continue
                # ZRL check runs at EVERY nonzero (history included, as
                # in T.81 G.1.2.3): the decoder reads correction bits
                # positionally during each symbol's advance, so a bit
                # buffered past a 16-zero boundary must ride the NEXT
                # symbol, not this ZRL
                while run > 15 and k <= eobk:
                    flush_eob()
                    ln, code = ac_code[0xF0]
                    put(ln, code)
                    run -= 16
                    for b in br:
                        put(1, b)
                    br.clear()
                if temp > 1:  # history coefficient: buffered correction bit
                    br.append(temp & 1)
                    continue
                flush_eob()
                ln, code = ac_code[(run << 4) | 1]
                put(ln, code)
                put(1, 1 if int(blk[k]) > 0 else 0)
                for b in br:
                    put(1, b)
                br.clear()
                run = 0
            if run > 0 or br:
                eobrun += 1
                ebits.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        entropy += flush_bytes()
        return bytes(entropy)

    def _full_block(blk, pred):
        diff = int(blk[0]) - pred
        t = abs(diff).bit_length()
        ln, code = dc_code[t]
        put(ln, code)
        put(t, sig_bits(diff, t))
        last_nz = max((k for k in range(1, 64) if int(blk[k])), default=0)
        run = 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_code[0xF0]
                put(ln, code)
                run -= 16
            s = abs(v).bit_length()
            ln, code = ac_code[(run << 4) | s]
            put(ln, code)
            put(s, sig_bits(v, s))
            run = 0
        if last_nz < 63:
            ln, code = ac_code[0x00]
            put(ln, code)
        return int(blk[0])

    def full_scan(scan_cis):
        """Complete sequential DC+AC coding of a COMPONENT SUBSET —
        raster over the true grid for one component, MCU-interleaved
        for several (the two multi-scan SOF0 layouts)."""
        entropy = bytearray()
        n_rst = 0
        pred = {ci: 0 for ci in scan_cis}
        if len(scan_cis) > 1:
            units = [
                (ci, by, bx)
                for my in range(mcuy)
                for mx in range(mcux)
                for ci in scan_cis
                for by in range(comps[ci]["v"] * my, comps[ci]["v"] * my + comps[ci]["v"])
                for bx in range(comps[ci]["h"] * mx, comps[ci]["h"] * mx + comps[ci]["h"])
            ]
            per = sum(comps[ci]["v"] * comps[ci]["h"] for ci in scan_cis)
        else:
            ci = scan_cis[0]
            units = [(ci, by, bx) for by in range(comps[ci]["bh"])
                     for bx in range(comps[ci]["bw"])]
            per = 1
        for u, (ci, by, bx) in enumerate(units):
            if restart_interval and u and u % (restart_interval * per) == 0:
                entropy += flush_bytes() + bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
                pred = {c_: 0 for c_ in scan_cis}
            pred[ci] = _full_block(comps[ci]["coef"][by, bx], pred[ci])
        entropy += flush_bytes()
        return bytes(entropy)

    # ---- container ----------------------------------------------------
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dc_counts = [0, 0, 0, 12] + [0] * 12
    ac_counts = [0] * 8 + [255, 1] + [0] * 6
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, c in zip((1, 2, 3), comps):
        sof += bytes([cid, (c["h"] << 4) | c["v"], 0])
    out += seg(0xC0 if sequential_multiscan else 0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(range(12)))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(range(256)))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def sos(scomps, Ss, Se, Ah, Al, entropy):
        body = bytes([len(scomps)])
        for ci in scomps:
            body += bytes([ci + 1, 0x00])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return seg(0xDA, body) + entropy

    if sequential_multiscan == "interleaved_subset":
        # two scans: (Y, Cb) MCU-interleaved, then Cr alone
        out += sos([0, 1], 0, 63, 0, 0, full_scan([0, 1]))
        out += sos([2], 0, 63, 0, 0, full_scan([2]))
        return out + b"\xff\xd9"
    if sequential_multiscan:
        for ci in range(3):
            out += sos([ci], 0, 63, 0, 0, full_scan([ci]))
        return out + b"\xff\xd9"

    out += sos([0, 1, 2], 0, 0, 0, 1, dc_first([0, 1, 2], 1))
    out += sos([0], 1, 5, 0, 1, ac_first(0, 1, 5, 1))
    out += sos([0], 6, 63, 0, 1, ac_first(0, 6, 63, 1))
    out += sos([1], 1, 63, 0, 1, ac_first(1, 1, 63, 1))
    out += sos([2], 1, 63, 0, 1, ac_first(2, 1, 63, 1))
    out += sos([0, 1, 2], 0, 0, 1, 0, dc_refine([0, 1, 2], 0))
    out += sos([0], 1, 5, 1, 0, ac_refine(0, 1, 5, 0))
    out += sos([0], 6, 63, 1, 0, ac_refine(0, 6, 63, 0))
    out += sos([1], 1, 63, 1, 0, ac_refine(1, 1, 63, 0))
    out += sos([2], 1, 63, 1, 0, ac_refine(2, 1, 63, 0))
    return out + b"\xff\xd9"


class TestProgressiveJpegProperties:
    """Progressive (SOF2) decode — VERDICT r9 ask #8.  The progressive
    encoder quantizes EXACTLY the coefficients the sequential encoder
    does, so after all refinement scans the decoder's coefficient
    arrays must be identical and the two files must decode to
    byte-identical pixels — a stronger check than a tolerance."""

    @given(w=st.integers(1, 20), h=st.integers(1, 20), seed=st.integers(0, 2**31))
    @settings(max_examples=40, deadline=None)
    def test_progressive_equals_sequential_exactly(self, w, h, seed):
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 5) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        seq = _jpeg_pixels(_jpeg_encode(img))
        prog = _jpeg_pixels(_jpeg_encode_progressive(img))
        assert prog is not None
        assert prog == seq

    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31),
        restart=st.sampled_from([0, 1, 3]),
    )
    @settings(max_examples=40, deadline=None)
    def test_progressive_420_with_restarts_equals_sequential(self, w, h, seed, restart):
        """4:2:0 sampling exercises the non-interleaved block geometry
        (chroma grids smaller than the MCU-padded arrays) and restart
        markers exercise predictor/EOB-run resets in EVERY scan kind
        (DC first, AC first with spectral splits, both refinements)."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 11) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        seq = _jpeg_pixels(_jpeg_encode(img, subsample=True, restart_interval=restart))
        prog = _jpeg_pixels(
            _jpeg_encode_progressive(img, subsample=True, restart_interval=restart)
        )
        assert prog is not None
        assert prog == seq

    @given(w=st.integers(1, 20), h=st.integers(1, 20), seed=st.integers(0, 2**31))
    @settings(max_examples=40, deadline=None)
    def test_progressive_roundtrip_within_tolerance(self, w, h, seed):
        """And the absolute contract vs the SOURCE pixels: all-ones
        quant means the only loss is coefficient rounding."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 7) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        got = _jpeg_pixels(_jpeg_encode_progressive(img))
        assert got is not None and (got[0], got[1]) == (w, h)
        for r in range(h):
            for c in range(w):
                for ch in range(3):
                    assert abs(got[2][r][c][ch] - img[r][c][ch]) <= TestJpegDecoderProperties.TOL

    @given(
        pos=st.integers(0, 10_000),
        val=st.integers(0, 255),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=200, deadline=None)
    def test_progressive_mutation_fuzz_never_raises(self, pos, val, seed):
        """Structured fuzz: corrupt ONE byte of a valid progressive
        file (marker bytes, scan headers, entropy data — wherever
        `pos` lands) — the decoder must return pixels or None, never
        raise.  Random-bytes fuzz almost never reaches the multi-scan
        machinery; byte-flipping a valid file exercises every branch
        with adversarial inputs."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 13) * 2654435761) % 256 for i in range(10 * 9 * 3)]
        img = [
            [tuple(rng[(r * 10 + c) * 3 : (r * 10 + c) * 3 + 3]) for c in range(10)]
            for r in range(9)
        ]
        blob = bytearray(_jpeg_encode_progressive(img))
        blob[pos % len(blob)] = val
        out = _jpeg_pixels(bytes(blob))
        assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)

    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31),
        sub=st.booleans(),
        restart=st.sampled_from([0, 2]),
    )
    @settings(max_examples=40, deadline=None)
    def test_sequential_multiscan_equals_interleaved(self, w, h, seed, sub, restart):
        """SOF0 with one complete scan per component (the
        non-interleaved sequential layout) must decode byte-identical
        to the interleaved single-scan file of the same coefficients —
        the multi-scan accumulator handling a SEQUENTIAL frame."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 17) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        seq = _jpeg_pixels(_jpeg_encode(img, subsample=sub, restart_interval=restart))
        multi = _jpeg_pixels(
            _jpeg_encode_progressive(
                img, subsample=sub, restart_interval=restart,
                sequential_multiscan=True,
            )
        )
        assert multi is not None
        assert multi == seq
        # two-scan variant: (Y, Cb) MCU-interleaved, Cr alone — the
        # subset-interleaved geometry of the full-scan accumulator
        mixed = _jpeg_pixels(
            _jpeg_encode_progressive(
                img, subsample=sub, restart_interval=restart,
                sequential_multiscan="interleaved_subset",
            )
        )
        assert mixed == seq

    def test_progressive_probe_and_truncation(self):
        """The header probe reports SOF2 dims, and a progressive file
        truncated mid-scan (no EOI) returns None, never raises."""
        from spark_binlog_spark.functions.multimodal import (
            _jpeg_pixels,
            _probe_header,
        )

        img = [[(r * 20 + c * 3 % 256, c, r) for c in range(9)] for r in range(7)]
        blob = _jpeg_encode_progressive(img)
        assert _probe_header(blob)[:3] == ("jpeg", 9, 7)
        assert _jpeg_pixels(blob[: len(blob) // 2]) is None
        # scans present but EOI missing: render never happens
        assert _jpeg_pixels(blob[:-2]) is None

    def test_second_sof_spliced_before_eoi_returns_none(self):
        """ADVICE r10 (high): a valid progressive file with a second
        SOF0 segment spliced in before EOI used to replace `frame`
        with comps lacking 'coef' arrays, so the EOI render raised
        KeyError('coef') — escaping the (IndexError, ValueError,
        struct.error) tuple and crashing the mapInPandas job on one
        adversarial blob.  T.81 allows one frame per image: the
        decoder must return None, never raise."""
        import struct

        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        img = [[(r * 20 + c * 3 % 256, c, r) for c in range(9)] for r in range(7)]
        blob = _jpeg_encode_progressive(img)
        assert _jpeg_pixels(blob) is not None  # baseline: valid file decodes
        # hand-build a minimal second SOF0: 1 grayscale component 9x7
        sof2 = (
            b"\xff\xc0"
            + struct.pack(">H", 2 + 6 + 3)
            + struct.pack(">BHHB", 8, 7, 9, 1)
            + struct.pack(">BBB", 1, 0x11, 0)
        )
        spliced = blob[:-2] + sof2 + blob[-2:]  # before EOI
        assert _jpeg_pixels(spliced) is None  # rejected, no raise
        # and splicing a second progressive SOF2 is equally rejected
        sof_prog = b"\xff\xc2" + sof2[2:]
        assert _jpeg_pixels(blob[:-2] + sof_prog + blob[-2:]) is None


class TestPngGifDecoderProperties:
    @given(data=st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_decoders_never_raise_on_arbitrary_bytes(self, data):
        """PNG/GIF decoders parse UNTRUSTED blobs — pixels or None,
        never an exception (same contract as BMP/PNM)."""
        from spark_binlog_spark.functions.multimodal import _gif_pixels, _png_pixels

        for fn in (_png_pixels, _gif_pixels):
            out = fn(data)
            assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        seed=st.integers(0, 2**31),
        color_type=st.sampled_from([0, 2, 3, 4, 6]),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
        depth=st.sampled_from([8, 16]),
        interlace=st.booleans(),
    )
    @settings(max_examples=200, deadline=None)
    def test_png_roundtrip_all_color_types_and_filters(
        self, w, h, seed, color_type, filters, depth, interlace
    ):
        """A generated PNG — any supported color type, any mix of the
        five scanline filters, depth 8 or 16, interlaced (Adam7) or
        not — decodes to exactly the source pixels (alpha dropped,
        gray expanded, palette resolved, 16-bit reduced to the high
        byte; the encoder plants ``255 - v`` in the low byte so
        truncation bugs fail)."""
        from spark_binlog_spark.functions.multimodal import _png_pixels

        if color_type == 3:
            depth = 8  # palette is 8-bit-indexed per spec

        rng = [(seed * (i + 11) * 2654435761) % 256 for i in range(w * h * 4)]
        palette = [( (7 * i) % 256, (13 * i) % 256, (29 * i) % 256) for i in range(16)]
        img, expect = [], []
        for r in range(h):
            row, erow = [], []
            for c in range(w):
                b = rng[(r * w + c) * 4 : (r * w + c) * 4 + 4]
                if color_type == 0:
                    row.append(b[0])
                    erow.append((b[0],) * 3)
                elif color_type == 2:
                    row.append((b[0], b[1], b[2]))
                    erow.append((b[0], b[1], b[2]))
                elif color_type == 3:
                    row.append(b[0] % 16)
                    erow.append(palette[b[0] % 16])
                elif color_type == 4:
                    row.append((b[0], b[1]))
                    erow.append((b[0],) * 3)
                else:
                    row.append((b[0], b[1], b[2], b[3]))
                    erow.append((b[0], b[1], b[2]))
            img.append(row)
            expect.append(erow)
        png = _png_encode(
            img, color_type, filters, palette, depth=depth, interlace=interlace
        )
        got = _png_pixels(png)
        assert got is not None
        assert (got[0], got[1]) == (w, h)
        assert got[2] == expect

    @given(
        w=st.integers(1, 10),
        h=st.integers(1, 10),
        seed=st.integers(0, 2**31),
        npal=st.integers(2, 16),
        interlace=st.booleans(),
    )
    @settings(max_examples=200, deadline=None)
    def test_gif_roundtrip_with_lzw_and_interlace(self, w, h, seed, npal, interlace):
        """A generated GIF (real variable-width LZW stream, optional
        interlace) decodes to exactly the palette-mapped pixels."""
        from spark_binlog_spark.functions.multimodal import _gif_pixels

        palette = [((11 * i) % 256, (17 * i) % 256, (23 * i) % 256) for i in range(npal)]
        idx = [(seed * (i + 5) * 2654435761) % npal for i in range(w * h)]
        gif = _gif_encode(w, h, idx, palette, interlace)
        got = _gif_pixels(gif)
        assert got is not None
        assert (got[0], got[1]) == (w, h)
        flat = [px for row in got[2] for px in row]
        assert flat == [palette[v] for v in idx]

    def test_png_gif_feed_the_feature_encoder(self):
        """End contract: a real PNG and GIF run through the stdlib
        feature encoder (no PIL) and produce the same features as the
        equivalent uncompressed BMP of identical pixels."""
        import struct

        from spark_binlog_spark.functions.multimodal import _image_features_stdlib

        w, h = 8, 8
        img = [
            [((r * 31 + c * 7) % 256, (r * 13) % 256, (c * 29) % 256) for c in range(w)]
            for r in range(h)
        ]
        png = _png_encode(img, 2, [0, 1, 2, 3, 4])
        # BMP with the same pixels (bottom-up, BGR, padded)
        stride = (w * 3 + 3) & ~3
        pix = bytearray()
        for r in reversed(range(h)):
            row = bytearray()
            for rgb in img[r]:
                row += bytes([rgb[2], rgb[1], rgb[0]])
            row += b"\x00" * (stride - len(row))
            pix += row
        header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
        bmp = header + dib + bytes(pix)
        assert _image_features_stdlib(png) == _image_features_stdlib(bmp)
        # GIF is palette-bound: check exactness on a 4-color image
        palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (255, 255, 255)]
        idx = [(r + c) % 4 for r in range(h) for c in range(w)]
        gif = _gif_encode(w, h, idx, palette)
        feats = _image_features_stdlib(gif)
        assert feats is not None and len(feats) == 16
        # exact integer-luma box means, computed independently
        lum = [
            (299 * palette[v][0] + 587 * palette[v][1] + 114 * palette[v][2]) // 1000
            for v in idx
        ]
        expect = []
        for gy in range(4):
            for gx in range(4):
                cells = [
                    lum[y * w + x]
                    for y in range(gy * 2, gy * 2 + 2)
                    for x in range(gx * 2, gx * 2 + 2)
                ]
                expect.append((sum(cells) // len(cells) - 128) / 128.0)
        assert feats == expect


class TestJpegDecoderProperties:
    TOL = 8  # coefficient rounding through DCT->IDCT + color transform

    @given(data=st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_decoder_never_raises_on_arbitrary_bytes(self, data):
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        out = _jpeg_pixels(b"\xff\xd8" + data)
        assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)
        assert _jpeg_pixels(data) is None or data[:2] == b"\xff\xd8"

    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_444_roundtrip_within_tolerance(self, w, h, seed):
        """With all-ones quant tables the only loss is coefficient
        rounding: every decoded channel lands within TOL of the
        source."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 3) * 2654435761) % 256 for i in range(w * h * 3)]
        img = [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]
        got = _jpeg_pixels(_jpeg_encode(img))
        assert got is not None
        assert (got[0], got[1]) == (w, h)
        for r in range(h):
            for c in range(w):
                for ch in range(3):
                    assert abs(got[2][r][c][ch] - img[r][c][ch]) <= self.TOL

    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31),
        restart=st.sampled_from([0, 1, 2]),
    )
    @settings(max_examples=60, deadline=None)
    def test_420_and_restart_roundtrip_on_gray_content(self, w, h, seed, restart):
        """4:2:0 subsampling with r=g=b content: chroma is exactly 128
        everywhere so subsampling is lossless and the decode must land
        within the luma rounding tolerance — also exercises the
        restart-marker resync path."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        rng = [(seed * (i + 9) * 2654435761) % 256 for i in range(w * h)]
        img = [[(rng[r * w + c],) * 3 for c in range(w)] for r in range(h)]
        blob = _jpeg_encode(img, subsample=True, restart_interval=restart)
        got = _jpeg_pixels(blob)
        assert got is not None
        assert (got[0], got[1]) == (w, h)
        for r in range(h):
            for c in range(w):
                px = got[2][r][c]
                # gray in, gray out (Cb=Cr=128 survive the round trip)
                assert max(px) - min(px) <= 2
                assert abs(px[0] - img[r][c][0]) <= self.TOL

    def test_flat_color_is_dc_exact(self):
        """A flat-color image has DC-only blocks: with quant 1 the
        round trip is exact up to YCbCr<->RGB rounding (±1)."""
        from spark_binlog_spark.functions.multimodal import _jpeg_pixels

        for color in [(128, 128, 128), (200, 30, 90), (0, 0, 0), (255, 255, 255)]:
            img = [[color] * 12 for _ in range(10)]
            got = _jpeg_pixels(_jpeg_encode(img))
            assert got is not None and (got[0], got[1]) == (12, 10)
            for row in got[2]:
                for px in row:
                    assert all(abs(px[i] - color[i]) <= 1 for i in range(3))

    def test_hostile_dimension_claims_rejected_cheaply(self):
        """Resource-bomb guards: a tiny blob claiming a 65535x65535
        JPEG frame, and a tiny PNG IDAT claiming a huge raster, must
        both return None WITHOUT attempting the implied multi-GB
        allocation (the untrusted-bytes contract extended to memory)."""
        import struct
        import zlib

        from spark_binlog_spark.functions.multimodal import (
            _jpeg_pixels,
            _png_pixels,
        )

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
        bomb = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([1] * 64))
            + seg(0xC0, sof)
            + seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12)))
            + seg(0xC4, bytes([0x10]) + bytes([0] * 8 + [255, 1] + [0] * 6) + bytes(range(256)))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + b"\x00" * 16
        )
        assert _jpeg_pixels(bomb) is None

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body))
            )

        png_bomb = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b"")
        )
        assert _png_pixels(png_bomb) is None

    def test_jpeg_feeds_the_feature_encoder_and_probe(self):
        from spark_binlog_spark.functions.multimodal import (
            _image_features_stdlib,
            _probe_header,
        )

        img = [[((r * 37 + c * 11) % 256,) * 3 for c in range(16)] for r in range(16)]
        blob = _jpeg_encode(img)
        assert _probe_header(blob)[:3] == ("jpeg", 16, 16)
        feats = _image_features_stdlib(blob)
        assert feats is not None and len(feats) == 16
        assert all(-1.0 <= x <= 1.0 for x in feats)


def _wav_bytes(tag, nch, rate, bits, block_align, data):
    """Minimal RIFF/WAVE writer for the compressed-audio tests."""
    import struct

    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * block_align, block_align, bits)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


class TestCompressedWavDecoders:
    def test_g711_spec_anchor_values(self):
        """The canonical G.711 anchors: mu-law 0xFF/0x7F are plus and
        minus zero, 0x80/0x00 are the 16-bit extremes +/-32124; A-law
        0xD5/0x55 are +/-8, 0xAA/0x2A the extremes +/-32256 (sign bit
        SET after the 0x55 toggle is POSITIVE, per canonical g711.c)."""
        from spark_binlog_spark.functions.multimodal import _alaw_expand, _ulaw_expand

        assert _ulaw_expand(0xFF) == 0 and _ulaw_expand(0x7F) == 0
        assert _ulaw_expand(0x80) == 32124 and _ulaw_expand(0x00) == -32124
        assert _alaw_expand(0xD5) == 8 and _alaw_expand(0x55) == -8
        assert _alaw_expand(0xAA) == 32256 and _alaw_expand(0x2A) == -32256

    def test_g711_monotone_and_symmetric(self):
        """Within each sign the expanded magnitudes are strictly
        monotone in the code's (exponent, mantissa), and the negative
        half mirrors the positive half exactly."""
        from spark_binlog_spark.functions.multimodal import _alaw_expand, _ulaw_expand

        for expand, pos_codes, neg_codes in (
            # mu-law: positive codes 0xFF..0x80 ascending magnitude
            (_ulaw_expand, [0xFF - i for i in range(128)], [0x7F - i for i in range(128)]),
            # A-law: positive = sign bit SET after XOR... enumerate by value
            (_alaw_expand, None, None),
        ):
            if pos_codes is None:
                vals = [expand(b) for b in range(256)]
                pos = sorted(v for v in vals if v > 0)
                neg = sorted(-v for v in vals if v < 0)
                assert pos == neg  # exact mirror
                assert len(set(pos)) == len(pos)  # strictly monotone
            else:
                pos = [expand(b) for b in pos_codes]
                neg = [-expand(b) for b in neg_codes]
                assert pos == neg
                assert all(a < b for a, b in zip(pos, pos[1:]))

    def test_g711_wav_decodes_like_manual_expand(self):
        from spark_binlog_spark.functions.multimodal import (
            FEATURE_DIM,
            _compressed_wav_features_stdlib,
            _ulaw_expand,
        )

        codes = bytes((i * 37) % 256 for i in range(FEATURE_DIM))
        wav = _wav_bytes(7, 1, 8000, 8, 1, codes)
        feats = _compressed_wav_features_stdlib(wav)
        assert feats == [_ulaw_expand(b) / 32768.0 for b in codes]
        # stereo: only channel 0's samples are taken
        inter = bytes(
            x for pair in zip(codes, bytes(FEATURE_DIM)) for x in pair
        )
        wav2 = _wav_bytes(7, 2, 8000, 8, 2, inter)
        assert _compressed_wav_features_stdlib(wav2) == feats

    def test_ima_adpcm_matches_independent_simulation(self):
        """Decode a hand-built mono ADPCM block and compare against an
        independent transcription of the public IMA step algorithm."""
        import struct

        from spark_binlog_spark.functions.multimodal import (
            FEATURE_DIM,
            _IMA_INDEX_ADJ,
            _IMA_STEPS,
            _compressed_wav_features_stdlib,
        )

        nibbles = [(i * 7 + 3) % 16 for i in range(30)]
        packed = bytes(
            (nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2)
        )
        pred0, idx0 = 1000, 20
        block = struct.pack("<hBB", pred0, idx0, 0) + packed
        wav = _wav_bytes(0x11, 1, 8000, 4, len(block), block)
        got = _compressed_wav_features_stdlib(wav)

        exp = [pred0 / 32768.0]
        pred, index = pred0, idx0
        for nib in nibbles:
            step = _IMA_STEPS[index]
            diff = (step >> 3) + (step >> 2 if nib & 1 else 0) \
                + (step >> 1 if nib & 2 else 0) + (step if nib & 4 else 0)
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
            exp.append(pred / 32768.0)
        assert got == (exp + [0.0] * FEATURE_DIM)[:FEATURE_DIM]

    def test_ima_adpcm_tracks_a_slow_ramp(self):
        """End-quality contract: a canonical test-side IMA ENCODER over
        a slow ramp decodes back within a few quantization steps."""
        import struct

        from spark_binlog_spark.functions.multimodal import (
            _IMA_INDEX_ADJ,
            _IMA_STEPS,
            _compressed_wav_features_stdlib,
        )

        # genuinely slow ramp: +2/sample stays inside the initial step
        # sizes, so the codec tracks without an adaptation transient
        src = [2 * i for i in range(15)]
        pred, index = src[0], 0
        nibbles = []
        for s in src[1:]:
            step = _IMA_STEPS[index]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirror update
            d = (step >> 3) + (step >> 2 if nib & 1 else 0) \
                + (step >> 1 if nib & 2 else 0) + (step if nib & 4 else 0)
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        packed = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        block = struct.pack("<hBB", src[0], 0, 0) + packed
        wav = _wav_bytes(0x11, 1, 8000, 4, len(block), block)
        got = _compressed_wav_features_stdlib(wav)
        for i, s in enumerate(src):
            assert abs(got[i] * 32768.0 - s) <= 16, (i, got[i] * 32768.0, s)

    @given(data=st.binary(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_never_raises_on_arbitrary_bytes(self, data):
        from spark_binlog_spark.functions.multimodal import (
            _compressed_wav_features_stdlib,
        )

        for blob in (data, b"RIFF" + data, _wav_bytes(0x11, 1, 8000, 4, 8, data[:40])):
            out = _compressed_wav_features_stdlib(blob)
            assert out is None or len(out) == 16


class _FlacWriter:
    """Minimal spec-correct FLAC writer for the tests: STREAMINFO +
    one frame, any subframe type, rice or escaped residuals, the
    three stereo decorrelation modes, wasted bits."""

    def __init__(self):
        self.bits: list[tuple[int, int]] = []

    def put(self, n, v):
        self.bits.append((n, v & ((1 << n) - 1)))

    def put_signed(self, n, v):
        self.put(n, v + (1 << n) if v < 0 else v)

    def bytes_(self):
        acc = nb = 0
        out = bytearray()
        for n, v in self.bits:
            acc = (acc << n) | v
            nb += n
            while nb >= 8:
                out.append((acc >> (nb - 8)) & 0xFF)
                nb -= 8
                acc &= (1 << nb) - 1
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    # --- subframe encoders -------------------------------------------
    def subframe_constant(self, v, bps):
        self.put(1, 0)
        self.put(6, 0)
        self.put(1, 0)
        self.put_signed(bps, v)

    def subframe_verbatim(self, samples, bps, wasted=0):
        self.put(1, 0)
        self.put(6, 1)
        if wasted:
            self.put(1, 1)
            self.put(wasted - 1, 0)  # unary: (wasted-1) zeros ...
            self.put(1, 1)  # ... then the terminating 1
        else:
            self.put(1, 0)
        for s in samples:
            self.put_signed(bps - wasted, s >> wasted)

    def _rice_residual(self, resid, param, escape_raw=None):
        self.put(2, 0)  # method 0: 4-bit params
        self.put(4, 0)  # partition order 0
        if escape_raw is not None:
            self.put(4, 15)  # escape
            self.put(5, escape_raw)
            for e in resid:
                self.put_signed(escape_raw, e)
            return
        self.put(4, param)
        for e in resid:
            zz = (e << 1) if e >= 0 else ((-e) << 1) - 1
            q, r = zz >> param, zz & ((1 << param) - 1)
            self.put(q, 0)  # q zero bits ...
            self.put(1, 1)  # ... then the 1 terminator
            if param:
                self.put(param, r)

    def subframe_fixed(self, samples, order, bps, param=4, escape_raw=None):
        from spark_binlog_spark.functions.multimodal import _FLAC_FIXED_COEFS

        self.put(1, 0)
        self.put(6, 8 + order)
        self.put(1, 0)
        for s in samples[:order]:
            self.put_signed(bps, s)
        coefs = _FLAC_FIXED_COEFS[order]
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        self._rice_residual(resid, param, escape_raw)

    def subframe_lpc(self, samples, coefs, shift, prec, bps, param=4):
        order = len(coefs)
        self.put(1, 0)
        self.put(6, 31 + order)
        self.put(1, 0)
        for s in samples[:order]:
            self.put_signed(bps, s)
        self.put(4, prec - 1)
        self.put_signed(5, shift)
        for c in coefs:
            self.put_signed(prec, c)
        resid = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(samples))
        ]
        self._rice_residual(resid, param)


def _flac_bytes(writer_body, blocksize, bps, ch_code, rate=8000):
    """Container: fLaC magic + STREAMINFO (last block) + one frame
    whose subframe bits come from ``writer_body(w)``."""
    import struct

    si = struct.pack(">HH", blocksize, blocksize) + b"\x00" * 6
    packed = (rate << 44) | ((0) << 41) | ((bps - 1) << 36) | blocksize
    si += packed.to_bytes(8, "big") + b"\x00" * 16
    head = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si

    w = _FlacWriter()
    w.put(14, 0x3FFE)
    w.put(1, 0)
    w.put(1, 0)
    w.put(4, 6)  # blocksize: 8-bit value at end
    w.put(4, 4)  # sample rate code (table value; decoder skips)
    w.put(4, ch_code)
    w.put(3, 4)  # 16-bit samples
    w.put(1, 0)
    w.put(8, 0x00)  # UTF-8 frame number 0
    w.put(8, blocksize - 1)  # the 8-bit blocksize
    w.put(8, 0)  # header CRC-8 (consumed, not verified)
    writer_body(w)
    return head + w.bytes_()


class TestFlacDecoderProperties:
    @given(data=st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_never_raises_on_arbitrary_bytes(self, data):
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        for blob in (data, b"fLaC" + data):
            out = _flac_features_stdlib(blob)
            assert out is None or len(out) == 16

    @given(seed=st.integers(0, 2**31), n=st.integers(16, 64))
    @settings(max_examples=100, deadline=None)
    def test_verbatim_roundtrip_is_bit_exact(self, seed, n):
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        samples = [((seed * (i + 17) * 2654435761) % 65536) - 32768 for i in range(n)]
        blob = _flac_bytes(
            lambda w: w.subframe_verbatim(samples, 16), n, 16, ch_code=0
        )
        got = _flac_features_stdlib(blob)
        assert got == [s / 32768.0 for s in samples[:16]]

    @given(
        seed=st.integers(0, 2**31),
        order=st.integers(0, 4),
        param=st.integers(0, 10),
    )
    @settings(max_examples=100, deadline=None)
    def test_fixed_predictor_roundtrip_all_orders(self, seed, order, param):
        """FLAC is lossless: any fixed order with any rice parameter
        reconstructs the samples bit-exactly."""
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        n = 24
        # smooth-ish signal so residuals stay small at any order
        samples = [
            (seed % 1000) + 3 * i + ((seed >> 4) * (i + 1) % 7) for i in range(n)
        ]
        blob = _flac_bytes(
            lambda w: w.subframe_fixed(samples, order, 16, param=param),
            n, 16, ch_code=0,
        )
        got = _flac_features_stdlib(blob)
        assert got == [s / 32768.0 for s in samples[:16]]

    def test_lpc_escape_wasted_and_constant(self):
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        n = 20
        samples = [100 + 7 * i - (i * i) % 13 for i in range(n)]
        # LPC order 2, shift 2, coefs ~ 2x - x^2-ish
        blob = _flac_bytes(
            lambda w: w.subframe_lpc(samples, [7, -3], 2, prec=6, bps=16),
            n, 16, ch_code=0,
        )
        assert _flac_features_stdlib(blob) == [s / 32768.0 for s in samples[:16]]
        # escaped (verbatim-bits) residual partition
        blob = _flac_bytes(
            lambda w: w.subframe_fixed(samples, 1, 16, escape_raw=12),
            n, 16, ch_code=0,
        )
        assert _flac_features_stdlib(blob) == [s / 32768.0 for s in samples[:16]]
        # wasted bits: all samples share 2 trailing zero bits
        shifted = [s << 2 for s in samples]
        blob = _flac_bytes(
            lambda w: w.subframe_verbatim(shifted, 16, wasted=2),
            n, 16, ch_code=0,
        )
        assert _flac_features_stdlib(blob) == [s / 32768.0 for s in shifted[:16]]
        # constant subframe
        blob = _flac_bytes(
            lambda w: w.subframe_constant(-1234, 16), n, 16, ch_code=0
        )
        assert _flac_features_stdlib(blob) == [-1234 / 32768.0] * 16

    @given(seed=st.integers(0, 2**31), mode=st.sampled_from([8, 9, 10]))
    @settings(max_examples=60, deadline=None)
    def test_stereo_decorrelation_reconstructs_left(self, seed, mode):
        """left-side / right-side / mid-side frames must all hand back
        the true LEFT channel as channel 0."""
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        n = 20
        L = [((seed * (i + 5) * 40503) % 4096) - 2048 for i in range(n)]
        R = [((seed * (i + 11) * 69069) % 4096) - 2048 for i in range(n)]
        side = [left - r for left, r in zip(L, R)]

        def body(w):
            if mode == 8:  # left-side: left (bps), side (bps+1)
                w.subframe_verbatim(L, 16)
                w.subframe_verbatim(side, 17)
            elif mode == 9:  # right-side: side (bps+1), right (bps)
                w.subframe_verbatim(side, 17)
                w.subframe_verbatim(R, 16)
            else:  # mid-side: mid (bps), side (bps+1)
                mid = [(left + r) >> 1 for left, r in zip(L, R)]
                w.subframe_verbatim(mid, 16)
                w.subframe_verbatim(side, 17)

        blob = _flac_bytes(body, n, 16, ch_code=mode)
        got = _flac_features_stdlib(blob)
        assert got == [s / 32768.0 for s in L[:16]]

    def test_flac_feeds_the_audio_feature_encoder(self):
        from spark_binlog_spark.functions.multimodal import (
            _flac_features_stdlib,
            _real_audio_features,
        )

        samples = [300 * i - 2000 for i in range(20)]
        blob = _flac_bytes(
            lambda w: w.subframe_verbatim(samples, 16), 20, 16, ch_code=0
        )
        assert _real_audio_features(blob) == _flac_features_stdlib(blob) is not None


class TestBm25ScoreProperties:
    @staticmethod
    def _score(n, tf, T, df, dl):
        # the exact two-stage integer formula of text.bm25_term_score
        # (r12 overflow-safe form); returns the score plus every
        # intermediate product whose int64 bound the engines rely on
        idf4 = (n * 10000) // df
        dlr2_num = 900 * dl * n
        dlr2 = dlr2_num // T
        sat4_num = 22000000 * tf
        sat4 = sat4_num // (1000 * tf + 300 + dlr2)
        return (idf4 * sat4) // 10000, (n * 10000, dlr2_num, sat4_num, idf4 * sat4)

    @given(
        n=st.integers(1, 10_000_000_000),
        t_seed=st.integers(0, 10**15),
        df_seed=st.integers(0, 10**15),
        dl_seed=st.integers(1, 10**6),
        tf_seed=st.integers(0, 10**15),
        dtf=st.integers(1, 100),
    )
    @settings(max_examples=300, deadline=None)
    def test_monotone_in_tf_and_int64_safe(self, n, t_seed, df_seed, dl_seed, tf_seed, dtf):
        """Within the r12 envelope (to 10^10 docs of 10^6 words — the
        sf10 rung overflowed the old one-fraction form at 5*10^5 docs)
        the per-term score is non-negative, non-strictly MONOTONE in tf
        (the BM25 saturation property survives the integer floors),
        bounded by its tf→∞ asymptote, and EVERY intermediate product
        stays inside int64 — the invariant both engines' BIGINT
        arithmetic depends on.  Operands are CONSTRUCTED inside the
        corpus-consistency envelope (df <= n, tf < dl <= min(10^6,
        10^16/n), dl <= T) rather than filtered."""
        df = 1 + df_seed % n                      # dfreq counts docs
        dl = 1 + dl_seed % min(1_000_000, 10**16 // n)  # dlr2 envelope
        T = dl + t_seed % (10**15)                # doc can't exceed corpus
        tf1 = 1 + tf_seed % dl
        tf2 = min(dl, tf1 + dtf)
        assume(tf2 > tf1)                         # only when tf1 == dl
        s1, mids1 = self._score(n, tf1, T, df, dl)
        s2, mids2 = self._score(n, tf2, T, df, dl)
        assert 0 <= s1 <= s2
        for v in mids1 + mids2:
            assert v < 2**63
        # asymptote: sat4 -> 22000 as tf -> inf ⇒ score ≤ idf4*22000/10^4
        assert s2 <= ((n * 10000) // df * 22000) // 10000 + 1


class TestDecoderMutationFuzz:
    """Single-byte corruption of VALID media files — the adversarial
    form of the untrusted-bytes contract.  Arbitrary-bytes fuzz almost
    never survives the magic/header checks, so it exercises little of
    the entropy/inflate machinery; flipping one byte of a well-formed
    file lands adversarial values in every later decode stage.  The
    contract everywhere: a value or None, never a raise."""

    @staticmethod
    def _img(w, h, seed):
        rng = [(seed * (i + 19) * 2654435761) % 256 for i in range(w * h * 3)]
        return [
            [tuple(rng[(r * w + c) * 3 : (r * w + c) * 3 + 3]) for c in range(w)]
            for r in range(h)
        ]

    @given(pos=st.integers(0, 10_000), val=st.integers(0, 255), seed=st.integers(0, 2**31))
    @settings(max_examples=150, deadline=None)
    def test_png_mutation(self, pos, val, seed):
        from spark_binlog_spark.functions.multimodal import _png_pixels

        blob = bytearray(_png_encode(self._img(9, 7, seed), 2, [0, 1, 2, 3, 4]))
        blob[pos % len(blob)] = val
        out = _png_pixels(bytes(blob))
        assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)

    @given(pos=st.integers(0, 10_000), val=st.integers(0, 255), seed=st.integers(0, 2**31))
    @settings(max_examples=150, deadline=None)
    def test_gif_mutation(self, pos, val, seed):
        from spark_binlog_spark.functions.multimodal import _gif_pixels

        w, h = 9, 7
        idx = [((seed >> 3) + r * w + c) % 4 for r in range(h) for c in range(w)]
        palette = [(i * 60 % 256, i * 90 % 256, i * 30 % 256) for i in range(4)]
        blob = bytearray(_gif_encode(w, h, idx, palette))
        blob[pos % len(blob)] = val
        out = _gif_pixels(bytes(blob))
        assert out is None or (len(out) == 3 and out[0] > 0 and out[1] > 0)

    @given(pos=st.integers(0, 10_000), val=st.integers(0, 255), seed=st.integers(0, 2**31))
    @settings(max_examples=150, deadline=None)
    def test_flac_mutation(self, pos, val, seed):
        from spark_binlog_spark.functions.multimodal import _flac_features_stdlib

        n = 24
        samples = [((seed * (i + 7) * 2654435761) % 65536) - 32768 for i in range(n)]
        blob = bytearray(
            _flac_bytes(lambda w: w.subframe_verbatim(samples, 16), n, 16, ch_code=0)
        )
        blob[pos % len(blob)] = val
        out = _flac_features_stdlib(bytes(blob))
        assert out is None or len(out) == 16

    @given(pos=st.integers(0, 10_000), val=st.integers(0, 255), seed=st.integers(0, 2**31))
    @settings(max_examples=150, deadline=None)
    def test_wav_adpcm_mutation(self, pos, val, seed):
        from spark_binlog_spark.functions.multimodal import (
            _compressed_wav_features_stdlib,
        )

        data = bytes((seed * (i + 3) * 2654435761) % 256 for i in range(64))
        blob = bytearray(_wav_bytes(0x11, 1, 8000, 4, 32, data))  # IMA ADPCM
        blob[pos % len(blob)] = val
        out = _compressed_wav_features_stdlib(bytes(blob))
        assert out is None or len(out) == 16

"""Argument-contract and version-pin tests (ADVICE r13 + VERDICT r13
ask #8): contracts must hold under ``python -O`` (ValueError, never
assert), and the two Spark behaviors lm_positions' numpy-pack
bit-exactness rides on — ``split(str, '')`` emitting no trailing empty
element and ``ascii()`` returning the full Unicode code point — are
pinned so a Spark upgrade that changes either fails loudly instead of
silently skewing every lm_score consumer."""

import pytest
from pyspark.sql import functions as F

from spark_binlog_spark.functions import dedup, text


class TestArgumentContracts:
    def test_minhash_min_agree_one_rejected(self, spark):
        df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_agree"):
            dedup.minhash_candidate_pairs(df, min_agree=1)

    def test_minhash_pairs_from_wide_contract(self, spark):
        wide = spark.createDataFrame([(0, 1, 2)], "doc_id long, mh0 long, mh1 long")
        with pytest.raises(ValueError, match="min_agree"):
            dedup.minhash_pairs_from_wide(wide, n_hashes=2, min_agree=1)

    def test_simhash_bits_over_60_rejected(self, spark):
        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="bits"):
            dedup.simhash(df, bits=61)

    def test_compressibility_n_over_6_rejected(self, spark):
        df = spark.createDataFrame([(0, "abcdefgh")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n must be"):
            text.compressibility(df, n=7)

    def test_hamming_summary_band_contract(self, spark):
        sig = spark.createDataFrame([(0, 3)], "doc_id long, sg long")
        with pytest.raises(ValueError, match="max_hamming"):
            dedup.hamming_dedup_summary(
                sig, "doc_id", "sg", bits=16, bands=4, max_hamming=4
            )

    def test_mpeg_builder_index_contract(self):
        from spark_binlog_spark.functions.audio_containers import build_mpeg_stream

        with pytest.raises(ValueError, match="br_idx"):
            build_mpeg_stream(1, br_idx=15, sr_idx=0)


class TestLmPositionsVersionPins:
    """lm_positions (Catalyst split('')/ascii() pack) must agree with
    lm_tri_counts (numpy utf-32 pack) on a fixture that exercises BMP,
    astral-plane, and empty documents — the two packs share no code, so
    agreement pins both Spark behaviors the numpy side assumes."""

    FIXTURE = [
        (0, "hello"),
        (1, ""),                      # empty doc: zero trigrams
        (2, "ab"),                    # below trigram width
        (3, "café naïve"),  # BMP accents + combining mark
        (4, "\U0001f600\U0001f601\U0001f602x"),  # astral plane (surrogate trap)
        (5, "aaaa"),                  # repeated trigram within one doc
        (6, "hello"),                 # repeated trigram across docs
    ]

    def test_positions_agree_with_tri_counts(self, spark):
        df = spark.createDataFrame(self.FIXTURE, "doc_id long, text string")
        from_positions = {
            (r["tri"],): r["c"]
            for r in text.lm_positions(df)
            .groupBy("tri")
            .agg(F.count("*").cast("long").alias("c"))
            .collect()
        }
        from_numpy = {
            (r["tri"],): r["c_tri"] for r in text.lm_tri_counts(df).collect()
        }
        assert from_positions == from_numpy
        assert from_positions, "fixture produced no trigrams"

    def test_astral_code_points_survive_both_packs(self, spark):
        # one astral doc: its lead trigram must carry the REAL code
        # points (>0xFFFF), not surrogate halves
        df = spark.createDataFrame([(0, "\U0001f600\U0001f601\U0001f602")],
                                   "doc_id long, text string")
        tri = text.lm_positions(df).collect()
        assert len(tri) == 1
        expect = (0x1F600 << 42) + (0x1F601 << 21) + 0x1F602
        assert tri[0]["tri"] == expect
        numpy_tri = text.lm_tri_counts(df).collect()
        assert numpy_tri[0]["tri"] == expect

"""Perceptual image dedup batteries: image_dhash63 (decode -> luma ->
9x8 grid -> gradient hash) + the generic banded hamming pair join.
Uses the INDEPENDENT PNG writer from test_properties for the
cross-format invariance proof."""

from __future__ import annotations

import pytest

from spark_binlog_spark.functions.multimodal import (
    build_gray_bmp,
    image_dhash63,
)
from tests.test_properties import _png_encode


def _vals(base: int, shift: int = 0, invert: bool = False) -> list[int]:
    out = []
    for y in range(8):
        for x in range(9):
            core = (base * 37 + y * 29 + x * 13 + ((x * y + base) % 7) * 23) % 191
            out.append((191 - core) if invert else core + shift)
    return out


class TestImageDhash:
    def test_brightness_shift_invariance(self):
        a = image_dhash63(build_gray_bmp(9, 8, _vals(5)))
        b = image_dhash63(build_gray_bmp(9, 8, _vals(5, shift=9)))
        assert a is not None and a == b

    def test_cross_format_invariance_bmp_vs_png(self):
        """The same pixels as BMP and as grayscale PNG (independent
        writer) must hash identically — format-independent dedup."""
        vals = _vals(11)
        bmp_h = image_dhash63(build_gray_bmp(9, 8, vals))
        img = [[vals[y * 9 + x] for x in range(9)] for y in range(8)]
        png = _png_encode(img, color_type=0, filters=[0] * 8)
        assert image_dhash63(png) == bmp_h

    def test_local_edit_small_hamming_inversion_large(self):
        a = image_dhash63(build_gray_bmp(9, 8, _vals(3)))
        # a non-crossing edit (cell +50 stays between its neighbors)
        # is absorbed ENTIRELY — gradient hashing's robustness
        soft = list(_vals(3))
        soft[2 * 9 + 4] += 50
        assert image_dhash63(build_gray_bmp(9, 8, soft)) == a
        # a crossing edit (cell blown to 255) flips only the local bits
        edited = list(_vals(3))
        edited[2 * 9 + 4] = 255
        e = image_dhash63(build_gray_bmp(9, 8, edited))
        inv = image_dhash63(build_gray_bmp(9, 8, _vals(3, invert=True)))
        assert 1 <= bin(a ^ e).count("1") <= 4
        assert bin(a ^ inv).count("1") > 20

    def test_downsample_path_larger_image(self):
        """A 36x16 image whose 9x8 box means reproduce the base grid
        must hash like the grid itself (each cell replicated 4x2)."""
        vals = _vals(7)
        big = []
        for y in range(16):
            for x in range(36):
                big.append(vals[(y // 2) * 9 + (x // 4)])
        assert image_dhash63(build_gray_bmp(36, 16, big)) == image_dhash63(
            build_gray_bmp(9, 8, vals)
        )

    def test_undecodable_returns_none(self):
        assert image_dhash63(b"not an image") is None
        assert image_dhash63(b"") is None

    def test_hash_stays_below_2_63(self):
        # all-ascending rows set every used bit; bit 63 must stay clear
        asc = [x * 20 for y in range(8) for x in range(9)]
        h = image_dhash63(build_gray_bmp(9, 8, asc))
        assert 0 < h < (1 << 63)


class TestVectorizedBlockKernels:
    """The r14 vectorized fast paths of image_dhash_signatures /
    audio_envelope_signatures must be value-identical to the scalar
    decoders on homogeneous blocks, and reject anything else (so the
    scalar path claims it)."""

    def test_bmp_block_matches_scalar(self):
        import random

        from spark_binlog_spark.functions.multimodal import _bmp_dhash63_block

        rng = random.Random(5)
        blobs = [
            build_gray_bmp(9, 8, [rng.randrange(256) for _ in range(72)])
            for _ in range(40)
        ]
        ids, hs = _bmp_dhash63_block(list(range(40)), blobs)
        for i, h in zip(ids, hs):
            assert int(h) == image_dhash63(blobs[int(i)])

    def test_bmp_block_larger_image_with_padding(self):
        import random

        from spark_binlog_spark.functions.multimodal import _bmp_dhash63_block

        rng = random.Random(6)
        # 18x16: box cells span multiple pixels; stride 56 > 54 pads
        blobs = [
            build_gray_bmp(18, 16, [rng.randrange(256) for _ in range(288)])
            for _ in range(16)
        ]
        ids, hs = _bmp_dhash63_block(list(range(16)), blobs)
        for i, h in zip(ids, hs):
            assert int(h) == image_dhash63(blobs[int(i)])

    def test_bmp_block_rejects_non_bmp(self):
        from spark_binlog_spark.functions.multimodal import _bmp_dhash63_block

        png = _png_encode(
            [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (1, 1, 1)]], 2, [0, 0]
        )
        assert _bmp_dhash63_block([0, 1], [png, png]) is None

    def test_wav_block_matches_scalar(self):
        import random

        from spark_binlog_spark.functions.multimodal import (
            _wav_envelope63_block,
            audio_envelope_hash63,
            build_pcm16_wav,
        )

        rng = random.Random(7)
        blobs = [
            build_pcm16_wav(8000, [rng.randrange(-498, 499) for _ in range(256)])
            for _ in range(40)
        ]
        ids, hs = _wav_envelope63_block(list(range(40)), blobs)
        for i, h in zip(ids, hs):
            assert int(h) == audio_envelope_hash63(blobs[int(i)])

    def test_wav_block_rejects_short_and_garbage(self):
        from spark_binlog_spark.functions.multimodal import (
            _wav_envelope63_block,
            build_pcm16_wav,
        )

        short = build_pcm16_wav(8000, [1] * 32)  # < 64 windows
        assert _wav_envelope63_block([0], [short]) is None
        assert _wav_envelope63_block([0], [b"not a wav" * 10]) is None


# doc_ids covering all four variant classes (m = id % 4) at small and
# large bases — the ADVICE r14 pin: the vectorized fixture synths must
# stay byte-equal to the scalar reference-builder loops, or the media
# query INPUTS drift silently.
_SYNTH_IDS = list(range(16)) + [997, 4242] + list(range(123456, 123460))


class TestMediaSynthMatchesBuilder:
    def test_image_synth_vectorized_matches_builder(self):
        import numpy as np

        from spark_binlog_spark.queries_ext import image_synth_blobs

        got = image_synth_blobs(np.array(_SYNTH_IDS, dtype=np.int64))
        for doc_id, blob in zip(_SYNTH_IDS, got):
            base, m = doc_id // 4, doc_id % 4
            vals = []
            for y in range(8):
                for x in range(9):
                    core = (base * 37 + y * 29 + x * 13 + ((x * y + base) % 7) * 23) % 191
                    if m == 2:
                        v = 191 - core
                    else:
                        v = core + (9 if m == 3 else 0) + (
                            50 if (m == 1 and x == 4 and y == 2) else 0
                        )
                    vals.append(v)
            assert blob == build_gray_bmp(9, 8, vals), f"doc_id {doc_id}"

    def test_audio_synth_vectorized_matches_builder(self):
        import numpy as np

        from spark_binlog_spark.functions.multimodal import build_pcm16_wav
        from spark_binlog_spark.queries_ext import audio_synth_blobs

        got = audio_synth_blobs(np.array(_SYNTH_IDS, dtype=np.int64))
        for doc_id, blob in zip(_SYNTH_IDS, got):
            base, m = doc_id // 4, doc_id % 4
            samples = []
            for i in range(256):
                alt = ((base * 131 + i * 23 + ((i * i * 3 + base) % 13) * 41) % 997) - 498
                std = ((base * 131 + i * 17 + ((i * i + base) % 11) * 37) % 997) - 498
                s = alt if m == 2 else (std * 2 if m == 3 else std)
                if m == 1 and 80 <= i < 84:
                    s = 498
                samples.append(s)
            assert blob == build_pcm16_wav(8000, samples), f"doc_id {doc_id}"


class TestHammingPairJoin:
    def test_banded_join_finds_exactly_the_near_pairs(self, spark):
        from spark_binlog_spark.functions.dedup import hamming_near_dup_pairs

        rows = [
            (1, 0b1010101),          # base
            (2, 0b1010101),          # exact dup -> hamming 0
            (3, 0b1010100),          # hamming 1
            (4, (1 << 50) - 1),      # far away
        ]
        sig = spark.createDataFrame(rows, "media_id long, dhash long")
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_near_dup_pairs(sig, max_hamming=6).collect()
        }
        assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}

    def test_strategies_agree(self, spark):
        """The distinct-value plan and the direct id-level plan are two
        physical shapes of ONE operator — on a corpus mixing heavy
        signature collisions (the distinct plan's reason to exist),
        near misses, and unique values they must produce the identical
        pair relation, so the strategy choice is invisible to
        correctness."""
        import random

        from spark_binlog_spark.functions.dedup import hamming_near_dup_pairs

        rng = random.Random(99)
        rows = []
        # 12 collision clusters of 1-8 members + near-miss variants
        for cid in range(12):
            base = rng.getrandbits(62)
            for m in range(rng.randint(1, 8)):
                rows.append((len(rows), base))
            for _ in range(rng.randint(0, 3)):
                flipped = base
                for bit in rng.sample(range(63), rng.randint(1, 8)):
                    flipped ^= 1 << bit
                rows.append((len(rows), flipped))
        for _ in range(40):  # plus uniform noise
            rows.append((len(rows), rng.getrandbits(62)))
        sig = spark.createDataFrame(rows, "media_id long, dhash long")

        def run(strategy):
            return sorted(
                tuple(r)
                for r in hamming_near_dup_pairs(
                    sig, max_hamming=6, strategy=strategy
                ).collect()
            )

        a, b = run("distinct"), run("direct")
        assert a == b and len(a) > 10


class TestAudioEnvelopeHash:
    @staticmethod
    def _samples(base: int, gain: int = 1, blow_window: int | None = None):
        out = []
        for i in range(256):
            s = ((base * 131 + i * 17 + ((i * i + base) % 11) * 37) % 997) - 498
            s *= gain
            if blow_window is not None and blow_window * 4 <= i < blow_window * 4 + 4:
                s = 498
            out.append(s)
        return out

    def test_gain_invariance(self):
        from spark_binlog_spark.functions.multimodal import (
            audio_envelope_hash63,
            build_pcm16_wav,
        )

        a = audio_envelope_hash63(build_pcm16_wav(8000, self._samples(9)))
        g = audio_envelope_hash63(build_pcm16_wav(8000, self._samples(9, gain=2)))
        assert a is not None and a == g and 0 < a < (1 << 63)

    def test_local_blowout_small_hamming(self):
        from spark_binlog_spark.functions.multimodal import (
            audio_envelope_hash63,
            build_pcm16_wav,
        )

        a = audio_envelope_hash63(build_pcm16_wav(8000, self._samples(9)))
        e = audio_envelope_hash63(
            build_pcm16_wav(8000, self._samples(9, blow_window=20))
        )
        assert 1 <= bin(a ^ e).count("1") <= 3  # only bits 19/20 can move

    def test_short_or_garbage_returns_none(self):
        from spark_binlog_spark.functions.multimodal import (
            audio_envelope_hash63,
            build_pcm16_wav,
        )

        assert audio_envelope_hash63(b"junk") is None
        assert audio_envelope_hash63(build_pcm16_wav(8000, [1] * 10)) is None

    def test_cross_format_invariance_wav_vs_flac(self):
        """The same 256 PCM16 samples as WAV and as a FLAC verbatim
        frame (independent test writer) must fingerprint identically —
        lossless cross-format audio dedup."""
        from spark_binlog_spark.functions.multimodal import (
            audio_envelope_hash63,
            build_pcm16_wav,
        )
        from tests.test_properties import _FlacWriter, _flac_bytes  # noqa: F401

        samples = self._samples(13)

        def body(w):
            # subframe header: pad(1)=0, type(6)=0b000001 (verbatim),
            # wasted(1)=0; then blocksize x 16-bit raw samples
            w.put(1, 0)
            w.put(6, 1)
            w.put(1, 0)
            for v in samples:
                w.put(16, v & 0xFFFF)

        flac = _flac_bytes(body, blocksize=256, bps=16, ch_code=0)
        wav_h = audio_envelope_hash63(build_pcm16_wav(8000, samples))
        assert audio_envelope_hash63(flac) == wav_h and wav_h is not None

    def test_cross_format_invariance_multiframe_flac(self):
        """ADVICE r11: the WAV==FLAC invariance must hold for
        MULTI-FRAME FLACs too — the fingerprint decodes every frame
        (_flac_all_samples), not just the first.  512 PCM16 samples as
        one WAV vs two 256-sample verbatim FLAC frames (byte-aligned,
        16-bit footer CRC between frames, STREAMINFO total=512) must
        hash identically; the first-frame-only hash must NOT."""
        import struct

        from spark_binlog_spark.functions.multimodal import (
            _flac_all_samples,
            audio_envelope_hash63,
            build_pcm16_wav,
        )
        from tests.test_properties import _FlacWriter

        samples = self._samples(13) + self._samples(14)  # 512 samples
        bs, total = 256, len(samples)
        si = struct.pack(">HH", bs, bs) + b"\x00" * 6
        packed = (8000 << 44) | ((16 - 1) << 36) | total
        si += packed.to_bytes(8, "big") + b"\x00" * 16
        blob = bytearray(b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si)
        for fno in range(2):
            w = _FlacWriter()
            w.put(14, 0x3FFE)
            w.put(1, 0)
            w.put(1, 0)  # fixed-blocksize strategy: number = frame index
            w.put(4, 6)  # blocksize: 8-bit value at end
            w.put(4, 4)  # sample-rate code (decoder skips)
            w.put(4, 0)  # mono
            w.put(3, 4)  # 16-bit samples
            w.put(1, 0)
            w.put(8, fno)  # UTF-8 frame number
            w.put(8, bs - 1)
            w.put(8, 0)  # header CRC-8 (consumed, not verified)
            w.put(1, 0)
            w.put(6, 1)  # verbatim subframe
            w.put(1, 0)
            for v in samples[fno * bs : (fno + 1) * bs]:
                w.put(16, v & 0xFFFF)
            blob += w.bytes_()  # frames are byte-aligned
            blob += b"\x00\x00"  # footer CRC-16 (consumed, not verified)
        flac = bytes(blob)
        assert _flac_all_samples(flac) == samples
        wav_h = audio_envelope_hash63(build_pcm16_wav(8000, samples))
        assert audio_envelope_hash63(flac) == wav_h and wav_h is not None
        first_only = audio_envelope_hash63(build_pcm16_wav(8000, samples[:bs]))
        assert first_only != wav_h  # the r11 bug would have produced this

"""Batteries for the dependency-free perceptual-audio container layer
(spark_binlog_spark/functions/audio_containers.py): spec-correct
writers here build MPEG-audio streams and Ogg pages byte-by-byte from
the public specs (ISO 11172-3 header layout; RFC 3533 framing + CRC;
Vorbis I id header; RFC 7845 OpusHead), the parsers must recover
exactly what was written, property-style over the parameter space, and
mutation fuzz enforces the untrusted-input-never-raises contract —
the same test strategy the JPEG/FLAC decoders use."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_binlog_spark.functions.audio_containers import (
    ogg_crc,
    parse_mp3,
    parse_ogg,
    probe,
)

# ---------------------------------------------------------------- writers

_SAMPLE_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}
_BITRATES = {
    ("V1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("V1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("V1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("V2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("V2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("V2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}


def mp3_frame(vbits, layer, br_idx, sr_idx, padding=0, mono=True, protect=False):
    """One spec-correct MPEG audio frame (header + zero payload).
    Returns (bytes, samples, bitrate_kbps, sample_rate)."""
    lbits = 4 - layer
    h = (
        (0x7FF << 21)
        | (vbits << 19)
        | (lbits << 17)
        | ((0 if protect else 1) << 16)
        | (br_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | ((3 if mono else 0) << 6)
    )
    vgroup = "V1" if vbits == 3 else "V2"
    kbps = _BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _SAMPLE_RATES[vbits][sr_idx]
    if layer == 1:
        size = (12 * kbps * 1000 // rate + padding) * 4
        samples = 384
    elif layer == 2:
        size = 144 * kbps * 1000 // rate + padding
        samples = 1152
    else:
        per, samples = (144, 1152) if vgroup == "V1" else (72, 576)
        size = per * kbps * 1000 // rate + padding
    frame = bytearray(size)
    frame[0:4] = h.to_bytes(4, "big")
    return bytes(frame), samples, kbps, rate


def mp3_stream(configs, id3v2=0, id3v1=False, xing=None):
    """Concatenate frames; optional ID3v2 prefix (syncsafe size =
    ``id3v2`` payload bytes), ID3v1 tail, and a Xing block planted in
    the first frame (xing = claimed frame count)."""
    out = bytearray()
    if id3v2:
        ss = bytes(
            [(id3v2 >> 21) & 0x7F, (id3v2 >> 14) & 0x7F, (id3v2 >> 7) & 0x7F, id3v2 & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + b"\xab" * id3v2
    frames = []
    for cfg in configs:
        fb, samples, kbps, rate = mp3_frame(**cfg)
        frames.append((bytearray(fb), samples, kbps, rate, cfg))
    if xing is not None:
        fb = frames[0][0]
        mono = frames[0][4].get("mono", True)
        vbits = frames[0][4]["vbits"]
        side = (17 if mono else 32) if vbits == 3 else (9 if mono else 17)
        xoff = 4 + side  # protect=False in these builders: no CRC bytes
        fb[xoff : xoff + 4] = b"Xing"
        fb[xoff + 4 : xoff + 8] = (1).to_bytes(4, "big")  # frames flag
        fb[xoff + 8 : xoff + 12] = xing.to_bytes(4, "big")
    for fb, *_ in frames:
        out += fb
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def ogg_page(serial, seq, granule, packets, continued=False, first=False, last=False):
    """One RFC 3533 page: packets -> lacing values, CRC computed with
    the field zeroed (exactly how readers verify it)."""
    segs = bytearray()
    body = bytearray()
    for pkt in packets:
        body += pkt
        ln = len(pkt)
        while ln >= 255:
            segs.append(255)
            ln -= 255
        segs.append(ln)  # includes the 0 lacing for len%255==0
    htype = (1 if continued else 0) | (2 if first else 0) | (4 if last else 0)
    hdr = bytearray(b"OggS\x00")
    hdr.append(htype)
    hdr += granule.to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"  # crc placeholder
    hdr.append(len(segs))
    hdr += segs
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def vorbis_id_packet(channels, rate):
    pkt = bytearray(b"\x01vorbis")
    pkt += (0).to_bytes(4, "little")  # version
    pkt.append(channels)
    pkt += rate.to_bytes(4, "little")
    pkt += (0).to_bytes(4, "little") * 3  # bitrates
    pkt.append((8 << 4) | 8)  # blocksizes
    pkt.append(1)  # framing
    return bytes(pkt)


def opus_head_packet(channels, pre_skip):
    pkt = bytearray(b"OpusHead")
    pkt.append(1)  # version
    pkt.append(channels)
    pkt += pre_skip.to_bytes(2, "little")
    pkt += (48000).to_bytes(4, "little")
    pkt += (0).to_bytes(2, "little")  # output gain
    pkt.append(0)  # mapping family
    return bytes(pkt)


def ogg_stream(codec="vorbis", channels=2, rate=44100, pre_skip=312, data_pages=3,
               packets_per_page=2, samples_per_packet=512):
    first_pkt = (
        vorbis_id_packet(channels, rate)
        if codec == "vorbis"
        else opus_head_packet(channels, pre_skip)
    )
    pages = [ogg_page(7, 0, 0, [first_pkt], first=True)]
    granule = 0
    total_packets = 1
    for p in range(data_pages):
        pkts = [bytes([p, i] * 20) for i in range(packets_per_page)]
        granule += samples_per_packet * len(pkts)
        pages.append(
            ogg_page(7, p + 1, granule, pkts, last=(p == data_pages - 1))
        )
        total_packets += len(pkts)
    return b"".join(pages), granule, total_packets


# ---------------------------------------------------------------- MP3 tests


class TestMp3Parse:
    def test_cbr_stream_exact_recovery(self):
        cfg = dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)  # 128k/44100 L3
        data = mp3_stream([cfg] * 10)
        m = parse_mp3(data)
        assert m["codec"] == "mpeg1-layer3"
        assert (m["sample_rate"], m["channels"], m["n_frames"]) == (44100, 1, 10)
        assert m["bitrate_kbps"] == 128 and not m["vbr"]
        assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
        # frame index: contiguous, sizes = 144*128000//44100
        sz = 144 * 128000 // 44100
        assert m["frames"] == [(i * sz, sz, 1152) for i in range(10)]

    def test_vbr_varies_bitrate_and_flags(self):
        cfgs = [dict(vbits=3, layer=3, br_idx=i % 14 + 1, sr_idx=1, mono=False) for i in range(8)]
        m = parse_mp3(mp3_stream(cfgs, xing=8))
        assert m["vbr"] and m["vbr_header_frames"] == 8
        assert m["n_frames"] == 8 and m["channels"] == 2

    def test_id3v2_and_id3v1_are_skipped(self):
        cfg = dict(vbits=3, layer=3, br_idx=5, sr_idx=2, mono=True)
        m = parse_mp3(mp3_stream([cfg] * 3, id3v2=200, id3v1=True))
        assert m["n_frames"] == 3 and m["id3v2_bytes"] == 210

    def test_resync_through_garbage_prefix(self):
        cfg = dict(vbits=3, layer=2, br_idx=4, sr_idx=0, mono=True)
        data = b"\x00garbage bytes\xff\x00" + mp3_stream([cfg] * 4)
        m = parse_mp3(data)
        assert m["n_frames"] == 4 and m["codec"] == "mpeg1-layer2"

    def test_truncated_tail_keeps_valid_prefix(self):
        cfg = dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)
        data = mp3_stream([cfg] * 5)
        m = parse_mp3(data[:-40])  # cut into the last frame
        assert m["n_frames"] == 4

    def test_header_lock_stops_on_parameter_change(self):
        a = dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)
        b = dict(vbits=3, layer=3, br_idx=9, sr_idx=1, mono=True)  # rate change
        m = parse_mp3(mp3_stream([a, a]) + mp3_stream([b, b]))
        assert m["n_frames"] == 2

    @settings(max_examples=60, deadline=None)
    @given(
        vbits=st.sampled_from([3, 2, 0]),
        layer=st.sampled_from([1, 2, 3]),
        br_idx=st.integers(1, 14),
        sr_idx=st.integers(0, 2),
        mono=st.booleans(),
        n=st.integers(1, 12),
        pad=st.booleans(),
    )
    def test_roundtrip_property(self, vbits, layer, br_idx, sr_idx, mono, n, pad):
        cfgs = [
            dict(vbits=vbits, layer=layer, br_idx=br_idx, sr_idx=sr_idx,
                 mono=mono, padding=int(pad and i % 2 == 0))
            for i in range(n)
        ]
        expect_samples = sum(mp3_frame(**c)[1] for c in cfgs)
        rate = _SAMPLE_RATES[vbits][sr_idx]
        m = parse_mp3(mp3_stream(cfgs))
        assert m["n_frames"] == n
        assert m["sample_rate"] == rate
        assert m["channels"] == (1 if mono else 2)
        assert m["duration_ms"] == expect_samples * 1000 // rate

    @settings(max_examples=120, deadline=None)
    @given(pos=st.integers(0, 2000), val=st.integers(0, 255))
    def test_mutation_fuzz_never_raises(self, pos, val):
        cfg = dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)
        data = bytearray(mp3_stream([cfg] * 5, id3v2=50, xing=5))
        data[pos % len(data)] = val
        m = parse_mp3(bytes(data))  # value or None, never an exception
        assert m is None or m["n_frames"] >= 0


# ---------------------------------------------------------------- Ogg tests


class TestOggParse:
    def test_vorbis_stream_exact_recovery(self):
        data, granule, packets = ogg_stream(codec="vorbis", channels=2, rate=32000)
        m = parse_ogg(data)
        assert (m["codec"], m["channels"], m["sample_rate"]) == ("vorbis", 2, 32000)
        assert m["n_pages"] == 4 and m["n_packets"] == packets
        assert m["crc_ok"] and m["duration_ms"] == granule * 1000 // 32000

    def test_opus_duration_subtracts_preskip(self):
        data, granule, _ = ogg_stream(codec="opus", channels=1, pre_skip=312)
        m = parse_ogg(data)
        assert m["codec"] == "opus" and m["sample_rate"] == 48000
        assert m["duration_ms"] == (granule - 312) * 1000 // 48000

    def test_crc_corruption_detected_not_fatal(self):
        data, _, _ = ogg_stream()
        bad = bytearray(data)
        bad[-1] ^= 0xFF  # corrupt the last page's body
        m = parse_ogg(bytes(bad))
        assert m is not None and not m["crc_ok"]

    def test_long_packet_lacing_255_boundary(self):
        # packets of exactly 255 and 510 bytes need terminating 0 lacing
        pkts = [b"a" * 255, b"b" * 510, b"c" * 10]
        page = ogg_page(9, 0, 100, pkts, first=True)
        m = parse_ogg(page)
        assert m["n_packets"] == 3 and m["crc_ok"]

    def test_truncated_page_keeps_prefix(self):
        data, _, _ = ogg_stream(data_pages=3)
        m = parse_ogg(data[:-20])
        assert m is not None and m["n_pages"] == 3  # last page dropped

    @settings(max_examples=120, deadline=None)
    @given(pos=st.integers(0, 4000), val=st.integers(0, 255))
    def test_mutation_fuzz_never_raises(self, pos, val):
        data = bytearray(ogg_stream()[0])
        data[pos % len(data)] = val
        m = parse_ogg(bytes(data))
        assert m is None or m["n_pages"] >= 0


# ---------------------------------------------------------------- dispatch + Spark


class TestProbeAndSparkOps:
    def test_probe_dispatch(self):
        ogg, _, _ = ogg_stream()
        mp3 = mp3_stream([dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)] * 2)
        assert probe(ogg)["format"] == "ogg"
        assert probe(mp3)["format"] == "mp3"
        assert probe(b"not audio at all") is None

    def test_container_probe_and_frame_index(self, spark):
        from spark_binlog_spark.functions.audio_containers import (
            audio_container_probe,
            audio_frame_index,
        )

        mp3 = mp3_stream([dict(vbits=3, layer=3, br_idx=9, sr_idx=0, mono=True)] * 6)
        ogg, granule, _ = ogg_stream(codec="vorbis", channels=1, rate=16000)
        df = spark.createDataFrame(
            [(1, bytearray(mp3)), (2, bytearray(ogg)), (3, bytearray(b"junk"))],
            "media_id long, content binary",
        )
        got = {r["media_id"]: r.asDict() for r in audio_container_probe(df).collect()}
        assert got[1]["format"] == "mp3" and got[1]["n_frames"] == 6
        assert got[1]["duration_ms"] == 6 * 1152 * 1000 // 44100
        assert got[2]["format"] == "ogg" and got[2]["codec"] == "vorbis"
        assert got[2]["duration_ms"] == granule * 1000 // 16000
        assert got[3]["format"] == "unknown"

        frames = audio_frame_index(df).collect()
        assert {r["media_id"] for r in frames} == {1}
        sz = 144 * 128000 // 44100
        assert sorted((r["frame_idx"], r["frame_offset"], r["frame_len"]) for r in frames) == [
            (i, i * sz, sz) for i in range(6)
        ]

    def test_multimodal_probe_header_covers_audio_containers(self):
        from spark_binlog_spark.functions.multimodal import _probe_header

        mp3 = mp3_stream([dict(vbits=3, layer=3, br_idx=9, sr_idx=1, mono=False)] * 2)
        ogg, _, _ = ogg_stream(codec="vorbis", channels=2, rate=44100)
        assert _probe_header(mp3)[0] == "mp3"
        assert _probe_header(mp3)[3:] == (48000, 2)
        assert _probe_header(ogg)[0] == "ogg"
        assert _probe_header(ogg)[3:] == (44100, 2)

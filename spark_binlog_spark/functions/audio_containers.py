"""Dependency-free container/frame-level parsing for perceptual audio
(MPEG audio / Ogg) — the metadata + segmentation layer a curation
pipeline filters and repartitions on BEFORE paying for PCM decode.

Everything here is REAL byte parsing from public specifications —
ISO/IEC 11172-3 (MPEG-1 audio frame header) plus the published MPEG-2 /
MPEG-2.5 extensions, the Xing/Info VBR header layout, ID3v2 syncsafe
tag sizes, RFC 3533 (Ogg framing, including the page CRC-32 with
polynomial 0x04c11db7), the Vorbis I specification (identification
header) and RFC 7845 (Opus-in-Ogg: OpusHead) — so, unlike the
import-gated PCM feature encoders, it runs real in ANY environment.
What stays gated is only the perceptual transform itself (Huffman +
IMDCT + synthesis filterbank), behind PIL/soundfile in
multimodal.extract_features.

Pipeline role (why frame-level parse is the 100 TB operator): media
curation filters on duration / sample-rate / channel-count and
repartitions decode work by frames — all derivable from headers at
~full scan speed, no entropy decode.  The reference treats media as
opaque rows end-to-end (binlog rows are byte payloads; see
mysql-binlog/.../RawBinlogEvent handling); the typed-probe layer is
part of this repo's training-data surface on top of that model.

Scale shape: all parsers are pure byte functions dispatched from
Arrow-batched ``mapInPandas`` (same plumbing as multimodal.py's image
decoders) — per-blob work is linear in blob size, no driver
involvement, no Python row-UDFs in any JVM-side plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- MPEG audio

# bitrate tables in kbps, indexed 1..14 (0 = free-format, unsupported
# here; 15 = invalid) — ISO 11172-3 table B.1 + MPEG-2 annex
_BITRATE_KBPS = {
    # (version_group, layer): [idx 1..14]
    ("V1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("V1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("V1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("V2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("V2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("V2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {
    # version bits 00=MPEG2.5, 10=MPEG2, 11=MPEG1; index bits 0..2
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def _syncsafe(b: bytes) -> int:
    """ID3v2 syncsafe integer: 4 bytes, 7 bits each."""
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _mpeg_header(h: int) -> dict | None:
    """Decode a 32-bit MPEG audio frame header; None if invalid.

    Returns dict with version ('1'/'2'/'2.5'), layer (1/2/3),
    sample_rate, bitrate_kbps, channels, padding, frame_size (bytes),
    samples (PCM samples this frame carries), side_info (bytes of
    Layer III side information, for the Xing offset)."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3
    if vbits == 1:  # reserved
        return None
    lbits = (h >> 17) & 3
    if lbits == 0:  # reserved
        return None
    layer = 4 - lbits  # 01->III(3), 10->II(2), 11->I(1)
    crc_present = ((h >> 16) & 1) == 0
    br_idx = (h >> 12) & 0xF
    if br_idx in (0, 15):  # free-format / invalid
        return None
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        return None
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    vgroup = "V1" if vbits == 3 else "V2"
    version = {3: "1", 2: "2", 0: "2.5"}[vbits]
    bitrate = _BITRATE_KBPS[(vgroup, layer)][br_idx - 1]
    rate = _SAMPLE_RATES[vbits][sr_idx]
    if layer == 1:
        samples = 384
        frame_size = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        samples = 1152
        frame_size = 144 * bitrate * 1000 // rate + padding
    else:  # Layer III
        samples = 1152 if vgroup == "V1" else 576
        per = 144 if vgroup == "V1" else 72
        frame_size = per * bitrate * 1000 // rate + padding
    if vgroup == "V1":
        side_info = 17 if channels == 1 else 32
    else:
        side_info = 9 if channels == 1 else 17
    return {
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "bitrate_kbps": bitrate,
        "channels": channels,
        "padding": padding,
        "crc_present": crc_present,
        "frame_size": frame_size,
        "samples": samples,
        "side_info": side_info,
    }


def parse_mp3(data: bytes) -> dict | None:
    """Frame-walk an MPEG audio stream (Layers I-III, MPEG-1/2/2.5).

    Skips a leading ID3v2 tag (syncsafe size, optional footer) and a
    trailing ID3v1 block, resyncs to the first valid header, then walks
    frame-to-frame by computed frame sizes.  After the first frame,
    every subsequent header must agree on version/layer/sample-rate/
    channel mode (bitrate may vary — VBR) or the walk stops: that is
    the false-sync guard the resync byte-scan needs.  The first frame's
    Xing/Info block (after side info, and the 2 CRC bytes when
    protection is on) marks VBR and carries the encoder frame count.

    Returns None when no valid frame exists; truncated tails yield the
    valid prefix (untrusted input never raises — same contract as the
    image decoders, multimodal.py)."""
    n = len(data)
    i = 0
    id3v2_len = 0
    if data[:3] == b"ID3" and n >= 10:
        id3v2_len = 10 + _syncsafe(data[6:10]) + (10 if data[5] & 0x10 else 0)
        i = min(id3v2_len, n)
    end = n - 128 if data[-128:][:3] == b"TAG" and n >= 128 else n
    frames: list[tuple[int, int, int, int]] = []  # (offset, size, samples, kbps)
    ref = None  # (version, layer, sample_rate, channels) lock after frame 0
    meta = None
    vbr_frames = None
    vbr = False
    while i + 4 <= end:
        hdr = _mpeg_header(int.from_bytes(data[i : i + 4], "big"))
        if hdr is None or hdr["frame_size"] < 4:
            if not frames:
                i += 1  # resync only before the first valid frame
                continue
            break
        if ref is None:
            ref = (hdr["version"], hdr["layer"], hdr["sample_rate"], hdr["channels"])
            meta = hdr
            # Xing/Info VBR header: after header (+2 CRC) + side info
            xoff = i + 4 + (2 if hdr["crc_present"] else 0) + hdr["side_info"]
            magic = data[xoff : xoff + 4]
            if magic in (b"Xing", b"Info"):
                vbr = magic == b"Xing"
                flags = int.from_bytes(data[xoff + 4 : xoff + 8], "big")
                if flags & 1 and xoff + 12 <= end:
                    vbr_frames = int.from_bytes(data[xoff + 8 : xoff + 12], "big")
        elif (hdr["version"], hdr["layer"], hdr["sample_rate"], hdr["channels"]) != ref:
            break
        if i + hdr["frame_size"] > end:
            break  # truncated final frame: keep the valid prefix
        frames.append((i, hdr["frame_size"], hdr["samples"], hdr["bitrate_kbps"]))
        i += hdr["frame_size"]
    if not frames:
        return None
    total_samples = sum(s for _, _, s, _ in frames)
    distinct_rates = {k for _, _, _, k in frames}
    return {
        "format": "mp3",
        "codec": f"mpeg{meta['version']}-layer{meta['layer']}",
        "sample_rate": meta["sample_rate"],
        "channels": meta["channels"],
        "n_frames": len(frames),
        "duration_ms": total_samples * 1000 // meta["sample_rate"],
        "bitrate_kbps": sum(k for _, _, _, k in frames) // len(frames),
        "vbr": vbr or len(distinct_rates) > 1,
        "vbr_header_frames": vbr_frames,
        "id3v2_bytes": id3v2_len,
        "frames": [(off, sz, sm) for off, sz, sm, _ in frames],
    }


def build_mpeg_stream(
    n_frames: int, br_idx: int, sr_idx: int, mono: bool = True,
    vbits: int = 3, layer: int = 3,
) -> bytes:
    """Deterministic header-true MPEG-audio fixture stream (zero
    payload) — synthetic-media generation for pipeline tests at scale
    and the blob source for the q_audio_probe oracle.  The test suite
    verifies parse_mp3 against its own INDEPENDENT writer
    (tests/test_audio_containers.py), not this one."""
    if not (1 <= br_idx <= 14 and 0 <= sr_idx <= 2):
        raise ValueError(
            f"MPEG header indices out of range (br_idx={br_idx}, sr_idx={sr_idx})"
        )
    lbits = 4 - layer
    h = (
        (0x7FF << 21)
        | (vbits << 19)
        | (lbits << 17)
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | ((3 if mono else 0) << 6)
    )
    vgroup = "V1" if vbits == 3 else "V2"
    kbps = _BITRATE_KBPS[(vgroup, layer)][br_idx - 1]
    rate = _SAMPLE_RATES[vbits][sr_idx]
    if layer == 1:
        size = (12 * kbps * 1000 // rate) * 4
    else:
        per = 144 if layer == 2 or vgroup == "V1" else 72
        size = per * kbps * 1000 // rate
    frame = bytearray(size)
    frame[0:4] = h.to_bytes(4, "big")
    return bytes(frame) * n_frames


# ---------------------------------------------------------------- Ogg

# RFC 3533 page CRC: polynomial 0x04c11db7, init 0, no reflection
_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def parse_ogg(data: bytes) -> dict | None:
    """Walk Ogg pages (RFC 3533): capture pattern, segment-table packet
    lacing, per-page CRC verification (field zeroed during the check),
    granule positions; identify the codec from the first packet —
    Vorbis identification header (channels, rate) or OpusHead
    (channels, 48 kHz granule clock, pre-skip).  Duration comes from
    the last non-(-1) granule position: PCM samples for Vorbis, a
    48 kHz clock minus pre-skip for Opus.

    Returns None when the first page is absent/invalid; later mangled
    pages end the walk with the valid prefix (untrusted input never
    raises)."""
    n = len(data)
    i = 0
    pages = 0
    packets = 0
    crc_ok = True
    last_granule = None
    codec = "unknown"
    rate = None
    channels = None
    pre_skip = 0
    while i + 27 <= n and data[i : i + 4] == b"OggS" and data[i + 4] == 0:
        nseg = data[i + 26]
        if i + 27 + nseg > n:
            break
        segs = data[i + 27 : i + 27 + nseg]
        body_len = sum(segs)
        total = 27 + nseg + body_len
        if i + total > n:
            break
        crc_field = int.from_bytes(data[i + 22 : i + 26], "little")
        page = bytearray(data[i : i + total])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_field:
            crc_ok = False
        packets += sum(1 for v in segs if v < 255)
        granule = int.from_bytes(data[i + 6 : i + 14], "little", signed=True)
        if granule >= 0:  # -1 = "no packet finishes on this page"
            last_granule = granule
        if pages == 0:
            # first packet of the first page carries the codec id header
            first_len = 0
            for v in segs:
                first_len += v
                if v < 255:
                    break
            pkt = data[i + 27 + nseg : i + 27 + nseg + first_len]
            if pkt[:7] == b"\x01vorbis" and len(pkt) >= 16:
                codec = "vorbis"
                channels = pkt[11]
                rate = int.from_bytes(pkt[12:16], "little")
            elif pkt[:8] == b"OpusHead" and len(pkt) >= 12:
                codec = "opus"
                channels = pkt[9]
                pre_skip = int.from_bytes(pkt[10:12], "little")
                rate = 48000  # the Opus granule clock (RFC 7845 §4)
        pages += 1
        i += total
    if pages == 0:
        return None
    duration_ms = None
    if last_granule is not None and rate:
        samples = last_granule - (pre_skip if codec == "opus" else 0)
        duration_ms = max(samples, 0) * 1000 // rate
    return {
        "format": "ogg",
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "n_pages": pages,
        "n_packets": packets,
        "duration_ms": duration_ms,
        "crc_ok": crc_ok,
    }


# ---------------------------------------------------------------- Spark ops

PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("codec", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("bitrate_kbps", IntegerType()),
    ]
)

FRAME_INDEX_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def probe(data: bytes) -> dict | None:
    """Container dispatch: Ogg by capture pattern, else MPEG audio."""
    if data[:4] == b"OggS":
        return parse_ogg(data)
    return parse_mp3(data)


def audio_container_probe(df: DataFrame) -> DataFrame:
    """Arrow-batched container probe over (media_id, content) — the
    filter stage (duration/rate/channels) a media pipeline runs before
    full decode.  Unparseable blobs yield format='unknown' rows rather
    than failing the job (untrusted-input contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                m = probe(bytes(content)) or {}
                rows.append(
                    {
                        "media_id": int(media_id),
                        "format": m.get("format", "unknown"),
                        "codec": m.get("codec"),
                        "sample_rate": m.get("sample_rate"),
                        "channels": m.get("channels"),
                        "n_frames": m.get("n_frames", m.get("n_packets")),
                        "duration_ms": m.get("duration_ms"),
                        "bitrate_kbps": m.get("bitrate_kbps"),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(run, PROBE_SCHEMA)


def audio_frame_index(df: DataFrame) -> DataFrame:
    """Per-frame segmentation rows for MPEG audio blobs — the REAL
    decode-work unit (replacing fixed-byte chunking for formats whose
    frame boundaries are knowable from headers).  A downstream decode
    stage repartitions on these rows so one long file cannot skew a
    task (same role as multimodal.py's decode-skew balancing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                m = parse_mp3(bytes(content))
                if not m:
                    continue
                for idx, (off, sz, samples) in enumerate(m["frames"]):
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "frame_offset": off,
                            "frame_len": sz,
                            "n_samples": samples,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_INDEX_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(run, FRAME_INDEX_SCHEMA)

"""Multimodal (binary) column handling.

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct.  The Spark-side plumbing — schema, batch shape, partitioning,
Arrow transfer — is real and tested.  Decode is REAL and
dependency-free for: 24-bit BMP and binary PNM images (struct-parsed
per the public specs), PNG (chunk walk + stdlib ``zlib`` inflate +
None/Sub/Up/Average/Paeth scanline unfiltering), GIF (variable-width
LZW + interlace reorder), baseline JPEG (T.81 sequential: Huffman
entropy decode, dequant, numpy inverse DCT, 4:2:0/4:2:2 upsampling,
restart markers), PCM WAV audio (stdlib ``wave``), the compressed
WAV families (G.711 mu-law/A-law per the public tables, IMA/DVI
ADPCM per the public step algorithm), and FLAC (frame-header parse,
constant/verbatim/fixed/LPC subframes, rice-coded residuals, stereo
decorrelation — lossless integer math, bit-exact) — deterministic and
pinned by tests in this container (integer-luma 4×4 box-average
features for images; JPEG property-tested against a spec-correct
encoder with bounded rounding tolerance; G.711 pinned to the spec
anchor values; FLAC round-tripped bit-exactly against a spec-correct
writer; PNG covers depths 8 AND 16 plus Adam7 interlace since
round 8; JPEG covers baseline AND progressive — spectral
selection, successive approximation, EOB runs — since round 10).
For perceptual audio (OGG/MP3) the CONTAINER layer decodes real and
dependency-free since round 11 (audio_containers.py: MPEG frame walk
with ID3/Xing handling, Ogg page walk with RFC 3533 CRC and
Vorbis/Opus id headers — duration, rate, channels, frame segmentation,
i.e. everything a curation pipeline filters and repartitions on); only
the perceptual PCM transform itself (Huffman + IMDCT + synthesis)
still runs behind executor-side import-tries (PIL / soundfile —
neither ships here): with the libs installed
``extract_features(fake=False)`` produces real features from the
identical plan; without them those formats raise the clearly-marked
NotImplementedError stub, and ``fake=True`` produces a deterministic
fake derived from the bytes so pipelines are testable end-to-end.

Scale notes: media blobs ride in their own column so parquet column
pruning skips them unless a stage touches them; ``mapInPandas`` streams
Arrow batches (no per-row Python overhead) and never materializes a
whole partition; frame outputs are exploded rows, so downstream
repartitioning can rebalance decode skew (one 4 GB video vs many 10 KB
images).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("byte_len", LongType()),
        StructField("content_key", StringType()),  # md5 of bytes
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_key", StringType()),
    ]
)

FRAME_SIZE = 1024  # bytes per synthetic "frame"


def as_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an opaque payload column into the typed media schema.

    For tests we derive binary content from the documents table
    (``encode(text)``); in production this is the raw blob column.
    """
    content = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(content).cast("long").alias("byte_len"),
        F.md5(content).alias("content_key"),
    )


def frame_plan(df: DataFrame) -> DataFrame:
    """Pure-DataFrame frame *planning* (no decode): one row per FRAME_SIZE
    slice of the blob.  This is the shuffle-able unit of decode work."""
    n_frames = F.floor((F.col("byte_len") - 1) / FRAME_SIZE).cast("int") + 1
    # guard: for an empty blob n_frames=0 and sequence(0, -1) would emit a
    # DESCENDING [0, -1] — emit no frames instead
    idx = F.explode(
        F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("frame_idx")
    out = df.select(F.col("media_id"), F.col("byte_len"), idx)
    frame_offset = (F.col("frame_idx").cast("long") * FRAME_SIZE).alias("frame_offset")
    frame_len = F.least(F.col("byte_len") - F.col("frame_idx") * FRAME_SIZE, F.lit(FRAME_SIZE)).alias(
        "frame_len"
    )
    return out.select("media_id", "frame_idx", frame_offset, frame_len)


def balance_decode_work(plan: DataFrame, num_partitions: int) -> DataFrame:
    """Spread frame-decode work evenly across tasks.

    Partitioning frames by media id puts ALL frames of a 4 GB video in
    one task while 10 KB images finish instantly — the classic media
    skew.  Range-partitioning on (media_id, frame_idx) instead slices
    each big blob's frames across consecutive partitions (range bounds
    come from sampling, so partition sizes track the actual frame
    distribution), giving every decode task ~equal frame counts while
    keeping a blob's frames mostly adjacent (sequential reads).
    """
    return plan.repartitionByRange(num_partitions, F.col("media_id"), F.col("frame_idx"))


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feature_norm4", LongType()),
    ]
)


def _real_image_features(content: bytes) -> list[float] | None:
    """PIL-backed encoder (import-try, executor-side): grayscale 4×4
    thumbnail -> FEATURE_DIM pixel intensities in [-1, 1).  Returns None
    when PIL is not importable so the caller can fall back."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    img = Image.open(io.BytesIO(content)).convert("L").resize((4, 4))
    return [(p - 128) / 128.0 for p in img.getdata()][:FEATURE_DIM]


def _bmp_pixels(data: bytes):
    """Dependency-free 24-bit uncompressed BMP decode (the format's
    public layout: 'BM' file header with the pixel-array offset at
    byte 10; BITMAPINFOHEADER with width/height/bpp/compression at
    18/22/28/30; rows 4-byte padded, bottom-up unless height < 0,
    pixels stored BGR).  Returns (width, height, row-major RGB tuples)
    or None for anything that isn't plain 24-bit."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        return None
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", data, 18)
    bpp, comp = struct.unpack_from("<HI", data, 28)
    if bpp != 24 or comp != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(data) < pix_off + stride * height:
        return None
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        base = pix_off + src * stride
        rows.append(
            [
                (data[base + 3 * c + 2], data[base + 3 * c + 1], data[base + 3 * c])
                for c in range(width)
            ]
        )
    return width, height, rows


def _png_pixels(data: bytes):
    """Dependency-free PNG decode per the public spec (RFC 2083 /
    ISO 15948): chunk walk (IHDR / PLTE / IDAT+ / IEND), stdlib
    ``zlib`` inflate of the concatenated IDAT stream, then scanline
    unfiltering (None/Sub/Up/Average/Paeth).  Supports bit depths 8
    AND 16 (16-bit samples reduce to their high byte — the spec's own
    8-bit approximation) in color types 0 (gray), 2 (RGB), 3 (palette,
    depth 8 per spec), 4 (gray+alpha) and 6 (RGBA), BOTH interlace
    methods (0 = none, 1 = Adam7: each of the 7 passes is an
    independently filtered sub-image scattered back on its
    (x0 + i·dx, y0 + j·dy) lattice) — alpha is dropped (features are
    luma).  Anything else (sub-byte depths) returns None so the PIL
    import-try can still claim it.  Returns (width, height, row-major
    RGB tuples) or None."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, n = 8, len(data)
    ihdr = None
    palette: list[tuple[int, int, int]] = []
    idat = bytearray()
    while i + 8 <= n:
        (clen,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if ctype == b"IHDR":
            if clen < 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"PLTE":
            palette = [
                (body[j], body[j + 1], body[j + 2]) for j in range(0, len(body) - 2, 3)
            ]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + body + crc
    if ihdr is None or not idat:
        return None
    width, height, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if (
        channels is None
        or depth not in (8, 16)
        or (color == 3 and depth != 8)  # palette is 8-bit-indexed per spec
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
        or width <= 0
        or height <= 0
        or (color == 3 and not palette)
    ):
        return None
    sb = depth // 8  # bytes per sample; 16-bit is big-endian, high byte kept
    bpp = channels * sb  # filter byte distance (spec: filters act on bytes)
    # interlace 0 = one full-image pass; 1 = the seven Adam7 passes,
    # each an (x0, y0, dx, dy) lattice with its own filtered scanlines
    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    else:
        passes = [
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ]
    dims = []
    need = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        dims.append((pw, ph))
        if pw > 0 and ph > 0:
            need += ph * (1 + pw * bpp)
    # resource guards for untrusted bytes: reject dimension lies that
    # can't fit the deflate stream's maximum ~1032:1 expansion before
    # inflating anything, and bound the inflater's output to exactly
    # the raster size so a crafted zip bomb cannot balloon memory
    if need > 1100 * len(idat) + (1 << 16):
        return None
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    grid: list[list] = [[(0, 0, 0)] * width for _ in range(height)]
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        prev = bytearray(stride)
        for ry in range(ph):
            ftype = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            if ftype == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = line[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pred) & 0xFF
            elif ftype != 0:
                return None  # not a spec filter type
            prev = line
            y = y0 + ry * dy
            for cx in range(pw):
                base_i = cx * bpp
                s = [line[base_i + k * sb] for k in range(channels)]
                if color == 0:
                    px = (s[0],) * 3
                elif color == 2:
                    px = (s[0], s[1], s[2])
                elif color == 3:
                    if s[0] >= len(palette):
                        return None  # index past the palette
                    px = palette[s[0]]
                elif color == 4:  # gray + alpha: drop alpha
                    px = (s[0],) * 3
                else:  # RGBA: drop alpha
                    px = (s[0], s[1], s[2])
                grid[y][x0 + cx * dx] = px
    return width, height, grid


class _JpegBitReader:
    """Entropy-segment bit reader per ITU-T T.81 F.2.2.5: MSB-first,
    0xFF00 byte stuffing removed, RSTn markers surfaced to the caller
    for predictor resync (read stops AT a marker; ``sync_restart``
    consumes it and realigns)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self) -> bool:
        d, i = self.data, self.pos
        if i >= len(d):
            return False
        b = d[i]
        if b == 0xFF:
            if i + 1 < len(d) and d[i + 1] == 0x00:
                self.pos = i + 2  # stuffed literal 0xFF
            else:
                return False  # a real marker: stop here
        else:
            self.pos = i + 1
        self.acc = (self.acc << 8) | b
        self.bits += 8
        return True

    def read_bit(self) -> int | None:
        if self.bits == 0 and not self._fill():
            return None
        self.bits -= 1
        v = (self.acc >> self.bits) & 1
        # Drop consumed high bits so acc stays a few bytes wide — an
        # unbounded accumulator makes each read O(stream) bigint work
        # (quadratic over a multi-MB entropy segment).
        self.acc &= (1 << self.bits) - 1
        return v

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def sync_restart(self, expect: int) -> bool:
        """Consume the next RSTn marker (T.81 F.2.2.5: byte-align,
        expect FFD0+expect) and reset the bit buffer."""
        self.acc = self.bits = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d) and d[i] == 0xFF and d[i + 1] == 0xFF:
            i += 1  # fill bytes before the marker
        if i + 1 >= len(d) or d[i] != 0xFF or d[i + 1] != 0xD0 + (expect & 7):
            return False
        self.pos = i + 2
        return True


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict | None:
    """Canonical Huffman map per T.81 C.2: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                return None
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_decode_huff(reader: _JpegBitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = reader.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t raw bits to the signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_next_marker(data: bytes, pos: int) -> int:
    """First byte index >= pos of a REAL marker (0xFF followed by
    neither 0x00 stuffing nor an RSTn) — how a multi-scan decoder finds
    the segment after an entropy-coded scan (T.81 B.1.1.2: within
    entropy data every 0xFF is stuffed or a restart)."""
    n = len(data)
    i = pos
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (0xD0 <= data[i + 1] <= 0xD7):
            # fill bytes (FF FF ... marker) resolve to the first FF
            return i
        i += 1
    return n


def _jpeg_progressive_scan(
    data, pos, scomps, Ss, Se, Ah, Al, restart_interval, mcux, mcuy, ncomps
):
    """Decode ONE progressive scan (T.81 G.2) into the per-component
    coefficient arrays (zigzag order, successive-approximation ints).

    scomps: [(ci, comp_dict)] in scan order; comp_dict carries the
    padded block grid ("coef": int array (by_pad, bx_pad, 64)), the
    true block grid ("bw"/"bh"), sampling factors and — for scans that
    need them — "dc"/"ac" Huffman tables.  Four scan kinds:
      DC first (Ss=0, Ah=0): Huffman diffs, coef[0] = pred << Al;
      DC refine (Ss=0, Ah>0): one raw bit per block, OR into bit Al
        (arithmetic-shift/OR pairing is exact for negatives in two's
        complement — and in Python ints);
      AC first (Ss>0, Ah=0): single component, EOB-run coded;
      AC refine (Ss>0, Ah>0): correction bits for already-nonzero
        coefficients + ±1<<Al insertions, run/EOB semantics over
        ZERO-HISTORY positions only.
    Returns the byte position of the next marker, or None on corrupt
    input.  Restart markers reset predictors and the EOB run."""
    reader = _JpegBitReader(data, pos)
    p1, m1 = 1 << Al, -1 << Al
    eobrun = 0
    pred = [0] * ncomps
    n_rst = 0

    def refine_nonzero(block, k):
        b = reader.read_bit()
        if b is None:
            return False
        if b and (block[k] & p1) == 0:
            block[k] += p1 if block[k] >= 0 else m1
        return True

    if Ss == 0 and Se == 63:
        # FULL sequential scan routed through the accumulator (a
        # multi-scan SOF0 file: each scan carries complete DC+AC for a
        # component subset, e.g. a Y scan then chroma scans)
        if Ah or Al:
            return None
        units = []
        if len(scomps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, c in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                units.append((ci, c, my * c["v"] + by, mx * c["h"] + bx))
            per_rst = sum(c["v"] * c["h"] for _, c in scomps)
        else:
            ci, c = scomps[0]
            units = [(ci, c, by, bx) for by in range(c["bh"]) for bx in range(c["bw"])]
            per_rst = 1
        for u, (ci, c, by, bx) in enumerate(units):
            if restart_interval and u and u % (restart_interval * per_rst) == 0:
                if not reader.sync_restart(n_rst):
                    return None
                n_rst = (n_rst + 1) & 7
                pred = [0] * ncomps
            blk = c["coef"][by, bx]
            t = _jpeg_decode_huff(reader, c["dc"])
            if t is None or t > 11:
                return None
            diff = reader.read_bits(t) if t else 0
            if diff is None:
                return None
            pred[ci] += _jpeg_extend(diff, t)
            blk[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _jpeg_decode_huff(reader, c["ac"])
                if rs is None:
                    return None
                run, size = rs >> 4, rs & 15
                if size == 0:
                    if run == 15:
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    return None
                v = reader.read_bits(size)
                if v is None:
                    return None
                blk[k] = _jpeg_extend(v, size)
                k += 1
        return _jpeg_next_marker(data, reader.pos)

    if Ss == 0:  # DC scan: interleaved MCU order (ns>1) or block order
        if Se != 0:
            return None
        units = []
        if len(scomps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, c in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                units.append((ci, c, my * c["v"] + by, mx * c["h"] + bx))
            per_rst = sum(c["v"] * c["h"] for _, c in scomps)
        else:
            ci, c = scomps[0]
            units = [(ci, c, by, bx) for by in range(c["bh"]) for bx in range(c["bw"])]
            per_rst = 1
        for u, (ci, c, by, bx) in enumerate(units):
            if restart_interval and u and u % (restart_interval * per_rst) == 0:
                if not reader.sync_restart(n_rst):
                    return None
                n_rst = (n_rst + 1) & 7
                pred = [0] * ncomps
            blk = c["coef"][by, bx]
            if Ah == 0:
                t = _jpeg_decode_huff(reader, c["dc"])
                if t is None or t > 11:
                    return None
                diff = reader.read_bits(t) if t else 0
                if diff is None:
                    return None
                pred[ci] += _jpeg_extend(diff, t)
                blk[0] = pred[ci] << Al
            else:
                b = reader.read_bit()
                if b is None:
                    return None
                if b:
                    blk[0] |= p1
        return _jpeg_next_marker(data, reader.pos)

    # AC scans: exactly one component, raster over its TRUE block grid
    if len(scomps) != 1:
        return None
    ci, c = scomps[0]
    for u in range(c["bh"] * c["bw"]):
        if restart_interval and u and u % restart_interval == 0:
            if not reader.sync_restart(n_rst):
                return None
            n_rst = (n_rst + 1) & 7
            eobrun = 0
        blk = c["coef"][u // c["bw"], u % c["bw"]]
        if Ah == 0:  # AC first scan
            if eobrun:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = _jpeg_decode_huff(reader, c["ac"])
                if rs is None:
                    return None
                run, size = rs >> 4, rs & 15
                if size == 0:
                    if run != 15:
                        eobrun = (1 << run) - 1
                        if run:
                            ext = reader.read_bits(run)
                            if ext is None:
                                return None
                            eobrun += ext
                        break
                    k += 16  # ZRL
                    continue
                k += run
                if k > Se:
                    return None
                v = reader.read_bits(size)
                if v is None:
                    return None
                blk[k] = _jpeg_extend(v, size) << Al
                k += 1
            continue
        # AC refinement scan
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = _jpeg_decode_huff(reader, c["ac"])
                if rs is None:
                    return None
                run, size = rs >> 4, rs & 15
                newval = 0
                if size:
                    if size != 1:
                        return None  # refinement codes only ±1
                    b = reader.read_bit()
                    if b is None:
                        return None
                    newval = p1 if b else m1
                elif run != 15:
                    eobrun = 1 << run
                    if run:
                        ext = reader.read_bits(run)
                        if ext is None:
                            return None
                        eobrun += ext
                    break
                # advance over `run` ZERO-HISTORY positions, emitting a
                # correction bit for every nonzero coefficient passed
                while k <= Se:
                    if blk[k] != 0:
                        if not refine_nonzero(blk, k):
                            return None
                    else:
                        if run == 0:
                            if newval:
                                blk[k] = newval
                            k += 1
                            break
                        run -= 1
                    k += 1
                else:
                    # ran past Se mid-advance: only legal for ZRL tails
                    if newval:
                        return None
        if eobrun > 0:
            while k <= Se:
                if blk[k] != 0 and not refine_nonzero(blk, k):
                    return None
                k += 1
            eobrun -= 1
    return _jpeg_next_marker(data, reader.pos)


def _jpeg_render_progressive(w, h, comps, qt, hmax, vmax):
    """Final reconstruction once every scan is in: dequantize the
    accumulated coefficient arrays (zigzag -> natural), batched inverse
    DCT over all blocks per component, then the shared assemble tail."""
    import numpy as np

    global _DCT_M
    if _DCT_M is None:
        _DCT_M = _jpeg_dct_matrix()
    zz = _JPEG_ZIGZAG
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            return None
        q = np.array(qt[c["tq"]], dtype=np.float64)
        coef = c["coef"].astype(np.float64)  # (by, bx, 64) zigzag order
        nat = np.zeros_like(coef)
        nat[:, :, zz] = coef * q
        blocks = nat.reshape(coef.shape[0], coef.shape[1], 8, 8)
        spat = _DCT_M.T @ blocks @ _DCT_M + 128.0
        planes.append(
            spat.transpose(0, 2, 1, 3).reshape(coef.shape[0] * 8, coef.shape[1] * 8)
        )
    return _jpeg_assemble(planes, comps, w, h, hmax, vmax)


def _jpeg_pixels(data: bytes):
    """Dependency-free JPEG decode per ITU-T T.81 (the public JPEG
    spec): marker walk, DQT/DHT/SOF0-SOF2/DRI/SOS, canonical Huffman
    entropy decode with byte-stuffing and restart-marker resync,
    dequantize + dezigzag, orthonormal inverse DCT (numpy), chroma
    upsampling by sample replication (JFIF), YCbCr->RGB.  Supports
    8-bit precision, 1 (grayscale) or 3 (YCbCr) components, sampling
    factors 1-2, sequential files (single-scan interleaved AND the
    multi-scan one-component-per-scan layout) plus progressive (SOF2)
    files — spectral selection, successive approximation (DC/AC first
    + refinement scans, EOB runs) per T.81 G.2, the encoding most
    web-scraped JPEGs actually use.  Arithmetic coding, 12-bit, and
    hierarchical files return None (the PIL import-try can
    still claim them); so does any malformed blob — untrusted input
    never raises."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None
        restart_interval = 0
        progressive = False
        geom = None  # (comps-with-coef-arrays, hmax, vmax, mcux, mcuy)
        n_scans = 0
        i = 2
        n = len(data)
        while i + 2 <= n:
            if data[i] != 0xFF:
                return None
            while i + 1 < n and data[i + 1] == 0xFF:
                i += 1  # fill bytes
            marker = data[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI: render what the scans accumulated
                if geom is not None and n_scans:
                    w, h, _ = frame
                    # render from geom's comps (the ones carrying the
                    # accumulated 'coef' arrays), never from frame's —
                    # a hostile second SOF is rejected below, but if one
                    # ever slipped through, frame's comps would lack
                    # 'coef' and the render would KeyError
                    comps, hmax, vmax = geom[0], geom[1], geom[2]
                    return _jpeg_render_progressive(w, h, comps, qt, hmax, vmax)
                return None  # EOI before any decodable scan
            if i + 4 > n:
                return None  # truncated before the segment length
            (seg_len,) = struct.unpack_from(">H", data, i + 2)
            seg = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 15
                    j += 1
                    if prec == 0:
                        vals = list(seg[j : j + 64])
                        j += 64
                    else:
                        vals = [
                            struct.unpack_from(">H", seg, j + 2 * k)[0]
                            for k in range(64)
                        ]
                        j += 128
                    if len(vals) < 64:
                        return None
                    qt[tid] = vals
            elif marker == 0xC4:  # DHT
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    counts = seg[j + 1 : j + 17]
                    nsym = sum(counts)
                    symbols = seg[j + 17 : j + 17 + nsym]
                    tbl = _jpeg_huff_table(counts, symbols)
                    if tbl is None:
                        return None
                    huff[(tc, th)] = tbl
                    j += 17 + nsym
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
                if frame is not None:
                    # T.81 allows exactly one frame per image; a second
                    # SOF in an adversarial blob would orphan geom's
                    # coefficient arrays and poison the EOI render
                    return None
                progressive = marker == 0xC2
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    return None
                # resource guard for untrusted bytes: a hostile SOF can
                # claim 65535x65535 (a multi-GB plane allocation).  A
                # real scan needs at least ~2 bits of entropy data per
                # 8x8 block, so dimensions wildly beyond the blob size
                # are a lie — reject before allocating anything.
                if (w * h) // 64 > 8 * len(data):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    ch, cv = hv >> 4, hv & 15
                    if not (1 <= ch <= 2 and 1 <= cv <= 2):
                        return None
                    comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
                frame = (w, h, comps)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless/arithmetic/hierarchical
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                w, h, comps = frame
                ns = seg[0]
                if not progressive and ns == len(comps) and geom is None:
                    # single-scan sequential fast path (decode + IDCT
                    # per block in one pass, no coefficient arrays)
                    sel = {}
                    for s in range(ns):
                        cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                        sel[cs] = (tt >> 4, tt & 15)
                    for c in comps:
                        if c["id"] not in sel or c["tq"] not in qt:
                            return None
                        td, ta = sel[c["id"]]
                        if (0, td) not in huff or (1, ta) not in huff:
                            return None
                        c["dc"] = huff[(0, td)]
                        c["ac"] = huff[(1, ta)]
                        c["q"] = np.array(qt[c["tq"]], dtype=np.float64)
                    return _jpeg_scan(
                        data, i + 2 + seg_len, w, h, comps, restart_interval
                    )
                # multi-scan (progressive OR sequential-with-component-
                # subset scans): lazily build the coefficient geometry,
                # then accumulate this scan and continue the walk
                if geom is None:
                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    for c in comps:
                        cw = -(-(w * c["h"]) // hmax)
                        ch_ = -(-(h * c["v"]) // vmax)
                        c["bw"], c["bh"] = -(-cw // 8), -(-ch_ // 8)
                        c["coef"] = np.zeros(
                            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                        )
                    geom = (comps, hmax, vmax, mcux, mcuy)
                _, _, _, mcux, mcuy = geom
                if ns < 1 or ns > len(comps) or len(seg) < 1 + 2 * ns + 3:
                    return None
                Ss, Se, AhAl = struct.unpack_from(">BBB", seg, 1 + 2 * ns)
                Ah, Al = AhAl >> 4, AhAl & 15
                if not (Ss <= Se <= 63) or Al > 13:
                    return None
                by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
                scomps = []
                for s in range(ns):
                    cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                    if cs not in by_id:
                        return None
                    ci, c = by_id[cs]
                    td, ta = tt >> 4, tt & 15
                    if Ss == 0 and Ah == 0:  # DC-carrying scans need a DC table
                        if (0, td) not in huff:
                            return None
                        c["dc"] = huff[(0, td)]
                    if Se > 0:  # AC-carrying scans (incl. full sequential)
                        if (1, ta) not in huff:
                            return None
                        c["ac"] = huff[(1, ta)]
                    scomps.append((ci, c))
                nxt = _jpeg_progressive_scan(
                    data, i + 2 + seg_len, scomps, Ss, Se, Ah, Al,
                    restart_interval, mcux, mcuy, len(comps),
                )
                if nxt is None:
                    return None
                n_scans += 1
                i = nxt
                continue
            i += 2 + seg_len
        return None
    except (IndexError, KeyError, ValueError, struct.error):
        return None  # untrusted bytes: malformed is None, never a raise


# orthonormal 8x8 DCT basis (numpy, built once): row k of _DCT_M is
# sqrt(2/8)*c(k)*cos((2j+1)k*pi/16) — IDCT of F is M.T @ F @ M
def _jpeg_dct_matrix():
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for k in range(8):
        ck = math.sqrt(0.5) if k == 0 else 1.0
        for j in range(8):
            m[k, j] = 0.5 * ck * math.cos((2 * j + 1) * k * math.pi / 16)
    return m


_DCT_M = None


def _jpeg_scan(data, pos, w, h, comps, restart_interval):
    """Entropy-decode the single sequential scan and reassemble RGB."""
    import numpy as np

    global _DCT_M
    if _DCT_M is None:
        _DCT_M = _jpeg_dct_matrix()
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _JpegBitReader(data, pos)
    pred = [0] * len(comps)
    zz = _JPEG_ZIGZAG
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_idx = my * mcux + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                if not reader.sync_restart(n_rst):
                    return None
                n_rst = (n_rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        t = _jpeg_decode_huff(reader, c["dc"])
                        if t is None or t > 11:
                            return None
                        diff = reader.read_bits(t) if t else 0
                        if diff is None:
                            return None
                        pred[ci] += _jpeg_extend(diff, t)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_huff(reader, c["ac"])
                            if rs is None:
                                return None
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            v = reader.read_bits(size)
                            if v is None:
                                return None
                            coef[k] = _jpeg_extend(v, size)
                            k += 1
                        # dequant in scan order, then dezigzag: zz maps
                        # scan position -> natural index
                        nat = np.zeros(64)
                        nat[zz] = coef * c["q"]
                        spat = _DCT_M.T @ nat.reshape(8, 8) @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spat
    return _jpeg_assemble(planes, comps, w, h, hmax, vmax)


def _jpeg_assemble(planes, comps, w, h, hmax, vmax):
    """Shared tail of both JPEG paths: upsample each component plane to
    full resolution by sample replication (JFIF), crop to (h, w),
    YCbCr->RGB (or replicate grayscale)."""
    import numpy as np

    full = []
    for ci, c in enumerate(comps):
        sy, sx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(planes[ci], sy, axis=0), sx, axis=1)[:h, :w]
        full.append(p)
    if len(comps) == 1:
        Y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, [[(int(v),) * 3 for v in row] for row in Y]
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    rgb = [np.clip(np.rint(x), 0, 255).astype(np.uint8) for x in (r, g, b)]
    return w, h, [
        [(int(rgb[0][y, x]), int(rgb[1][y, x]), int(rgb[2][y, x])) for x in range(w)]
        for y in range(h)
    ]


def _gif_lzw_decode(min_code_size: int, data: bytes, max_pixels: int):
    """GIF's LZW variant (GIF89a spec appendix F): variable-width codes
    LSB-first, CLEAR resets the table, EOI ends the stream, code width
    grows when the next entry would not fit (capped at 12 bits).
    Returns the index stream (list of palette indices) or None."""
    if not (1 <= min_code_size <= 8):
        # untrusted byte from the wire: the spec caps the LZW minimum
        # code size at 8 (256-entry root table); larger values would
        # build byte values >= 256 (mutation-fuzz finding, round 10)
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out.extend(entry)
            if len(out) > max_pixels:
                return None  # corrupt stream ballooning past the image
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _gif_pixels(data: bytes):
    """Dependency-free GIF decode per the public GIF89a spec: logical
    screen descriptor, global/local color tables, extension-block
    skipping, first image descriptor only (animation = first frame),
    LZW index stream, interlace row reordering.  Returns
    (width, height, row-major RGB tuples) or None."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    flags = data[10]
    i = 13
    global_pal: list[tuple[int, int, int]] = []
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        pal = data[i : i + 3 * size]
        if len(pal) < 3 * size:
            return None
        global_pal = [tuple(pal[3 * j : 3 * j + 3]) for j in range(size)]
        i += 3 * size
    while i < len(data):
        block = data[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(data):
                return None
            _left, _top, width, height = struct.unpack_from("<HHHH", data, i + 1)
            iflags = data[i + 9]
            i += 10
            pal = global_pal
            if iflags & 0x80:  # local color table wins
                size = 2 << (iflags & 0x07)
                raw = data[i : i + 3 * size]
                if len(raw) < 3 * size:
                    return None
                pal = [tuple(raw[3 * j : 3 * j + 3]) for j in range(size)]
                i += 3 * size
            if not pal or width <= 0 or height <= 0 or i >= len(data):
                return None
            min_code = data[i]
            i += 1
            lzw = bytearray()
            while i < len(data) and data[i] != 0:
                n = data[i]
                lzw += data[i + 1 : i + 1 + n]
                i += 1 + n
            idx = _gif_lzw_decode(min_code, bytes(lzw), width * height)
            if idx is None or len(idx) < width * height:
                return None
            if max(idx[: width * height]) >= len(pal):
                return None
            flat = [pal[v] for v in idx[: width * height]]
            rows = [flat[r * width : (r + 1) * width] for r in range(height)]
            if iflags & 0x40:  # interlaced: pass order 8/0, 8/4, 4/2, 2/1
                ordered: list = [None] * height
                src = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for r in range(start, height, step):
                        ordered[r] = rows[src]
                        src += 1
                rows = ordered
            return width, height, rows
        elif block == 0x3B:  # trailer
            return None
        else:
            return None
    return None


def _pnm_tokens(data: bytes, n_tokens: int, start: int = 2):
    """The netpbm header walk (whitespace-separated ASCII tokens with
    '#' line comments): returns (tokens, index-one-past-the-last-token)
    — shared by the full decoder and the header probe so a tokenizer
    fix applies to both."""
    tokens, i, n = [], start, len(data)
    while len(tokens) < n_tokens and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    return tokens, i


def _pnm_pixels(data: bytes):
    """Dependency-free binary PNM decode: P5 (grayscale) and P6 (RGB),
    maxval <= 255, per the public netpbm spec (ASCII header tokens with
    '#' comments, then raw samples — each sample scaled by 255/maxval
    so a maxval-15 white pixel decodes to 255, not 15).  Returns
    (width, height, row-major RGB tuples) or None."""
    if data[:2] not in (b"P5", b"P6"):
        return None
    tokens, i = _pnm_tokens(data, 3)
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if width <= 0 or height <= 0 or not (0 < maxval <= 255):
        return None
    i += 1  # exactly one whitespace byte separates header and raster
    ch = 1 if data[:2] == b"P5" else 3
    need = width * height * ch
    raster = data[i : i + need]
    if len(raster) < need:
        return None

    def scale(v: int) -> int:
        # spec: sample/maxval is the intensity; integer-exact rescale
        return v * 255 // maxval

    rows = []
    for r in range(height):
        base = r * width * ch
        if ch == 1:
            rows.append([(scale(raster[base + c]),) * 3 for c in range(width)])
        else:
            rows.append(
                [
                    tuple(scale(x) for x in raster[base + 3 * c : base + 3 * c + 3])
                    for c in range(width)
                ]
            )
    return width, height, rows


def _image_features_stdlib(content: bytes) -> list[float] | None:
    """REAL dependency-free image encoder: 24-bit BMP and binary PNM
    (uncompressed), plus PNG (stdlib zlib inflate + scanline
    unfiltering), GIF (LZW) and baseline JPEG (Huffman + numpy IDCT)
    since round 6 — integer-luma grayscale ((299r + 587g + 114b) //
    1000), 4×4 box-average downsample with integer means — fully
    deterministic, so tests pin exact features (JPEG within the
    codec's rounding tolerance; progressive JPEG decodes real since
    round 10 — byte-identical to the sequential decode of the same
    coefficients).
    """
    decoded = (
        _bmp_pixels(content)
        or _pnm_pixels(content)
        or _png_pixels(content)
        or _gif_pixels(content)
        or _jpeg_pixels(content)
    )
    if decoded is None:
        return None
    width, height, rows = decoded
    grid = 4
    feats = []
    for gy in range(grid):
        y0, y1 = gy * height // grid, max((gy + 1) * height // grid, gy * height // grid + 1)
        y1 = min(y1, height)
        for gx in range(grid):
            x0, x1 = gx * width // grid, max((gx + 1) * width // grid, gx * width // grid + 1)
            x1 = min(x1, width)
            total = cnt = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    r, g, b = rows[y][x]
                    total += (299 * r + 587 * g + 114 * b) // 1000
                    cnt += 1
            feats.append(((total // cnt if cnt else 0) - 128) / 128.0)
    return feats[:FEATURE_DIM]


def image_dhash63(content: bytes) -> int | None:
    """REAL dependency-free perceptual image hash (difference hash):
    decode (any of the real decoders below), integer-luma grayscale,
    box-average to a 9-column x 8-row grid, then one bit per
    horizontal gradient — bit (y*8 + x) set iff cell[y][x] <
    cell[y][x+1], with the final (y=7, x=7) comparison DROPPED so the
    63-bit value folds inside a signed 64-bit long in BOTH engines
    (the same width rationale as the 60-bit simhash).  dHash is
    invariant under global brightness shifts and under the encoding
    FORMAT (the same pixels as BMP or PNG hash identically), which is
    exactly what image near-dup detection needs.  All-integer:
    deterministic across platforms."""
    decoded = (
        _bmp_pixels(content)
        or _pnm_pixels(content)
        or _png_pixels(content)
        or _gif_pixels(content)
        or _jpeg_pixels(content)
    )
    if decoded is None:
        return None
    width, height, rows = decoded
    cols, grows = 9, 8
    grid = []
    for gy in range(grows):
        y0 = gy * height // grows
        y1 = max((gy + 1) * height // grows, y0 + 1)
        y1 = min(y1, height)
        line = []
        for gx in range(cols):
            x0 = gx * width // cols
            x1 = max((gx + 1) * width // cols, x0 + 1)
            x1 = min(x1, width)
            total = cnt = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    r, g, b = rows[y][x]
                    total += (299 * r + 587 * g + 114 * b) // 1000
                    cnt += 1
            line.append(total // cnt if cnt else 0)
        grid.append(line)
    h = 0
    for y in range(grows):
        for x in range(cols - 1):
            if y == 7 and x == 7:
                continue  # keep the fold under 2^63
            if grid[y][x] < grid[y][x + 1]:
                h |= 1 << (y * 8 + x)
    return h


def build_gray_bmp(width: int, height: int, vals: list[int]) -> bytes:
    """Minimal spec-layout 24-bit top-down BMP with r=g=b=val — the
    deterministic image-fixture builder (integer luma of (v,v,v) is
    exactly v, so oracle SQL can recompute the dHash from the same
    value formula without decoding anything).  The decoder batteries
    verify _bmp_pixels against INDEPENDENT writers in the test suite;
    this builder only feeds fixtures/queries."""
    import struct

    stride = (width * 3 + 3) & ~3
    pix = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = vals[y * width + x] & 0xFF
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        pix += row
    # file header, then BITMAPINFOHEADER: biSize, width, NEGATIVE
    # height (top-down), planes, bpp, compression(0), image size,
    # ppm x/y, colors used/important
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
    )
    return bytes(header) + bytes(pix)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def _bmp_dhash63_block(ids, blobs):
    """Vectorized dHash for a HOMOGENEOUS block of plain 24-bit BMPs
    (same byte length and same 54-byte header, i.e. same dimensions,
    pixel offset and orientation — the shape any fixture or
    batch-captured camera feed produces).  One numpy pass computes
    every blob's luma grid and gradient bits; integer arithmetic
    identical to ``image_dhash63`` (the property suite pins the two
    paths equal).  Returns (media_ids, dhashes) or None when the
    header is not the plain-24-bit layout the scalar decoder accepts."""
    import struct

    import numpy as np

    head = blobs[0]
    if len(head) < 54 or head[:2] != b"BM":
        return None
    (pix_off,) = struct.unpack_from("<I", head, 10)
    (hdr_size,) = struct.unpack_from("<I", head, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", head, 18)
    bpp, comp = struct.unpack_from("<HI", head, 28)
    if bpp != 24 or comp != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(head) < pix_off + stride * height:
        return None
    k = len(blobs)
    arr = np.frombuffer(b"".join(blobs), np.uint8).reshape(k, len(head))
    pix = arr[:, pix_off : pix_off + stride * height].reshape(k, height, stride)
    if not top_down:
        pix = pix[:, ::-1, :]
    rows = pix[:, :, : width * 3].reshape(k, height, width, 3).astype(np.int64)
    # BGR byte order; integer luma exactly as image_dhash63
    luma = (299 * rows[..., 2] + 587 * rows[..., 1] + 114 * rows[..., 0]) // 1000
    cols, grows = 9, 8
    grid = np.empty((k, grows, cols), np.int64)
    for gy in range(grows):
        y0 = gy * height // grows
        y1 = min(max((gy + 1) * height // grows, y0 + 1), height)
        for gx in range(cols):
            x0 = gx * width // cols
            x1 = min(max((gx + 1) * width // cols, x0 + 1), width)
            cell = luma[:, y0:y1, x0:x1]
            grid[:, gy, gx] = cell.reshape(k, -1).sum(axis=1) // (
                (y1 - y0) * (x1 - x0)
            )
    h = np.zeros(k, np.uint64)
    for y in range(grows):
        for x in range(cols - 1):
            if y == 7 and x == 7:
                continue  # keep the fold under 2^63 (same as scalar)
            h |= (grid[:, y, x] < grid[:, y, x + 1]).astype(np.uint64) << np.uint64(
                y * 8 + x
            )
    return np.asarray(ids, np.int64), h.astype(np.int64)


def image_dhash_signatures(df: DataFrame) -> DataFrame:
    """Arrow-batched dHash over (media_id, content); undecodable blobs
    are dropped (a near-dup pass has nothing to say about them — the
    header probe reports them separately).

    Blocks of same-layout plain 24-bit BMPs (grouped by byte length +
    54-byte header) take a fully vectorized numpy path — the scalar
    per-pixel Python walk was the sf10 rung's cost center (~50 s for
    500k 9x8 fixtures); anything else (PNG/GIF/JPEG/PNM, odd BMPs)
    falls back to the scalar decoder per blob, value-identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            groups: dict[tuple, tuple[list, list]] = {}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                key = (len(b), b[:54])
                ids, blobs = groups.setdefault(key, ([], []))
                ids.append(int(media_id))
                blobs.append(b)
            out_ids: list[np.ndarray] = []
            out_hs: list[np.ndarray] = []
            rows = []
            for ids, blobs in groups.values():
                fast = _bmp_dhash63_block(ids, blobs) if len(blobs) >= 8 else None
                if fast is not None:
                    out_ids.append(fast[0])
                    out_hs.append(fast[1])
                    continue
                for media_id, b in zip(ids, blobs):
                    h = image_dhash63(b)
                    if h is not None:
                        rows.append({"media_id": media_id, "dhash": h})
            frames = []
            if rows:
                frames.append(pd.DataFrame(rows, columns=["media_id", "dhash"]))
            if out_ids:
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": np.concatenate(out_ids),
                            "dhash": np.concatenate(out_hs),
                        }
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype="int64"),
                        "dhash": pd.Series([], dtype="int64"),
                    }
                )
            )

    return df.select("media_id", "content").mapInPandas(run, DHASH_SCHEMA)


def _wav_samples_int(content: bytes) -> list[int] | None:
    """All first-channel PCM samples as INTEGERS (16-bit signed as-is,
    8-bit unsigned centered) — the raw-sample sibling of the
    normalized feature path below, for integer-exact fingerprints."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if width == 2:
        n = len(raw) // 2
        return list(struct.unpack(f"<{n}h", raw[: n * 2]))[::nch]
    if width == 1:
        return [b - 128 for b in raw[::nch]]
    return None


def audio_envelope_hash63(content: bytes, windows: int = 64) -> int | None:
    """REAL dependency-free perceptual AUDIO fingerprint — the audio
    sibling of image_dhash63: decode PCM (stdlib wave), split the
    first channel into ``windows`` equal spans, take each span's
    integer ENERGY (sum of squared samples), and set one bit per
    energy gradient — bit k iff env[k] < env[k+1], k in 0..62, so the
    63-bit value folds inside signed long in both engines.  GAIN-
    invariant by construction (a constant amplitude factor scales
    every window's energy by the same g², preserving all gradients) —
    the loudness-normalization dedup case; all-integer, so
    deterministic across platforms and SQL-recomputable."""
    samples = _wav_samples_int(content)
    if samples is None:
        # lossless integers across EVERY frame: WAV==FLAC of the same
        # PCM hash identically (cross-format audio dedup) — multi-frame
        # decode per ADVICE r11, not just the first frame
        samples = _flac_all_samples(content)
    if samples is None or len(samples) < windows:
        return None
    n = len(samples)
    env = []
    for k in range(windows):
        span = samples[k * n // windows : (k + 1) * n // windows]
        env.append(sum(v * v for v in span))
    h = 0
    for k in range(min(windows - 1, 63)):
        if env[k] < env[k + 1]:
            h |= 1 << k
    return h


def build_pcm16_wav(rate: int, samples: list[int]) -> bytes:
    """Minimal mono PCM16 WAV via the stdlib writer — the audio
    fixture builder (decode batteries verify the reader against
    independent writers elsewhere; this only feeds fixtures/queries)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def _wav_envelope63_block(ids, blobs, windows: int = 64):
    """Vectorized envelope hash for a HOMOGENEOUS block of canonical
    mono PCM16 WAVs (same byte length, 44-byte RIFF header with the
    16-byte fmt chunk followed directly by 'data' — the stdlib
    writer's layout).  Integer arithmetic identical to
    ``audio_envelope_hash63`` (property-pinned).  Returns
    (media_ids, ahashes) or None when the header is not this exact
    layout (the scalar wave/FLAC path then claims the blobs)."""
    import struct

    import numpy as np

    head = blobs[0]
    if len(head) < 44 or head[:4] != b"RIFF" or head[8:16] != b"WAVEfmt ":
        return None
    fmt_size, audio_fmt, nch = struct.unpack_from("<IHH", head, 16)
    width = struct.unpack_from("<H", head, 34)[0]
    if fmt_size != 16 or audio_fmt != 1 or nch != 1 or width != 16:
        return None
    if head[36:40] != b"data":
        return None
    (data_size,) = struct.unpack_from("<I", head, 40)
    n = min(data_size // 2, (len(head) - 44) // 2)
    if n < windows:
        return None
    k = len(blobs)
    raw = np.frombuffer(b"".join(blobs), np.uint8).reshape(k, len(head))
    samples = (
        raw[:, 44 : 44 + n * 2].reshape(k, n, 2).astype(np.uint16)
    )
    s = (samples[..., 0] | (samples[..., 1].astype(np.uint16) << 8)).astype(
        np.int16
    ).astype(np.int64)
    edges = np.array([w * n // windows for w in range(windows)], np.int64)
    env = np.add.reduceat(s * s, edges, axis=1)  # k x windows
    h = np.zeros(k, np.uint64)
    for w in range(min(windows - 1, 63)):
        h |= (env[:, w] < env[:, w + 1]).astype(np.uint64) << np.uint64(w)
    return np.asarray(ids, np.int64), h.astype(np.int64)


def audio_envelope_signatures(df: DataFrame) -> DataFrame:
    """Arrow-batched envelope hash over (media_id, content);
    undecodable / too-short blobs are dropped.

    Blocks of same-layout canonical mono PCM16 WAVs (grouped by byte
    length + 44-byte header) take a fully vectorized numpy path — the
    scalar per-sample Python energy loop was an sf10 cost center
    (~30 s for 500k 256-sample fixtures); anything else (multi-channel,
    8-bit, extra chunks, FLAC) falls back to the scalar decoder per
    blob, value-identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            groups: dict[tuple, tuple[list, list]] = {}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                key = (len(b), b[:44])
                ids, blobs = groups.setdefault(key, ([], []))
                ids.append(int(media_id))
                blobs.append(b)
            out_ids: list[np.ndarray] = []
            out_hs: list[np.ndarray] = []
            rows = []
            for ids, blobs in groups.values():
                fast = _wav_envelope63_block(ids, blobs) if len(blobs) >= 8 else None
                if fast is not None:
                    out_ids.append(fast[0])
                    out_hs.append(fast[1])
                    continue
                for media_id, b in zip(ids, blobs):
                    h = audio_envelope_hash63(b)
                    if h is not None:
                        rows.append({"media_id": media_id, "ahash": h})
            frames = []
            if rows:
                frames.append(pd.DataFrame(rows, columns=["media_id", "ahash"]))
            if out_ids:
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": np.concatenate(out_ids),
                            "ahash": np.concatenate(out_hs),
                        }
                    )
                )
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype="int64"),
                        "ahash": pd.Series([], dtype="int64"),
                    }
                )
            )

    return df.select("media_id", "content").mapInPandas(run, AHASH_SCHEMA)


def _wav_features_stdlib(content: bytes) -> list[float] | None:
    """Dependency-free REAL audio decode: stdlib ``wave`` parses
    PCM WAV (8/16-bit), normalizing the first channel's first
    FEATURE_DIM samples to [-1, 1) exactly like soundfile does
    (sample / 2^(bits-1)).  Returns None for non-WAV bytes or sample
    widths wave can't express, so the soundfile path can still try."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(FEATURE_DIM)
    except (wave.Error, EOFError):
        return None
    if width == 2:
        n = len(raw) // 2
        samples = struct.unpack(f"<{n}h", raw[: n * 2])
        flat = [s / 32768.0 for s in samples[::nch]]
    elif width == 1:  # WAV 8-bit is unsigned
        flat = [(b - 128) / 128.0 for b in raw[::nch]]
    else:
        return None
    return (flat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def _wav_chunks(content: bytes):
    """RIFF/WAVE chunk walk shared by the compressed-WAV decoders:
    returns (fmt_fields, data_bytes) or None.  fmt_fields =
    (audio_format, channels, sample_rate, block_align,
    bits_per_sample)."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    fmt = data = None
    i = 12
    n = len(content)
    while i + 8 <= n:
        cid = content[i : i + 4]
        (clen,) = struct.unpack_from("<I", content, i + 4)
        body = content[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            tag, ch, rate = struct.unpack_from("<HHI", body, 0)
            block_align, bits = struct.unpack_from("<HH", body, 12)
            fmt = (tag, ch, rate, block_align, bits)
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        return None
    return fmt, data


def _ulaw_expand(b: int) -> int:
    """G.711 mu-law byte -> linear PCM16 (the spec's inverse transform:
    bias 0x84, 3-bit exponent segment, 4-bit mantissa)."""
    u = ~b & 0xFF
    sign, exp, mant = u & 0x80, (u >> 4) & 7, u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return -mag if sign else mag


def _alaw_expand(b: int) -> int:
    """G.711 A-law byte -> linear PCM16 (toggle 0x55, segmented)."""
    a = b ^ 0x55
    sign, exp, mant = a & 0x80, (a >> 4) & 7, a & 0x0F
    if exp == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (exp - 1)
    # G.711 sign convention: after the 0x55 toggle a SET sign bit means
    # POSITIVE (canonical g711.c: alaw2linear(0xD5) == +8, 0x55 == -8).
    return mag if sign else -mag


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_adpcm_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM decode step (the public DVI/IMA algorithm):
    returns (new predictor, new step index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nibble & 7]))
    return pred, index


def _compressed_wav_features_stdlib(content: bytes) -> list[float] | None:
    """Dependency-free decode of the compressed WAV families stdlib
    ``wave`` rejects: G.711 mu-law (format tag 7) and A-law (tag 6)
    per the public G.711 tables, and IMA/DVI ADPCM (tag 0x11) per the
    public IMA algorithm (4-byte-per-channel block headers carrying
    the initial predictor/step index, then 4-bit nibbles, low nibble
    first, interleaved in 4-byte channel runs).  First FEATURE_DIM
    channel-0 samples normalized to [-1, 1), zero-padded."""
    import struct

    parsed = _wav_chunks(content)
    if parsed is None:
        return None
    (tag, nch, _rate, block_align, bits), data = parsed
    if nch < 1:
        return None
    if tag in (6, 7):
        if bits != 8:
            return None
        expand = _alaw_expand if tag == 6 else _ulaw_expand
        samples = [expand(b) for b in data[: FEATURE_DIM * nch]][::nch]
        flat = [s / 32768.0 for s in samples]
        return (flat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
    if tag == 0x11:
        if bits != 4 or block_align < 4 * nch:
            return None
        out: list[float] = []
        pos = 0
        while len(out) < FEATURE_DIM and pos + block_align <= len(data):
            block = data[pos : pos + block_align]
            pos += block_align
            # channel-0 header: predictor int16, step index, reserved
            pred, index = struct.unpack_from("<hB", block, 0)
            if index > 88:
                return None
            out.append(pred / 32768.0)  # header predictor IS sample 0
            # data nibbles: channels interleaved in 4-byte runs; walk
            # channel 0's runs only
            run = 0
            i = 4 * nch
            while i < len(block) and len(out) < FEATURE_DIM:
                if nch > 1 and (run // 4) % nch != 0:
                    i += 1
                    run += 1
                    continue
                byte = block[i]
                for nib in (byte & 0x0F, byte >> 4):
                    pred, index = _ima_adpcm_step(nib, pred, index)
                    out.append(pred / 32768.0)
                    if len(out) >= FEATURE_DIM:
                        break
                i += 1
                run += 1
        if not out:
            return None
        return (out + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
    return None


class _FlacBits:
    """MSB-first bit reader for the FLAC stream (raises IndexError at
    end of data — the caller's try/except turns that into None)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int):
        self.data = data
        self.bitpos = bytepos * 8

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.bitpos
        if (p + n - 1) >> 3 >= len(d):
            raise IndexError("flac: out of data")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.bitpos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise IndexError("flac: runaway unary")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_residual(bits: _FlacBits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual per the FLAC format spec: 2-bit method
    (0 = 4-bit rice params, 1 = 5-bit), 4-bit partition order,
    2^order partitions, escape code = raw verbatim bits."""
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: blocksize not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition layout")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # un-zigzag
    return out


def _flac_subframe(bits: _FlacBits, blocksize: int, bps: int) -> list[int]:
    """One subframe per the spec: padding bit, 6-bit type, wasted-bits
    unary; constant / verbatim / fixed(0-4) / LPC(1-32)."""
    if bits.read(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order = ftype - 8
        order = ftype - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _flac_residual(bits, blocksize, order)
        coefs = _FLAC_FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + e)
    elif ftype >= 32:  # LPC, order = ftype - 31
        order = ftype - 31
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _flac_residual(bits, blocksize, order)
        for e in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(pred + e)
    else:
        raise ValueError("flac: reserved subframe type")
    return [s << wasted for s in samples]


_FLAC_BLOCKSIZES = [
    0, 192, 576, 1152, 2304, 4608, -1, -2, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768,
]


def _flac_metadata(content: bytes) -> tuple[int, int | None, int] | None:
    """STREAMINFO walk: (first-frame byte offset, streaminfo bps or
    None, total samples — 0 when the encoder left it unknown)."""
    if content[:4] != b"fLaC":
        return None
    i = 4
    si_bps: int | None = None
    total = 0
    try:
        while True:
            if i + 4 > len(content):
                return None
            last = content[i] & 0x80
            btype = content[i] & 0x7F
            blen = int.from_bytes(content[i + 1 : i + 4], "big")
            if btype == 0 and blen >= 18:  # STREAMINFO
                body = content[i + 4 : i + 4 + blen]
                # layout from byte 10: 20 bits rate | 3 bits channels-1
                # | 5 bits bps-1 | 36 bits total samples — bps-1 spans
                # byte 12's low bit and byte 13's high nibble
                si_bps = (((body[12] & 0x01) << 4) | (body[13] >> 4)) + 1
                total = ((body[13] & 0x0F) << 32) | int.from_bytes(
                    body[14:18], "big"
                )
            i += 4 + blen
            if last:
                break
    except IndexError:
        return None  # declared-but-truncated block on untrusted bytes
    return i, si_bps, total


def _flac_frame_ch0(bits: _FlacBits, si_bps: int | None) -> tuple[list[int], int]:
    """ONE frame at the reader's current position: header parse,
    subframes, stereo decorrelation.  Returns (channel-0 samples,
    bps); raises ValueError/IndexError on malformed bits — the public
    wrappers turn that into None.  The frame footer CRC-16 is NOT
    consumed here (the multi-frame walk owns inter-frame alignment)."""
    # ---- frame header
    if bits.read(14) != 0x3FFE:
        raise ValueError("flac: bad frame sync")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved
    # UTF-8-coded frame/sample number: first byte tells the length
    first = bits.read(8)
    extra = 0
    if first >= 0xC0:
        b = first
        while b & 0x40:
            extra += 1
            b <<= 1
    for _ in range(extra):
        bits.read(8)
    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code")
    blocksize = _FLAC_BLOCKSIZES[bs_code]
    if blocksize == -1:
        blocksize = bits.read(8) + 1
    elif blocksize == -2:
        blocksize = bits.read(16) + 1
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("flac: invalid sample-rate code")
    bps_map = {0: si_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    bps = bps_map.get(ss_code)
    if bps is None:
        raise ValueError("flac: reserved sample-size code")
    bits.read(8)  # header CRC-8 (consumed, not verified)
    # ---- subframes + stereo decorrelation
    if ch_code <= 7:
        nch = ch_code + 1
        chans = []
        for _c in range(nch):
            chans.append(_flac_subframe(bits, blocksize, bps))
        ch0 = chans[0]
    elif ch_code == 8:  # left-side: ch0 = left
        left = _flac_subframe(bits, blocksize, bps)
        _side = _flac_subframe(bits, blocksize, bps + 1)
        ch0 = left
    elif ch_code == 9:  # right-side: ch0 = right + side
        side = _flac_subframe(bits, blocksize, bps + 1)
        right = _flac_subframe(bits, blocksize, bps)
        ch0 = [r + s for r, s in zip(right, side)]
    elif ch_code == 10:  # mid-side: mid = (L+R)>>1 (side LSB lost),
        # side = L-R; reconstruct L = ((mid<<1 | side&1) + side) >> 1
        mid = _flac_subframe(bits, blocksize, bps)
        side = _flac_subframe(bits, blocksize, bps + 1)
        ch0 = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
    else:
        raise ValueError("flac: reserved channel assignment")
    return ch0, bps


def _flac_first_frame_samples(content: bytes) -> tuple[list[int], int] | None:
    """Dependency-free FLAC decode per the public format spec
    (xiph.org): STREAMINFO walk, frame-header parse, constant /
    verbatim / fixed / LPC subframes with rice-coded residuals, and
    left-side / right-side / mid-side stereo decorrelation — FLAC is
    lossless integer arithmetic end to end, so decode is bit-exact.
    Returns (channel-0 INTEGER samples of the first frame, bps); the
    feature wrapper below normalizes, the audio fingerprint decodes
    EVERY frame via _flac_all_samples.  CRCs are consumed, not
    verified."""
    meta = _flac_metadata(content)
    if meta is None:
        return None
    start, si_bps, _total = meta
    try:
        return _flac_frame_ch0(_FlacBits(content, start), si_bps)
    except (IndexError, ValueError):
        return None  # untrusted bytes: malformed is None, never a raise


def _flac_all_samples(content: bytes) -> list[int] | None:
    """Channel-0 samples of EVERY frame, concatenated (ADVICE r11:
    the fingerprint's WAV==FLAC cross-format invariance must hold for
    multi-frame FLACs, not just single-frame ones).  Frames are
    byte-aligned and separated by a 16-bit footer CRC (consumed, not
    verified); the walk stops at STREAMINFO's total-samples count
    when the encoder recorded one, else at end of data.  A malformed
    frame ANYWHERE returns None — a partial-stream hash would
    silently mis-dedup, so untrusted bytes are flagged, not guessed."""
    meta = _flac_metadata(content)
    if meta is None:
        return None
    start, si_bps, total = meta
    bits = _FlacBits(content, start)
    out: list[int] = []
    try:
        ch0, _bps = _flac_frame_ch0(bits, si_bps)
        out.extend(ch0)
        while not (total and len(out) >= total):
            bits.align()
            # after the LAST frame at most a final CRC-16 remains; a
            # next frame needs CRC (2B) + sync/header (>=2B more)
            if len(content) - (bits.bitpos >> 3) < 4:
                break
            bits.read(16)  # previous frame's footer CRC-16
            ch0, _bps = _flac_frame_ch0(bits, si_bps)
            out.extend(ch0)
    except (IndexError, ValueError):
        return None  # untrusted bytes: malformed is None, never a raise
    return out[:total] if total else out


def _flac_features_stdlib(content: bytes) -> list[float] | None:
    """First FEATURE_DIM channel-0 FLAC samples normalized by
    2^(bps-1) (only the first frame is read — FEATURE_DIM << any real
    blocksize); see _flac_first_frame_samples for the decode itself."""
    decoded = _flac_first_frame_samples(content)
    if decoded is None:
        return None
    ch0, bps = decoded
    scale = float(1 << (bps - 1))
    flat = [s / scale for s in ch0[:FEATURE_DIM]]
    return (flat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def _real_audio_features(content: bytes) -> list[float] | None:
    """Audio encoder: stdlib-``wave`` PCM WAV decode first, then the
    dependency-free G.711/IMA-ADPCM WAV and FLAC decoders (formats
    ``wave`` can't parse), then the soundfile import-try for
    everything else.  First FEATURE_DIM samples, zero-padded."""
    wav = _wav_features_stdlib(content)
    if wav is not None:
        return wav
    wav = _compressed_wav_features_stdlib(content)
    if wav is not None:
        return wav
    wav = _flac_features_stdlib(content)
    if wav is not None:
        return wav
    try:
        import io

        import soundfile as sf
    except ImportError:
        return None
    data, _rate = sf.read(io.BytesIO(content))
    flat = [float(x) for x in (data[:, 0] if getattr(data, "ndim", 1) > 1 else data)]
    return (flat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched media feature extraction (mapInPandas).

    With ``fake=False`` the REAL encoders run behind executor-side
    import-tries — PIL for images, soundfile for audio (neither is in
    this container; with the libs installed real features come out of
    the identical plan).  When the lib for a row's media_type is absent
    this raises the clearly-marked NotImplementedError stub.  ``fake=True``
    is the deterministic test path: a FEATURE_DIM-float vector derived
    from the md5 of the bytes — same schema/batching as the real
    encoders, feeding the similarity operators downstream.
    """

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, content, mtype in zip(
                pdf["media_id"], pdf["content"], pdf["media_type"]
            ):
                data = bytes(content)
                if fake:
                    digest = hashlib.md5(data).digest()
                    vec = [(b - 128) / 128.0 for b in digest[:FEATURE_DIM]]
                else:
                    if mtype == "image":
                        # stdlib decoders first: REAL, deterministic,
                        # dependency-free for BMP/PNM; PIL import-try
                        # covers the compressed formats
                        vec = _image_features_stdlib(data) or _real_image_features(data)
                    elif mtype == "audio":
                        vec = _real_audio_features(data)
                    else:
                        vec = None
                    if vec is None:
                        raise NotImplementedError(
                            f"no encoder available for media_type={mtype!r} "
                            "(PIL/soundfile not installed, or unsupported "
                            "exotic format; BMP/PNM/PNG/GIF/JPEG (baseline+progressive) images and "
                            "PCM WAV decode real without any lib); "
                            "use fake=True for the deterministic test encoder"
                        )
                norm4 = int(sum(x * x for x in vec) * 10000)
                rows.append({"media_id": int(media_id), "feature": vec, "feature_norm4": norm4})
            yield pd.DataFrame(rows, columns=["media_id", "feature", "feature_norm4"])

    return df.select("media_id", "content", "media_type").mapInPandas(run, FEATURE_SCHEMA)


def decode_frames(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched frame extraction via mapInPandas.

    Real decode would call an image/audio lib per blob; that lib is not
    available here, so fake=False raises (clearly-marked stub) and
    fake=True derives deterministic frame keys from the bytes —
    exercising the exact schema/batching/partitioning the real decoder
    would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode libs are not installed in this environment; "
                    "use fake=True for the deterministic test decoder"
                )
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                for i in range(0, max(len(data), 1), FRAME_SIZE):
                    chunk = data[i : i + FRAME_SIZE]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": i // FRAME_SIZE,
                            "frame_offset": i,
                            "frame_len": len(chunk),
                            "frame_key": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def _probe_header(data: bytes):
    """REAL, dependency-free media metadata decode from container/file
    headers — the resolution/sample-rate probe a pipeline runs to
    filter media BEFORE paying for full decode (e.g. drop images under
    256px, resample-flag audio != 16 kHz).  Pure byte parsing (struct
    offsets per the public PNG/JPEG/GIF/BMP/RIFF specs), so unlike the
    PIL/soundfile feature encoders this runs real in ANY environment.

    Returns (format, width, height, sample_rate, channels); unknown
    containers -> ("unknown", None, ...)."""
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h, None, None
    if data[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOF frame
        i = 2
        while i + 1 < len(data):
            if data[i] != 0xFF:
                break
            # ISO 10918-1 B.1.1.2: any number of 0xFF FILL bytes may
            # precede a marker — consume them, they carry no length
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers: no length field
                continue
            if i + 4 > len(data):
                break
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(data):
                    break  # SOF present but truncated before the dims
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h, None, None
            i += 2 + seg_len
        return "jpeg", None, None, None, None
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h, None, None
    if data[:2] == b"BM" and len(data) >= 26:
        # dispatch on the DIB header size: 12 = OS/2 BITMAPCOREHEADER
        # (uint16 dims), anything bigger = BITMAPINFOHEADER family
        # (int32 dims; height may be negative for top-down rows)
        dib = struct.unpack("<I", data[14:18])[0]
        if dib == 12:
            w, h = struct.unpack("<HH", data[18:22])
            return "bmp", w, h, None, None
        w, h = struct.unpack("<ii", data[18:26])
        return "bmp", w, abs(h), None, None
    if data[:2] in (b"P5", b"P6"):
        # netpbm binary formats — the shared header walk; dims only
        # (a probe-sized prefix may not carry the raster)
        tokens, _ = _pnm_tokens(data, 2)
        if len(tokens) == 2 and all(t.isdigit() for t in tokens):
            return "pnm", int(tokens[0]), int(tokens[1]), None, None
        return "pnm", None, None, None, None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        # walk the chunk list for 'fmt ' — spec-valid files may lead
        # with JUNK/LIST chunks, so fixed offsets 22/24 would read
        # padding as channels/rate
        i = 12
        while i + 8 <= len(data):
            cid = data[i : i + 4]
            clen = struct.unpack("<I", data[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 16 <= len(data):
                channels = struct.unpack("<H", data[i + 10 : i + 12])[0]
                rate = struct.unpack("<I", data[i + 12 : i + 16])[0]
                return "wav", None, None, rate, channels
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        return "wav", None, None, None, None
    if data[:4] == b"fLaC" and len(data) >= 22:
        # STREAMINFO is the mandatory first metadata block: 4-byte
        # block header, then 10 bytes to the packed rate/channels word
        # (20-bit sample rate, 3-bit channels-1)
        packed = struct.unpack(">I", data[18:22])[0]
        return "flac", None, None, packed >> 12, ((packed >> 9) & 7) + 1
    if (
        data[:4] == b"OggS"
        or data[:3] == b"ID3"
        or (len(data) >= 2 and data[0] == 0xFF and data[1] & 0xE0 == 0xE0)
    ):
        # perceptual-audio containers: REAL frame/page-level parse
        # (audio_containers.py) — only attempted behind a cheap magic /
        # sync gate so unknown blobs keep the O(1) fall-through
        from spark_binlog_spark.functions.audio_containers import probe as _aprobe

        m = _aprobe(data)
        if m is not None:
            return m["format"], None, None, m.get("sample_rate"), m.get("channels")
    return "unknown", None, None, None, None


def probe_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched header probe over the media table (mapInPandas) —
    same plumbing as the feature extractors, but the decode itself is
    REAL and dependency-free (see _probe_header).  Column pruning keeps
    non-content columns out of the Arrow transfer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                fmt, w, h, rate, ch = _probe_header(bytes(content))
                rows.append(
                    {
                        "media_id": int(media_id),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "sample_rate": rate,
                        "channels": ch,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(run, PROBE_SCHEMA)

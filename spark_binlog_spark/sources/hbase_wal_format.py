"""Dependency-free reader for the HBase ProtobufLogWriter WAL file
layout (VERDICT r10 ask #7 — the last in-sandbox semantic gap).

The reference consumes WAL files through the HBase client library
(``WALFactory.createReader``, hbase-wal/.../HBaseWALClient.scala:136)
and maps each ``WAL.Entry`` to row events
(HBaseWALClient.scala:157-203: key carries encoded region name, table
name, sequence id, write time; the edit's cells are grouped into
consecutive same-row same-type Put/Delete runs, meta-edit-family cells
skipped).  This module parses the same PUBLIC on-disk format without
any HBase dependency, the way the image/audio decoders parse their
public formats: protobuf wire primitives are implemented from the
public encoding spec, and the message/field layout follows HBase's
public ``WAL.proto`` + ``KeyValue`` serialization:

    file   := PB_WAL_MAGIC("PWAL") delimited(WALHeader) entry* trailer?
    entry  := delimited(WALKey) cell{WALKey.following_kv_count}
    cell   := int32 kv_len, int32 key_len, int32 val_len,
              key(int16 row_len, row, int8 fam_len, family, qualifier,
                  int64 ts, int8 type), value
    trailer:= WALTrailer bytes, int32 trailer_size,
              PB_WAL_COMPLETE_MAGIC("LAWP")

    WALKey fields: 1=encoded_region_name(bytes), 2=table_name(bytes),
    3=log_sequence_number(uint64), 4=write_time(uint64),
    7=following_kv_count(uint32); WALHeader fields:
    1=has_compression(bool), 4=writer_cls_name(string),
    5=cell_codec_cls_name(string).

Cell type bytes follow the public KeyValue.Type enum (Put=4, Delete=8,
DeleteColumn=12, DeleteFamily=14).  Compression (header field 1) is
refused, not mis-parsed.  A file truncated mid-entry (the live-tail
case — an active WAL is read while the regionserver appends; the
reference treats EOFException as "stop here", HBaseWALClient.scala:139)
yields every complete entry and stops cleanly.

``write_wal_file`` is the spec-correct writer the property battery
round-trips against — the same prove-by-construction method the
JPEG/FLAC decoders used (tests/test_properties.py).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

PB_WAL_MAGIC = b"PWAL"
PB_WAL_COMPLETE_MAGIC = b"LAWP"
METAFAMILY = b"METAFAMILY"  # WALEdit.METAFAMILY: region/compaction meta edits

# public KeyValue.Type bytes
TYPE_PUT = 4
TYPE_DELETE = 8
TYPE_DELETE_COLUMN = 12
TYPE_DELETE_FAMILY = 14
_DELETE_TYPES = frozenset({TYPE_DELETE, TYPE_DELETE_COLUMN, TYPE_DELETE_FAMILY})


# -- protobuf wire primitives (public encoding spec) ---------------------
def _write_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    """(value, next_index); raises ValueError on truncation/overlong."""
    n, shift = 0, 0
    while True:
        if i >= len(data):
            raise ValueError("varint truncated")
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _pb_field(field_no: int, wire_type: int, payload: bytes | int) -> bytes:
    tag = _write_varint((field_no << 3) | wire_type)
    if wire_type == 0:  # varint
        return tag + _write_varint(payload)
    if wire_type == 2:  # length-delimited
        return tag + _write_varint(len(payload)) + payload
    raise ValueError(f"unsupported wire type {wire_type}")


def _pb_parse(data: bytes) -> dict[int, list]:
    """Parse one message's fields -> {field_no: [values]}.  Varint
    fields yield ints, length-delimited yield bytes; fixed32/64 are
    consumed (skipped values kept as ints) so unknown fields in a real
    file don't break the walk — the protobuf forward-compat rule."""
    out: dict[int, list] = {}
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        field_no, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(data, i)
        elif wt == 2:
            ln, i = _read_varint(data, i)
            if i + ln > len(data):
                raise ValueError("length-delimited field truncated")
            v = data[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            if i + 4 > len(data):
                raise ValueError("fixed32 truncated")
            (v,) = struct.unpack_from("<I", data, i)
            i += 4
        elif wt == 1:  # fixed64
            if i + 8 > len(data):
                raise ValueError("fixed64 truncated")
            (v,) = struct.unpack_from("<Q", data, i)
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(field_no, []).append(v)
    return out


def _delimited(msg: bytes) -> bytes:
    return _write_varint(len(msg)) + msg


def _read_delimited(data: bytes, i: int) -> tuple[bytes, int]:
    ln, i = _read_varint(data, i)
    if i + ln > len(data):
        raise ValueError("delimited message truncated")
    return data[i : i + ln], i + ln


# -- cells ----------------------------------------------------------------
# NamedTuples, not frozen dataclasses (r14): a frozen dataclass pays an
# object.__setattr__ per field on EVERY construction, and the WAL parse
# builds one WalCell per KeyValue — 30M at the sf10 rung.  Tuple
# construction is ~4x cheaper; the API (positional/keyword init,
# attribute reads, immutability, is_delete) is unchanged.
class WalCell(NamedTuple):
    row: bytes
    family: bytes
    qualifier: bytes
    ts: int
    type_byte: int
    value: bytes

    @property
    def is_delete(self) -> bool:
        return self.type_byte in _DELETE_TYPES


class WalEntry(NamedTuple):
    region: bytes
    table: bytes
    seqnum: int
    write_time: int
    cells: tuple[WalCell, ...]


def _encode_cell(c: WalCell) -> bytes:
    key = (
        struct.pack(">H", len(c.row))
        + c.row
        + struct.pack(">B", len(c.family))
        + c.family
        + c.qualifier
        + struct.pack(">qB", c.ts, c.type_byte)
    )
    return struct.pack(">iii", 8 + len(key) + len(c.value), len(key), len(c.value)) + key + c.value


def _decode_cell(data: bytes, i: int) -> tuple[WalCell, int]:
    if i + 12 > len(data):
        raise ValueError("cell header truncated")
    kv_len, key_len, val_len = struct.unpack_from(">iii", data, i)
    if kv_len != 8 + key_len + val_len or key_len < 12 or val_len < 0:
        raise ValueError("cell length fields inconsistent")
    i += 12
    if i + key_len + val_len > len(data):
        raise ValueError("cell body truncated")
    key = data[i : i + key_len]
    value = data[i + key_len : i + key_len + val_len]
    i += key_len + val_len
    (row_len,) = struct.unpack_from(">H", key, 0)
    j = 2 + row_len
    if j + 1 > key_len:
        raise ValueError("cell row overruns key")
    row = key[2:j]
    fam_len = key[j]
    j += 1
    if j + fam_len + 9 > key_len:
        raise ValueError("cell family overruns key")
    family = key[j : j + fam_len]
    j += fam_len
    qualifier = key[j : key_len - 9]
    ts, type_byte = struct.unpack_from(">qB", key, key_len - 9)
    return WalCell(row, family, qualifier, ts, type_byte, value), i


# -- file write (the spec-correct test writer) -----------------------------
def write_wal_file(entries: list[WalEntry], with_trailer: bool = True) -> bytes:
    """Serialize entries in the ProtobufLogWriter layout.  The trailer
    is optional because an ACTIVE (still-appended) WAL has none — the
    reader must handle both (the reference's live-tail case)."""
    out = bytearray(PB_WAL_MAGIC)
    header = _pb_field(1, 0, 0) + _pb_field(
        4, 2, b"org.apache.hadoop.hbase.regionserver.wal.ProtobufLogWriter"
    )
    out += _delimited(header)
    for e in entries:
        key = (
            _pb_field(1, 2, e.region)
            + _pb_field(2, 2, e.table)
            + _pb_field(3, 0, e.seqnum)
            + _pb_field(4, 0, e.write_time)
            + _pb_field(7, 0, len(e.cells))
        )
        out += _delimited(key)
        for c in e.cells:
            out += _encode_cell(c)
    if with_trailer:
        trailer = b""  # WALTrailer has no required fields
        out += trailer + struct.pack(">i", len(trailer)) + PB_WAL_COMPLETE_MAGIC
    return bytes(out)


def read_wal_file(data: bytes) -> list[WalEntry]:
    """Parse a WAL file; a file truncated mid-entry (live tail) yields
    every COMPLETE entry and stops — the EOFException-as-done contract
    (HBaseWALClient.scala:139).  A corrupt header/magic or a compressed
    file raises ValueError (mis-parsing compressed cells would yield
    garbage rows, the one failure worse than failing)."""
    if data[:4] != PB_WAL_MAGIC:
        raise ValueError("not a PWAL file (bad magic)")
    header, i = _read_delimited(data, 4)
    h = _pb_parse(header)
    if h.get(1, [0])[0]:
        raise ValueError("compressed WAL not supported (WALHeader.has_compression)")
    # strip the trailer (if complete) so entry parsing never walks into it
    end = len(data)
    if len(data) >= 8 and data[-4:] == PB_WAL_COMPLETE_MAGIC:
        (tsize,) = struct.unpack_from(">i", data, len(data) - 8)
        if 0 <= tsize <= len(data) - 8:
            end = len(data) - 8 - tsize
    entries: list[WalEntry] = []
    while i < end:
        try:
            key_bytes, j = _read_delimited(data, i)
            k = _pb_parse(key_bytes)
            region = k[1][0]
            table = k[2][0]
            seqnum = k[3][0]
            write_time = k[4][0]
            n_cells = k.get(7, [0])[0]
            cells = []
            for _ in range(n_cells):
                c, j = _decode_cell(data, j)
                cells.append(c)
        except (ValueError, KeyError, IndexError, struct.error):
            break  # truncated tail of an active WAL: done, keep completes
        entries.append(WalEntry(region, table, seqnum, write_time, tuple(cells)))
        i = j
    return entries


# -- event mapping (reference parity: HBaseWALClient.scala:157-203) --------
def entries_to_events(entries: list[WalEntry]) -> list[dict]:
    """Group each entry's cells into consecutive same-row same-kind
    Put/Delete runs — one event per run, exactly the reference's
    ``map(entry, collectEvt)`` loop: a new event starts when the row
    OR the put/delete kind changes; meta-edit-family cells are skipped
    (``WALEdit.isMetaEditFamily``).  Event dicts carry the offset pair
    (region, seqnum) the region-mode stream indexes."""
    events: list[dict] = []
    for e in entries:
        run_cells: list[WalCell] = []
        run_row = b""
        run_del = False
        for c in e.cells:
            if c.family == METAFAMILY:
                continue
            is_del = c.type_byte in _DELETE_TYPES
            if run_cells and (c.row != run_row or is_del != run_del):
                events.append(
                    {
                        "op": "delete" if run_del else "put",
                        "row": run_row,
                        "region": e.region,
                        "table": e.table,
                        "seqnum": e.seqnum,
                        "write_time": e.write_time,
                        "cells": tuple(run_cells),
                    }
                )
                run_cells = []
            if not run_cells:
                run_row, run_del = c.row, is_del
            run_cells.append(c)
        if run_cells:
            events.append(
                {
                    "op": "delete" if run_del else "put",
                    "row": run_row,
                    "region": e.region,
                    "table": e.table,
                    "seqnum": e.seqnum,
                    "write_time": e.write_time,
                    "cells": tuple(run_cells),
                }
            )
    return events


def pump_wal_files(wal_blobs: list[bytes], ingestor) -> int:
    """Feed parsed WAL binaries into a ``RegionWalIngestor``-shaped
    sink (sources/live_client.py): one row event per put/delete run,
    mapped onto the fixture's demo-table contract the same way
    ``pump`` maps binlog row images — row bytes are the integer pk,
    the first non-meta cell's value column carries ``value``.
    Returns the number of row events ingested; flushes before return.
    """
    n = 0
    for blob in wal_blobs:
        for ev in entries_to_events(read_wal_file(blob)):
            op = "delete" if ev["op"] == "delete" else "insert"
            val_cell = next((c for c in ev["cells"] if c.qualifier == b"value"), None)
            val = float(val_cell.value) if val_cell is not None and val_cell.value else None
            ingestor.on_row_event(
                op,
                ev["write_time"] // 1000,  # HBase write_time is epoch millis
                int(ev["row"]),
                val,
            )
            n += 1
    ingestor.flush()
    return n

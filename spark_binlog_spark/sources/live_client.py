"""Live binlog-connector seam: where a REAL wire client drops in.

The fixture source (binlog_fixture.py) tails a rotating-segment parquet
event store with the reference's exact offset protocol (packed
``fileId * 10^13 + pos`` offsets over ``mysql-bin.%06d`` files).  This
module is the documented boundary between that store and a live MySQL
server: ``LiveBinlogIngestor`` is a connector-agnostic event listener
that publishes the SAME segment layout the stream reader already scans,
so everything Spark-side — offsets, checkpoint recovery, schema epochs,
the envelope wire format, purged-binlog failfast — is IDENTICAL between
fixture replay and live tailing.  The reference couples these concerns
inside one executor-held socket server (BinLogSocketServerInExecutor
.scala:277-302 runs the BinaryLogClient loop and serves consumers over
RPC; MLSQLBinLogDataSource.scala:76-98 probes ``show master status`` at
connect); splitting ingest (this module) from serving (the DataSource)
removes the single-reader bottleneck and the custom RPC layer — any
number of Spark tasks range-read the store in parallel.

Connector interface (the ``pump`` contract) follows the public
python-mysql-replication package's ``BinLogStreamReader``: an ITERATOR
of event objects where a rotate event carries ``next_binlog`` (the next
binlog file name) and row events carry ``timestamp`` (epoch seconds),
``rows`` (list of row dicts), and an operation discriminator.  Any
client matching that shape — including a JVM mysql-binlog-connector
bridge — plugs in unchanged; tests fake it with scripted events
(tests/test_live_client.py), which proves the offset/envelope contract
end-to-end without a live server.

``connect_live`` is import-gated on ``pymysqlreplication`` (not in this
container — same gating pattern as streaming/delta_sink.py and the PIL
decode path).
"""

from __future__ import annotations

import os
import re

# op -> fixture event_type such that binlog_fixture.OP_MAP round-trips
# it back to the same op on the wire (OP_MAP: signup->insert,
# error->delete, else update)
_OP_TO_EVENT_TYPE = {"insert": "signup", "delete": "error", "update": "update"}


def _file_seq(binlog_name: str) -> int:
    """'mysql-bin.000007' -> 7 (the reference derives file ids from the
    rotate event's next-binlog name the same way)."""
    m = re.search(r"\.(\d{6})$", binlog_name)
    if not m:
        raise ValueError(f"not a rotation-family binlog name: {binlog_name!r}")
    return int(m.group(1))


class LiveBinlogIngestor:
    """Publishes connector events as the fixture store's segment layout.

    One instance owns one store directory (the serial binlog-writer
    role — mirroring the single upstream MySQL server; Spark-side reads
    of the store stay fully parallel).  Events are buffered per active
    segment and published by ``flush()`` as ``<prefix>.%06d`` via
    write-aside + atomic rename — exactly ``write_segments``'s publish
    protocol, so a live stream tailing the directory never sees a
    half-written file.  The active segment may be re-published as it
    grows (the footer cache keys on size+mtime); rotated segments are
    immutable.

    Event ids are a dense monotone sequence (the store's global
    sequence the packed offsets index); on resume the sequence and the
    active file id are recovered from the store itself, so a restarted
    ingestor continues exactly where the previous one stopped — the
    same recovery contract the reader's checkpoints assume.
    """

    def __init__(self, dest_dir: str, prefix: str = "mysql-bin"):
        import pyarrow as pa  # noqa: F401  (validated early: executor dep)

        self.dest_dir = dest_dir
        self.prefix = prefix
        os.makedirs(dest_dir, exist_ok=True)
        self._buf: list[tuple[int, int, int, str, float, str | None]] = []
        self._fid = 1
        self._next_eid = 0
        # True iff _buf holds rows NOT yet durably published (fresh
        # on_row_event rows since the last flush).  Rows reloaded by
        # _resume came FROM a published segment, so they don't count —
        # this is what lets the connector's connect-time RotateEvent
        # (which names the CURRENT binlog on every connect) pass as a
        # no-op after a restart (ADVICE r10).
        self._unpublished = False
        self._resume()

    # -- store recovery ------------------------------------------------
    def _resume(self) -> None:
        from spark_binlog_spark.sources.binlog_fixture import (
            _segment_index,
            is_segmented,
        )

        if not is_segmented(self.dest_dir):
            return
        index = _segment_index(self.dest_dir, prefix=self.prefix)
        last = index[-1]
        self._fid = last["fid"]
        self._next_eid = last["max"] + 1
        # the active (last) segment keeps growing: reload its rows so a
        # re-publish carries them forward
        import pyarrow.parquet as pq

        tbl = pq.read_table(last["path"])
        self._buf = list(
            zip(
                tbl.column("event_id").to_pylist(),
                tbl.column("ts").cast("int64").to_pylist(),
                tbl.column("user_id").to_pylist(),
                tbl.column("event_type").to_pylist(),
                tbl.column("value").to_pylist(),
                tbl.column("props").to_pylist(),
            )
        )

    # -- listener surface (what a connector client calls) ---------------
    def on_rotate(self, next_binlog: str) -> None:
        """Rotate event: publish the finished segment, open the next.
        The new file id comes from the server's next-binlog NAME (never
        a local counter) so the store's rotation family matches the
        server's — a resumed client mid-family lands on the right id."""
        nxt = _file_seq(next_binlog)
        if nxt == self._fid and not self._unpublished:
            # the connector's connect-time announcement of the ACTIVE
            # file (python-mysql-replication emits RotateEvent first on
            # every connect, naming the current binlog).  Everything
            # buffered is already durably published — either reloaded
            # by _resume from the published active segment, or written
            # by a prior flush — so this is a no-op; the buffer is KEPT
            # so the next re-publish of the growing segment carries its
            # rows forward (ADVICE r10: resume + reconnect contract).
            return
        self.flush()
        # a published segment at the current id pins the floor: the
        # next file must strictly advance.  nxt == fid with FRESH rows
        # buffered means the server re-announced a file we already
        # appended new events to — non-monotone, same as nxt < fid.
        if nxt <= self._fid:
            raise ValueError(
                f"rotate to file {nxt} behind active file {self._fid} "
                "— a non-monotone rotation would corrupt the offset index"
            )
        self._fid = nxt
        self._buf = []
        self._unpublished = False

    def on_row_event(
        self,
        op: str,
        timestamp: int,
        user_id: int,
        value: float | None = None,
        props: str | None = None,
    ) -> int:
        """One row-image event (the connector's Write/Update/DeleteRows
        unpacked to the store's row schema).  Returns the assigned
        global event id (what the packed offsets index)."""
        et = _OP_TO_EVENT_TYPE.get(op)
        if et is None:
            raise ValueError(f"unknown row op {op!r} (insert/update/delete)")
        eid = self._next_eid
        self._next_eid += 1
        self._buf.append(
            (eid, int(timestamp) * 1_000_000_000, int(user_id), et,
             float(value) if value is not None else None, props)
        )
        self._unpublished = True
        return eid

    # -- publish --------------------------------------------------------
    def flush(self) -> str | None:
        """Publish the active segment (all rows so far) atomically;
        returns the published path, or None when the buffer is empty
        (an empty segment is never published — the reader's index
        skips stat-less files, and MySQL never rotates an empty log
        into the sequence either)."""
        if not self._buf:
            return None
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = self._buf
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        final = os.path.join(self.dest_dir, f"{self.prefix}.{self._fid:06d}")
        tmp = final + ".inprogress"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        self._unpublished = False  # everything buffered is now durable
        return final


class RegionWalIngestor:
    """Region-mode (HBase rolled-WAL, S2) analogue of
    ``LiveBinlogIngestor``: routes each row event to its owning region
    (``user_id % n_regions`` — the source's region-ownership rule) and
    publishes ``dest/region=K/<prefix>.%06d``, the exact layout the
    region-mode stream reader tails.  Mirrors a live WAL reader's
    semantics:

    - ONE global event-id sequence shared across regions (region
      offsets index the shared sequence — binlog_fixture's region
      offset rule);
    - ``on_roll`` rolls EVERY region at once (time-triggered WAL rolls
      hit all regionservers at about the same log point), publishing
      an EMPTY file for a quiet region — the reader's file-id
      contiguity check counts empty rolls as present;
    - resume recovers the sequence, the active file id, and each
      region's active rows from the store itself.
    """

    def __init__(self, dest_dir: str, n_regions: int, prefix: str = "wal"):
        self.dest_dir = dest_dir
        self.n_regions = n_regions
        self.prefix = prefix
        self._fid = 1
        self._next_eid = 0
        self._buf: dict[int, list] = {r: [] for r in range(n_regions)}
        for r in range(n_regions):
            os.makedirs(os.path.join(dest_dir, f"region={r}"), exist_ok=True)
        self._resume()

    def _region_dir(self, r: int) -> str:
        return os.path.join(self.dest_dir, f"region={r}")

    def _resume(self) -> None:
        import pyarrow.parquet as pq

        last_fid, max_eid = 0, -1
        for r in range(self.n_regions):
            for name in os.listdir(self._region_dir(r)):
                m = re.match(re.escape(self.prefix) + r"\.(\d{6})$", name)
                if m:
                    last_fid = max(last_fid, int(m.group(1)))
        if last_fid == 0:
            return
        self._fid = last_fid
        for r in range(self.n_regions):
            fp = os.path.join(self._region_dir(r), f"{self.prefix}.{last_fid:06d}")
            if not os.path.exists(fp):
                continue
            tbl = pq.read_table(fp)
            rows = list(
                zip(
                    tbl.column("event_id").to_pylist(),
                    tbl.column("ts").cast("int64").to_pylist(),
                    tbl.column("user_id").to_pylist(),
                    tbl.column("event_type").to_pylist(),
                    tbl.column("value").to_pylist(),
                    tbl.column("props").to_pylist(),
                )
            )
            self._buf[r] = rows
            if rows:
                max_eid = max(max_eid, max(x[0] for x in rows))
        # rolled (non-active) files also bound the sequence
        from spark_binlog_spark.sources.binlog_fixture import _region_segment_index

        for r in range(self.n_regions):
            try:
                for seg in _region_segment_index(self._region_dir(r)):
                    max_eid = max(max_eid, seg["max"])
            except ValueError:
                pass  # region with only empty files: no spans
        self._next_eid = max_eid + 1

    def on_row_event(
        self,
        op: str,
        timestamp: int,
        user_id: int,
        value: float | None = None,
        props: str | None = None,
    ) -> int:
        et = _OP_TO_EVENT_TYPE.get(op)
        if et is None:
            raise ValueError(f"unknown row op {op!r} (insert/update/delete)")
        eid = self._next_eid
        self._next_eid += 1
        self._buf[int(user_id) % self.n_regions].append(
            (eid, int(timestamp) * 1_000_000_000, int(user_id), et,
             float(value) if value is not None else None, props)
        )
        return eid

    def flush(self) -> None:
        """Publish every region's active segment (atomic rename).
        Quiet regions publish EMPTY files: presence is load-bearing for
        the reader's file-id contiguity failfast."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        for r in range(self.n_regions):
            rows = self._buf[r]
            tbl = pa.table(
                {
                    "event_id": pa.array([x[0] for x in rows], pa.int64()),
                    "ts": pa.array([x[1] for x in rows], pa.timestamp("ns")),
                    "user_id": pa.array([x[2] for x in rows], pa.int64()),
                    "event_type": pa.array([x[3] for x in rows], pa.string()),
                    "value": pa.array([x[4] for x in rows], pa.float64()),
                    "props": pa.array([x[5] for x in rows], pa.string()),
                }
            )
            final = os.path.join(self._region_dir(r), f"{self.prefix}.{self._fid:06d}")
            tmp = final + ".inprogress"
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)

    def on_roll(self) -> None:
        """Time-triggered roll: publish all active segments, open the
        next file id in every region."""
        self.flush()
        self._fid += 1
        self._buf = {r: [] for r in range(self.n_regions)}


def pump(stream, ingestor: LiveBinlogIngestor, max_events: int | None = None) -> int:
    """Drain a python-mysql-replication-style event iterator into the
    store.  Duck-typed on the public package's event classes:

    - rotate: the event has a ``next_binlog`` attribute (RotateEvent)
    - rows: the event has ``rows`` (list of dicts) + ``timestamp``
      (epoch seconds); the op is taken from an explicit ``op``
      attribute if present, else from the class name
      (WriteRows/UpdateRows/DeleteRows — the package's names)

    Row dicts use the package's shape: insert/delete carry ``values``,
    update carries ``after_values``.  Only ``id``-keyed long rows map
    onto the fixture's pk today (the demo table contract); a production
    mapping would route per-table columns through the schema registry.
    Returns the number of ROW events ingested; flushes before return so
    a tailing reader sees everything pumped.
    """
    n = 0
    for ev in stream:
        nxt = getattr(ev, "next_binlog", None)
        if nxt is not None:
            ingestor.on_rotate(nxt)
            continue
        rows = getattr(ev, "rows", None)
        if rows is None:
            continue  # format/xid/etc. events carry no row images
        op = getattr(ev, "op", None)
        if op is None:
            cls = type(ev).__name__.lower()
            op = ("insert" if "write" in cls else
                  "delete" if "delete" in cls else "update")
        for row in rows:
            vals = row.get("after_values", row.get("values", {}))
            ingestor.on_row_event(
                op,
                ev.timestamp,
                vals["id"],
                vals.get("value"),
                vals.get("props"),
            )
            n += 1
            if max_events is not None and n >= max_events:
                ingestor.flush()
                return n
    ingestor.flush()
    return n


def connect_live(dest_dir: str, *, host: str, port: int = 3306, user: str,
                 password: str, server_id: int = 1, prefix: str = "mysql-bin",
                 **kwargs) -> int:
    """Tail a REAL MySQL server into the store (import-gated: needs the
    public ``pymysqlreplication`` package, not in this container).
    Blocks pumping events until the stream closes; the fixture
    DataSource serves Spark from ``dest_dir`` concurrently."""
    try:
        from pymysqlreplication import BinLogStreamReader
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "live binlog tailing needs the 'pymysqlreplication' package "
            "(pip install mysql-replication); in environments without it "
            "use the fixture store + LiveBinlogIngestor/pump with your "
            "own connector bridge"
        ) from e
    stream = BinLogStreamReader(  # pragma: no cover - needs a live server
        connection_settings={"host": host, "port": port, "user": user,
                             "passwd": password},
        server_id=server_id, blocking=True, resume_stream=True, **kwargs,
    )
    try:  # pragma: no cover
        return pump(stream, LiveBinlogIngestor(dest_dir, prefix=prefix))
    finally:  # pragma: no cover
        stream.close()

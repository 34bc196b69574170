"""Binlog offset algebra (reference: mysql-binlog protocols.scala:6-26).

The reference packs a MySQL binlog position into one monotonic long:
``offset = fileId * 10^13 + filePos`` (string-concat of fileId with the
13-digit zero-padded position), and derives binlog file names as
``<prefix>.%06d``.  Pure functions here; columnar equivalents in
``operators/offset_ops.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from spark_binlog_spark import POW13


@dataclass(frozen=True, order=True)
class BinlogOffset:
    """Composite (file_id, pos) offset — protocols.scala:6-13."""

    file_id: int
    pos: int

    def to_long(self) -> int:
        # protocols.scala:24-26 — fileId concat %013d pos
        if self.pos >= POW13:
            raise ValueError(f"pos {self.pos} overflows 13-digit packing")
        return self.file_id * POW13 + self.pos

    @staticmethod
    def from_long(offset: int) -> "BinlogOffset":
        # protocols.scala:7-13 — inverse split (length >= 14 asserted by
        # MLSQLBinLogDataSource.scala:102-107)
        if offset < POW13:
            raise ValueError(f"offset {offset} too short to carry a file id")
        return BinlogOffset(offset // POW13, offset % POW13)

    def file_name(self, prefix: str = "mysql-bin") -> str:
        # protocols.scala:15-17 — "%s.%06d"
        return f"{prefix}.{self.file_id:06d}"

    @staticmethod
    def from_file_name(name: str) -> int:
        # protocols.scala:19-21 — split on '.', int of suffix
        return int(name.rsplit(".", 1)[1])

"""spark_binlog_spark — a PySpark-native CDC/analytics engine.

Re-implements the query and data-processing capabilities of
allwefantasy/spark-binlog (reference at /root/reference) as idiomatic
PySpark: the binlog/WAL change-event dataflow (envelope encode/parse,
table/event filters, row flatten, offset algebra, latest-image, CDC
apply) plus the large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns).

Design: DataFrame/SQL first — every operator is a Catalyst logical
plan, not an imperative loop; the reference's socket/server plumbing
(its X1-X3 operators) is deleted outright because Spark's DataSource
API already provides partitioned, replayable scans.
"""

__version__ = "0.1.0"

POW13 = 10_000_000_000_000  # BinlogOffset packing base (protocols.scala:24-26)

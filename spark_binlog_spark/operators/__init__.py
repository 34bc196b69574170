from spark_binlog_spark.operators.filters import event_type_filter, table_pattern_filter
from spark_binlog_spark.operators.images import cdc_apply, latest_image, scd2_history
from spark_binlog_spark.operators.offset_ops import (
    max_offset_per_key,
    monotonic_dedup,
    offset_range,
    pack_offset,
    partition_ranges,
    unpack_offset,
)
from spark_binlog_spark.operators.rollup import cell_run_rollup

__all__ = [
    "table_pattern_filter",
    "event_type_filter",
    "latest_image",
    "cdc_apply",
    "scd2_history",
    "pack_offset",
    "unpack_offset",
    "offset_range",
    "max_offset_per_key",
    "monotonic_dedup",
    "partition_ranges",
    "cell_run_rollup",
]

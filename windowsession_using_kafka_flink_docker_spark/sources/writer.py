"""Compaction-aware partitioned parquet writer — the small-files defense.

A naive ``df.write.partitionBy(cols)`` emits one file per (task x partition
value): at 100 TB with thousands of tasks and values, that is millions of
KB-sized files, and every later scan pays listing + open overhead per file
(the classic small-files problem). This writer:

1. hash-repartitions on the partition columns first, so each partition
   value's rows converge to ONE task -> one file per value;
2. caps oversized values with ``maxRecordsPerFile`` derived from a
   target file size and the plan's estimated bytes/row, so a hot partition
   value splits into ~target-sized files instead of one huge file.

The bytes/row estimate comes from Catalyst's in-memory stats; parquet
encoding + compression typically shrinks that 2-5x, so files land under
the target — the failure mode is "somewhat smaller than target", never
"unsplittable giant".
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      target_file_mb: int = 128, mode: str = "overwrite") -> int:
    """Write ``df`` partitioned by ``partition_cols`` with one
    ~target-sized file per partition value (oversized values split).
    Returns the ``maxRecordsPerFile`` used (0 = uncapped)."""
    n_rows = df.count()
    max_records = 0
    if n_rows > 0:
        est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        bytes_per_row = max(1, est_bytes // n_rows)
        max_records = max(1, math.ceil(target_file_mb * 1024 * 1024 / bytes_per_row))
    writer = (
        df.repartition(*[df[c] for c in partition_cols])
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records)
        .partitionBy(*partition_cols)
    )
    writer.parquet(path)
    return max_records

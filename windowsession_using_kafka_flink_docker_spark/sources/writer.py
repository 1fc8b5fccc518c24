"""Compaction-aware partitioned parquet writer — the small-files defense.

A naive ``df.write.partitionBy(cols)`` emits one file per (task x partition
value): at 100 TB with thousands of tasks and values, that is millions of
KB-sized files, and every later scan pays listing + open overhead per file
(the classic small-files problem). This writer:

1. hash-repartitions on (partition columns, salt), where the salt fans a
   partition value out over ``ceil(value_rows / rows_per_file)`` writer
   tasks — small values converge to ONE task -> one file, while a hot
   value writes its ~target-sized files IN PARALLEL instead of serially
   through a single task;
2. caps per-file size with ``maxRecordsPerFile`` as the backstop, so even
   estimate error never produces an unsplittable giant.

The salt is a deterministic function of the row content (pmod of xxhash64
— never rand(), the SPARK-23207 retry-correctness rule), so stage retries
reproduce identical file assignments.

The bytes/row estimate comes from Catalyst's in-memory stats via a private
API, guarded with a conservative fallback (the API moves across Spark
versions and is absent under Spark Connect). Parquet encoding +
compression typically shrinks the estimate 2-5x, so files land under the
target — the failure mode is "somewhat smaller than target", never
"unsplittable giant".
"""

from __future__ import annotations

import functools
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bytes/row assumed when Catalyst stats are unavailable (private-API
#: fallback); deliberately small -> more, smaller files, never giants.
FALLBACK_BYTES_PER_ROW = 256


def _bytes_per_row(df: DataFrame, n_rows: int) -> int:
    try:
        est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return max(1, est_bytes // n_rows)
    except Exception:  # private API moved / Spark Connect
        return FALLBACK_BYTES_PER_ROW


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      target_file_mb: int = 128, mode: str = "overwrite",
                      rows_per_file: int | None = None) -> int:
    """Write ``df`` partitioned by ``partition_cols`` with ~target-sized
    files; a value bigger than one target file writes its files in
    parallel across ``ceil(rows / rows_per_file)`` tasks. Returns the
    ``maxRecordsPerFile`` used (0 = uncapped). ``rows_per_file`` overrides
    the size-based estimate when the caller knows the row weight.

    One aggregation pass computes the per-value row counts AND the total
    (no separate ``df.count()``); ``df`` is persisted across the stats
    pass and the write so the input is scanned from cache, not twice.
    """
    df = df.persist()
    try:
        counts = df.groupBy(*partition_cols).count().collect()
        n_rows = sum(r["count"] for r in counts)
        if n_rows == 0:
            df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
            return 0
        if rows_per_file is not None:
            max_records = rows_per_file
        else:
            bpr = _bytes_per_row(df, n_rows)
            max_records = max(1, math.ceil(target_file_mb * 1024 * 1024 / bpr))

        # Salt only the hot values (counts is small: one row per partition
        # value). n_splits == 1 for everything else keeps the one-file-per-
        # value convergence.
        n_splits = F.lit(1)
        total_splits = 0
        for r in counts:
            splits = math.ceil(r["count"] / max_records)
            total_splits += splits
            if splits > 1:
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [df[c].eqNullSafe(F.lit(r[c])) for c in partition_cols],
                )
                n_splits = F.when(cond, F.lit(splits)).otherwise(n_splits)
        salt = F.pmod(F.xxhash64(*[df[c] for c in df.columns]), n_splits)

        (
            # Explicit partition count = desired file count: AQE would
            # otherwise coalesce the salted shuffle back into few tasks
            # (its advisory sizing knows nothing about the per-VALUE file
            # convergence this writer exists for), serializing the hot
            # value's files through one writer again.
            df.withColumn("_salt", salt)
            .repartition(total_splits, *[F.col(c) for c in partition_cols],
                         F.col("_salt"))
            .drop("_salt")
            .write.mode(mode)
            .option("maxRecordsPerFile", max_records)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        return max_records
    finally:
        df.unpersist()

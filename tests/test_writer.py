"""Compaction-aware writes: one file per partition value (vs the naive
task x value explosion), oversized values split, lossless round-trip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
from windowsession_using_kafka_flink_docker_spark.sources.writer import write_partitioned


def _parquet_files(root):
    return glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)


def test_one_file_per_partition_value(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").repartition(32)  # worst-case input
    out = str(tmp_path / "compacted")
    write_partitioned(ev, out, ["event_type"], target_file_mb=128)

    n_types = ev.select("event_type").distinct().count()
    files = _parquet_files(out)
    assert len(files) == n_types  # exactly one file per value at this size

    naive = str(tmp_path / "naive")
    ev.write.partitionBy("event_type").parquet(naive)
    assert len(_parquet_files(naive)) > len(files)  # the explosion this avoids

    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    want = sorted(str(r) for r in ev.select(sorted(ev.columns)).collect())
    back = sorted(str(r) for r in got.select(sorted(got.columns)).collect())
    assert back == want


def test_oversized_partition_value_splits(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "tiny_target")
    # absurdly small target -> every value must split into multiple files
    max_records = write_partitioned(ev, out, ["event_type"], target_file_mb=0)
    assert max_records == 1 or max_records > 0
    n_types = ev.select("event_type").distinct().count()
    assert len(_parquet_files(out)) > n_types
    assert spark.read.parquet(out).count() == ev.count()


def test_hot_value_writes_in_parallel(spark, tmp_path):
    """A value 10x the per-file target must fan out over multiple WRITER
    TASKS (salted repartition), not write its files serially through one
    task — the part-file task index in the filename is the witness. Small
    values must still converge to exactly one file."""
    rows = [("hot", i, float(i)) for i in range(1000)] + \
           [("cold", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type STRING, k LONG, v DOUBLE") \
              .repartition(32)  # worst-case input layout
    out = str(tmp_path / "salted")
    write_partitioned(df, out, ["event_type"], rows_per_file=100)

    hot_files = _parquet_files(os.path.join(out, "event_type=hot"))
    cold_files = _parquet_files(os.path.join(out, "event_type=cold"))
    assert len(cold_files) == 1
    assert len(hot_files) >= 5  # ~1000/100 target-sized files
    # distinct part-XXXXX task indices == files written by distinct tasks
    task_ids = {os.path.basename(f).split("-")[1] for f in hot_files}
    assert len(task_ids) >= 2, f"hot value wrote serially: {sorted(task_ids)}"

    got = spark.read.parquet(out)
    assert got.count() == 1010
    assert got.groupBy().sum("v").collect()[0][0] == sum(float(i) for i in range(1000)) + sum(float(i) for i in range(10))


def test_writer_stats_fallback():
    """The Catalyst-stats probe is a private API (absent under Spark
    Connect, mobile across versions); a frame without it must fall back to
    the conservative bytes/row default, not crash."""
    import windowsession_using_kafka_flink_docker_spark.sources.writer as W

    class Broken:
        @property
        def _jdf(self):
            raise RuntimeError("no private API here")

    assert W._bytes_per_row(Broken(), 100) == W.FALLBACK_BYTES_PER_ROW


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """The point of a partitioned layout at 100 TB: a filter on the
    partition column must prune at the SCAN (PartitionFilters), reading
    one directory instead of the table. Regression-locks the layout the
    writer produces against Spark's pruning machinery."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "pruned")
    write_partitioned(ev, out, ["event_type"], target_file_mb=128)
    back = spark.read.parquet(out)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = (back.where(F.col("event_type") == "purchase")
            ._jdf.queryExecution().explainString(jmode))
    pruned = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pruned and "event_type" in pruned[0], plan
    # and the pruned scan must read only the purchase directory's rows
    n_purchase = ev.where("event_type = 'purchase'").count()
    assert back.where("event_type = 'purchase'").count() == n_purchase

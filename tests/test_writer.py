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

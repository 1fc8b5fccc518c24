"""Z-order layout: the locality claim is MEASURED from parquet row-group
statistics — a z-ordered layout must let min/max pruning skip row groups
for predicates on BOTH dimensions, where a single-column sort skips on one
dimension only."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from windowsession_using_kafka_flink_docker_spark.sources.batch import load_table
from windowsession_using_kafka_flink_docker_spark.sources.zorder import write_zordered


def _rowgroup_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` for every row group across the files."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(idx).statistics
            out.append((stats.min, stats.max))
    return out


def _prunable_fraction(ranges: list[tuple], point) -> float:
    """Fraction of row groups whose [min,max] excludes ``point`` — the
    groups a stats-based reader skips for an equality predicate."""
    skipped = sum(1 for lo, hi in ranges if not (lo <= point <= hi))
    return skipped / len(ranges)


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_seconds("ts").alias("epoch"), "value")
    )
    zpath = str(tmp_path / "zordered")
    upath = str(tmp_path / "user_sorted")
    write_zordered(ev, zpath, "user_id", "epoch", bits=8, n_files=8)
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(upath)
    )

    mid_user = ev.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    mid_epoch = int(ev.agg(F.expr("percentile(epoch, 0.5)")).collect()[0][0])

    # both layouts must return identical data (layout is not semantics)
    assert (spark.read.parquet(zpath).count()
            == spark.read.parquet(upath).count() == ev.count())

    z_user = _prunable_fraction(_rowgroup_ranges(zpath, "user_id"), mid_user)
    z_time = _prunable_fraction(_rowgroup_ranges(zpath, "epoch"), mid_epoch)
    u_user = _prunable_fraction(_rowgroup_ranges(upath, "user_id"), mid_user)
    u_time = _prunable_fraction(_rowgroup_ranges(upath, "epoch"), mid_epoch)

    # single-column sort: excellent on its own column, useless on the other
    assert u_user >= 0.5
    assert u_time == 0.0
    # z-order: must skip meaningfully on BOTH dimensions...
    assert z_user >= 0.25, (z_user, z_time)
    assert z_time >= 0.25, (z_user, z_time)
    # ...and strictly beat the single-column layout on the second one
    assert z_time > u_time

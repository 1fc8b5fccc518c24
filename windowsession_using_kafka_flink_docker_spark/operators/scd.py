"""Slowly-changing-dimension (SCD type 2) upsert — the lakehouse MERGE
pattern expressed as pure joins, with no table-format dependency.

The reference has no storage layer at all; a production deployment of its
session analytics needs dimension maintenance (customer tiers drive the
dynamic gap), and at 100 TB the standard shape is: periodic change batches
merged into a versioned dimension where updated rows are *expired* (bounded
``valid_to``) rather than overwritten, so any fact row can be joined to the
dimension version that was current at its event time (an as-of join —
``operators/asof.py`` — on ``valid_from``).

Spark-first: MERGE needs a transactional table format, but the SCD2
*transform* itself is three join legs over the snapshot/changes pair —
semi (expire), anti (carry), plus the change batch — one shuffle each on
the key, all expressible in plain SQL, hence exactly oracle-checkable.
Writers persist the result partitioned by ``is_current`` so the serving
path scans only current rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(snapshot: DataFrame, changes: DataFrame, key: str,
               batch_ts: Column, attr_cols: tuple[str, ...],
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               is_current: str = "is_current",
               change_order: str | None = None) -> DataFrame:
    """Apply one change batch to the CURRENT rows of an SCD2 dimension.

    ``snapshot``: the current rows — ``key``, ``attr_cols``, ``valid_from``
    (``valid_to``/``is_current`` implied open/true). ``changes``: ``key`` +
    new ``attr_cols`` values. Returns the new version set:

    - **expired**: current rows whose key appears in the batch with at
      least one differing attribute — closed with ``valid_to = batch_ts``;
    - **new current**: one row per *effective* change (differs from the
      current version, or is a brand-new key), opening at ``batch_ts``;
    - **carried**: current rows not effectively changed, untouched.

    No-op changes (every attribute equal) are dropped, the standard SCD2
    checksum-compare: re-sending yesterday's full feed must not version
    the whole dimension.

    A real feed can re-send a key within one batch; keeping both would
    open two "current" rows and break the one-current-row-per-key
    invariant, so the batch is deduped to ONE row per key first. Pass
    ``change_order`` (a column in ``changes``, e.g. a CDC sequence
    number) to keep the highest-ordered row; without it the tie-break is
    deterministic-but-arbitrary (max over the attribute tuple), which is
    only safe when intra-batch duplicates are exact resends.
    """
    snap = snapshot.select(key, *attr_cols, valid_from)
    # attr tuple is ALWAYS the trailing tie-break: two rows sharing the
    # same change_order value must still dedupe deterministically.
    order_cols = (([F.col(change_order).desc()] if change_order else [])
                  + [F.col(c).desc_nulls_last() for c in attr_cols])
    w = Window.partitionBy(key).orderBy(*order_cols)
    chg = (changes.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1).select(key, *attr_cols))

    differs = F.lit(False)
    for c in attr_cols:
        differs = differs | ~F.col(f"s.{c}").eqNullSafe(F.col(f"c.{c}"))
    joined = snap.alias("s").join(chg.alias("c"), key, "inner").where(differs)
    effective = joined.select(key, *[f"c.{c}" for c in attr_cols])
    new_keys = chg.join(snap, key, "left_anti")

    expired = (
        joined.select(key, *[f"s.{c}" for c in attr_cols], f"s.{valid_from}")
        .withColumn(valid_to, batch_ts)
        .withColumn(is_current, F.lit(False))
    )
    opened = (
        effective.unionByName(new_keys)
        .withColumn(valid_from, batch_ts)
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .withColumn(is_current, F.lit(True))
    )
    carried = (
        snap.join(effective.select(key), key, "left_anti")
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .withColumn(is_current, F.lit(True))
    )
    cols = [key, *attr_cols, valid_from, valid_to, is_current]
    return (
        expired.select(*cols)
        .unionByName(opened.select(*cols))
        .unionByName(carried.select(*cols))
    )

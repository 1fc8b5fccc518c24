"""Skew-mitigation operators: salted two-stage aggregation.

When a groupBy key is pathologically hot (the reference's phase-4 workload
funnels 100k events into ONE user, generator1.py:51), map-side partial
aggregation usually absorbs it — but for aggregations whose partial state
is large (collect-like, exact distinct counts) or under extreme card-
inality collapse, the classic fix is salting: shard each key into
``n_salts`` sub-keys, aggregate per (key, salt), then re-aggregate per key.
Two small shuffles, neither with a hot partition, instead of one shuffle
where a single reducer owns the hot key.

Decomposable aggregates only (sum/count/min/max — anything with an
associative merge); averages decompose as sum+count and are derived after
the second stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn, first_stage_fn) per supported aggregate.
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.sum, F.count),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column name → (agg_fn, input_col) with agg_fn in
    {sum, count, min, max}. Produces exactly the same result as
    ``df.groupBy(keys).agg(...)`` — the salt is internal — but no reducer
    ever owns more than ~1/n_salts of a hot key's rows.

    The salt is a DETERMINISTIC function of the full row content, never
    ``monotonically_increasing_id()``/``rand()``: a non-deterministic salt
    used as a shuffle grouping key reassigns rows on stage retry after a
    fetch failure, duplicating or dropping them against outputs already
    consumed by reducers (the SPARK-23207 correctness class) — exactly the
    large-cluster scenario this operator exists for. Identical rows share a
    salt, which only matters if a hot key's rows are also near-identical;
    aggregation stays exact either way.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).alias("_salt")
    stage1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in _MERGES:
            raise ValueError(f"non-decomposable aggregate: {fn}")
        _, first = _MERGES[fn]
        stage1_exprs.append(first(col).alias(f"_s1_{out}"))
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1_exprs)
    stage2_exprs = []
    for out, (fn, _col) in aggs.items():
        merge, _ = _MERGES[fn]
        stage2_exprs.append(merge(f"_s1_{out}").alias(out))
    return stage1.groupBy(*keys).agg(*stage2_exprs)

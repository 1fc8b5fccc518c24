"""Distributed as-of (point-in-time) join.

Not in the reference (its only join surface is broadcast enrichment); part
of the training-data-pipeline extension surface (SURVEY.md §2.11). The
semantics are pandas ``merge_asof`` / DuckDB ``ASOF JOIN``: each left row
picks the single right row with the greatest ``right.ts <= left.ts`` for
the same key (backward as-of, ties match).

Implementation — union-merge, not a range join:

1. tag each side (right=0, left=1) and union into one frame with a shared
   schema (each side carries NULLs for the other side's payload columns);
2. one hash shuffle on the key, local sort by ``(ts, side)`` — the sort
   order puts an equal-timestamp right row *before* the left row so ties
   match, like ``>=`` in the oracle;
3. a running ``last(payload, ignorenulls=True)`` window carries the most
   recent right payload forward onto every left row;
4. keep left rows, inner semantics (unmatched left rows drop, matching
   DuckDB's default ASOF JOIN).

100 TB design: ONE exchange on the join key and an O(n log n) per-partition
sort; the window state is a single running value per payload column. The
naive alternative — a conditional join on ``l.ts >= r.ts`` then a
``row_number`` to keep the latest — materializes O(|L|·|R|) candidate pairs
per key before discarding all but one, which is quadratic on any active
key. A pathologically hot key serializes into one task here (window
functions cannot be AQE-split); ``asof_join_bucketed`` is the escape hatch
at that extreme — it partitions the heavy work on (key, time_bucket) and
hands each bucket's last right row forward, leaving only a
per-bucket-cardinality scan serial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORD, _SIDE = "_asof_ord", "_asof_side"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts: str = "ts", right_ts: str | None = None,
              right_cols: dict[str, str] | None = None,
              right_ts_name: str = "asof_ts",
              tolerance_sec: float | None = None,
              how: str = "inner",
              direction: str = "backward") -> DataFrame:
    """As-of join of ``left`` to ``right`` on key columns ``on``.

    ``direction='backward'`` (default, pandas/DuckDB semantics): each left
    row picks the right row with the GREATEST ``right.ts <= left.ts``.
    ``direction='forward'``: the right row with the SMALLEST
    ``right.ts >= left.ts`` — the next-event attribution variant (DuckDB:
    ``ASOF JOIN ... ON l.ts <= r.ts``). Implementation-wise forward is
    the identical union-merge with the window ordered descending, so the
    one-exchange/one-sort scale shape is unchanged; ties match in both
    directions.

    ``right_cols`` maps output column name -> right column name (the
    payload carried from the matched right row); the matched right row's
    timestamp is emitted as ``right_ts_name``. ``tolerance_sec`` optionally
    rejects matches further than that many seconds away (past for
    backward, future for forward); inner-only. ``how='left'`` keeps
    unmatched left rows with NULL right columns (matched-ness is
    ``right_ts_name IS NOT NULL`` — right rows with a NULL event time are
    dropped up front, so the marker is unambiguous). NULL key values join
    to each other, like window partitioning and unlike an equi-join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}")
    if tolerance_sec is not None and how != "inner":
        raise ValueError("tolerance_sec is only supported with how='inner'")
    right_ts = right_ts or ts
    right = right.where(F.col(right_ts).isNotNull())
    right_cols = dict(right_cols or {})
    left_payload = [c for c in left.columns if c not in on and c != ts]
    clash = (set(right_cols) | {right_ts_name}) & (set(left_payload) | {ts, *on})
    if clash:
        raise ValueError(f"right output columns collide with left columns: {clash}")

    # The matched right row travels as ONE struct so the carried payload and
    # timestamp always come from the SAME row — carrying each payload column
    # through its own last(ignorenulls) would stitch an older row's non-null
    # payload onto a newer matched row whose payload is NULL (diverging from
    # DuckDB ASOF JOIN / pandas merge_asof on nullable right columns).
    rrow = F.struct(
        F.col(right_ts).alias(right_ts_name),
        *[F.col(rc).alias(out) for out, rc in right_cols.items()],
    )
    lside = left.select(
        *on,
        F.col(ts).alias(_ORD),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(
            right.select(rrow.alias("_r")).schema["_r"].dataType
        ).alias("_asof_r"),
    )
    rside = right.select(
        *on,
        F.col(right_ts).alias(_ORD),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        rrow.alias("_asof_r"),
    )

    ord_col = F.asc(_ORD) if direction == "backward" else F.desc(_ORD)
    w = (Window.partitionBy(*on).orderBy(ord_col, F.asc(_SIDE))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lside.unionByName(rside).select(
        *on, _ORD, _SIDE, *left_payload,
        F.last("_asof_r", ignorenulls=True).over(w).alias("_asof_r"),
    )
    out = carried.where(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.where(F.col("_asof_r").isNotNull())
    out = (
        out.drop(_SIDE)
        .withColumnRenamed(_ORD, ts)
        .select(
            "*",
            *[F.col(f"_asof_r.{out_name}").alias(out_name)
              for out_name in (right_ts_name, *right_cols)],
        )
        .drop("_asof_r")
    )
    if tolerance_sec is not None:
        gap = F.col(ts).cast("double") - F.col(right_ts_name).cast("double")
        if direction == "forward":
            gap = -gap
        out = out.where(gap <= F.lit(float(tolerance_sec)))
    return out


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: list[str],
                       ts: str = "ts", right_ts: str | None = None,
                       right_cols: dict[str, str] | None = None,
                       right_ts_name: str = "asof_ts",
                       bucket_sec: float = 3600.0,
                       tolerance_sec: float | None = None) -> DataFrame:
    """As-of join parallelized across time buckets — the hot-key escape
    hatch promised by ``asof_join``'s docstring.

    ``asof_join`` serializes each key into one task (window functions can't
    be split); a key carrying a large share of the input becomes a
    straggler. Here the heavy work partitions on ``(key, time_bucket)``:

    1. within each bucket, run the union-merge as-of with the bucket added
       to the partition key and ``how='left'`` — matches whose right row
       falls in the left row's own bucket resolve here, fully parallel, and
       misses fall out of the SAME computed frame (no recompute, no
       anti-join);
    2. reduce each ``(key, bucket)`` of the right side to its LAST row (one
       row per key-bucket — tiny), forward-fill over a dense per-key bucket
       grid (the only serial step, at per-BUCKET not per-event
       cardinality) so ``_carry`` at bucket b = latest right row of any
       bucket < b;
    3. misses take their bucket's carry-in via a null-safe equi-join on
       ``(key, bucket)`` — null-safe because NULL keys as-of-join to each
       other (window partitioning groups them), so the stitch joins must
       too.

    Exactly equal to ``asof_join`` output (asserted in tests, including
    NULL keys/payloads and under hypothesis); inner semantics. Choose
    ``bucket_sec`` so a hot key's per-bucket row count fits a task; note
    the grid is ``(max left/right bucket - min right bucket)`` entries per
    key, so don't pair a tiny ``bucket_sec`` with a multi-year key span.
    """
    right_ts = right_ts or ts
    right_cols = dict(right_cols or {})
    bucket_us = int(bucket_sec * 1_000_000)

    def bkt(c: str) -> F.Column:
        # floor (not cast-truncate): pre-epoch timestamps are negative
        return F.floor(F.unix_micros(F.col(c)) / F.lit(bucket_us)).cast("long")

    lb = left.withColumn("_bkt", bkt(ts))
    rb = right.where(F.col(right_ts).isNotNull()).withColumn("_bkt", bkt(right_ts))
    keys = [*on, "_bkt"]

    # 1. within-bucket as-of, left semantics: one frame carries both the
    # matched rows and the misses.
    within = asof_join(lb, rb, keys, ts, right_ts, right_cols, right_ts_name,
                       how="left")
    matched = F.col(right_ts_name).isNotNull()
    within_out = within.where(matched).select(*left.columns, right_ts_name, *right_cols)
    misses = within.where(~matched).select(*left.columns, "_bkt")

    # 2. per-(key, bucket) last right row, forward-filled over the dense
    # grid. Grid lower bound comes from the RIGHT side only — buckets
    # before the first right row can never produce a carry.
    rrow = F.struct(
        F.col(right_ts).alias(right_ts_name),
        *[F.col(rc).alias(out) for out, rc in right_cols.items()],
    )
    last_per_bucket = (
        rb.withColumn("_r", rrow)
        .groupBy(*keys)
        .agg(F.max_by("_r", F.col(right_ts)).alias("_r"))
    )
    rspan = rb.groupBy(*on).agg(F.min("_bkt").alias("lo"), F.max("_bkt").alias("hi"))
    lspan = lb.groupBy(*on).agg(F.max("_bkt").alias("lhi")).select(
        *[F.col(k).alias(f"_l_{k}") for k in on], "lhi"
    )
    span_cond = None
    for k in on:
        c = F.col(k).eqNullSafe(F.col(f"_l_{k}"))
        span_cond = c if span_cond is None else (span_cond & c)
    span = (
        rspan.join(lspan, span_cond, "left")  # null-safe: NULL keys carry too
        .select(*on, "lo", F.greatest("hi", F.coalesce("lhi", "hi")).alias("hi"))
    )
    grid = span.select(*on, F.explode(F.sequence("lo", "hi")).alias("_bkt"))
    worder = Window.partitionBy(*on).orderBy("_bkt")
    lpb = last_per_bucket.select(
        *[F.col(k).alias(f"_p_{k}") for k in keys], "_r"
    )
    grid_cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_p_{k}"))
        grid_cond = c if grid_cond is None else (grid_cond & c)
    filled = (
        grid.join(lpb, grid_cond, "left")  # null-safe: NULL keys carry too
        .withColumn(
            "_filled",
            F.last("_r", ignorenulls=True).over(
                worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_carry", F.lag("_filled").over(worder))
        .select(*on, "_bkt", "_carry")
    )

    # 3. null-safe join: NULL keys matched each other in the window-based
    # step, so they must here too (a plain equi-join would drop them).
    fa = filled.select(
        *[F.col(k).alias(f"_f_{k}") for k in keys], "_carry"
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_f_{k}"))
        cond = c if cond is None else (cond & c)
    miss_out = (
        misses.join(fa, cond, "left")
        .where(F.col("_carry").isNotNull())
        .select(
            *left.columns,
            *[F.col(f"_carry.{name}").alias(name)
              for name in (right_ts_name, *right_cols)],
        )
    )
    out = within_out.unionByName(miss_out)
    if tolerance_sec is not None:
        out = out.where(
            F.col(ts).cast("double") - F.col(right_ts_name).cast("double")
            <= F.lit(float(tolerance_sec))
        )
    return out

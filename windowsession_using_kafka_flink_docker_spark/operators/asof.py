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
functions cannot be AQE-split); the mitigation at that extreme is
time-bucket salting with boundary handoff of the last right row per bucket,
which composes from this same primitive applied per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORD, _SIDE = "_asof_ord", "_asof_side"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts: str = "ts", right_ts: str | None = None,
              right_cols: dict[str, str] | None = None,
              right_ts_name: str = "asof_ts",
              tolerance_sec: float | None = None) -> DataFrame:
    """Backward as-of join of ``left`` to ``right`` on key columns ``on``.

    ``right_cols`` maps output column name -> right column name (the
    payload carried from the matched right row); the matched right row's
    timestamp is emitted as ``right_ts_name``. ``tolerance_sec`` optionally
    rejects matches further than that many seconds in the past (pandas
    ``merge_asof(tolerance=...)``).
    """
    right_ts = right_ts or ts
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

    w = (Window.partitionBy(*on).orderBy(_ORD, _SIDE)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lside.unionByName(rside).select(
        *on, _ORD, _SIDE, *left_payload,
        F.last("_asof_r", ignorenulls=True).over(w).alias("_asof_r"),
    )
    out = (
        carried.where(F.col(_SIDE) == 1)
        .where(F.col("_asof_r").isNotNull())
        .drop(_SIDE)
        .withColumnRenamed(_ORD, ts)
        .select(
            "*",
            *[F.col(f"_asof_r.{out_name}").alias(out_name)
              for out_name in (right_ts_name, *right_cols)],
        )
        .drop("_asof_r")
    )
    if tolerance_sec is not None:
        out = out.where(
            F.col(ts).cast("double") - F.col(right_ts_name).cast("double")
            <= F.lit(float(tolerance_sec))
        )
    return out

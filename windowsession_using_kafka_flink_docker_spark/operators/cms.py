"""Count-min sketch — fixed-size frequency state, fully oracle-replayable.

Complements the existing sketch row (HLL distinct counts, KLL/GK
percentiles in ``sketch_accuracy_report``) with the third classic:
point-frequency estimation in O(d×w) counters regardless of stream size.
The CMS guarantee — estimates never undercount, overcount bounded by
collisions — is exactly hash-checkable because the bucket hash is md5
(byte-identical in Spark and DuckDB: `conv(substr(md5(x),1,8),16,10)` ==
`('0x' || substr(md5(x),1,8))::BIGINT`), unlike xxhash64 which forced
SimHash to a rows-only check.

Spark shape: the sketch IS a groupBy — explode each token occurrence into
its d (row, bucket) cells, map-side partial count, one shuffle of at most
d×w groups. That aggregation is the textbook CMS merge: partition-local
sketches sum cell-wise, so the same plan runs unchanged as a streaming
update-mode aggregate or across 1000 executors. The audit join (estimate
vs exact) broadcasts the d×w-row sketch.

At 100 TB: d×w counters of state vs a token-cardinality-sized exact
count. The exact side here exists only to *audit* the sketch at test
scale; production consumers read the sketch alone.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(tok: str | Column, row: int, width: int) -> Column:
    """Bucket of ``tok`` in sketch row ``row`` — md5-based so DuckDB
    replays it bit-identically (see ``duckdb_cms_bucket_sql``)."""
    col = F.col(tok) if isinstance(tok, str) else tok
    salted = F.concat(col, F.lit(f"#{row}"))
    return F.pmod(
        F.conv(F.substring(F.md5(salted.cast("binary")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(width),
    )


def duckdb_cms_bucket_sql(tok_expr: str, row: int, width: int) -> str:
    """DuckDB replica of :func:`cms_bucket`: same md5-prefix integer, same
    salt, same modulus. The 8-hex-char prefix is < 2^32 so plain ``%``
    equals Spark's pmod (operand never negative)."""
    return (f"(('0x' || substr(md5({tok_expr} || '#{row}'), 1, 8))::BIGINT"
            f" % {width})")


def cms_build(tokens: DataFrame, tok_col: str = "token",
              depth: int = 4, width: int = 16) -> DataFrame:
    """Build the sketch from a frame of token OCCURRENCES (one row per
    occurrence). Returns (r, bucket, n) — at most depth×width rows."""
    cells = tokens.select(
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     cms_bucket(tok_col, r, width).alias("bucket"))
            for r in range(depth)
        ])).alias("cell")
    )
    return (cells.groupBy("cell.r", "cell.bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def cms_estimate(items: DataFrame, sketch: DataFrame, tok_col: str = "token",
                 depth: int = 4, width: int = 16,
                 out_col: str = "cms_n") -> DataFrame:
    """Point-estimate each distinct token in ``items``: min over the d
    cell counts. The sketch broadcasts (≤ d×w rows). ``items`` must not
    already carry ``_b<r>``/``_n<r>`` columns (used as join scratch).

    Left joins: a queried token that was never sketched lands in cells
    with no row — its count there is 0, so the CMS answer is 0 (or the
    collision mass of whatever cells it shares), never a dropped row."""
    est = items
    for r in range(depth):
        cell = (sketch.where(F.col("r") == r)
                .select(F.col("bucket").alias(f"_b{r}"),
                        F.col("n").alias(f"_n{r}")))
        est = est.withColumn(f"_b{r}", cms_bucket(tok_col, r, width)).join(
            F.broadcast(cell), f"_b{r}", "left")
    cms = reduce(lambda a, b: F.least(a, b),
                 [F.coalesce(F.col(f"_n{r}"), F.lit(0))
                  for r in range(depth)])
    return est.withColumn(out_col, cms).drop(
        *[c for r in range(depth) for c in (f"_b{r}", f"_n{r}")])

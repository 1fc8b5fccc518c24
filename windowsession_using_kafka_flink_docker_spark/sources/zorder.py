"""Z-order (Morton-curve) clustering — multi-column data skipping.

A layout sorted on one column skips beautifully on that column and not at
all on any other. Interleaving the bits of two (range-normalized) columns
into one Morton code and range-partitioning + sorting on THAT gives every
parquet row group a tight min/max envelope on BOTH columns — so predicate
pushdown can prune row groups for filters on either dimension. This is the
standard lakehouse answer (Delta/Iceberg `ZORDER BY`) re-expressed with
nothing but Spark expressions and a range partitioner; at 100 TB it is an
ingest-once decision exactly like the bucketed layout in ``bucketed.py``.

Everything is exact integer arithmetic (scale to 2^bits buckets, interleave
with shifts), so the code column is bit-replicable in DuckDB for the oracle
(:func:`duckdb_zvalue_sql`) and the locality claim is measured — not
asserted — from parquet row-group statistics in ``tests/test_zorder.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: str, hi: str, bits: int, idiv: str) -> str:
    """Exact-integer normalization of BIGINT ``col`` into [0, 2^bits):
    ((col - lo) * (2^bits - 1)) intdiv max(hi - lo, 1). All BIGINT ops;
    ``idiv`` is the engine's integer-division template (Spark ``DIV``,
    DuckDB ``//`` — identical for the non-negative operands here)."""
    top = (1 << bits) - 1
    return idiv.format(
        num=f"(({col} - {lo}) * {top})",
        den=f"(CASE WHEN ({hi} - {lo}) > 0 THEN ({hi} - {lo}) ELSE 1 END)")


def _interleave_sql(a: str, b: str, bits: int, shl: str, shr: str) -> str:
    """Morton interleave of two ``bits``-bit ints; ``shl``/``shr`` are
    format strings for the engine's shift syntax."""
    terms = []
    for i in range(bits):
        terms.append(shl.format(x=f"({shr.format(x=a, n=i)} & 1)", n=2 * i))
        terms.append(shl.format(x=f"({shr.format(x=b, n=i)} & 1)", n=2 * i + 1))
    return "(" + " + ".join(terms) + ")"


def zvalue_expr(a: str, b: str, a_lo: str, a_hi: str, b_lo: str, b_hi: str,
                bits: int = 8) -> Column:
    """Spark Column: Morton code of BIGINT expressions ``a``/``b``, each
    range-normalized into [0, 2^bits) by the given lo/hi expressions
    (columns or literals — typically broadcast-computed min/max)."""
    sa = _scale_expr(a, a_lo, a_hi, bits, idiv="({num} DIV {den})")
    sb = _scale_expr(b, b_lo, b_hi, bits, idiv="({num} DIV {den})")
    return F.expr(_interleave_sql(
        f"({sa})", f"({sb})", bits,
        shl="shiftleft({x}, {n})", shr="shiftright({x}, {n})"))


def duckdb_zvalue_sql(a: str, b: str, a_lo: str, a_hi: str,
                      b_lo: str, b_hi: str, bits: int = 8) -> str:
    """DuckDB replica of :func:`zvalue_expr` (same exact-integer math)."""
    sa = _scale_expr(a, a_lo, a_hi, bits, idiv="({num} // {den})")
    sb = _scale_expr(b, b_lo, b_hi, bits, idiv="({num} // {den})")
    return _interleave_sql(
        f"({sa})", f"({sb})", bits,
        shl="(({x}) << {n})", shr="(({x}) >> {n})")


def write_zordered(df: DataFrame, path: str, a: str, b: str,
                   bits: int = 8, n_files: int = 16) -> None:
    """Write ``df`` z-ordered on BIGINT columns ``a``, ``b``: compute the
    Morton code against the frame's own min/max (one tiny aggregate,
    broadcast via crossJoin), range-partition into ``n_files`` and sort
    within partitions so every file's row groups carry tight min/max
    stats on BOTH columns."""
    bounds = df.agg(
        F.min(a).alias("_alo"), F.max(a).alias("_ahi"),
        F.min(b).alias("_blo"), F.max(b).alias("_bhi"),
    )
    z = zvalue_expr(a, b, "_alo", "_ahi", "_blo", "_bhi", bits)
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_alo", "_ahi", "_blo", "_bhi", "_z")
        .write.mode("overwrite").parquet(path)
    )

"""Meta-tests for tests/oracle.compare: the gate must actually FAIL on
wrong results — a vacuously-green comparator would make every parity
test meaningless. Each failure mode the driver distinguishes (values,
schema, row count, int-vs-float typing) is exercised negatively."""

from __future__ import annotations

from tests.oracle import compare


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_matching_result_passes(spark, sf_dir):
    ok, msg = compare(
        _df(spark, [(1, "a"), (2, "b")], ["k", "v"]),
        "SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b'", sf_dir)
    assert ok, msg


def test_value_mismatch_fails(spark, sf_dir):
    ok, msg = compare(
        _df(spark, [(1, "a")], ["k", "v"]),
        "SELECT 1 AS k, 'X' AS v", sf_dir)
    assert not ok and "mismatch" in msg


def test_schema_mismatch_fails(spark, sf_dir):
    ok, msg = compare(
        _df(spark, [(1,)], ["k"]),
        "SELECT 1 AS wrong_name", sf_dir)
    assert not ok and "schema" in msg


def test_row_count_mismatch_fails(spark, sf_dir):
    ok, msg = compare(
        _df(spark, [(1,), (2,)], ["k"]),
        "SELECT 1 AS k", sf_dir)
    assert not ok and "row count" in msg


def test_int_vs_float_typing_fails(spark, sf_dir):
    """The driver's value hash distinguishes int64 3549 from float64
    3549.0; compare must too (Python == alone would not)."""
    ok, msg = compare(
        _df(spark, [(3549,)], ["k"]),
        "SELECT 3549.0 AS k", sf_dir)
    assert not ok, "int/float conflation slipped through"


def test_row_order_is_irrelevant(spark, sf_dir):
    ok, msg = compare(
        _df(spark, [(2, "b"), (1, "a")], ["k", "v"]),
        "SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'b'", sf_dir)
    assert ok, msg

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (task1-parity sessionization of
the events table) at sf 0.001. ``queries()``/``oracle_sql()`` expose the
full catalog from
``windowsession_using_kafka_flink_docker_spark.plans.catalog`` — one entry
per implemented operator (SURVEY.md §2), DuckDB oracle attached wherever
the semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from windowsession_using_kafka_flink_docker_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.CATALOG["session_fixed_gap"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()

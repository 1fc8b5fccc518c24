"""Local replica of the driver's oracle comparison: run the Spark query and
the DuckDB oracle SQL on the same parquet, sort columns by name, sort rows,
compare values exactly. If this passes, the driver's value-hash gate should
too (modulo its own normalizations)."""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import numpy as np

from windowsession_using_kafka_flink_docker_spark.sources.batch import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, np.generic):  # np.int64 does not subclass int
        v = v.item()
    # Type-strict on numerics: the driver's value hash distinguishes
    # int64 3549 from float64 3549.0 (e.g. DuckDB HUGEINT sums arriving as
    # float), but Python's == does not — tag the type so we catch what the
    # driver would.
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float:nan",)
        # collapse -0.0 / 0.0 and fp noise below the round() the queries apply
        return ("float", round(v, 9) + 0.0)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    recs = [tuple(_canon(v) for v in row) for row in df_pandas[cols].itertuples(index=False, name=None)]
    return sorted(recs, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    want = con.execute(sql).df()
    con.close()
    if sorted(got.columns) != sorted(want.columns):
        return False, f"schema mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"row count mismatch: spark={len(got)} oracle={len(want)}"
    g, w = _rows(got), _rows(want)
    for i, (a, b) in enumerate(zip(g, w)):
        if a != b:
            return False, f"first value mismatch at sorted row {i}: spark={a} oracle={b}"
    return True, "ok"

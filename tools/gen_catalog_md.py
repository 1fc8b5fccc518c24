#!/usr/bin/env python
"""Regenerate CATALOG.md from the query registry (single source of truth).

    python tools/gen_catalog_md.py > CATALOG.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

HEADER = """# CATALOG — every registered query/operator

Generated from `windowsession_using_kafka_flink_docker_spark/plans/catalog.py`
(the registry behind `__spark_entry__.queries()` / `oracle_sql()`) by
`tools/gen_catalog_md.py`.
`oracle` = driver-checked against DuckDB SQL on the same parquet at
sf 0.01 (row count + schema + order-insensitive value hash);
`rows-only` = executes + stable schema (semantics approximate or
engine-specific by design — reason in the description).
`bench` = in the `bench.py` headline set.

| # | query | check | bench | impl | description |
|---|---|---|---|---|---|"""


def main() -> None:
    print(HEADER)
    for i, (name, spec) in enumerate(CATALOG.items(), 1):
        mod = spec.spark.__module__.rsplit("windowsession_using_kafka_flink_docker_spark.", 1)[-1]
        impl = mod.replace(".", "/") + ".py"
        check = "oracle" if spec.oracle is not None else "rows-only"
        bench = "yes" if spec.bench else ""
        desc = " ".join(spec.description.split())
        print(f"| {i} | `{name}` | {check} | {bench} | `{impl}` | {desc} |")


if __name__ == "__main__":
    main()

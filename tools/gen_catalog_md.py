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


def render() -> str:
    """Full CATALOG.md text — also compared verbatim by
    tests/test_catalog_integrity.py::test_catalog_md_in_sync so the
    committed file can never drift from the registry again (r11 shipped
    3 entries with a 181-row CATALOG.md)."""
    lines = [HEADER]
    for i, (name, spec) in enumerate(CATALOG.items(), 1):
        mod = spec.spark.__module__.rsplit("windowsession_using_kafka_flink_docker_spark.", 1)[-1]
        impl = mod.replace(".", "/") + ".py"
        check = "oracle" if spec.oracle is not None else "rows-only"
        bench = "yes" if spec.bench else ""
        desc = " ".join(spec.description.split())
        lines.append(
            f"| {i} | `{name}` | {check} | {bench} | `{impl}` | {desc} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    print(render(), end="")


if __name__ == "__main__":
    main()

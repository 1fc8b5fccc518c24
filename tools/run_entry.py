#!/usr/bin/env python
"""Run one catalog entry by name and optionally compare it against its
DuckDB oracle — the one-liner every build/debug session otherwise
re-invents with ad-hoc ``python -c``:

    python tools/run_entry.py gini_spend_inequality                # show
    python tools/run_entry.py gini_spend_inequality --oracle       # gate
    python tools/run_entry.py q19_disjunctive_revenue --explain
    python tools/run_entry.py --list experiment                    # find
    python tools/run_entry.py a b c --oracle       # batch: ONE shared JVM

Prints ``RESULT <name> OK|FAIL`` on --oracle so output survives Spark's
progress-bar carriage returns (grep -a RESULT).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="*",
                    help="catalog entry name(s) — several names share "
                         "one Spark session (a per-entry JVM costs ~10 s "
                         "of startup each; a 40-entry sweep drops from "
                         "~40 min to minutes)")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--oracle", action="store_true",
                    help="compare against the DuckDB oracle")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan")
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--list", dest="list_filter", metavar="SUBSTR",
                    nargs="?", const="",
                    help="list entries (optionally filtered by "
                         "name/tag/description substring)")
    args = ap.parse_args()

    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

    if args.list_filter is not None:
        needle = args.list_filter.lower()
        for n, spec in sorted(CATALOG.items()):
            hay = " ".join((n, " ".join(spec.tags), spec.description)).lower()
            if needle in hay:
                kind = "oracle" if spec.oracle else "rows-only"
                print(f"{n}  [{kind}]  tags={','.join(spec.tags)}")
        return
    if not args.name:
        ap.error("entry name required (or --list)")
    unknown = [n for n in args.name if n not in CATALOG]
    if unknown:
        ap.error(f"unknown entries {unknown!r} — try --list")

    from windowsession_using_kafka_flink_docker_spark import get_spark

    spark = get_spark("run-entry")
    batch = len(args.name) > 1
    failed = False
    for name in args.name:
        spec = CATALOG[name]
        df = spec.spark(spark, args.sf)
        if args.explain:
            df.explain("formatted")
        if not batch:
            df.show(args.rows, truncate=False)
            print(f"rows: {df.count()}")
        elif not (args.oracle or args.explain):
            # batch mode with neither flag used to build each DataFrame
            # lazily and exit 0 having executed nothing (r13 ADVICE);
            # a count per entry makes the sweep actually run the plans.
            print(f"RESULT {name} ROWS {df.count()}", flush=True)
        if args.oracle:
            if spec.oracle is None:
                print(f"RESULT {name} ROWS-ONLY (no oracle registered)",
                      flush=True)
                continue
            from tests.oracle import compare

            ok, msg = compare(df, spec.oracle, args.sf)
            print(f"RESULT {name} {'OK' if ok else 'FAIL'} {msg[:400]}",
                  flush=True)
            failed = failed or not ok
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Reproducible 10x stress protocol behind SCALING.md's per-batch tables:
best-of-N wall time for named catalog entries at two scale factors, one
JSON line out (grep -a STRESSRESULT).

    python tools/stress_entries.py gini_spend_inequality welch_t_spend_ab
    python tools/stress_entries.py --runs 5 --sfs sf0.01,sf0.1 <names...>

Timings are only comparable when nothing else runs a Spark JVM on the
box.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sfs", default="sf0.01,sf0.1",
                    help="comma-separated sf dir basenames under --root")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    from windowsession_using_kafka_flink_docker_spark import get_spark
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG

    unknown = [n for n in args.names if n not in CATALOG]
    if unknown:
        ap.error(f"unknown entries: {unknown}")

    spark = get_spark("stress-entries")
    out: dict[str, dict[str, float]] = {}
    for sf in args.sfs.split(","):
        sf_dir = os.path.join(args.root, sf)
        for name in args.names:
            spec = CATALOG[name]
            spec.spark(spark, sf_dir).count()  # warm-up, excluded
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                spec.spark(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            out.setdefault(name, {})[sf] = round(best, 2)
    print("STRESSRESULT " + json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profile one or more catalog entries: noop-sink timings (median of N)
plus per-stage metrics (duration, shuffle bytes, input bytes, spill)
scraped from the local UI REST API — the optimization round's
measure-first harness (guide sections 1 and 7).

    python tools/profile_entry.py ngram_jaccard_neardups --sf /root/testdata/sf0.1
    python tools/profile_entry.py a b c --runs 3 --plan-dir /tmp/plans
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None,
                    help="write <name>.formatted.txt (pre-exec plan) and "
                         "<name>.stages.txt (per-stage metrics of the last "
                         "timed run) per entry")
    args = ap.parse_args()

    from windowsession_using_kafka_flink_docker_spark import get_spark
    from windowsession_using_kafka_flink_docker_spark.plans.catalog import CATALOG
    from windowsession_using_kafka_flink_docker_spark.plans.llm_pipeline import (
        clear_stage_caches,
    )
    from windowsession_using_kafka_flink_docker_spark.plans import llm_pipeline

    def resolve(n):
        if n in CATALOG:
            return CATALOG[n].spark
        return getattr(llm_pipeline, n)

    spark = get_spark("profile-entry",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4049"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    api = f"{ui}/api/v1/applications/{app_id}"

    for name in args.name:
        fn = resolve(name)
        label = f"profile:{name}"
        spark.sparkContext.setJobDescription(label)
        clear_stage_caches()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        times = []
        first_job_of_last_run = 0
        for _ in range(args.runs):
            clear_stage_caches()
            spark.sparkContext._jvm.System.gc()
            jobs_before = _get(f"{api}/jobs?status=succeeded")
            first_job_of_last_run = 1 + max(
                (j["jobId"] for j in jobs_before), default=-1)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        print(f"PROFILE {name} median={med:.3f} "
              f"runs={[round(t, 3) for t in times]}", flush=True)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df2 = fn(spark, args.sf)
            fp = df2._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.plan_dir,
                                   f"{name}.formatted.txt"), "w") as f:
                f.write(fp)
            time.sleep(0.7)
            jobs = [j for j in _get(f"{api}/jobs")
                    if j["jobId"] >= first_job_of_last_run]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            lines = [f"stages of the final timed run of {name} "
                     f"(jobs >= {first_job_of_last_run})",
                     f"{'stage':>5} {'ms':>7} {'tasks':>5} {'input':>10} "
                     f"{'sh_read':>10} {'sh_write':>10} {'spill':>9}  name"]
            rows = []
            for sid in stage_ids:
                try:
                    st = _get(f"{api}/stages/{sid}")
                except Exception:
                    continue
                for att in st:
                    if att["status"] not in ("COMPLETE", "FAILED"):
                        continue
                    dur = att.get("executorRunTime", 0)
                    rows.append((dur, sid, att))
            for dur, sid, att in sorted(rows, reverse=True):
                lines.append(
                    f"{sid:>5} {dur:>7} {att['numCompleteTasks']:>5} "
                    f"{att.get('inputBytes', 0):>10} "
                    f"{att.get('shuffleReadBytes', 0):>10} "
                    f"{att.get('shuffleWriteBytes', 0):>10} "
                    f"{att.get('diskBytesSpilled', 0):>9}  "
                    f"{att['name'][:90]}")
            with open(os.path.join(args.plan_dir,
                                   f"{name}.stages.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

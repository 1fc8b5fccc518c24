#!/usr/bin/env python
"""Project the NEXT driver correctness window — the round-start/round-end
protocol check this repo's sessions otherwise re-type as an ad-hoc
snippet:

    python tools/window_projection.py            # greppable summary
    python tools/window_projection.py --full     # + the 50 window names

Reads the live registry, the on-disk CORRECTNESS history, and the
certified fingerprints, then reports which cohorts (at-bound, never-
checked, changed, pinned) land inside the upcoming DRIVER_WINDOW and —
the invariant that matters — whether ANY critical cohort member falls
outside it. Exit code 1 if one does, so the check can gate a round
seal. Prints one `WINDOWPROJ {json}` line (grep -a WINDOWPROJ).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also print the projected window, in order")
    args = ap.parse_args()

    from windowsession_using_kafka_flink_docker_spark.plans import catalog as cat
    from windowsession_using_kafka_flink_docker_spark.plans import (
        fingerprints as fp,
    )

    last_green, latest = cat.driver_history()
    names = list(cat.CATALOG)
    changed = fp.changed_entries(cat.CATALOG, fp.load_recorded())
    order = cat.compute_driver_priority(names, last_green, changed)
    window = list(order[:cat.DRIVER_WINDOW])
    wset = set(window)

    at_bound = sorted(n for n in names if n in last_green
                      and latest - last_green[n] >= cat.STALENESS_BOUND)
    never = sorted(n for n in names if n not in last_green)
    missing = {
        "at_bound": [n for n in at_bound if n not in wset],
        "never": [n for n in never if n not in wset],
        "changed": sorted(n for n in changed if n not in wset),
        "pinned": [n for n in cat.PINNED if n not in wset],
    }
    ages: dict[str, int] = {}
    for n in window:
        a = "never" if n not in last_green else str(latest - last_green[n])
        ages[a] = ages.get(a, 0) + 1

    # One-round lookahead: assume the projected window all greens at
    # round latest+1, then compute round latest+2's at-bound cohort +
    # pins. If that sum approaches DRIVER_WINDOW there is no slack for
    # new/changed entries NEXT round — the planning number that decides
    # how many entries this round may safely add (the r9 cohort bunch
    # makes r14 ~49/50, for example).
    next_green = dict(last_green)
    for n in window:
        next_green[n] = latest + 1
    nxt_at_bound = [n for n in names if n in next_green
                    and latest + 1 - next_green[n] >= cat.STALENESS_BOUND]
    nxt_pins = [n for n in cat.PINNED
                if n in names and n not in set(nxt_at_bound)]
    next_round_free = cat.DRIVER_WINDOW - len(nxt_at_bound) - len(nxt_pins)

    # Next-round MEMBERSHIP for the critical cohorts (r13 VERDICT item
    # 3's ad-hoc simulation, made a tool feature): with this round's
    # window assumed green, do today's missing changed/never entries
    # enter the NEXT window? A changed entry that misses two consecutive
    # windows would run driver-uncertified code for two rounds — that is
    # the deferred-too-long signal this field exists to surface.
    nxt_window = set(cat.compute_driver_priority(names, next_green, changed)
                     [:cat.DRIVER_WINDOW])
    deferred_twice = sorted(
        n for n in (set(missing["changed"]) | set(missing["never"]))
        if n not in nxt_window)

    ok = not any(missing.values())
    print("WINDOWPROJ " + json.dumps({
        "ok": ok,
        "catalog": len(names),
        "latest_round": latest,
        "at_bound": len(at_bound),
        "never": len(never),
        "changed": len(changed),
        "window_ages": ages,
        "next_round_at_bound": len(nxt_at_bound),
        "next_round_free_slots": next_round_free,
        "missing": {k: v for k, v in missing.items() if v},
        "missing_recover_next_round": sorted(
            n for n in (set(missing["changed"]) | set(missing["never"]))
            if n in nxt_window),
        "deferred_past_next_round": deferred_twice,
    }))
    if args.full:
        for i, n in enumerate(window, 1):
            age = ("never" if n not in last_green
                   else latest - last_green[n])
            print(f"{i:3d}. {n}  (age {age})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Record certified source+oracle fingerprints — run at ROUND START.

For every catalog entry with a green row in the LATEST on-disk
``CORRECTNESS_r*.json`` snapshot, record the entry's CURRENT fingerprint
(source closure + oracle, ``plans/fingerprints.py``) into
``CERTIFIED_FINGERPRINTS.json`` at the repo root. Run this before making
any edits in a round: at that moment the working tree is byte-identical
to the code the driver just hashed, so "current fingerprint" == "the
fingerprint the certification covers". Any subsequent edit then makes
the entry's live fingerprint diverge from the record, and
``compute_driver_priority`` schedules it into the next correctness
window (change-aware rotation, VERDICT r9 item 4).

Entries NOT green in the latest snapshot keep their previous record —
their certified source is from an older round and may legitimately
differ from the tree; overwriting would launder an unverified edit.

Bootstrap caveat (round 10): the record was initialized from the
round-9 final commit for entries green in CORRECTNESS_r09. Entries whose
last green predates r9 AND whose source was edited before that commit
(the r8 precision-sweep six) carry a record of their r9-end source, not
their r7-certified source — harmless, because the age bound already
forces them into the r10 window, after which the record becomes exact.

Usage:  python tools/record_fingerprints.py [--root DIR] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from windowsession_using_kafka_flink_docker_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    driver_history,
)
from windowsession_using_kafka_flink_docker_spark.plans.fingerprints import (  # noqa: E402
    ALGO,
    RECORD_FILE,
    entry_fingerprint,
    load_recorded,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="repo root (default: parent of tools/)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    root = args.root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))

    last_green, latest = driver_history(root)
    record = load_recorded(root)
    updated = []
    for name, spec in CATALOG.items():
        if last_green.get(name) != latest:
            continue  # not certified by the latest snapshot — keep old
        fp = entry_fingerprint(spec.spark, spec.oracle)  # current ALGO
        old = record.get(name)
        if old is None or old["fingerprint"] != fp \
                or old["round"] != latest or old.get("algo", "v1") != ALGO:
            record[name] = {"round": latest, "fingerprint": fp,
                            "algo": ALGO}
            updated.append(name)
    out = os.path.join(root, RECORD_FILE)
    if args.dry_run:
        print(f"DRY RUN: would update {len(updated)} records in {out}")
    else:
        with open(out, "w") as f:
            json.dump(dict(sorted(record.items())), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"RECORDED {len(updated)} entries (round {latest}) -> {out}")
    for n in updated:
        print(" ", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

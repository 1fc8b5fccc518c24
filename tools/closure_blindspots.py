#!/usr/bin/env python
"""Audit the fingerprint closure's module-attribute blind spot.

The v1 closure resolved global names in each function's own module
globals only, so a registered entry that reaches repo code ONLY as a
module attribute (``T.bm25_topk(...)`` where ``T`` is a module alias)
or through a function-local import did NOT carry that code in its
fingerprint closure — editing the attributed function never flagged the
entry as changed (found the day the bm25_topk qf-unification landed:
the edit mechanically flagged nothing, SURVEY 2.116). ALGO v2
(``plans/fingerprints.py``) resolves both classes into the closure, but
records migrate lazily: a record written under v1 keeps v1 semantics
until the next round-start re-record. This tool lists, per entry, the
attribute/local-import references that v2 covers and v1 does not — i.e.
the TRANSITIONAL exposure while any v1 records remain, and the
blast-radius map for editors of the listed operator modules
(`tools/run_entry.py <entry> --oracle` to re-verify a dependent by
hand).

    python tools/closure_blindspots.py            # full audit
    python tools/closure_blindspots.py --module text_analysis
                                                  # who reaches this
                                                  # module blind?

Prints one ``BLINDSPOT {json}`` line per entry that has at least one
unresolved repo-module attribute reference:
``{"entry": ..., "refs": ["operators.text_analysis.bm25_topk", ...]}``
— i.e. names referenced through a repo-module alias in the entry's
closure functions but absent from those functions' module globals.
A final ``BLINDSPOTSUMMARY`` line aggregates per attributed module.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PACKAGE = "windowsession_using_kafka_flink_docker_spark"


def _entry_blind_refs(fn) -> set[str]:
    """Closure members ALGO v2 reaches that v1 does not — the sources
    (functions/classes) present in the v2 source closure but absent
    from the v1 closure, i.e. code an edit to which a v1-era record
    cannot detect."""
    from windowsession_using_kafka_flink_docker_spark.plans import (
        fingerprints as fp,
    )

    v2_sources, _ = fp._source_closure(fn, resolve_module_attrs=True)
    v1_sources, _ = fp._source_closure(fn, resolve_module_attrs=False)
    v1 = {(m, q) for m, q, _ in v1_sources}
    return {f"{m.removeprefix(_PACKAGE + '.')}.{q}"
            for m, q, _ in v2_sources if (m, q) not in v1}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", default=None,
                    help="only report refs into this module (substring)")
    args = ap.parse_args()

    from windowsession_using_kafka_flink_docker_spark.plans.catalog import (
        CATALOG,
    )

    by_module: dict[str, list[str]] = defaultdict(list)
    n_exposed = 0
    for name, spec in sorted(CATALOG.items()):
        refs = sorted(_entry_blind_refs(spec.spark))
        if args.module:
            refs = [r for r in refs if args.module in r]
        if not refs:
            continue
        n_exposed += 1
        print("BLINDSPOT " + json.dumps({"entry": name, "refs": refs}))
        for r in refs:
            by_module[r.rsplit(".", 1)[0]].append(name)
    print("BLINDSPOTSUMMARY " + json.dumps(
        {"entries_exposed": n_exposed,
         "by_module": {m: sorted(set(v)) for m, v in sorted(by_module.items())}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

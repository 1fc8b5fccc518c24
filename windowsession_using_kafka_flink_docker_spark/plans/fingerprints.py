"""Content fingerprints for catalog entries — the change-aware half of the
driver rotation (VERDICT r8 item 3 / r9 item 4).

The age-based rotation alone re-certifies an entry within
``STALENESS_BOUND`` rounds of its last driver hash, but it cannot tell
that an entry's CODE changed after that hash — the r8 precision sweep
left six entries locally verified yet driver-stale for two rounds, and
the r9 ANALYZE rewrite repeated the pattern. The fix: fingerprint each
entry's Spark-side source (the registered function plus the transitive
closure of repo-defined functions/classes it reaches) together with its
oracle SQL; record the fingerprint of the code the driver actually
hashed (``tools/record_fingerprints.py``, run at round start before any
edits); and let :func:`changed_entries` feed
``compute_driver_priority`` so any edited entry self-schedules into the
very next correctness window instead of waiting out the age bound.

Closure scope: starting from the registered callable, every global name
reachable through ``co_names``/nested code objects is resolved in the
function's module globals; resolved functions and classes whose
``__module__`` lives under this package are included (source text) and
recursed into. This catches the common pattern where the registered
entry is a two-line composition over module-level helpers (e.g.
``orders_column_ndv_kmv`` -> ``orders_kmv_state`` ->
``kmin_merge_agg``). It deliberately does NOT hash third-party modules
or data files; the age bound remains the backstop for anything the
closure cannot see.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

_PACKAGE = "windowsession_using_kafka_flink_docker_spark"

#: Repo-root file written by ``tools/record_fingerprints.py``. Maps
#: entry name -> {"round": R, "fingerprint": hex} where R is the round
#: whose driver snapshot certified exactly this source+oracle content.
RECORD_FILE = "CERTIFIED_FINGERPRINTS.json"


def _iter_code_names(code):
    """All global names referenced by a code object, including names
    used inside nested code objects (lambdas, comprehensions)."""
    yield from code.co_names
    for const in code.co_consts:
        if inspect.iscode(const):
            yield from _iter_code_names(const)


def _is_repo_defined(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return bool(mod) and (mod == _PACKAGE or mod.startswith(_PACKAGE + "."))


def _source_closure(fn) -> list[tuple[str, str, str]]:
    """Deterministic list of ``(module, qualname, source)`` for ``fn``
    and every repo-defined function/class transitively reachable from it
    through global-name references."""
    seen: dict[tuple[str, str], str] = {}
    stack = [fn]
    visited_ids: set[int] = set()
    while stack:
        obj = stack.pop()
        if id(obj) in visited_ids:
            continue
        visited_ids.add(id(obj))
        if not _is_repo_defined(obj):
            continue
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):  # builtins, C extensions, REPL defs
            continue
        key = (obj.__module__, getattr(obj, "__qualname__", repr(obj)))
        seen[key] = src
        # collect the code objects to mine for further global names
        codes = []
        if inspect.isfunction(obj):
            codes.append(obj.__code__)
            globalns = obj.__globals__
        elif inspect.isclass(obj):
            globalns = vars(inspect.getmodule(obj)) if inspect.getmodule(obj) else {}
            for member in vars(obj).values():
                member_fn = getattr(member, "__func__", member)
                if inspect.isfunction(member_fn):
                    codes.append(member_fn.__code__)
        else:
            continue
        for code in codes:
            for name in _iter_code_names(code):
                target = globalns.get(name)
                if target is not None and (inspect.isfunction(target)
                                           or inspect.isclass(target)):
                    stack.append(target)
    return [(m, q, seen[(m, q)]) for m, q in sorted(seen)]


def entry_fingerprint(spark_fn, oracle: str | None) -> str:
    """sha256 over the entry's transitive repo source closure + oracle
    SQL. Stable across processes (pure text, sorted order)."""
    h = hashlib.sha256()
    for module, qualname, src in _source_closure(spark_fn):
        h.update(module.encode())
        h.update(b"\x00")
        h.update(qualname.encode())
        h.update(b"\x00")
        h.update(src.encode())
        h.update(b"\x00")
    h.update(b"--oracle--\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()


def _repo_root() -> str:
    # plans/ -> package/ -> repo root
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def load_recorded(root: str | None = None) -> dict[str, dict]:
    path = os.path.join(root or _repo_root(), RECORD_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def changed_entries(catalog, recorded: dict[str, dict]) -> frozenset[str]:
    """Entries whose CURRENT source+oracle fingerprint differs from the
    recorded certified fingerprint. Entries with no record (never
    certified, or pre-bootstrap) are NOT flagged — the never-checked
    bucket and the age bound cover those."""
    changed = set()
    for name, spec in catalog.items():
        rec = recorded.get(name)
        if rec is None:
            continue
        if entry_fingerprint(spec.spark, spec.oracle) != rec["fingerprint"]:
            changed.add(name)
    return frozenset(changed)

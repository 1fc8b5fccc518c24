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
``kmin_merge_agg``). Referenced module-level CONSTANTS (ints, strings,
tuples, pyspark schema objects, ...) are hashed too, by deterministic
repr — editing e.g. a sample-size ``K`` or a state ``StructType``
changes the entry's behavior without touching any function body, and
must flag the entry as changed (r10 ADVICE). Blind spots that remain:
third-party modules, data files, and constants whose type has no
deterministic repr (skipped, listed in :data:`_CONST_TYPES`); the age
bound is the backstop for those.
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
    used inside nested code objects (lambdas, comprehensions).

    Deliberate over-approximation (r11 ADVICE): ``co_names`` also holds
    ATTRIBUTE names (``x.foo`` puts ``foo`` here), so an attribute that
    happens to share its name with a module-level constant makes that
    constant hash into the closure even when never read as a global.
    The failure direction is safe — an edit to the colliding constant
    spuriously marks the entry changed and over-schedules it into the
    next window; a real dependency is never missed. Walking only
    LOAD_GLOBAL via ``dis`` would be exact but couples the fingerprint
    to bytecode details that shift across CPython minors; a fingerprint
    that silently changes on interpreter upgrade would mass-invalidate
    the certified record, which is worse than the rare extra re-check."""
    yield from code.co_names
    for const in code.co_consts:
        if inspect.iscode(const):
            yield from _iter_code_names(const)


def _is_repo_defined(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return bool(mod) and (mod == _PACKAGE or mod.startswith(_PACKAGE + "."))


#: Scalar constant types with process-independent reprs. set/frozenset
#: are handled separately (element order depends on PYTHONHASHSEED for
#: strings, so their reprs are re-sorted); containers recurse.
_CONST_TYPES = (type(None), bool, int, float, complex, str, bytes)


def _const_repr(value, _depth: int = 0) -> str | None:
    """Deterministic repr for a module-level constant, or None when the
    value's type has no process-independent repr (objects repr with
    memory addresses; modules/arrays are out of scope). Covers the
    constant shapes the plans actually use: scalars, tuples/lists/dicts
    of them, sets (sorted), and pyspark DataType trees (StructType repr
    is pure field text)."""
    if _depth > 6:
        return None
    if isinstance(value, _CONST_TYPES):
        return repr(value)
    if isinstance(value, (tuple, list)):
        parts = [_const_repr(v, _depth + 1) for v in value]
        if any(p is None for p in parts):
            return None
        return f"{type(value).__name__}[{', '.join(parts)}]"
    if isinstance(value, dict):
        parts = []
        for k, v in value.items():
            kr = _const_repr(k, _depth + 1)
            vr = _const_repr(v, _depth + 1)
            if kr is None or vr is None:
                return None
            parts.append(f"{kr}: {vr}")
        return "dict{%s}" % ", ".join(parts)
    if isinstance(value, (set, frozenset)):
        parts = [_const_repr(v, _depth + 1) for v in value]
        if any(p is None for p in parts):
            return None
        return f"{type(value).__name__}{{{', '.join(sorted(parts))}}}"
    try:  # pyspark schema constants (StructType/StructField/DataType)
        from pyspark.sql.types import DataType
        if isinstance(value, DataType):
            return repr(value)
    except ImportError:  # pragma: no cover
        pass
    return None


def _source_closure(fn) -> tuple[list[tuple[str, str, str]],
                                 list[tuple[str, str, str]]]:
    """Deterministic ``(sources, constants)`` for ``fn`` and every
    repo-defined function/class transitively reachable from it through
    global-name references. ``sources`` is ``(module, qualname,
    source)``; ``constants`` is ``(module, name, repr)`` for every
    referenced module-level non-callable with a deterministic repr —
    behavior-bearing values like sample sizes and state schemas live
    there (r10 ADVICE)."""
    seen: dict[tuple[str, str], str] = {}
    consts: dict[tuple[str, str], str] = {}
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
        module = obj.__module__
        for code in codes:
            for name in _iter_code_names(code):
                target = globalns.get(name)
                if target is None:
                    continue
                if inspect.isfunction(target) or inspect.isclass(target):
                    stack.append(target)
                elif not callable(target) and not inspect.ismodule(target):
                    r = _const_repr(target)
                    if r is not None:
                        consts[(module, name)] = r
    return ([(m, q, seen[(m, q)]) for m, q in sorted(seen)],
            [(m, n, consts[(m, n)]) for m, n in sorted(consts)])


def entry_fingerprint(spark_fn, oracle: str | None) -> str:
    """sha256 over the entry's transitive repo source closure, the
    referenced module-level constants, and the oracle SQL. Stable across
    processes (pure text, sorted order, hash-seed-independent reprs)."""
    sources, constants = _source_closure(spark_fn)
    h = hashlib.sha256()
    for module, qualname, src in sources:
        h.update(module.encode())
        h.update(b"\x00")
        h.update(qualname.encode())
        h.update(b"\x00")
        h.update(src.encode())
        h.update(b"\x00")
    h.update(b"--constants--\x00")
    for module, name, rep in constants:
        h.update(module.encode())
        h.update(b"\x00")
        h.update(name.encode())
        h.update(b"\x00")
        h.update(rep.encode())
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

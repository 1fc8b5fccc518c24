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
must flag the entry as changed (r10 ADVICE).

Algorithm versions: the bm25_topk qf-unification landing (SURVEY 2.116)
showed that MODULE-ATTRIBUTE references (``T.bm25_topk(...)`` where
``T`` is a repo-module alias) were invisible to the v1 closure — the
name does not resolve in the function's module globals, so the
attributed function's body never reached the hash, and editing it
flagged nothing (41 entries exposed, ``tools/closure_blindspots.py``).
ALGO ``v2`` closes that class: an unresolved name that IS an attribute
of a repo-module alias visible to the function joins the closure
(functions/classes recursed, constants hashed by repr) — and the
module aliases include function-LOCAL imports, recovered from the
dotted IMPORT_NAME paths ``co_names`` carries, so ``from pkg.mod
import y`` inside a body attributes ``y`` to ``pkg.mod`` the same way
(this was the second v1 gap: the capped_sessionization entry's
operator body never reached its hash). Migration is version-pinned,
never mass-invalidating: each record in
``CERTIFIED_FINGERPRINTS.json`` carries the algorithm that produced it,
:func:`changed_entries` compares every record UNDER ITS OWN algorithm,
and ``tools/record_fingerprints.py`` writes the current ALGO — so
pre-existing v1 records keep their change-detection until the next
round-start re-record upgrades them, and nothing is spuriously flagged
by the algorithm switch itself. Blind spots that remain in v2:
third-party modules, data files, and constants whose type has no
deterministic repr (skipped, listed in :data:`_CONST_TYPES`); the age
bound and the per-round full-catalog sf0.1 sweeps are the backstop for
those.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os

_PACKAGE = "windowsession_using_kafka_flink_docker_spark"

#: Current fingerprint algorithm. "v1": direct-global resolution only.
#: "v2": additionally resolves repo-module ATTRIBUTE references into
#: the closure. Records compare under the algorithm that produced them.
ALGO = "v2"

#: Repo-root file written by ``tools/record_fingerprints.py``. Maps
#: entry name -> {"round": R, "fingerprint": hex, "algo": "v2"} where R
#: is the round whose driver snapshot certified exactly this
#: source+oracle content (records without "algo" are v1).
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


def _source_closure(fn, resolve_module_attrs: bool = True,
                    ) -> tuple[list[tuple[str, str, str]],
                               list[tuple[str, str, str]]]:
    """Deterministic ``(sources, constants)`` for ``fn`` and every
    repo-defined function/class transitively reachable from it through
    global-name references. ``sources`` is ``(module, qualname,
    source)``; ``constants`` is ``(module, name, repr)`` for every
    referenced module-level non-callable with a deterministic repr —
    behavior-bearing values like sample sizes and state schemas live
    there (r10 ADVICE).

    With ``resolve_module_attrs`` (ALGO v2), a name that does NOT
    resolve in the function's module globals is additionally looked up
    as an attribute of every repo-module alias visible to the function
    (``T.bm25_topk`` with ``T = operators.text_analysis``): matching
    repo functions/classes join the closure, matching constants hash
    under the OWNING module's name. Same safe over-approximation
    direction as ``_iter_code_names`` — a DataFrame-method name that
    happens to collide with a repo-module attribute pulls that
    attribute in spuriously, which can only over-schedule, never miss."""
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
        all_names: list[str] = []
        for code in codes:
            all_names.extend(_iter_code_names(code))
        repo_mods = []
        if resolve_module_attrs:
            mods = {val.__name__: val for val in globalns.values()
                    if inspect.ismodule(val)
                    and getattr(val, "__name__", "").startswith(_PACKAGE)}
            # function-LOCAL imports: ``from pkg.mod import y`` compiles
            # to IMPORT_NAME "pkg.mod" + IMPORT_FROM "y", both in
            # co_names — the dotted path names the module, and the
            # attribute fallback below then attributes ``y`` to it
            # (closes the local-import blind spot, e.g. the
            # capped_sessionization entry's operator import). IMPORT the
            # module rather than peeking at sys.modules: the hash must
            # not depend on what happens to be imported already (a
            # lazily-imported module would drop out of the closure in
            # one process and join it in another, flipping the
            # fingerprint between identical trees).
            for name in all_names:
                if name.startswith(_PACKAGE) and "." in name:
                    try:
                        mods[name] = importlib.import_module(name)
                    except ImportError:
                        pass  # dynamic/dead path — age bound covers it
            repo_mods = [mods[k] for k in sorted(mods)]
        for code in codes:
            for name in _iter_code_names(code):
                target = globalns.get(name)
                if target is None or inspect.ismodule(target):
                    # v2: unresolved (or module-shadowed) name — try it
                    # as an attribute of each visible repo-module alias
                    for m in repo_mods:
                        tgt = getattr(m, name, None)
                        if inspect.isfunction(tgt) or inspect.isclass(tgt):
                            if _is_repo_defined(tgt):
                                stack.append(tgt)
                        elif tgt is not None and not callable(tgt) \
                                and not inspect.ismodule(tgt):
                            r = _const_repr(tgt)
                            if r is not None:
                                consts[(m.__name__, name)] = r
                    continue
                if inspect.isfunction(target) or inspect.isclass(target):
                    stack.append(target)
                elif not callable(target) and not inspect.ismodule(target):
                    r = _const_repr(target)
                    if r is not None:
                        consts[(module, name)] = r
    return ([(m, q, seen[(m, q)]) for m, q in sorted(seen)],
            [(m, n, consts[(m, n)]) for m, n in sorted(consts)])


def entry_fingerprint(spark_fn, oracle: str | None, algo: str = ALGO) -> str:
    """sha256 over the entry's transitive repo source closure, the
    referenced module-level constants, and the oracle SQL. Stable across
    processes (pure text, sorted order, hash-seed-independent reprs).
    ``algo`` selects the closure rules — pass a record's own algorithm
    when comparing against it (v1 hashes stay byte-identical to the
    pre-v2 implementation)."""
    sources, constants = _source_closure(
        spark_fn, resolve_module_attrs=(algo != "v1"))
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
    recorded certified fingerprint — each record compared UNDER ITS OWN
    algorithm (see ALGO), so an algorithm upgrade never mass-flags the
    catalog. Entries with no record (never certified, or pre-bootstrap)
    are NOT flagged — the never-checked bucket and the age bound cover
    those."""
    changed = set()
    for name, spec in catalog.items():
        rec = recorded.get(name)
        if rec is None:
            continue
        algo = rec.get("algo", "v1")
        if entry_fingerprint(spec.spark, spec.oracle,
                             algo=algo) != rec["fingerprint"]:
            changed.add(name)
    return frozenset(changed)

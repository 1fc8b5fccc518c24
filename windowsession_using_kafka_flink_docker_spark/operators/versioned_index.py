"""Shared versioned-increment plumbing for persisted serving indexes.

Both maintained indexes — BM25 postings (operators/bm25_index.py,
maintainer #25) and the near-dup LSH index (operators/neardup_index.py,
maintainer #26) — follow the same on-disk discipline:

- an index is a set of COMPONENTS (``postings``/``doclens``;
  ``bands``/``bucket_counts``/``shingles``/``pairs``), each a directory
  of ``inc=<n>`` increments, one per ingest, each increment carrying
  its own ``_SUCCESS`` commit marker;
- readers require every component to hold the SAME committed increment
  set (fail closed on any mismatch — an ingest interrupted between
  component writes must never silently mis-serve);
- a re-driven increment overwrites in place (replay-idempotent; the
  streaming maintainers key ``inc`` on batch_id);
- COMPACTION folds all increments EXCEPT THE NEWEST into the fixed
  ``inc=00000`` via tmp-then-swap: the folded union of every component
  is written to a ``compact_tmp`` sibling first (committed), then the
  folded ``inc=`` dirs are deleted and the tmp dirs renamed in
  component order. The newest increment is deliberately left alone —
  it is the only one a crash-replayed micro-batch can overwrite, and
  folding it would double its rows on redelivery. Every crash point
  re-enters: a half-written tmp set is discarded (increments intact);
  a fully committed tmp set resumes the delete+rename; a mid-rename
  crash leaves components mismatched — reads FAIL CLOSED until the
  next compact call completes the remaining renames.

This module is the single implementation of that discipline; the index
modules contribute only their component list, per-component partition
columns, and the domain math.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

COMPACT_TARGET = "inc=00000"
_COMPACT_TMP = "compact_tmp"  # does not start with "inc=": never listed


def increments(path: str, comp: str) -> list[str]:
    """Sorted ``inc=<n>`` leaf names present under a component."""
    d = os.path.join(path, comp)
    if not os.path.isdir(d):
        return []
    return sorted(x for x in os.listdir(d) if x.startswith("inc="))


def _filtered(incs: list[str], before_inc: int | None) -> list[str]:
    if before_inc is None:
        return incs
    return [x for x in incs if int(x.split("=")[1]) < before_inc]


def check_components_committed(path: str, comps: tuple[str, ...],
                               kind: str,
                               before_inc: int | None = None) -> list[str]:
    """The fail-closed reader guard: every component's (optionally
    ``before_inc``-scoped) increment set must match exactly, and every
    increment must carry its commit marker. Returns the committed
    increment leaves. ``kind`` names the index in error messages."""
    sets = {c: _filtered(increments(path, c), before_inc) for c in comps}
    first = sets[comps[0]]
    if any(s != first for s in sets.values()):
        raise ValueError(
            f"{kind} index under {path} has mismatched increments "
            f"({sets}) — an export or append was interrupted between "
            "components; re-drive the increment before reading")
    for c in comps:
        for x in first:
            if not os.path.exists(os.path.join(path, c, x, "_SUCCESS")):
                raise ValueError(
                    f"{kind} index under {path} is missing the commit "
                    f"marker for {c}/{x} — the increment write was "
                    "interrupted; re-drive it before reading")
    return first


def next_increment(path: str, comp: str) -> int:
    incs = increments(path, comp)
    return 1 + max((int(x.split("=")[1]) for x in incs), default=-1)


def read_component(spark: SparkSession, path: str, comp: str,
                   incs: list[str],
                   before_inc: int | None = None) -> DataFrame | None:
    """Read a component across increments with ``basePath`` so ``inc``
    is a discovered partition column (dropped), preserving any deeper
    partition columns for pruning. None when the scoped set is empty."""
    incs = _filtered(incs, before_inc)
    if not incs:
        return None
    return (spark.read.option("basePath", os.path.join(path, comp))
            .parquet(*[os.path.join(path, comp, x) for x in incs])
            .drop("inc"))


def write_increment(df: DataFrame, path: str, comp: str, inc: int,
                    partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(path, comp, f"inc={inc:05d}"))


def compact_components(
        spark: SparkSession, path: str,
        comps: dict[str, tuple[str, ...]], kind: str) -> int:
    """Fold all increments except the newest into ``inc=00000`` across
    every component of ``comps`` (name -> partition columns) — the
    read-amplification control (module docstring has the crash-safety
    argument). Returns the number of increments folded (0 = no-op)."""
    names = tuple(comps)

    def tmp(c: str) -> str:
        return os.path.join(path, c, _COMPACT_TMP)

    def committed(c: str) -> bool:
        return os.path.exists(os.path.join(tmp(c), "_SUCCESS"))

    present = [c for c in names if os.path.isdir(tmp(c))]
    # Recovery disambiguation relies on the FIXED component order used
    # for both tmp writes and renames:
    # - a PARTIAL tmp set containing the first component = crash
    #   between tmp writes (nothing deleted/renamed yet): discard the
    #   tmps and restart from the intact increments;
    # - a tmp set missing the first component = crash mid-rename (the
    #   absent components' renames completed, deletions done): finish
    #   the remaining renames;
    # - the FULL committed set = crash before/during delete+rename:
    #   finish;
    # - any half-written tmp (no marker) only occurs before renames
    #   start, so it always falls in the discard case.
    if present and (not all(committed(c) for c in present)
                    or (names[0] in present
                        and len(present) < len(names))):
        for c in present:
            shutil.rmtree(tmp(c))
        present = []
    if present:
        n = max(len(increments(path, names[0])) - 1, 0)
        _finish_compaction(path, comps)
        return n if len(present) == len(names) else 0

    incs = check_components_committed(path, names, kind)
    folded = incs[:-1]
    if not folded or folded == [COMPACT_TARGET]:
        return 0
    for c, parts in comps.items():
        df = read_component(spark, path, c, folded)
        w = df.write.mode("overwrite")
        if parts:
            w = w.partitionBy(*parts)
        w.parquet(tmp(c))
    _finish_compaction(path, comps)
    return len(folded)


def _finish_compaction(path: str,
                       comps: dict[str, tuple[str, ...]]) -> None:
    """Delete every folded increment (all but the newest) and rename
    each committed tmp into ``inc=00000``, in component order — a
    mid-sequence crash is detectable (mismatched components fail
    closed) and the next call completes only the missing renames."""
    for c in comps:
        tmp = os.path.join(path, c, _COMPACT_TMP)
        if not os.path.isdir(tmp):
            continue  # this component already renamed by a prior attempt
        incs = increments(path, c)
        newest = incs[-1] if incs else None
        for leaf in incs:
            if leaf != newest:
                shutil.rmtree(os.path.join(path, c, leaf))
        os.rename(tmp, os.path.join(path, c, COMPACT_TARGET))

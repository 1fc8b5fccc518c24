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
  is written to a ``compact_tmp`` sibling first (committed, with a
  ``_folded.txt`` manifest naming exactly the folded leaves), then the
  MANIFESTED ``inc=`` dirs are deleted and the tmp dirs renamed in
  component order. The newest increment is deliberately left alone —
  it is the only one a crash-replayed micro-batch can overwrite, and
  folding it would double its rows on redelivery. Every crash point
  re-enters: a half-written tmp set is discarded (increments intact);
  a fully committed tmp set resumes the delete+rename; a mid-rename
  crash leaves components mismatched — reads FAIL CLOSED until the
  next compact call completes the remaining renames. The manifest is
  what makes the swap safe against a VIOLATED quiescence contract
  (r15 ADVICE): deletion is confined to the leaves actually folded
  into the tmp, so an increment that lands between the fold and the
  finish is never rmtree'd — the finish detects it (more than one
  non-manifested leaf) BEFORE deleting anything and, when no rename
  has happened yet, discards the stale tmps so the next fold rebuilds
  with the extra increments included (self-healing, r16 ADVICE); only
  a violation discovered mid-rename — a genuinely torn index — fails
  loudly.

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
_FOLDED = "_folded.txt"  # underscore prefix: invisible to parquet reads


def _read_manifest(tmp_dir: str) -> list[str]:
    with open(os.path.join(tmp_dir, _FOLDED)) as fh:
        return [x for x in fh.read().split("\n") if x]


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
        # A tmp is committed only once BOTH the Spark marker and the
        # fold manifest exist — a crash between them leaves a tmp whose
        # folded set is unknowable, which must be discarded (safe:
        # nothing is deleted until _finish_compaction).
        return (os.path.exists(os.path.join(tmp(c), "_SUCCESS"))
                and os.path.exists(os.path.join(tmp(c), _FOLDED)))

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
        n = len(_read_manifest(tmp(present[0])))
        completed = _finish_compaction(path, comps)
        return n if completed and len(present) == len(names) else 0

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
        # Manifest AFTER the Spark write (overwrite wipes the dir):
        # records exactly which leaves this tmp folded, so the finish
        # deletes those and only those.
        with open(os.path.join(tmp(c), _FOLDED), "w") as fh:
            fh.write("\n".join(folded))
    return len(folded) if _finish_compaction(path, comps) else 0


def _finish_compaction(path: str,
                       comps: dict[str, tuple[str, ...]]) -> bool:
    """Delete exactly the MANIFESTED increments (the leaves actually
    folded into each tmp) and rename each committed tmp into
    ``inc=00000``, in component order — a mid-sequence crash is
    detectable (mismatched components fail closed) and the next call
    completes only the missing renames. Deleting 'all but newest' at
    finish time instead (the pre-r16 behavior) silently dropped any
    increment that landed between the fold and the finish: the
    previously-newest UNFOLDED leaf became non-newest and was rmtree'd
    (r15 ADVICE). A violated quiescence contract (at fold time exactly
    one leaf — the then-newest — stays outside the fold, so more than
    one non-manifested leaf means ingests ran mid-compaction) is
    audited for EVERY pending component BEFORE anything is deleted:

    - if no rename has happened yet (all components still hold their
      tmps), the committed tmps are DISCARDED — increments are fully
      intact, so this is safe, self-healing, and lets the next fold
      rebuild with the extra increments included (r16 ADVICE: the
      previous permanent ValueError re-raised on every later compact,
      failing the wired streaming job on every run);
    - mid-rename (some components already swapped), a violation is
      genuinely torn — raise with the manual recovery spelled out.

    Returns True when the swap completed, False when it was aborted by
    the discard path (nothing changed on disk except the tmps).
    """
    names = tuple(comps)
    pending = [c for c in names
               if os.path.isdir(os.path.join(path, c, _COMPACT_TMP))]
    violated = []
    for c in pending:
        folded = _read_manifest(os.path.join(path, c, _COMPACT_TMP))
        extras = [x for x in increments(path, c) if x not in folded]
        if len(extras) > 1:
            violated.append((c, extras))
    if violated:
        if len(pending) == len(names):
            # Nothing deleted or renamed yet: discarding the tmps is
            # safe and restores the pre-compaction state exactly.
            for c in pending:
                shutil.rmtree(os.path.join(path, c, _COMPACT_TMP))
            return False
        raise ValueError(
            f"compaction of {path} found increments beyond the fold "
            f"manifest ({violated}) AFTER some components were already "
            f"renamed (pending: {pending}) — ingests ran while a "
            "mid-rename recovery was in flight; the index is torn. "
            "Manual recovery: finish the pending components by hand "
            "(delete each one's manifested inc= leaves, then rename "
            "its compact_tmp to inc=00000), or restore from the "
            "renamed components' inc=00000")
    for c in pending:
        tmp = os.path.join(path, c, _COMPACT_TMP)
        folded = _read_manifest(tmp)
        for leaf in folded:
            try:
                shutil.rmtree(os.path.join(path, c, leaf))
            except FileNotFoundError:
                pass  # already deleted by a prior finish attempt
        # The manifest rides into inc=00000 through the atomic rename
        # (removing it first would open a crash window where folded
        # leaves are deleted but the tmp looks uncommitted and gets
        # discarded); underscore files are invisible to parquet reads.
        os.rename(tmp, os.path.join(path, c, COMPACT_TARGET))
        os.remove(os.path.join(path, c, COMPACT_TARGET, _FOLDED))
    return True

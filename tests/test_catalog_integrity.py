"""Registry integrity: the driver contract is only as good as the catalog
bookkeeping behind it."""

from __future__ import annotations

from windowsession_using_kafka_flink_docker_spark.plans.catalog import (
    CATALOG,
    DRIVER_PRIORITY,
    oracle_sql,
    queries,
)


def test_driver_priority_names_exist():
    """_ordered() silently skips unknown names — a typo here would quietly
    push an entry out of the driver's correctness window."""
    missing = [n for n in DRIVER_PRIORITY if n not in CATALOG]
    assert not missing, f"DRIVER_PRIORITY names not in CATALOG: {missing}"


def test_driver_priority_no_duplicates():
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))


def test_queries_and_oracles_consistent():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    assert list(q)  # non-empty, ordered
    # every registered entry surfaces exactly once
    assert sorted(q) == sorted(CATALOG)


def test_every_entry_documented():
    undocumented = [n for n, s in CATALOG.items() if not s.description.strip()]
    assert not undocumented
    untagged = [n for n, s in CATALOG.items() if not s.tags]
    assert not untagged


def test_priority_covers_all_post_snapshot_entries():
    """Every entry without a driver row in the LATEST correctness snapshot
    must be in the priority front so the next snapshot sees it."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))[-1]
    with open(latest) as f:
        seen = set(json.load(f))
    # Entries deliberately left outside the window (rationale at their
    # catalog.py comment) — each yield keeps a core-parity row inside.
    yielded = {"orc_roundtrip_revenue", "tfidf_search", "unpivot_order_counts",
               "user_event_sequences"}
    unseen = [n for n in CATALOG if n not in seen]
    not_prioritized = [n for n in unseen
                       if n not in DRIVER_PRIORITY and n not in yielded]
    assert not not_prioritized, (
        f"never-driver-checked entries missing from DRIVER_PRIORITY: "
        f"{not_prioritized}")

"""STAGING — drafts not yet registered (window-slot discipline).

Drafted code + DuckDB oracles land here, verified locally by
tests/test_staging_r15.py, and move behind ``@register`` the round the
driver window has free slots (tools/promote_staging.py does the
arithmetic). This module is deliberately NOT imported by
plans/catalog.py — nothing here can perturb a certified entry's
fingerprint closure.

Promotion history:

- r15: ``session_top2_per_user`` / ``session_top10_global`` ->
  plans/parity.py; the ``curation_pipeline_e2e`` single-scan rewrite
  landed in plans/curation.py.
- r16: the ``quality_scores`` exact-e4 rewrite landed in
  plans/llm_pipeline.py.
- r17: the 7-entry exact-e2 session-family rewrite landed in
  operators/sessionize.py + plans/parity.py (streaming twins inherit
  through streaming/pipeline.py).
- r18 window: the ``capped_sessionization`` exact-e2 rewrite landed in
  operators/capped_sessionize.py (streaming twin streaming/stateful.py
  moved to BIGINT-cents state in the same commit); the ``bm25_topk``
  qf-unification landed in operators/text_analysis.py (value-neutral
  on distinct-term queries, so no rewrite slot was consumed); and ALL
  EIGHT remaining drafts promoted — ``event_type_crosscorr`` +
  ``isotonic_monthly_revenue`` -> plans/relational.py,
  ``incremental_session_merge`` + ``late_event_session_repair`` ->
  plans/parity.py, ``ivf_index_persist_roundtrip`` +
  ``incremental_neardup_probe`` + ``incremental_bm25_search`` +
  ``semantic_rrf_hybrid_search`` -> plans/llm_pipeline.py (shared
  helpers to operators/scratch.py and operators/similarity.py; the
  staleness-bound relaxation 4 -> 5 opened the slots for the last
  two). Draft tests moved to tests/test_maintenance_entries.py,
  tests/test_analytics.py and tests/test_text_ops.py.

The queue is EMPTY. New drafts register here as
``STAGED[name] = (spark_fn, oracle_sql, description, tags)`` (the
exact shape the promotion round's @register call takes) and
registered-entry rewrites as ``REWRITES[name] = (spark_fn,
oracle_sql)``; tests/test_staging_r15.py gates both automatically.
"""

from __future__ import annotations

#: name -> (spark_fn, oracle_sql, description, tags) — kept OUT of the
#: catalog until a window has free slots.
STAGED: dict = {}

#: Registered-entry rewrites queued for a future window: name ->
#: (spark_fn, oracle_sql). Landing day replaces the registered entry's
#: body/oracle and clears the queue slot.
REWRITES: dict = {}

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from windowsession_using_kafka_flink_docker_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Slow tier (VERDICT r17 item 3): the suite outgrew the driver's verify
#: budget (r17: ~33 min wall, the driver's pytest window expired at ~96%
#: with zero failures, so the gate certified nothing). The tests below —
#: every call >= 10 s in the timed full run (702 s of the 2010 s total,
#: mostly exhaustive property drills and crash/restart streaming drills
#: whose operators also have fast siblings in the same files) — are
#: skipped unless SPARK_GRAFT_SLOW_TESTS=1, bringing the default run to
#: ~22 min. The FULL tier (SPARK_GRAFT_SLOW_TESTS=1) is run at every
#: round close and its tally recorded in the round doc; the default tier
#: is what the driver's budgeted `pytest tests/ -x -q` certifies.
_SLOW_TESTS = {
    "tests/test_maintenance_entries.py::test_incremental_merge_equals_full_recompute_at_every_cutoff",
    "tests/test_properties.py::TestPagerankProperties::test_mass_bounds",
    "tests/test_streaming.py::TestWatermarkSemantics::test_partition_drift_monotonous_drops_in_order_rows",
    "tests/test_streaming.py::TestWatermarkSemantics::test_partition_drift_bounded_delay_keeps_rows",
    "tests/test_streaming.py::TestCrashMidBatchDurability::test_crash_between_state_write_and_commit_no_double_count",
    "tests/test_properties.py::test_asof_join_matches_naive",
    "tests/test_properties.py::TestScd2Properties::test_version_invariants",
    "tests/test_maintenance_entries.py::TestMergeProperties::test_any_cutoff_merges_to_full_recompute",
    "tests/test_streaming.py::TestWatermarkSemantics::test_late_event_beyond_watermark_dropped",
    "tests/test_text_ops.py::TestBpeTokenizerTrain::test_hypothesis_word_tables",
    "tests/test_neardup_index_stream.py::test_count_triggered_compaction_is_invisible",
    "tests/test_session_store_stream.py::TestAtomRepairProperties::test_any_late_subset_repairs_to_full_recompute",
    "tests/test_properties.py::TestBloomProperties::test_no_false_negatives_and_exact_composition",
    "tests/test_neardup_index_stream.py::TestNearDupCompaction::test_compact_preserves_pairs_and_serving",
    "tests/test_streaming.py::TestRateSourceRestartUnderLoad::test_stop_start_under_load_exactly_once_and_pipeline_parity",
    "tests/test_neardup_index_stream.py::TestNearDupCompaction::test_compact_crash_points_reenter",
    "tests/test_properties.py::TestParseRoundTripProperties::test_wire_roundtrip_preserves_good_rows_drops_bad",
    "tests/test_dedup_similarity.py::TestTextNearDups::test_banding_checkpoint_is_deterministic",
    "tests/test_streaming.py::TestMaintainerStatePersistence::test_kill_restore_continue_bit_identical",
    "tests/test_neardup_index_stream.py::TestNearDupCompaction::test_half_written_tmp_prefix_is_discarded",
    "tests/test_partition_invariance.py::test_result_invariant_to_shuffle_partitions[eval_ngram_novelty]",
    "tests/test_neardup_index_stream.py::test_restart_resumes_on_same_checkpoint",
    "tests/test_writer.py::test_oversized_partition_value_splits",
    "tests/test_neardup_index_stream.py::test_stream_equals_batch",
    "tests/test_graph.py::test_uniform_on_cycle",
    "tests/test_neardup_index_stream.py::test_torn_batch_detected_then_healed",
    "tests/test_properties.py::TestSessionizationProperties::test_gap_boundary_merge_semantics",
    "tests/test_bm25_index_stream.py::test_stream_equals_batch_and_one_shot_index",
    "tests/test_properties.py::TestSessionizationProperties::test_events_partition_exactly_into_sessions",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (>=10 s): set SPARK_GRAFT_SLOW_TESTS=1; "
               "run in full at round close (see OPTIMIZATION_r18.md)")
    for item in items:
        if item.nodeid in _SLOW_TESTS:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("windowsession-tests", extra_conf={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "4g",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR

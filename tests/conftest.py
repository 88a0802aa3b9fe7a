from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# Fast-gate policy (verdict r11 item 1): the default run (`-m "not slow"`,
# pytest.ini) must finish inside the external verifier's budget (<15 min);
# the full suite grew past 2h and was killed unfinished in round 11. The
# heavy unit BATTERIES below (measured per-file on a quiet box, round 12:
# each 60-100s+ of property differentials / recall fits / streaming replays)
# move to the slow tier wholesale, except for a small allowlist of tests
# that guard THIS round's changes or are cheap planted-case differentials.
# Functional end-to-end coverage in the fast gate comes from the
# oracle/edge differential cores (driver window + bench headline) and the
# full plan-invariant sweep. Everything still runs under `-m ""`.
# ---------------------------------------------------------------------------

_SLOW_FILES: dict[str, set[str]] = {
    # file -> allowlist of test functions that STAY in the fast gate
    "test_editjoin.py": set(),            # naive-crossJoin oracles, slow by design
    "test_graph_ingest.py": set(),        # streaming ANN ingest battery
    "test_nndescent.py": set(),           # graph-ANN recall fits
    "test_graph_pq.py": set(),            # PQ/IVF recall fits
    "test_fit_sampling.py": set(),        # sampled-fit recall batteries
    "test_fuzz_expressions.py": set(),    # randomized expression battery
    "test_streaming_incremental.py": set(),
    "test_streaming_incremental_perceptual.py": set(),
    "test_streaming_heavyhitters.py": set(),
    "test_streaming_recovery.py": set(),
    "test_streaming_late.py": set(),
    "test_quantile.py": set(),            # covered by agg_*median oracle rows
    "test_zorder.py": set(),
    "test_operators.py": {
        # connected-components differentials + the pagerank/numpy pin —
        # both operators were rewritten this round
        "test_connected_components_chain_and_islands",
        "test_connected_components_path_graph_high_diameter",
        "test_connected_components_random_vs_union_find",
        "test_pagerank_matches_numpy_power_iteration",
        "test_operators_accept_empty_inputs",
    },
    "test_snapshots.py": {
        # append_split landed this round (stream_cdf_partitioned path)
        "test_append_split_equals_sequential_appends",
        "test_append_split_empty_value_is_plain_append",
        "test_append_split_enforces_constraints",
    },
    "test_ckpt_release.py": {
        # keep the cheap release/guard contracts; the 3-pass long-session
        # bound run is the slow one
        "test_release_all_persistent_releases_blocks",
        "test_release_all_persistent_refuses_during_active_stream",
        "test_release_all_persistent_survives_bad_rdd",
        "test_worker_spawn_flake_matcher",
    },
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SLOW_FILES:
            base = item.name.split("[")[0]
            if base not in _SLOW_FILES[fname]:
                item.add_marker(pytest.mark.slow)

# Default to the smallest SF for fast iteration; CI/driver-parity runs can set
# TEST_SF_DIR=/root/testdata/sf0.01 to match the driver's correctness gate.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    from corintick_spark.session import get_spark

    s = get_spark(app_name="corintick-spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle import duck_connection

    con = duck_connection(sf_dir)
    yield con
    con.close()

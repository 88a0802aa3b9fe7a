"""Global plan invariants: EVERY registry query's physical plan must be
free of the two classic scale-killers —

- ``CartesianProduct``: an all-pairs join that slipped past the bucketed /
  broadcast rewrites would be invisible at sf0.001 and fatal at 100 TB;
- ``BatchEvalPython`` (row-at-a-time Python UDF): the engine's contract is
  that Python only ever runs Arrow-batched (ArrowEvalPython / mapInPandas
  / applyInPandasWithState).

The per-query plan tests (test_plans.py) pin POSITIVE shapes for selected
queries; this sweep pins the NEGATIVE invariants for all of them, so a new
query can never silently introduce either anti-pattern. Queries that
execute work at plan-build time (streaming replays, iterative fits with
driver loops, store writes) are exercised elsewhere and skipped here —
each listed with the reason."""

from __future__ import annotations

import pytest

from corintick_spark.registry import load_all

QUERIES = load_all()

# plan-build for these runs real work (streaming query to a sink, driver
# iteration loops, store writes) — their execution behavior is covered by
# their own tests; planning them here would re-run minutes of work
SELF_EXECUTING = {
    name
    for name in QUERIES
    if name.startswith("stream_")
    or name
    in {
        "write_roundtrip",      # writes a store then reads it
        "storage_snapshot",     # commits snapshot versions then reads them
        "cluster_kmeans",       # driver-loop fit
        "similarity_ivf",       # fit + probe
        "similarity_pq",        # fit + encode
        "similarity_ivfpq",     # two fits
        "dedup_incremental",    # writes a signature table
        "dedup_image_incremental",  # writes an image signature table
        "dedup_audio_incremental",  # writes an audio signature table
        "source_python_stream", # runs a streaming query
        "graph_pagerank",       # iterative loop with checkpoints
        "agg_exact_median",     # driver-pass selection; returns a local relation
        "agg_group_median",     # driver-pass selection; returns a local relation
        "agg_group_quartiles",  # driver-pass selection; returns a local relation
        "graph_bfs",            # iterative frontier loop with checkpoints
    }
}

PLANNABLE = sorted(set(QUERIES) - SELF_EXECUTING)


@pytest.mark.parametrize("name", PLANNABLE)
def test_no_cartesian_and_no_row_python(name, spark, sf_dir):
    plan = (
        QUERIES[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: all-pairs join in plan"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use the Arrow tier"
    )


def test_no_driver_materialization_in_streaming_paths():
    """Verdict r04 item 2: no streaming path may materialize an unbounded
    table on the driver. Enforced at the source level — `.toPandas()` and
    `.collect()` must not appear in the streaming query/operator modules
    (per-batch work happens on Spark DataFrames via foreachBatch)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "corintick_spark"
    offenders = []
    for path in [root / "queries" / "streaming_queries.py", *sorted((root / "streaming").glob("*.py"))]:
        text = path.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if ".toPandas()" in line or ".collect()" in line:
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, "driver-side materialization in streaming path:\n" + "\n".join(offenders)

"""Two-phase-commit contract of the custom Arrow-IPC sink
(sources/arrow_sink.py): committed data round-trips exactly, a failed job
commits NOTHING, and overwrite replaces the previous committed set.
"""

from __future__ import annotations

import os

import pytest

from corintick_spark.sources.arrow_sink import (
    make_arrow_sink_datasource,
    read_back,
    register,
)


@pytest.fixture()
def sink_dir(tmp_path):
    return str(tmp_path / "sink")


def _register(spark):
    register(spark)


def test_roundtrip_exact(spark, sink_dir):
    _register(spark)
    df = spark.range(1000).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 7 AS STRING) AS k"
    ).repartition(4)
    df.write.format("arrowsink").option("path", sink_dir).mode("append").save()
    assert os.path.exists(os.path.join(sink_dir, "_SUCCESS"))
    t = read_back(sink_dir)
    assert t.num_rows == 1000
    got = sorted(zip(*[c.to_pylist() for c in t.columns]))
    want = sorted((i, i * 2, str(i % 7)) for i in range(1000))
    assert got == want
    # _SUCCESS records the committed row count
    assert open(os.path.join(sink_dir, "_SUCCESS")).read() == "1000"


def test_abort_commits_nothing(spark, sink_dir):
    _register(spark)
    df = spark.range(100).selectExpr(
        "id",
        "CASE WHEN id = 55 THEN raise_error('planted failure')"
        " ELSE CAST(id AS STRING) END AS v",
    ).repartition(4)
    with pytest.raises(Exception):
        df.write.format("arrowsink").option("path", sink_dir).mode(
            "append"
        ).save()
    # no committed files, no success marker; staging cleaned or empty
    # (the dir may not even exist if the job died before any task wrote)
    assert not os.path.exists(os.path.join(sink_dir, "_SUCCESS"))
    committed = (
        [f for f in os.listdir(sink_dir) if f.endswith(".arrow")]
        if os.path.isdir(sink_dir)
        else []
    )
    assert not committed


def test_overwrite_replaces(spark, sink_dir):
    _register(spark)
    a = spark.range(10).selectExpr("id")
    b = spark.range(3).selectExpr("id + 100 AS id")
    a.write.format("arrowsink").option("path", sink_dir).mode("append").save()
    b.write.format("arrowsink").option("path", sink_dir).mode(
        "overwrite"
    ).save()
    t = read_back(sink_dir)
    assert sorted(t.column("id").to_pylist()) == [100, 101, 102]


def test_abort_removes_staged_files_directly(tmp_path):
    """Drive the writer object directly: stage two task files, abort one
    job — staged files named by the messages are removed and staging is
    cleaned up (deterministic coverage of the abort path, which the
    Spark-level test can't guarantee reaches the staged state)."""
    import pyarrow as pa

    ArrowIpcWriter = make_arrow_sink_datasource()[1]

    path = str(tmp_path / "sink2")
    os.makedirs(path)
    w = ArrowIpcWriter(path, overwrite=False)
    batch = pa.record_batch({"id": pa.array([1, 2, 3], type=pa.int64())})
    m1 = w.write(iter([batch]))
    m2 = w.write(iter([batch]))
    staging = os.path.join(path, "_staging")
    assert len(os.listdir(staging)) == 2
    w.abort([m1, m2])
    assert not os.path.exists(staging)
    assert not [f for f in os.listdir(path) if f.endswith(".arrow")]

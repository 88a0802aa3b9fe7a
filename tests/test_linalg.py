"""Numpy differentials for the distributed linear-algebra tier
(operators/linalg.py): the Spark covariance must equal the locally
computed quantized covariance exactly, and the PCA projections must match
np.linalg.eigh's dominant component up to the documented sign convention.
"""

from __future__ import annotations

import numpy as np
import pytest

from corintick_spark.catalog import table
from corintick_spark.operators.linalg import Q_SCALE, covariance, pca_top_component


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    pdf = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    return ids, X


def _half_up(x: np.ndarray) -> np.ndarray:
    # HALF_UP (away from zero) — the module-wide convention shared by
    # gram_partials (np.trunc+copysign), F.round, and DuckDB round()
    return np.trunc(x + np.copysign(0.5, x)).astype(np.int64)


def _local_cov(X: np.ndarray) -> np.ndarray:
    q = _half_up(X * Q_SCALE)
    n = len(q)
    g = (q.T @ q).astype(np.float64)
    s = q.sum(axis=0).astype(np.float64)
    return g / (Q_SCALE * Q_SCALE) / n - np.outer(s / Q_SCALE / n, s / Q_SCALE / n)


def test_covariance_matches_numpy_exactly(spark, sf_dir, emb_np):
    _, X = emb_np
    local = _local_cov(X)
    rows = covariance(table(spark, sf_dir, "embeddings")).collect()
    d = X.shape[1]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        # identical integer moments + identical float expression ⇒ exact
        assert r["cov"] == pytest.approx(local[r["i"], r["j"]], abs=0.0, rel=0.0), (
            r["i"],
            r["j"],
        )


def test_pca_projection_matches_eigh(spark, sf_dir, emb_np):
    ids, X = emb_np
    local = _local_cov(X)
    evals, evecs = np.linalg.eigh(local)
    v = evecs[:, -1]
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    # spectral-gap guard: power iteration needs λ1 > λ2 to converge to v1
    assert evals[-1] > evals[-2] * 1.0001
    expected = dict(zip(ids.tolist(), (X @ v).tolist()))
    got = pca_top_component(table(spark, sf_dir, "embeddings")).collect()
    assert len(got) == len(ids)
    for r in got:
        assert r["pc1_projection"] == pytest.approx(
            expected[r["vec_id"]], abs=1e-6
        )


def test_cusum_closed_form_equals_recursive_fold(spark, sf_dir):
    """window_cusum's prefix-sum − running-min closed form must equal the
    textbook recursion s_i = max(0, s_{i-1} + d_i) exactly (integer
    arithmetic end to end)."""
    from collections import defaultdict

    from corintick_spark.registry import load_all

    rows = (
        load_all()["window_cusum"]
        .spark(spark, sf_dir)
        .collect()
    )
    got = {(r["user_id"], r["event_id"]): (r["cusum"], r["alarm"]) for r in rows}

    import pyspark.sql.functions as F

    from corintick_spark.catalog import table

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    n_checked = 0
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        s = 0
        for r in evs:
            d = round(r["value"] * 1_000_000) - 250_000_000
            s = max(0, s + d)
            cus, alarm = got[(uid, r["event_id"])]
            assert cus == s / 1_000_000, (uid, r["event_id"])
            assert alarm == (s > 500_000_000)
            n_checked += 1
    assert n_checked == len(got) > 0


def test_quantization_boundary_half_values(spark):
    """Exact-.5 boundary components (0.0625·1000 = 62.5, representable in
    float32) must quantize identically in gram_partials, F.round-based
    marginals, and the DuckDB-convention local model — HALF_UP everywhere.
    np.round (half-to-even) would give 62 here and break cov's internal
    gram-vs-mean consistency."""
    import pyspark.sql.functions as F

    from corintick_spark.operators.linalg import covariance, gram_partials

    vals = [0.0625, 0.1875, -0.0625, -0.1875]
    rows = [(i, [float(v), float(-v)]) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # gram diag for dim 0 must use q = HALF_UP(x*1000): 63, 188, -63, -188
    g = {
        (r["i"], r["j"]): r["g"]
        for r in gram_partials(df).groupBy("i", "j").agg(
            F.sum("g").alias("g")
        ).collect()
    }
    q = np.array([63, 188, -63, -188], dtype=np.int64)
    assert g[(0, 0)] == int((q * q).sum())
    assert g[(0, 1)] == int((q * -q).sum())

    X = np.array([[v, -v] for v in vals], dtype=np.float64)
    local = _local_cov(X)
    for r in covariance(df).collect():
        assert r["cov"] == pytest.approx(local[r["i"], r["j"]], abs=0.0)

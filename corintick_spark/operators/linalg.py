"""Distributed linear algebra over embedding columns — exact Gram/covariance
matrices and PCA power iteration.

The Spark-first shape for X^T·X over a tall-skinny matrix (n rows × d dims,
d small, n unbounded): each Arrow batch folds its rows into one d×d int64
partial Gram locally (numpy matmul — vectorized, no per-row Python), the
partials reduce through a partial+final hash aggregate keyed on (i, j) —
d² cells of shuffle regardless of corpus size. Exactness comes from the
scaled-long convention (corintick_spark.exact): components quantize to
round(x·1000) int64 BEFORE multiplying, so partial sums are integers and
the reduction is order-independent — the same numbers DuckDB's self-join
oracle computes.

The eigen step (PCA) then operates on a d×d matrix whose size is
data-independent — solving it driver-side is the same bounded-state
pattern as k-means centroids (clustering.py:61): the driver holds d²
doubles, never rows. Projections go back through a broadcast literal into
a JVM higher-order fold.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

GRAM_SCHEMA = "i int, j int, g long, n long"
Q_SCALE = 1000  # component quantization: round(x*1000) — float32 inputs
                # carry ~7 significant digits, 1e-3 resolution is exact
                # under the oracle's identical quantization


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle partial Gram sums per Arrow batch.

    Returns (i, j, g, n) rows with i<=j, where g = Σ q_i·q_j over the
    batch's vectors (q = round(x·1000) as int64) and n the number of
    vectors covering both dims — summed downstream by groupBy(i, j).
    Mixed-length vectors are handled per length group (a shorter vector
    contributes only its own dim pairs), NULL vectors are skipped —
    matching the SQL self-join semantics exactly.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v)]
            if not vecs:
                continue
            by_len: dict[int, list] = {}
            for v in vecs:
                by_len.setdefault(len(v), []).append(v)
            out_i, out_j, out_g, out_n = [], [], [], []
            for d, group in by_len.items():
                # one rounding convention module-wide: HALF_UP (half away
                # from zero), matching Spark F.round in covariance's
                # marginals and DuckDB round() in the oracle. np.round is
                # half-to-even and would quantize exact .5 boundaries
                # (e.g. 0.0625*1000 = 62.5, representable in float32)
                # differently from the other two paths.
                x = np.asarray(group, dtype=np.float64) * Q_SCALE
                q = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
                gram = q.T @ q  # d×d int64 — exact
                iu, ju = np.triu_indices(d)
                out_i.append(iu)
                out_j.append(ju)
                out_g.append(gram[iu, ju])
                out_n.append(np.full(len(iu), len(group), dtype=np.int64))
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i).astype(np.int32),
                    "j": np.concatenate(out_j).astype(np.int32),
                    "g": np.concatenate(out_g),
                    "n": np.concatenate(out_n),
                }
            )

    return df.select(vec_col).mapInPandas(fold, schema=GRAM_SCHEMA)


def covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact covariance matrix as (i, j, cov) rows, i<=j.

    cov_ij = E[q_i·q_j]/s² − (E[q_i]/s)(E[q_j]/s) with s the quantization
    scale — every expectation a ratio of exact integers, the final float
    expression evaluated identically by both engines.
    """
    g = (
        gram_partials(df, vec_col)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"), F.sum("n").alias("n"))
    )
    marg = (
        df.select(F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.sum(
                F.round(F.col("val").cast("double") * Q_SCALE).cast("bigint")
            ).alias("s"),
            F.count("*").alias("cnt"),
        )
    )
    mi = marg.select(
        F.col("dim").alias("i"), F.col("s").alias("si"), F.col("cnt").alias("ci")
    )
    mj = marg.select(
        F.col("dim").alias("j"), F.col("s").alias("sj"), F.col("cnt").alias("cj")
    )
    s2 = float(Q_SCALE * Q_SCALE)
    cov = (
        F.col("g").cast("double") / F.lit(s2) / F.col("n")
        - (F.col("si").cast("double") / F.lit(float(Q_SCALE)) / F.col("ci"))
        * (F.col("sj").cast("double") / F.lit(float(Q_SCALE)) / F.col("cj"))
    )
    return (
        g.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select("i", "j", cov.alias("cov"))
        .orderBy("i", "j")
    )


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every vector onto the top principal component.

    The covariance matrix collects to the driver — d² doubles, a
    data-size-INDEPENDENT amount (the bounded-state exception documented
    for k-means centroids) — and the d×d eigenproblem solves locally with
    LAPACK (np.linalg.eigh). Power iteration was deliberately rejected:
    embedding spectra are nearly flat (λ2/λ1 ≈ 0.93 on the test corpus),
    so it needs hundreds of matmuls for 1e-6 accuracy, and once C is
    driver-side there is nothing distributed left to gain — the
    distributed work is the covariance fold and the projection pass. The
    dominant eigenvector broadcasts back as a literal array; the
    projection is one JVM zip_with/aggregate fold per row, no Python.
    Sign fixed by making the largest-|component| coordinate positive, so
    results don't flip run-to-run.
    """
    rows = covariance(df, vec_col).collect()  # ≤ d(d+1)/2 rows, tiny
    if not rows:
        return df.select(
            F.col(id_col), F.lit(None).cast("double").alias("pc1_projection")
        ).limit(0)
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    v = np.linalg.eigh(C)[1][:, -1]
    pivot = int(np.argmax(np.abs(v)))
    if v[pivot] < 0:
        v = -v
    lit = "array(" + ",".join(f"{x!r}D" for x in v.tolist()) + ")"
    proj = F.expr(
        f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> CAST(x AS DOUBLE) * y),"
        " 0D, (s, p) -> s + p)"
    )
    return df.select(F.col(id_col), proj.alias("pc1_projection"))

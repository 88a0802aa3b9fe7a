"""Similarity search over embedding columns (array<float>).

Two paths:

- brute_force_topk — exact cosine top-k of a (small) query set against the
  corpus: broadcast the queries, one pass over the corpus, per-query heap
  via window row_number. Cost O(|corpus|·|queries|) — the right plan when
  queries fit in a broadcast (the common "probe" shape).
- lsh_topk — random-hyperplane LSH (sign-random-projection): bucket both
  sides by signature bands, search only within buckets. Approximate, but
  corpus-vs-corpus scale path: the join is an equi-join on band values, so
  at 100 TB it shuffles on well-distributed hash keys instead of exploding
  a crossJoin.

Dot products / norms are JVM higher-order functions over the arrays —
vectorized codegen, no Python. Hyperplane components are pseudo-random ±1
derived from xxhash64(j, d) so the whole operator is deterministic with no
driver-side randomness to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql import Window

from corintick_spark.operators.spread import spread_input


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )


def _norm2(a: str) -> Column:
    return F.expr(
        f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (s, v) -> s + v)"
    )


def _cosine(dot: Column, n2_a: Column, n2_b: Column) -> Column:
    """Cosine with a NULL (not ANSI-abort) result for zero-norm vectors.

    Spark 4 runs ANSI mode: a bare x/0.0 kills the whole job the moment one
    zero embedding appears in the corpus (they exist at 100 TB — padding
    rows, failed encoders). DuckDB yields NULL for double/0, so the
    nullif-guarded division is also exactly what every oracle computes;
    NULL scores then drop out of >=-threshold filters and sort last in
    top-k rankings. Found by the edge-dataset differential
    (tests: testdata/edge zero vector, vec_id 9001)."""
    return dot / F.nullif(F.sqrt(n2_a) * F.sqrt(n2_b), F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
    max_broadcast_rows: int | None = 100_000,
    on_large: str = "lsh",
    lsh_kwargs: dict | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. Returns (q_id, c_id, score, rank).

    Scale guard: the plan broadcasts the query side and is O(|corpus|·|queries|)
    — correct ONLY for the probe shape (a small query set). A caller passing
    a huge query side used to silently get a cluster-melting
    BroadcastNestedLoopJoin; now the query side is bounds-checked (one
    ``limit(n+1).count()`` probe, cost capped at the threshold) and, above
    ``max_broadcast_rows``:

    - ``on_large="lsh"`` (default): route to :func:`lsh_topk` — approximate
      recall, shuffle-bounded equi-join cost, the only sane corpus×corpus
      plan. A UserWarning notes the switch.
    - ``on_large="raise"``: ValueError for callers that require exactness.
    - ``max_broadcast_rows=None``: explicit opt-out of the guard.
    """
    if max_broadcast_rows is not None:
        probe = queries.limit(max_broadcast_rows + 1).count()
        if probe > max_broadcast_rows:
            if on_large == "raise":
                raise ValueError(
                    f"brute_force_topk: query side exceeds {max_broadcast_rows} "
                    "rows — not broadcastable; use lsh_topk (approximate) or "
                    "raise max_broadcast_rows explicitly"
                )
            import warnings

            warnings.warn(
                f"brute_force_topk: query side exceeds {max_broadcast_rows} "
                "rows; routing to lsh_topk (approximate)",
                stacklevel=2,
            )
            return lsh_topk(
                queries, corpus, k=k, id_col=id_col, vec_col=vec_col,
                round_to=round_to, **(lsh_kwargs or {}),
            )
    corpus = spread_input(corpus)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm2(vec_col).alias("q_n2"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm2(vec_col).alias("c_n2"),
    )
    score = _cosine(_dot("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2"))
    if round_to is not None:
        score = F.round(score, round_to)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        pairs.select(
            "q_id", "c_id", "score", F.row_number().over(w).cast("bigint").alias("rank")
        )
        .filter(F.col("rank") <= k)
    )


def srp_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    nbits: int = 16,
    dim: int = 64,
    out: str = "srp_sig",
) -> DataFrame:
    """Sign-random-projection signature: bit j = sign(<v, r_j>) with
    r_j[d] = ±1 from xxhash64(j, d). Deterministic, shipped as codegen."""
    return df.withColumn(
        out,
        F.expr(
            f"""transform(sequence(0, {nbits - 1}),
                  j -> CASE WHEN aggregate(
                           zip_with({vec_col}, sequence(0, {dim - 1}),
                               (x, d) -> CAST(x AS DOUBLE)
                                         * CASE WHEN pmod(xxhash64(j, d), 2) = 0
                                                THEN 1D ELSE -1D END),
                           0D, (s, v) -> s + v) >= 0D
                       THEN 1 ELSE 0 END)"""
        ),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 16,
    bands: int = 4,
    dim: int = 64,
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate cosine top-k: candidates must share >=1 LSH signature band
    (equi-join on (band_id, band_bits)), then exact re-score within
    candidates. Recall rises with bands; cost stays shuffle-bounded."""
    width = nbits // bands
    band_expr = F.expr(
        f"""transform(sequence(0, {bands - 1}),
              b -> concat_ws('', transform(slice(srp_sig, b * {width} + 1, {width}),
                                           x -> CAST(x AS STRING))))"""
    )

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        return (
            srp_signature(df, vec_col, nbits, dim)
            .select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}_vec"),
                _norm2(vec_col).alias(f"{prefix}_n2"),
                F.posexplode(band_expr).alias("band_id", "band_bits"),
            )
        )

    qb = prep(queries, "q")
    cb = prep(spread_input(corpus), "c")
    cand = (
        qb.join(cb, ["band_id", "band_bits"])
        .filter(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    score = _cosine(_dot("q_vec", "c_vec"), F.col("q_n2"), F.col("c_n2"))
    if round_to is not None:
        score = F.round(score, round_to)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        cand.withColumn("score", score)
        .select(
            "q_id", "c_id", "score", F.row_number().over(w).cast("bigint").alias("rank")
        )
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 6,
    nbits: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cosine >= threshold).

    With ``block_col`` the pair space is restricted to an equi-join on the
    blocking key (label, shard, coarse cluster id) — the IVF-style pattern:
    quantize first, compare within cells; exact within the block.

    Without ``block_col`` the blocking key is an SRP-LSH signature band
    (candidates must collide on at least one band) — approximate recall,
    but the join stays an equi-join on well-distributed hash keys. There
    is deliberately NO all-pairs fallback: a corpus×corpus crossJoin is
    never the plan this operator produces.
    """
    base = spread_input(df)
    if block_col is None:
        # SRP-band blocking: explode each vector into its signature bands,
        # equi-join on (band_id, band_bits), dedup candidate pairs.
        width = nbits // bands
        band_expr = F.expr(
            f"""transform(sequence(0, {bands - 1}),
                  b -> concat_ws('', transform(slice(srp_sig, b * {width} + 1, {width}),
                                               x -> CAST(x AS STRING))))"""
        )
        v = srp_signature(base, vec_col, nbits, dim).select(
            F.col(id_col),
            F.col(vec_col),
            _norm2(vec_col).alias("_n2"),
            F.posexplode(band_expr).alias("_band_id", "_blk"),
        )
        blk_keys = ["_band_id", "_blk"]
    else:
        v = base.select(
            F.col(id_col),
            F.col(vec_col),
            _norm2(vec_col).alias("_n2"),
            F.col(block_col).alias("_blk"),
        )
        blk_keys = ["_blk"]
    a = v.select(
        *blk_keys,
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        F.col("_n2").alias("a_n2"),
    )
    b = v.select(
        *blk_keys,
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        F.col("_n2").alias("b_n2"),
    )
    joined = a.join(b, blk_keys).filter(F.col("a_id") < F.col("b_id"))
    if block_col is None:
        joined = joined.dropDuplicates(["a_id", "b_id"])
    score = F.round(
        _cosine(_dot("a_vec", "b_vec"), F.col("a_n2"), F.col("b_n2")),
        round_to,
    )
    return (
        joined.withColumn("cosine", score)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )

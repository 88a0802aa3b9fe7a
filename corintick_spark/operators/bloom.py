"""Bloom-filter semi-join reduction — the runtime-filter pattern for
fact ⋈ selective-dim joins at 100 TB.

Problem shape: `fact SEMI JOIN dim_filtered` where the dim side is too big
to broadcast as rows but its FILTERED key set is small-ish (millions). A
plain shuffle semi-join moves the ENTIRE fact table; the right plan sends a
few-hundred-KB bit set to every task instead and shuffles only the rows
that might match (this is what Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled` injects, Iceberg stores
in its bloom metadata, and every warehouse calls a runtime filter /
semi-join reducer).

Implementation is all JVM-side expression work — no Python in the per-row
path:

- **build**: one pass over the dim keys computes k = `num_hashes` bit
  positions per key (`pmod(xxhash64(key, i), num_bits)`), folds them into
  64-bit words with a partial-aggregated `bit_or` (map-side combine means
  the shuffle carries at most `num_bits/64` rows PER PARTITION, and the
  final collect is exactly `num_bits/64` longs — a fit-time collect bounded
  by the filter size, like a k-means centroid pull, NOT by the data).
- **probe**: the word array ships as a plan literal (part of the task
  binary, broadcast once per executor — not per row, not per task); each
  fact row ANDs its k masks against `element_at` lookups, whole-stage
  codegen, zero shuffles.
- **exactness**: Bloom filters have false positives but NO false negatives,
  so `bloom_semi_join` re-verifies survivors with a real semi-join — the
  result is EXACTLY the plain semi-join, only the shuffle is ~|match|+FP
  rows instead of |fact|. (This mirrors how `join_salted` proves the salted
  rewrite: the optimization must be result-invisible.)

Sizing: FP rate ≈ (1 - e^(-k·n/m))^k; the default 2^17 bits / 5 hashes
holds ~18k keys at <1% FP. At 100 TB you size m from the dim-side count
(~10 bits/key) — the literal grows linearly but 10M keys is still only a
12.5 MB task-binary payload, far below the broadcast-join threshold the
row set itself would blow through.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _array_literal(words: list[int]) -> Column:
    """The word array as ONE plan node. `F.lit(list)` expands to a
    CreateArray with len(words) child Literals — analysis/codegen cost
    grows with the filter size (measured: ~2.8s fixed for 2048 words).
    Classic PySpark can build a single ArrayType Literal from a JVM
    long[] instead (~1.3s less per query, independent of probe count);
    fall back to the expanded form where the JVM gateway isn't reachable
    (Spark Connect)."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        sc = spark.sparkContext
        arr = sc._gateway.new_array(sc._jvm.long, len(words))
        for i, w in enumerate(words):
            arr[i] = w
        from pyspark.sql.column import Column as _Col

        return _Col(sc._jvm.org.apache.spark.sql.functions.lit(arr))
    except Exception:
        return F.lit(words)


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of `key` — identical expression on build and
    probe sides (xxhash64 seeded by the hash index i)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key: str | Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """One distributed pass over `df[key]` → the filter's word array
    (length num_bits/64, int64). NULL keys are skipped (SQL semantics:
    NULL never equi-joins, so it must not set bits)."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    k = F.col(key) if isinstance(key, str) else key
    pos = (
        df.filter(k.isNotNull())
        .select(F.explode(F.array(*_positions(k, num_bits, num_hashes))).alias("p"))
    )
    words = (
        pos.select(
            F.shiftright(F.col("p"), 6).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def merge_blooms(a: list[int], b: list[int]) -> list[int]:
    """Word-wise OR — build(A) ∪ build(B) == build(A ∪ B), so per-day /
    per-partition filters fold without touching the data again."""
    if len(a) != len(b):
        raise ValueError("blooms must share num_bits to merge")
    return [x | y for x, y in zip(a, b)]


def might_contain(
    key: Column, words: list[int], num_hashes: int = 5
) -> Column:
    """Membership probe: every one of the key's k bits is set. The word
    array is ONE plan-literal node (:func:`_array_literal`), evaluated by
    codegen — it rides in the task binary once per executor. NULL keys
    probe NULL → filtered out, matching semi-join semantics."""
    num_bits = len(words) * 64
    arr = _array_literal(words)
    checks = []
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        # dynamic shift distance needs the SQL form (the pyspark helper
        # only takes a literal int)
        bit = (p % 64).cast("int")
        mask = F.call_function("shiftleft", F.lit(1).cast("bigint"), bit)
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda x, y: x & y, checks)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT `fact LEFT SEMI JOIN dim ON fact_key = dim_key`, with a Bloom
    prefilter so the semi-join shuffle carries only probable matches.

    Two actions total: the build-side collect (bounded at num_bits/64
    longs) happens once up front; the returned plan is lazy. False
    positives survive the prefilter but die in the verifying semi-join —
    result equality with the plain semi-join is pinned by
    tests/test_bloom.py on an FP-forcing tiny filter."""
    words = build_bloom(dim, dim_key, num_bits, num_hashes)
    pre = fact.filter(might_contain(F.col(fact_key), words, num_hashes))
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pre.join(keys, on=fact_key, how="left_semi")


def build_bitmap(
    df: DataFrame,
    key: str | Column,
    max_key: int,
) -> list[int]:
    """EXACT membership bitmap for a bounded non-negative integer key
    domain [0, max_key]: bit i set iff key value i occurs. Same
    distributed fold as :func:`build_bloom` (bit positions → bit_or'd
    words → bounded collect) but with the identity mapping, so there are
    NO false positives and the probe needs no verifying join at all —
    the semi-join disappears into a map-side filter. Guard: raises on
    keys outside the declared domain (a silent wrap would corrupt
    membership) and on domains too large to ship as a plan literal
    (use :func:`build_bloom` there — that is its exact trade-off)."""
    if max_key < 0:
        raise ValueError("max_key must be >= 0")
    num_bits = ((max_key + 64) // 64) * 64
    if num_bits > (1 << 26):  # 8 MiB of words — beyond that, bloom it
        raise ValueError(
            f"domain [0, {max_key}] needs {num_bits // 8} bytes; "
            "too large for an exact plan-literal bitmap — use build_bloom"
        )
    k = (F.col(key) if isinstance(key, str) else key).cast("bigint")
    bad = df.filter(k.isNotNull() & ((k < 0) | (k > max_key))).limit(1).count()
    if bad:
        raise ValueError(f"key values outside [0, {max_key}]")
    words = (
        df.filter(k.isNotNull())
        .select(k.alias("k"))
        .select(
            F.shiftright(F.col("k"), 6).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def in_bitmap(key: Column, words: list[int]) -> Column:
    """Exact membership probe against :func:`build_bitmap`'s words —
    false outside [0, max_key], NULL keys excluded (semi-join
    semantics)."""
    num_bits = len(words) * 64
    arr = _array_literal(words)
    k = key.cast("bigint")
    word = F.element_at(arr, F.shiftright(k, 6).cast("int") + F.lit(1))
    mask = F.call_function("shiftleft", F.lit(1).cast("bigint"), (k % 64).cast("int"))
    return (
        k.isNotNull()
        & (k >= 0)
        & (k < num_bits)
        & (word.bitwiseAND(mask) != 0)
    )


def bitmap_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    max_key: int,
) -> DataFrame:
    """EXACT `fact LEFT SEMI JOIN dim` with NO join in the plan: for a
    bounded integer key domain the dim side folds to an exact bitmap and
    the semi-join becomes a map-side filter — zero shuffle, zero join,
    the strongest form of join elimination. This is what a warehouse
    does with a dense dictionary-encoded dim key; the bloom variant
    (:func:`bloom_semi_join`) is the fallback when the domain is
    unbounded or sparse."""
    words = build_bitmap(dim, dim_key, max_key)
    return fact.filter(in_bitmap(F.col(fact_key), words))


def semi_join_auto(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    broadcast_rows_max: int = 1_000_000,
    bitmap_domain_max: int = 1 << 26,
) -> DataFrame:
    """Route `fact LEFT SEMI JOIN dim` to the cheapest EXACT strategy,
    decided from ONE stats aggregate over the dim keys (count distinct,
    min, max — the same numbers a warehouse reads from table stats):

    1. integral key with domain [0, bitmap_domain_max) → exact bitmap
       filter (:func:`bitmap_semi_join`): the join disappears.
    2. few distinct keys → plain broadcast semi-join: one hash probe.
    3. otherwise → bloom prefilter + verifying semi-join
       (:func:`bloom_semi_join`), sized at ~10 bits per distinct key.

    Every branch returns exactly the plain semi-join's rows; only the
    plan differs. Branch selection is pinned by tests/test_bloom.py."""
    k = F.col(dim_key)
    n_distinct, lo, hi = (
        dim.filter(k.isNotNull())
        .agg(F.count_distinct(k), F.min(k), F.max(k))
        .first()
    )
    if n_distinct == 0:
        return fact.limit(0)
    dim_type = dict(dim.dtypes)[dim_key]
    integral = dim_type in ("tinyint", "smallint", "int", "bigint")
    if integral and 0 <= int(lo) and int(hi) < bitmap_domain_max:
        return bitmap_semi_join(fact, dim, fact_key, dim_key, max_key=int(hi))
    if n_distinct <= broadcast_rows_max:
        keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
        return fact.join(F.broadcast(keys), on=fact_key, how="left_semi")
    bits = 1 << max(10, (10 * int(n_distinct) - 1).bit_length())
    return bloom_semi_join(
        fact, dim, fact_key, dim_key, num_bits=min(bits, 1 << 24)
    )


def bitmap_anti_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    max_key: int,
) -> DataFrame:
    """EXACT `fact LEFT ANTI JOIN dim` with no join in the plan — the dual
    of :func:`bitmap_semi_join`. Because the bitmap is exact (no FPs, no
    FNs), negating the membership probe IS the anti-join; NULL fact keys
    are kept (they never equi-match, so LEFT ANTI retains them) and
    out-of-domain keys are kept for the same reason. A bloom filter could
    NOT do this: its false positives would silently DROP non-matching
    rows, which is why only the exact structure gets an anti form."""
    words = build_bitmap(dim, dim_key, max_key)
    return fact.filter(~in_bitmap(F.col(fact_key), words))

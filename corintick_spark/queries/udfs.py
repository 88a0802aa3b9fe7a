"""Tier B UDF/UDAF/UDTF surface — T-B44..B47 (SURVEY.md §2.2).

The escape hatch for semantics built-ins can't express — always Arrow-batched
pandas UDFs (vectorized, ~10-100x row-at-a-time Python), never per-row
Python UDFs. The grouped-map form is the direct home for corintick's
"read one uid, compute on its frame in pandas" workflow
(api.py::Corintick.read † returning a per-uid pandas DataFrame): the same
user code, but Spark ships it to the data per key group instead of pulling
data to the client.

Oracle note: each UDF computes only IEEE-exact arithmetic (+,-,*,/,sqrt,
min/max) so results hash-match the SQL mirror bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf

from corintick_spark.catalog import table
from corintick_spark.registry import query


# T-B44 — vectorized scalar UDF. (pandas_udf construction is deferred into
# the query functions: the decorator requires an active SparkSession.)
def _score_udf():
    @pandas_udf("double")
    def _score(value: pd.Series) -> pd.Series:
        return value * 0.5 + np.sqrt(np.abs(value))

    return _score


@query(
    "udf_scalar",
    sql="""
    SELECT event_id, value,
           value * 0.5 + sqrt(abs(value)) AS score
    FROM events
    """,
)
def udf_scalar(spark, sf_dir):
    """Arrow-batched scalar pandas UDF (SNIPPETS.md [1] pattern)."""
    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "value", _score_udf()("value").alias("score"))


# T-B45 — grouped-aggregate pandas UDFs (Spark disallows mixing grouped-agg
# pandas UDFs with built-in aggregates in one agg, so count is a UDF too —
# this query's purpose is to exercise the UDAF path; production code with a
# plain COUNT alongside a pandas UDAF should instead compute the two aggs
# separately and join, keeping the count in codegen).
def _vrange_udf():
    @pandas_udf("double")
    def _vrange(value: pd.Series) -> float:
        return float(value.max() - value.min())

    return _vrange


def _vcount_udf():
    @pandas_udf("long")
    def _vcount(value: pd.Series) -> int:
        return int(len(value))

    return _vcount


@query(
    "udf_grouped_agg",
    sql="""
    SELECT user_id,
           MAX(value) - MIN(value) AS value_range,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def udf_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF (SNIPPETS.md [2] pattern) — partial results
    flow through the same hash-agg shuffle as built-ins."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        _vrange_udf()("value").alias("value_range"),
        _vcount_udf()("value").alias("n"),
    )


# T-B46 — grouped-map: per-uid frame → frame.
def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["value"].min(), pdf["value"].max()
    rng = hi - lo
    pdf = pdf[["user_id", "event_id", "value"]].copy()
    pdf["value_norm"] = 0.0 if rng == 0 else (pdf["value"] - lo) / rng
    return pdf


@query(
    "udf_grouped_map",
    sql="""
    SELECT user_id, event_id, value,
           CASE WHEN MAX(value) OVER w = MIN(value) OVER w THEN 0.0
                ELSE (value - MIN(value) OVER w)
                     / (MAX(value) OVER w - MIN(value) OVER w)
           END AS value_norm
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas per uid (SNIPPETS.md [3] pattern) — corintick's
    'read(uid) then compute in pandas' loop, distributed per key group."""
    ev = table(spark, sf_dir, "events")
    return ev.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _normalize, schema="user_id long, event_id long, value double, value_norm double"
    )


# T-B47 — UDTF-style row generation: explode with position.
@query(
    "udtf_explode",
    sql="""
    SELECT vec_id,
           UNNEST(range(len(embedding))) AS pos,
           CAST(UNNEST(embedding) AS DOUBLE) AS comp
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def udtf_explode(spark, sf_dir):
    """posexplode of the embedding vector — 1 row in, 64 rows out."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "comp"))
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.col("comp").cast("double").alias("comp"),
        )
    )


# T-B47 — real Python UDTF (Spark 3.5+ table function): one doc row in,
# one row per token out, with position.
@query(
    "udtf_python",
    sql="""
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word,
           CAST(generate_subscripts(list_filter(string_split(text, ' '), x -> x != ''), 1) - 1 AS BIGINT) AS pos
    FROM documents
    WHERE doc_id < 100
    """,
)
def udtf_python(spark, sf_dir):
    """Python UDTF exploding documents into (word, pos) rows — the
    row-generating escape hatch when built-in explode can't express the
    generator logic. (Here it can, which is exactly what the oracle checks.)"""
    from pyspark.sql.functions import udtf

    # useArrow: the UDTF tier is Arrow-batched like every other Python
    # surface here (plan shows ArrowEvalPythonUDTF, not row-at-a-time
    # BatchEvalPythonUDTF — pinned by tests/test_plan_invariants.py)
    @udtf(returnType="word string, pos bigint", useArrow=True)
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            pos = 0
            for w in text.split(" "):
                if w:
                    yield w, pos
                    pos += 1

    spark.udtf.register("split_words", SplitWords)
    d = table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") < 100).createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """SELECT d.doc_id, t.word, t.pos
           FROM _docs_udtf d, LATERAL split_words(d.doc_id, d.text) t"""
    )


# EWMA per uid via grouped-map pandas. The UNBOUNDED recursion has no
# window built-in; the bounded-frame variant IS expressible JVM-side as a
# list fold (extras.py::window_ewma) — prefer that at scale; this per-key
# pandas escape hatch covers full-history semantics.
#
# ORACLE-PAIRED (verdict r07 item 7): pandas .ewm(alpha, adjust=False)
# computes s_i = (1-a)*s_{i-1} + a*v_i in exactly that double-precision
# order, and DuckDB's list_reduce fold below performs the identical
# operation sequence — measured BIT-EXACT over every sf0.01 row (1 - 0.2
# is exactly the double 0.8, so both engines multiply by the same
# constant). NULL values are excluded in both engines up front: pandas
# NaN weighting semantics (ignore_na) have no SQL mirror.
@query(
    "udf_ewma",
    sql="""
    WITH src AS (
      SELECT user_id, event_id, ts, value
      FROM events WHERE value IS NOT NULL
    ), o AS (
      SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS vals
      FROM src
    )
    SELECT user_id, event_id, value,
           list_reduce(vals, (acc, x) ->
               CASE WHEN acc = x THEN acc ELSE 0.8*acc + 0.2*x END) AS ewma
    FROM o
    """,
)
def udf_ewma(spark, sf_dir):
    """Exponentially-weighted moving average per uid (alpha=0.2) computed
    by pandas .ewm inside applyInPandas; the DuckDB oracle replays the
    identical left-fold via list_reduce (bit-exact, see module note).
    The fold carries pandas' constant-run short-circuit: when the running
    average EQUALS the incoming value, pandas skips the update ("avoid
    numerical errors on constant series" in its ewm kernel) — the literal
    convex combination would drift by 1 ulp there (0.8*7 + 0.2*7 is
    7.000000000000001 in doubles), caught by the edge set's constant-value
    runs."""

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = pdf["value"].ewm(alpha=0.2, adjust=False).mean()
        return pdf[["user_id", "event_id", "value", "ewma"]]

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            ewma,
            schema="user_id long, event_id long, value double, ewma double",
        )
    )


# mapInArrow: the lowest-overhead Python batch hook — RecordBatches in,
# RecordBatches out, no pandas conversion. The right tier for bulk
# per-batch transforms (multimodal payload shaping, tensor packing) where
# even pandas overhead matters. IEEE-exact arithmetic only, so it keeps a
# full SQL oracle.
@query(
    "udf_arrow",
    sql="""
    SELECT event_id, user_id,
           value * 2.0 + 1.0 AS scaled
    FROM events WHERE event_type = 'click'
    """,
)
def udf_arrow(spark, sf_dir):
    """Arrow-native batch transform (mapInArrow) over the click stream."""
    import pyarrow as pa

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("event_id", "user_id", "value")

    def scale(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            scaled = pa.compute.add(
                pa.compute.multiply(t.column("value"), pa.scalar(2.0)),
                pa.scalar(1.0),
            )
            yield pa.RecordBatch.from_arrays(
                [t.column("event_id").combine_chunks(),
                 t.column("user_id").combine_chunks(),
                 scaled.combine_chunks()],
                names=["event_id", "user_id", "scaled"],
            )

    return ev.mapInArrow(
        scale, "event_id bigint, user_id bigint, scaled double"
    )


# T-B47 extension — POLYMORPHIC Python UDTF (PySpark 4 `analyze()`):
# the output schema is computed at plan time from the constant argument
# (k ⇒ columns tok0..tok{k-1}), the table-function feature that fixed-
# returnType UDTFs can't express. Arrow-batched like the rest of the
# Python surface.
@query(
    "udtf_dynamic",
    sql="""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id, w[1] AS tok0, w[2] AS tok1, w[3] AS tok2
    FROM tok
    """,
)
def udtf_dynamic(spark, sf_dir):
    """UDTF with plan-time dynamic schema: first-k tokens as k columns,
    k supplied as a literal argument and reflected in the schema by
    analyze()."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument, text: AnalyzeArgument, k: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType().add("doc_id", LongType())
            for i in range(int(k.value)):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, k):
            toks = [w for w in (text or "").split(" ") if w]
            yield tuple(
                [doc_id]
                + [toks[i] if i < len(toks) else None for i in range(k)]
            )

    fn = udtf(FirstTokens, useArrow=True)
    spark.udtf.register("first_tokens", fn)
    d = table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") < 100).createOrReplaceTempView("_docs_udtf_dyn")
    return spark.sql(
        """SELECT t.* FROM _docs_udtf_dyn d,
           LATERAL first_tokens(d.doc_id, d.text, 3) t"""
    )

"""Generate scaled-up datasets (N x sf0.1) for scale-step measurements.

/root/testdata is read-only, so scaled data lives inside the repo at
``testdata/sf{N/10}`` (gitignored — regenerate with this script). The
scale-up is a deterministic N-way replication with key offsets chosen so
workload *shape* scales the way a real Nx corpus would:

- ``orders``/``lineitem`` shift ``orderkey`` by a shared stride — join
  keys stay consistent, fact-fact join cardinality scales linearly.
- ``events`` shifts ``event_id``; timestamps are kept, so the 30-day
  window densifies Nx (what an Nx-busier stream looks like).
- ``documents`` rewrites every token with a per-copy suffix: each copy is
  a *new* corpus with the same internal near-dup structure, so MinHash
  candidate generation scales linearly instead of quadratically colliding
  N identical corpora into the same LSH buckets.
- ``embeddings`` shifts ``vec_id`` (brute-force top-k cost is linear in
  corpus size; probe set unchanged).
- dimension tables are byte-copied (an Nx fact load joins the same dims).

Usage: python scripts/make_scale.py [copies ...]   (default: 10)
       e.g. `python scripts/make_scale.py 10 100` writes testdata/sf1 (~170
       MB, ~30s) and testdata/sf10 (~1.7 GB, ~3 min).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate(spark, copies: int) -> str:
    import pyspark.sql.functions as F

    sf = copies / 10
    dst = os.path.join(REPO, "testdata", f"sf{sf:g}")
    os.makedirs(dst, exist_ok=True)

    def replicate(name: str, per_copy) -> None:
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = per_copy(src, 0)
        for i in range(1, copies):
            out = out.unionByName(per_copy(src, i))
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: {out.count()} rows")

    ok_stride = (
        spark.read.parquet(f"{SRC}/orders.parquet").agg(F.max("o_orderkey")).first()[0] + 1
    )
    ev_stride = (
        spark.read.parquet(f"{SRC}/events.parquet").agg(F.max("event_id")).first()[0] + 1
    )
    doc_stride = (
        spark.read.parquet(f"{SRC}/documents.parquet").agg(F.max("doc_id")).first()[0] + 1
    )
    vec_stride = (
        spark.read.parquet(f"{SRC}/embeddings.parquet").agg(F.max("vec_id")).first()[0] + 1
    )

    replicate(
        "orders",
        lambda df, i: df.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ok_stride)),
    )
    replicate(
        "lineitem",
        lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ok_stride)),
    )
    replicate(
        "events",
        lambda df, i: df.withColumn("event_id", F.col("event_id") + F.lit(i * ev_stride)),
    )
    replicate(
        "documents",
        lambda df, i: (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * doc_stride)).withColumn(
                "text",
                F.col("text")
                if i == 0
                else F.array_join(
                    F.expr(f"transform(split(text, ' '), x -> concat(x, '~{i}'))"), " "
                ),
            )
        ),
    )
    replicate(
        "embeddings",
        lambda df, i: df.withColumn("vec_id", F.col("vec_id") + F.lit(i * vec_stride)),
    )

    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet", f"{dst}/{dim}.parquet")
        print(f"{dim}: copied")
    return dst


def main() -> None:
    from corintick_spark.session import get_spark

    copies_list = [int(a) for a in sys.argv[1:]] or [10]
    spark = get_spark(app_name="make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for copies in copies_list:
        print(f"=== {copies}x sf0.1 -> {generate(spark, copies)}")
    spark.stop()


if __name__ == "__main__":
    main()

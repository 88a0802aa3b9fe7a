"""Measured evidence that SnapshotStore.merge cost scales with TOUCHED
data, not table size (SCALING.md): build a 16-file range-partitioned
table at sf0.1, then time (a) a narrow merge touching ~1 file, (b) a
wide merge touching all files, (c) a full overwrite as the no-pruning
comparator."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from corintick_spark.session import get_spark
from corintick_spark.snapshots import SnapshotStore

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark()
    li = (
        spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="mergescale_") + "/t")
    store.append(li.repartitionByRange(16, "l_orderkey"))
    m = store.manifest(0)
    n_rows = sum(f["rows"] for f in m["files"])
    print(f"table: {len(m['files'])} files, {n_rows} rows")

    keys = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(2000).collect()]
    lo_keys = sorted(keys)[:1000]
    src_narrow = (
        li.filter(F.col("l_orderkey").isin(lo_keys[:50]))
        .withColumn("l_quantity", F.col("l_quantity") + 1)
    )
    # warm the JVM/code paths so the narrow-vs-wide comparison isn't
    # first-job noise (at sf0.1 wall time is overhead-bound; the load-born
    # evidence is ROWS REWRITTEN, which is what scales at 100 TB)
    warm = SnapshotStore(spark, tempfile.mkdtemp(prefix="mergewarm_") + "/t")
    warm.append(li.limit(1000))
    warm.merge(li.limit(10), key="l_orderkey")

    def staged_rows(version, prev_files):
        prev = {f["path"] for f in prev_files}
        return sum(
            f["rows"] for f in store.manifest(version)["files"]
            if f["path"] not in prev
        )

    t0 = time.time()
    v = store.merge(src_narrow, key="l_orderkey")
    t_narrow = time.time() - t0
    carried = sum(
        1 for f in store.manifest(v)["files"]
        if any(f["path"] == g["path"] for g in m["files"])
    )
    print(
        f"narrow merge: {t_narrow:.2f}s, carried {carried}/16 files, "
        f"rewrote {staged_rows(v, m['files'])}/{n_rows} rows"
    )

    src_wide = li.sample(0.02, seed=7).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    prev_files = store.manifest(v)["files"]
    t0 = time.time()
    v2 = store.merge(src_wide, key="l_orderkey")
    t_wide = time.time() - t0
    carried2 = sum(
        1 for f in store.manifest(v2)["files"]
        if any(f["path"] == g["path"] for g in prev_files)
    )
    print(
        f"wide merge: {t_wide:.2f}s, carried {carried2}/~16 files, "
        f"rewrote {staged_rows(v2, prev_files)}/{n_rows} rows"
    )

    t0 = time.time()
    store.overwrite(store.read())
    t_full = time.time() - t0
    print(f"full rewrite (no pruning comparator): {t_full:.2f}s")


if __name__ == "__main__":
    main()

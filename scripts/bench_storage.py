"""Storage-codec benchmark: parquet compression trade-offs on the events
table — bytes on disk, write time, full-scan read time, and a filtered
read — printed as one JSON line per codec. Informs the TickStore default
(zstd): the engine's choice is a measured trade, not a guess.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_storage.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODECS = ["zstd", "snappy", "lz4", "gzip", "uncompressed"]


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from corintick_spark.session import get_spark

    spark = get_spark(
        app_name="corintick-spark-bench-storage",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from corintick_spark.catalog import table

    ev = table(spark, sf_dir, "events").cache()
    n = ev.count()  # materialize once so codec writes see identical input

    base = tempfile.mkdtemp(prefix="codec_bench_")
    try:
        for codec in CODECS:
            path = os.path.join(base, codec)
            t0 = time.time()
            ev.write.mode("overwrite").option("compression", codec).parquet(path)
            t_write = time.time() - t0
            size = dir_bytes(path)
            t0 = time.time()
            assert spark.read.parquet(path).count() == n
            t_scan = time.time() - t0
            t0 = time.time()
            spark.read.parquet(path).filter("user_id = 7").agg(
                {"value": "sum"}
            ).collect()
            t_filtered = time.time() - t0
            print(
                json.dumps(
                    {
                        "codec": codec,
                        "bytes": size,
                        "write_s": round(t_write, 3),
                        "scan_s": round(t_scan, 3),
                        "filtered_s": round(t_filtered, 3),
                        "rows": n,
                    }
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

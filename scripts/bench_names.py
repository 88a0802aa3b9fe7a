"""Ad-hoc scale measurement: time an arbitrary query list at a chosen sf
dir (warm medians — pass 1 untimed-equivalent via drop-first, matching
bench.py's extras contract) and print one JSON line. Used for the
SCALING.md per-tier scale rows.

Usage: python scripts/bench_names.py --sf testdata/sf1 --names a,b,c [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--names", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cpus", default=str(os.cpu_count() or 8))
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    from corintick_spark.session import get_spark

    spark = get_spark(
        app_name="corintick-spark-bench-names",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from corintick_spark.catalog import table
    from corintick_spark.registry import load_all

    registry = load_all()
    for t in ("lineitem", "events", "documents", "embeddings", "orders"):
        table(spark, args.sf, t).write.format("noop").mode("overwrite").save()

    import gc

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.passes):
        for name in names:
            t0 = time.perf_counter()
            registry[name].spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            gc.collect()  # let ContextCleaner reclaim checkpoint blocks
    warm = {n: v[1:] if len(v) > 1 else v for n, v in samples.items()}
    med = {n: sorted(v)[len(v) // 2] for n, v in warm.items()}
    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "medians_warm": med,
                "all_samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Generic per-query scale measurement: time registered queries at the
local scale dirs (testdata/sf1, sf10, sf30) with warm medians — the
SCALING.md row generator (round 11; generalizes measure_simhash_triple.py).

Usage: python scripts/measure_query_scale.py q1[,q2,...] [passes=2] [sf ...]
(sf args like sf1 sf10; default sf1 sf10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from corintick_spark.session import get_spark
from corintick_spark.registry import load_all


def main():
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sfs = sys.argv[3:] or ["sf1", "sf10"]
    spark = get_spark()
    qs = load_all()
    for name in names:
        q = qs[name].spark
        for sf in [f"/root/repo/testdata/{s}" for s in sfs]:
            if not os.path.exists(os.path.join(sf, "orders.parquet")):
                print(f"{sf}: missing, skipped")
                continue
            times = []
            for p in range(passes + 1):  # +1 warm pass
                t0 = time.time()
                n = q(spark, sf).count()
                dt = time.time() - t0
                times.append(dt)
                print(f"{name} {sf} pass{p} rows={n} {dt:.1f}s", flush=True)
            rec = sorted(times[1:])
            print(
                f"{name} {sf} RECORDED warm median ~{rec[len(rec) // 2]:.1f}s"
                f" (all warm: {['%.1f' % t for t in times[1:]]})",
                flush=True,
            )


if __name__ == "__main__":
    main()

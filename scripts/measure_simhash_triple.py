"""Round-11 scale measurement for block-triples combination banding
(verdict r10 item 2): time dedup_simhash_multi at sf10 (auto keeps the
PAIR scheme — the adjudicated sf10 plan must not regress) and sf30
(auto escalates to TRIPLES), and compare against the round-10 sf30 pair
rows (426-570s, ~4.6-6.1x per 3x data). Warm medians: pass 1 warms page
cache/JIT, passes 2+ are recorded.

Usage: python scripts/measure_simhash_triple.py [passes=2] [sf ...]
(sf args like sf10 sf30; default both)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from corintick_spark.session import get_spark
from corintick_spark.registry import load_all


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sfs = sys.argv[2:] or ["sf10", "sf30"]
    spark = get_spark()
    q = load_all()["dedup_simhash_multi"].spark
    for sf in [f"/root/repo/testdata/{s}" for s in sfs]:
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(f"{sf}: missing, skipped")
            continue
        times = []
        for p in range(passes + 1):  # +1 warm pass
            t0 = time.time()
            n = q(spark, sf).count()
            dt = time.time() - t0
            times.append(dt)
            print(f"{sf} pass{p} rows={n} {dt:.1f}s", flush=True)
        rec = sorted(times[1:])
        print(f"{sf} RECORDED warm median ~{rec[len(rec) // 2]:.1f}s "
              f"(all warm: {['%.1f' % t for t in times[1:]]})", flush=True)


if __name__ == "__main__":
    main()

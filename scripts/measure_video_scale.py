"""Measure dedup_video_phash's OPERATOR cost from materialized payloads
(round 10, verdict r9 item 4).

The registered query synthesizes its planted GIF corpus inline (Python
LZW encode per doc), which dominated the round-9 SCALING row (17.6x per
10x data) and misgraded a map-shaped operator. A real corpus arrives as
payload bytes; this script reproduces that: it writes the planted corpus
(doc_id, payload) to parquet ONCE per sf dir (skipped when present),
then times decode -> per-frame pHash -> aligned-frame Hamming banding ->
vote aggregation from the parquet inputs, warm medians like
bench_names.py.

Usage: python scripts/measure_video_scale.py --sf testdata/sf1 [--passes 3]
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
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cpus", default=str(os.cpu_count() or 8))
    ap.add_argument(
        "--bits", type=int, default=64, choices=(64, 128),
        help="per-frame signature width (128 = the scale path; uses the "
        "hybrid-amplitude corpus and an 18-bit-band join at d=6)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from corintick_spark.catalog import table
    from corintick_spark.operators import dedup as D
    from corintick_spark.operators import multimodal as M
    from corintick_spark.operators.spread import spread_input
    from corintick_spark.queries.llm import (
        VIDEO_N_FRAMES,
        video_gif_hybrid_payloads,
        video_gif_payloads,
    )
    from corintick_spark.session import get_spark

    spark = get_spark(
        app_name="corintick-spark-video-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = args.sf.rstrip("/")
    tag = "_hybrid" if args.bits == 128 else ""
    fixture = os.path.join(
        sf, "..", f"video_{os.path.basename(sf)}{tag}.parquet"
    )
    fixture = os.path.normpath(fixture)
    if not os.path.exists(fixture):
        t0 = time.perf_counter()
        d = spread_input(table(spark, sf, "documents").select("doc_id"))
        builder = (
            video_gif_hybrid_payloads if args.bits == 128
            else video_gif_payloads
        )
        builder(d).write.mode("overwrite").parquet(fixture)
        print(
            f"materialized {fixture} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    def run() -> int:
        payloads = spark.read.parquet(fixture)
        if args.bits == 128:
            sigs = M.phash128_video_frames(payloads)
            frame_pairs = D.hamming_pairs(
                sigs,
                sig_col=["phash0", "phash1"],
                max_hamming=6,
                within=["frame_idx"],
            )
        else:
            sigs = M.phash_video_frames(payloads)
            frame_pairs = D.hamming_pairs(
                sigs, sig_col="phash", max_hamming=4, within=["frame_idx"]
            )
        votes = frame_pairs.groupBy("a_id", "b_id").agg(
            F.count(F.lit(1)).alias("matched_frames"),
            F.max("hamming").alias("max_hamming"),
        )
        near = votes.filter(
            F.col("matched_frames") * 4 >= F.lit(3 * VIDEO_N_FRAMES)
        )
        near.write.format("noop").mode("overwrite").save()
        return 0

    import gc

    samples: list[float] = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        run()
        samples.append(round(time.perf_counter() - t0, 3))
        gc.collect()
    warm = samples[1:] if len(samples) > 1 else samples
    print(
        json.dumps(
            {
                "sf": sf,
                "bits": args.bits,
                "fixture": fixture,
                "samples": samples,
                "warm_median": sorted(warm)[len(warm) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()

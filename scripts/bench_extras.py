"""Scale check for the round-3 extension operators (not in bench.py's
HEADLINE set, which stays fixed for cross-round comparability): times each
at $SPARK_GRAFT_SF_DIR through the same noop-sink materialization and
prints one JSON line. Run at sf0.1 and sf1 to verify the new operators'
scale posture (SCALING.md second table).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bench_extras.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXTRAS = [
    "agg_regression",
    "resample_interp",
    "events_anomaly",
    "text_contamination",
    "window_rolling_median",
    "window_ewma",
    "sample_fixed_k",
    "ml_linear_score",
    "graph_pagerank",
    # round-4 second-session additions
    "graph_triangles",
    "corpus_mixture",
    "pipeline_decontaminate",
    "events_throttle",
    "text_heavyhitters",
    "text_perplexity",
    "pack_fragments",
    "similarity_pq",
    # round-4 third-session additions
    "sql_q18",
    "sql_recursive",
    "knn_classify",
    "embedding_covariance",
    "dedup_survivors",
    "window_cusum",
    "stream_asof",
    "events_abandonment",
    "text_pmi_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from corintick_spark.session import get_spark

    spark = get_spark(
        app_name="corintick-spark-bench-extras",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from corintick_spark.catalog import table
    from corintick_spark.registry import load_all

    registry = load_all()
    for t in ("lineitem", "events", "documents", "embeddings", "orders"):
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in EXTRAS:
        t0 = time.perf_counter()
        registry[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "extras_suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

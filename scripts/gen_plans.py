"""Regenerate PLANS.md (annotated physical plans for headline queries)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from corintick_spark.session import get_spark
from corintick_spark.registry import load_all

NOTES = {
    "scan_filter": "uid + type predicates pushed into the parquet scan (DataFilters/PushedFilters); only referenced columns read (ReadSchema).",
    "join_broadcast": "all three dimension joins are BroadcastHashJoin — zero dim-side shuffles; the only exchange is the final aggregation's.",
    "agg_basic": "two HashAggregate nodes (partial map-side combine, then final after one exchange); scaled-long sums stay in whole-stage codegen.",
    "join_asof": "union + single hashpartitioning exchange on user_id + one Window pass — no per-row lookups, no range probe.",
    "topk_per_group": "one exchange on the group key, Window row_number, filter — the single-shuffle top-k-per-group plan.",
    "topk_global": "TakeOrderedAndProject: per-partition heaps + driver merge, no global sort.",
    "dedup_minhash": "signature stage materialized once (localCheckpoint; durable table at 100 TB); candidate generation is a hash join on (band_id, band_hash) buckets carrying ONLY ids — no cross product, no array payloads through exchanges; shingles semi-join back on deduped pairs.",
    "similarity_topk": "BroadcastNestedLoopJoin over the 10-row probe set (the guarded cross join) followed by a windowed top-k; the corpus is never shuffled.",
    "resample_ohlc": "single partial+final hash aggregation on (uid, hour bucket) — the map-side combine reduces before the shuffle.",
    "cdc_merge": "latest-per-key upsert compaction plans WindowGroupLimit (partial before the exchange, final after) — ~1 row per key crosses the shuffle, not the full log.",
    "window_drawdown": "running-sum, running-max and final max-per-user stack on ONE (user_id) exchange and one sort; the aggregation reuses the window's partitioning.",
    "scd2_intervals": "both window passes (LAG change detection, LEAD interval close) share a single exchange + sort on user_id.",
    "text_topngrams": "bigrams via higher-order array transform — no positional self-join; one exchange for the count, TakeOrderedAndProject for the top-k.",
    "reshape_unpivot": "unpivot plans a single Expand over one column-pruned scan — not four re-reads of the table.",
    "pack_sequences": "one exchange on source feeds both the prefix-sum window and the bin aggregation; only per-bin summaries (not packed text) leave the stage.",
    "window_winsorize": "per-key percentile stats are |keys| rows and broadcast back (BroadcastHashJoin) — the fact side is never shuffled for the clip.",
    "join_asof_tolerance": "identical single-shuffle union+window plan as join_asof; the staleness bound is a projection-level null-out, not a second join.",
    "dedup_incremental": "new-batch signatures checkpointed once; corpus side reads ONLY the signature table (no text column in any FileScan — pinned by tests/test_operators.py); candidates meet in a (band_id, band_hash) hash join.",
    "resample_ffill": "grid rows are sequence()+explode from per-key bounds (no driver loop); ONE window pass carries the last tick struct onto grid rows — a NULL-valued tick correctly fills NULL.",
    "events_concurrency": "two-level distributed prefix sum: per-instant deltas aggregate map-side, the global prefix runs over the tiny hour-bucket table (broadcast back), interior cumsums are bucket-partitioned windows — no corpus-sized SinglePartition window anywhere.",
    "dedup_editjoin": "PassJoin segment candidates: each string probes (2k+1)^2(k+1) short substrings against the k+1-segment index as an equi-join on (segment text, j, target length) — a candidate needs a ~13-char VERBATIM near-aligned match; only the bounded short stratum uses a (broadcast) direct join; verification computes levenshtein on deduped candidate ids only.",
    "dedup_substring": "duplicated-window detection: one JVM transform hashes every 30-char window through overlapping 256-char slices (O(len*chunk), not O(len^2); the only corpus-sized exchange carries 8-byte hashes), hash candidates (count>=2) semi-join back, per-doc candidate positions fold to ONE array so verification re-extracts window text once per doc, exact text recount filters hash collisions.",
    "dedup_substring_winnow": "winnow scale tier adjudicated against the exact tier in one plan: anchor positions (rightmost-min of every 8 window hashes, selected inside the row) are the ONLY positions entering the candidate exchange (~2/9 of the exact tier's shuffle); text-verified anchors merge to spans; the per-doc join + pooled-recall broadcast compare both tiers.",
    "dq_suite": "all four row-level checks compile into ONE partial+final HashAggregate over a single scan (plan test pins <=1 Scan); the referential check is a LeftAnti join collapsed to a 1-row aggregate.",
    "graph_triangles": "equi-joins only (edge derivation: one fact-fact shuffle + broadcast dims; wedge + closing joins on node keys) — no CartesianProduct/BNLJ anywhere; degree orientation bounds wedge fan-out to the low-degree endpoint.",
    "pipeline_decontaminate": "the removal is a BroadcastHashJoin LeftAnti against the tiny contaminated-id set — the corpus is never shuffled to be cleaned.",
    "join_interval_point": "no equi key exists, yet the plan is a hash join: intervals exploded to hour buckets, equi-join on bucket, exact residual filter — the BNLJ a naive overlap join would plan never appears.",
    "shuffle_shards": "the training permutation is windowed PER SHARD (hash partition) — no SinglePartition global row_number; each shard is one writer task at scale.",
    "text_heavyhitters": "per-partition Misra-Gries summaries (mapInPandas) emit <= k rows each; the exact verification is a broadcast semi-join + partial-aggregated count — the full vocabulary never crosses an exchange.",
    "sample_per_group": "WindowGroupLimit pushes the rank<=k bound below the window, so only k rows per group survive the exchange.",
    "pack_fragments": "one exchange on source feeds the prefix-sum window; fragments are a sequence()+explode over each doc's token interval — splitting needs no sequential fold.",
    "profile_numeric": "stack() melts 4 columns inside the scan's stage; ONE partial+final aggregation keyed by column name — |columns| rows out regardless of table size.",
    "sample_priority": "weighted top-k is TakeOrderedAndProject (per-partition heaps of k) — the corpus is scanned once and never globally sorted or shuffled.",
    "sql_q18": "the IN-subquery decorrelates to LeftSemi hash joins fed by a broadcast of the per-order aggregate; every lineitem scan reads only (l_orderkey, l_quantity).",
    "sql_q22": "NOT EXISTS decorrelates to a hash anti join on custkey; the 1-row average CTE enters as a single-row broadcast, never a cartesian.",
    "embedding_covariance": "Arrow-batched partial Gram folds (numpy matmul per batch); the only wide exchange carries (i, j, partial) cells — d² rows whatever the corpus size; the embedding column never crosses a shuffle.",
    "knn_classify": "broadcast nested loop ONLY over the <=20-row probe set (the guarded cross-join shape), then one windowed top-k and a tiny vote aggregate — the corpus is scanned once.",
    "window_cusum": "the recursive max(0, s+d) folds into prefix-sum minus running-min: two window passes sharing ONE (user_id) exchange and sort — no per-key list fold, no sequential state.",
    "text_pmi_pairs": "the co-occurrence self-join is capped to the in-plan top-100 vocabulary (TakeOrdered), bounding the per-doc pair lattice at C(100,2) regardless of document length; dimension joins broadcast.",
    "events_abandonment": "the time-bounded NOT EXISTS is a LeftSemi hash join on the user_id equi key with the 1-hour window as residual — never a nested loop over purchases.",
    "join_bloom_prefilter": "the dim side folds to a bit-set plan literal; the fact-side Filter (xxhash64 probes in whole-stage codegen) sits BELOW the verifying LeftSemi join, so the join shuffle carries only probable matches (~15% of lineitem here), never the full fact table.",
    "join_bitmap": "no Join operator anywhere — the exact bitmap turns the semi-join into a map-side Filter on the scan; the only exchange left is the final aggregation's (the strongest runtime-filter form, for bounded integer dim domains).",
    "graph_bfs": "per-level frontier expansion is a BroadcastHashJoin (frontier ≪ edges) + LeftAnti against visited; the edge-derivation fact-fact shuffle happens once up front, and localCheckpoint per level keeps the plan from growing with depth.",
    "storage_pruned_read": "the FileScan lists ONLY the manifest-pruned files (4/8 at sf0.01 for this range) — pruning happened before the plan existed; the residual BETWEEN is additionally pushed into the parquet scan (PushedFilters).",
    "events_pattern": "one partial+final hash aggregate builds each user-day's ordered letter sequence (array_sort makes it shuffle-immune); the regex count is a scalar projection — no window, no self-join, group state bounded by events-per-user-day.",
    "storage_ivm": "the refresh side reads ONLY the CDF delta files (the version diff pruned the base files before planning); the sign-fold is one small exchange on the group keys — base-table cost is absent from the plan, not just reduced.",
    "storage_bloom_lookup": "the scan lists only the files whose per-file Bloom filter hits the probe (min/max bounds are useless on this hash-scattered layout); the residual equality is pushed into the parquet scan — exact at any FP rate.",
    "text_bm25": "one explode feeds tf and df; document lengths, corpus stats, query terms, and df all enter as broadcasts — the document side crosses exactly one exchange for the per-doc score fold.",
    "agg_group_median": "no sort and no percentile buffers anywhere: each refinement round is one (group, bucket) hash aggregation against broadcast per-group ranges; the per-round driver exchange is bounded by groups × buckets.",
    "agg_chi2": "one corpus aggregation builds the contingency cells; marginals re-aggregate the cells-sized table and broadcast back — the statistic is computed without a second corpus pass.",
    "dedup_image_phash": "pixels never cross an exchange: decode+DCT run inside ONE Arrow-batched mapInPandas, and the localCheckpointed (id, 8-byte sig) frame feeds BOTH sides of the band join (decode runs once, not twice); candidates meet in a hash join on (chunk_id, chunk_val) — a (max_hamming+1)-way fan-out of 16-byte rows, never a crossJoin.",
    "dedup_video_phash": "per-frame hashes join WITHIN (chunk_id, chunk_val, frame_idx) — misaligned frames never become candidates; the vote is one (a_id, b_id) hash aggregation over frame pairs, and only (id, idx, 8-byte hash) rows ever shuffle.",
}


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical plans of headline queries (sf0.01, AQE initial plans)",
        "",
        "Generated by scripts/gen_plans.py; the properties called out per plan",
        "are pinned by `tests/test_plans.py` so refactors cannot silently",
        "regress them.",
        "",
    ]
    for name, note in NOTES.items():
        plan = reg[name].spark(spark, sf)._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n")
        out.append(f"**Why this plan survives 100 TB:** {note}\n")
        out.append("```")
        out.extend(l.rstrip()[:160] for l in plan.splitlines()[:40])
        out.append("```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()

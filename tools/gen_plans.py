#!/usr/bin/env python
"""Regenerate PLANS.md: `explain formatted` output for representative
queries, with the plan property each one demonstrates (the same
properties tests/test_plans.py asserts)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducer_spark.plans import formatted_plan  # noqa: E402
from mapreducer_spark.registry import all_queries  # noqa: E402
from mapreducer_spark.session import get_spark  # noqa: E402

PICKS = [
    ("word_count", "flagship: tokenize -> partial+final hash aggregate"),
    ("pricing_summary", "TPC-H Q1: wide agg, filter pushed to parquet scan"),
    ("nation_revenue", "dim joins broadcast; single fact shuffle"),
    ("returned_items_topn", "Q10: two pushed filters + broadcasts + TakeOrdered"),
    ("nation_market_share", "Q8: 6-table join, all dims broadcast"),
    ("event_value_band_join", "band join -> BroadcastNestedLoopJoin"),
    ("events_asof_latest_order", "as-of join: union + single window shuffle"),
    ("dedup_exact", "hash-groupBy dedup: narrow (hash, id) shuffle rows"),
    ("dedup_minhash_lsh", "map-side minhash -> banded buckets -> in-array pairs"),
    ("similarity_topk", "broadcast queries x candidate scan + per-query top-k"),
    ("word_count_topk", "orderBy+limit -> TakeOrderedAndProject"),
    ("hash_sampled_orders", "row-local sampling predicate: zero exchanges"),
    ("user_activity_similarity_blocked", "multi-probe LSH pair stage: equi-join, no cartesian"),
    ("corpus_mixture_quota", "exact-quota mixing: per-source window, no fact shuffle"),
    ("ann_ivf_topk", "frozen-index IVF: map-side argmax assignment, 2 exchanges total"),
    ("semdedup_clusters", "cluster-bounded semantic dedup: broadcast index + within-cluster pairs"),
    ("quantity_decile_stats", "decile banding via histogram + boundary-only windows"),
    ("bm25_retrieval", "BM25: decimal term components, TakeOrderedAndProject top-k"),
    ("chunk_level_dedup", "chunk dedup: one hash-keyed window shuffle + per-doc agg"),
    ("ann_pq_adc_topk", "PQ ADC: broadcast LUT over code scan, decimal partial sums"),
    ("cms_heavy_hitters", "count-min sketch: broadcast 256-cell grid, TakeOrdered top-20"),
    ("weighted_sample_orders", "weighted A-Res sample: map-only keys -> TakeOrderedAndProject"),
    ("min_cost_supplier_q2ish", "Q2 over derived partsupp: map-side generation + one window"),
    ("incremental_daily_agg", "mergeable partial states: two partial aggs re-reduced"),
    ("ann_ivf_nprobe_sweep", "nprobe sweep: ONE scored frame, per-level filter + window (no re-scan per level)"),
    ("simhash_hamming_pairs", "banded Hamming blocking: band equi-join + xor/popcount verify, no cartesian"),
    ("bpe_corpus_token_counts", "BPE apply: broadcast vocab join + partial-agg groupBy over exploded tokens"),
    ("split_leakage_pairs", "leakage audit: blocked pair set x (key, split) joins only"),
    ("bloom_decontamination", "bloom bitmap: bit_or build, broadcast probe, map-side membership"),
    ("cdc_chunk_dedup", "CDC: map-side boundary flags, narrow explode, prefix-sum + chunk-hash shuffles"),
    ("incremental_neardup_pairs", "delta dedup: new-side postings x full index, no old-old branch"),
    ("dp_nation_order_counts", "DP release: 25-cell agg + broadcast threshold BNLJ, noise O(cells)"),
    ("density_prune_plan", "density prune: collapsed (cluster, sim) frame, value-domain-bounded window"),
    ("substring_dedup_spans", "ExactSubstr spans: one hash-window shuffle + doc-keyed islands, agg reuses window partitioning"),
    ("incremental_substring_spans", "delta substring dedup: delta shingles probe frozen old index"),
    ("doc_trigram_perplexity", "3-level Stupid Backoff: all model tables broadcast, corpus never shuffles"),
    ("sequence_packing_offsets", "two-phase prefix sum: bucketed windows + 64-row offset broadcast"),
    ("embedding_int8_recall_at_k", "sample-calibrated quantization: 1-row params broadcast, one scan serves both rankings"),
    ("market_basket_rules", "basket rules: in-array i<j pair expansion, floor before the frequency joins"),
    ("customer_spend_gini", "exact Gini: value-histogram collapse, windows over distinct values only"),
    ("label_centroid_auc", "rank-sum AUC: 10-row centroid broadcast, window over collapsed (label, score) groups"),
    ("embedding_kmeans_spherical", "in-engine Lloyd rounds: k-row centroid broadcast per round, map-side assignment, checkpointed iterates"),
    ("copurchase_link_prediction", "Adamic-Adar: in-array wedge expansion over memoized edges, anti-join removes existing edges"),
    ("bootstrap_revenue_ci", "hash bootstrap: one md5 per row, 50-way map-side fan-out into ONE shuffle of 50 groups"),
    ("ship_delay_percentiles", "integer percentiles: (month x delay) domain grid + per-month cumulative windows, zero floats"),
    ("trimmed_mean_order_value", "L-statistics: value-histogram collapse, bucket-overlap interior mass, no per-row sort"),
    ("lineitem_correlation_matrix", "fixed6 scaled-long moments (codegen, no per-row BigDecimal); all 6 pairs F.stack'd from ONE moment row (r9 — was a 12-scan unionAll)"),
    ("welch_price_ttest", "Welch t: fixed6 grouped moments, 2-row frame pivots via conditional MAX (no branch re-scan), one broadcast segment join"),
    ("ann_ivf_rebalance_plan", "IVF maintenance readout: frozen lists + delta-only assignment, sqrt-n rule computed in-plan on the 1-row total, k-row output"),
    ("retrieval_pipeline_summary", "RAG capstone: IVF probe -> checkpointed MMR rounds -> broadcast selection x chunk tiling -> per-query offset windows, one plan"),
]


def main() -> None:
    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = all_queries()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `python tools/gen_plans.py` (Spark `explain formatted`,",
        "sf0.01, 8 shuffle partitions).  What to look for per plan is noted",
        "above each; plan-shape tests in `tests/test_plans.py` assert these",
        "properties so they cannot silently regress.",
        "",
    ]
    for name, why in PICKS:
        plan = formatted_plan(qs[name].fn(spark, sf))
        out += [f"## {name}", "", f"**Property under test:** {why}", "",
                "```", plan.strip(), "```", ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()

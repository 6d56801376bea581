"""Partition-count invariance: the engine's results must be identical
regardless of how many shuffle partitions the cluster runs — the claim
behind every floating aggregate's exact-DECIMAL accumulation and every
hash id's canonical serialization.  A 1000-executor cluster IS the
shuffle-partition change; any query whose values move here would drift
at scale."""

from __future__ import annotations

import pytest

from apl_commissions_etl_spark.registry import all_queries

#: numerically / orderingly sensitive representatives: float aggs,
#: money rounding, percent banding, windows over ties, hash ids, a
#: sketch, a self-trained model, and the fused text metrics
SENSITIVE = [
    "agg_pricing_summary",
    "agg_conformance_banding",
    "calc_stage7_commissions",
    "builder_split_hierarchies",
    "corpus_perplexity_filter",
    "corpus_countmin_sketch",
    "text_profile_suite",
    "seq_anomaly_zscore",
    # round-3 additions: register-max sketch, scaled-int PQ distances,
    # global-ntile layout assignment, windowed RAG context assembly
    "corpus_hll_distinct",
    "ann_pq_codes",
    "layout_zorder_plan",
    "pipeline_rag_retrieval",
]


def _rows(spark, name, sf_dir, n_shuffle):
    spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    try:
        df = all_queries()[name].spark_fn(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(
            (tuple(str(r[c]) for c in cols) for r in df.collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


@pytest.mark.parametrize("name", SENSITIVE)
def test_results_invariant_to_shuffle_partition_count(spark, sf_dir, name):
    assert _rows(spark, name, sf_dir, 1) == _rows(spark, name, sf_dir, 13)

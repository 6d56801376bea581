"""Engine-wide physical-plan invariants over the ENTIRE query registry.

The per-query oracle gate proves values; these prove the 100 TB
posture holds for every registered operator at once:

- no row-at-a-time Python UDFs anywhere (``BatchEvalPython``) and no
  Arrow scalar UDFs outside the sanctioned grouped/map stages — Python
  enters only through mapInPandas/applyInPandas where the operator is
  an ordered fold or a codec boundary;
- no CartesianProduct (both sides shuffled, no broadcast) except the
  explicitly labeled brute-force baseline. BroadcastNestedLoopJoin is
  NOT flagged: it is the intended physical strategy for non-equi
  predicates against a broadcast-small side (theta bands, '*'
  wildcards) — by definition one side fits in memory.
"""

from __future__ import annotations

from apl_commissions_etl_spark.registry import all_queries

#: queries whose plan may contain a true cartesian, each bounded by
#: construction:
#: - dedup_embedding_cosine: the labeled brute-force all-pairs baseline
#:   (the LSH/IVF variants are the scale path);
#: - ann_topk_*: the probe side is a literal query vector / a
#:   16-row centroid list (constant-size).
CARTESIAN_OK = {
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
}

#: queries allowed to run Python batch stages (Arrow mapInPandas /
#: applyInPandas): the ordered consolidation fold and the multimodal
#: codec boundary (decode feeds the resize geometry). Everything else
#: must stay JVM-side.
PANDAS_OK = {
    "consolidate_proposals",
    # same sanctioned sorted-fold stage, over the touched groups only
    "consolidate_incremental_parity",
    "multimodal_decode",
    "multimodal_codec_roundtrip",
    "multimodal_png_roundtrip",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "multimodal_image_dedup_dhash",
    "multimodal_image_dedup_hamming",
}

# a family suite UNIONs the plans of its sub-queries, so it inherits
# exactly the sanctioned stages its subs already have
from apl_commissions_etl_spark.queries.suites import SUITE_DEFS  # noqa: E402

for _suite, (_ref, _subs) in SUITE_DEFS.items():
    if set(_subs) & CARTESIAN_OK:
        CARTESIAN_OK.add(_suite)
    if set(_subs) & PANDAS_OK:
        PANDAS_OK.add(_suite)


def test_registry_plan_invariants(spark, sf_dir):
    qs = all_queries()
    bad: dict[str, str] = {}
    for name, q in qs.items():
        df = q.spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            bad[name] = "row-at-a-time Python UDF in plan"
        elif "ArrowEvalPython" in plan:
            bad[name] = "Arrow scalar UDF in plan (use native expressions)"
        elif (
            "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
        ) and name not in PANDAS_OK:
            bad[name] = "unexpected pandas stage"
        elif "CartesianProduct" in plan and name not in CARTESIAN_OK:
            bad[name] = "unbroadcast cartesian product"
    assert not bad, f"plan invariant violations: {bad}"

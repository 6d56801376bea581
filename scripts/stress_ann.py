"""Embeddings-replication stress for the ANN family: measure the
batch top-k serving join (sign-LSH bucketed) and the PQ code
assignment with the embedding table replicated 1x / 4x / 16x (unique
vec_ids per replica, vectors unchanged — the adversarial case for the
bucket join: every replica lands in the SAME sign-LSH bucket, so
bucket population, and therefore the per-bucket candidate count,
grows with the factor while the bucket COUNT stays fixed), and update
the "Embeddings-replication stress" section of SCALING.md.

PQ assignment is the control: it is pure map-side (constant literal
codebooks, no shuffle), so its slope is scan + codegen throughput —
the same shape the 1000-executor cluster keeps.

Usage: python scripts/stress_ann.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from apl_commissions_etl_spark.operators import similarity
from apl_commissions_etl_spark.session import get_spark
from apl_commissions_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
)
MARK = "## Embeddings-replication stress (ANN serving)"


def replicate(emb: DataFrame, factor: int) -> DataFrame:
    if factor == 1:
        return emb
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    n = 10_000_000
    return emb.select("vec_id", "embedding", reps).select(
        (F.col("vec_id") + F.col("rep") * n).alias("vec_id"), "embedding"
    )


def batch_topk(emb: DataFrame) -> DataFrame:
    """ann_topk_batch's shape: 5 query vectors, 4-plane bucket join,
    per-query top-5 window."""
    bucket = similarity.sign_lsh_bucket(F.col("embedding"), planes=4)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
        bucket.alias("qb"),
    )
    b = emb.select("vec_id", "embedding", bucket.alias("qb"))
    cand = (
        b.join(F.broadcast(q), "qb")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            similarity.cosine(F.col("embedding"), F.col("qv")).alias("cos"),
        )
    )
    rn = F.row_number().over(W.partitionBy("qid").orderBy(F.desc("cos"), "vec_id"))
    return cand.withColumn("rn", rn).filter(F.col("rn") <= 5)


W = Window


def pq_codes(emb: DataFrame) -> DataFrame:
    from apl_commissions_etl_spark.queries.llmdata import (
        _PQ_K,
        _PQ_SUBS,
        _pq_spark_dist,
    )

    seeds = similarity.ivf_centroids(emb, n_centroids=4)
    books = [
        [[float(x) for x in seeds[k][1][s * 8 : s * 8 + 8]] for k in range(_PQ_K)]
        for s in range(_PQ_SUBS)
    ]
    exprs = []
    for s in range(_PQ_SUBS):
        entries = ",".join(
            f"named_struct('d', {_pq_spark_dist(s, books[s][k])}, 'c', {k})"
            for k in range(_PQ_K)
        )
        exprs.append(f"CAST(array_min(array({entries})).c AS STRING)")
    code = F.expr("concat(" + ",".join(exprs) + ")")
    return emb.select("vec_id", code.alias("pq_code"))


def ivfpq_parts(emb: DataFrame, base: DataFrame):
    """(index_builder, probe_builder) for the full IVF-PQ read path —
    same expressions as the registered ann_topk_ivfpq, parameterized
    so the index covers the REPLICATED table while centroids/codebooks
    and the query stay fixed (as they would in production: the model
    doesn't retrain because the corpus grew)."""
    from apl_commissions_etl_spark.queries.llmdata import (
        _PQ_K,
        _PQ_SUBS,
        _pq_lit_dist_sql,
        _pq_spark_dist,
    )

    seeds = similarity.ivf_centroids(base, n_centroids=16)
    qvec = [
        float(x)
        for x in base.filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    books = [
        [[float(x) for x in seeds[k][1][s * 8 : s * 8 + 8]]
         for k in range(_PQ_K)]
        for s in range(_PQ_SUBS)
    ]
    spark = emb.sparkSession
    qcol = F.lit(qvec).cast("array<double>")
    cent_df = spark.createDataFrame(
        [(cid, cv) for cid, cv in seeds], "vec_id long, cvec array<double>"
    )
    probe = [
        r[0]
        for r in cent_df.select(
            "vec_id", similarity.cosine(F.col("cvec"), qcol).alias("sim")
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(4)
        .collect()
    ]
    code_digits = []
    for s in range(_PQ_SUBS):
        entries = ",".join(
            f"named_struct('d', {_pq_spark_dist(s, books[s][k])}, 'c', {k})"
            for k in range(_PQ_K)
        )
        code_digits.append(f"array_min(array({entries})).c")
    adc_terms = []
    for s in range(_PQ_SUBS):
        q_sub = qvec[s * 8 : s * 8 + 8]
        table = ",".join(
            _pq_lit_dist_sql(q_sub, books[s][k]) for k in range(_PQ_K)
        )
        adc_terms.append(
            f"element_at(array({table}), {code_digits[s]} + 1)"
        )
    adc = F.expr("(" + " + ".join(adc_terms) + ")")
    exact = F.expr(
        "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), "
        + similarity._vec_sql(qvec)
        + ", (x, y) -> CAST(round((x - y) * (x - y) * 1e9) AS BIGINT)),"
        " 0L, (acc, t) -> acc + t)"
    )

    def build_index() -> DataFrame:
        return similarity.ivf_assign(emb, seeds).localCheckpoint()

    def probe_topk(index: DataFrame) -> list:
        return (
            index.filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0))
            .select("vec_id", adc.alias("adc_scaled"), "embedding")
            .orderBy("adc_scaled", "vec_id")
            .limit(20)
            .withColumn("exact_scaled", exact)
            .orderBy("exact_scaled", "vec_id")
            .limit(10)
            .collect()
        )

    return build_index, probe_topk


def main() -> None:
    spark = get_spark("stress-ann")
    emb = load_table(spark, SF, "embeddings")
    # warm-up: JIT/codegen compile + parquet footer reads, so the 1x
    # row measures steady-state work, not first-query fixed costs
    batch_topk(emb).count()
    pq_codes(emb).write.format("noop").mode("overwrite").save()
    rows = []
    for factor in (1, 4, 16):
        r = replicate(emb, factor)
        t0 = time.time()
        n_topk = batch_topk(r).count()
        t_topk = time.time() - t0
        t0 = time.time()
        pq_codes(r).write.format("noop").mode("overwrite").save()
        t_codes = time.time() - t0
        build_index, probe_topk = ivfpq_parts(r, emb)
        t0 = time.time()
        index = build_index()
        t_index = time.time() - t0
        t0 = time.time()
        n_pq = len(probe_topk(index))
        t_probe = time.time() - t0
        rows.append((factor, n_topk, t_topk, t_codes, t_index, t_probe))
        print(f"{factor}x: topk rows={n_topk} {t_topk:.2f}s; "
              f"pq assign {t_codes:.2f}s; ivfpq index {t_index:.2f}s "
              f"probe {t_probe:.2f}s ({n_pq} rows)", flush=True)

    base_topk, base_codes = rows[0][2], rows[0][3]
    lines = [
        MARK,
        "",
        "`embeddings` replicated in-plan (unique vec_ids, vectors",
        "unchanged — every replica falls in the SAME sign-LSH bucket, so",
        "per-bucket candidate population grows with the factor while the",
        "bucket count stays fixed: the worst case for the serving join).",
        f"sf0.1 base ({emb.count()} vectors x 64 dims), 5-query batch",
        "top-5, local[32]; PQ assignment as the shuffle-free control;",
        "ivfpq = the full IVF-PQ read path (ann_topk_ivfpq), split into",
        "its one-time index build (cell assignment, O(n) map-side) and",
        "the per-query serving probe (nprobe cell filter -> ADC top-20",
        "-> exact re-rank), which is the number a retrieval service",
        "pays per request:",
        "",
        "| vectors | topk sec | vs 1x | pq-assign sec | vs 1x "
        "| ivfpq index s | ivfpq probe s |",
        "|---|---|---|---|---|---|---|",
    ]
    for factor, n_topk, t_topk, t_codes, t_index, t_probe in rows:
        lines.append(
            f"| {factor}x | {t_topk:.2f} | {t_topk / base_topk:.1f}x "
            f"| {t_codes:.2f} | {t_codes / base_codes:.1f}x "
            f"| {t_index:.2f} | {t_probe:.2f} |"
        )
    lines += [
        "",
        "The bucket join's candidate count grows linearly (replicas",
        "share buckets), and the window's per-qid top-5 bounds the",
        "output; PQ assignment stays scan-bound. At 100 TB the bucket",
        "key becomes a partition key, so the same join prunes",
        "(1 - 5/2^planes) of the table before any vector math, and hot",
        "buckets fall under the documented cap (ann_range_search) or",
        "AQE skew split.",
        "",
    ]
    section = "\n".join(lines)

    with open(OUT) as f:
        doc = f.read()
    if MARK in doc:
        pat = re.escape(MARK) + r".*?(?=\n## |\Z)"
        doc = re.sub(pat, section, doc, flags=re.S)
    else:
        doc = doc.rstrip() + "\n\n" + section
    with open(OUT, "w") as f:
        f.write(doc)
    print("SCALING.md embeddings stress section updated")


if __name__ == "__main__":
    main()

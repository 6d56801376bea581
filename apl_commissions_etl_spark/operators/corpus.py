"""Corpus-preparation operators for LLM pretraining pipelines:
repetition filtering, stratified/weighted sampling, sequence packing,
benchmark-contamination detection, embedding quantization.

All pure JVM expressions or narrow-shuffle aggregations — the same
100 TB posture as the rest of the LLM-data suite:

- per-document metrics (repetition, quality) are higher-order-function
  folds inside the scan stage: zero shuffles;
- sampling decisions are pure functions of a key hash, so any executor
  reproduces them without coordination (no global RNG state);
- the only shuffles are group-scale aggregations (per-source counts,
  benchmark shingle sets) that broadcast back to the fact side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import textanalysis as ta

# ---------------------------------------------------------------------------
# deterministic hash-uniform in [0, 4096): cross-engine reproducible
# (md5 hex prefix — same bytes in Spark and DuckDB), used for every
# sampling decision instead of seeded RNG (not reproducible across
# engines or across Spark partitionings)
# ---------------------------------------------------------------------------


def hash_bucket(key: Column | str, buckets_hex_digits: int = 3) -> Column:
    """First N hex digits of md5(key) as an integer in [0, 16^N)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, buckets_hex_digits), 16, 10
    ).cast("int")


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style filters)
# ---------------------------------------------------------------------------


def _max_run_sorted(arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array — i.e.
    the max frequency of any element — as a single codegen'd fold (no
    explode/groupBy shuffle)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc["best"])


def word_shingles(w: Column, n: Column) -> Column:
    """All 3-word shingles (non-distinct), empty when < 3 words.
    Mirrors the DuckDB construction used by the dedup oracles."""
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i + 1), F.element_at(w, i + 2),
                F.element_at(w, i + 3)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document repetition profile: duplicate-word fraction,
    top-word frequency fraction, duplicate-3-gram fraction. The
    Gopher/MassiveText repetition rules are thresholds over exactly
    these ratios. All ratios are raw double divisions of exact integer
    counts (bit-identical across engines; no rounding step).

    Entirely per-row array math — no explode, no shuffle — so callers
    can pass ``keep`` columns to carry through and fuse further
    projection-shaped signals onto the SAME scan instead of joining
    separately-derived frames back on the id."""
    w = ta.words(text_col)
    d = df.select(
        F.col(id_col),
        w.alias("w"),
        F.size(w).alias("n_words"),
        *keep,
    )
    sh = word_shingles(F.col("w"), F.col("n_words"))
    d = d.select(
        id_col,
        "n_words",
        *keep,
        (
            F.lit(1.0)
            - F.size(F.array_distinct("w")).cast("double") / F.col("n_words")
        ).alias("dup_word_frac"),
        (_max_run_sorted(F.col("w")).cast("double") / F.col("n_words")).alias(
            "top_word_frac"
        ),
        F.size(sh).alias("n_shingles"),
        F.size(F.array_distinct(sh)).alias("n_distinct_shingles"),
    )
    return d.select(
        id_col,
        "n_words",
        *keep,
        "dup_word_frac",
        "top_word_frac",
        F.when(
            F.col("n_shingles") > 0,
            F.lit(1.0)
            - F.col("n_distinct_shingles").cast("double") / F.col("n_shingles"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str,
    part_col: str,
    tokens_col: Column,
    budget: int = 512,
) -> DataFrame:
    """Contiguous token-budget packing: within each ``part_col`` stream
    (ordered by id), documents are laid end-to-end and cut into bins of
    ``budget`` tokens; each doc is assigned the bin its first token
    falls in. One window aggregation per partition stream — at 100 TB
    the shuffle is by source/shard key, and each executor packs its
    stream independently (the exact shape of distributed pretraining
    shard writers)."""
    win = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.select(F.col(id_col), F.col(part_col), tokens_col.alias("n_tokens"))
    cum = F.sum("n_tokens").over(win)
    return d.select(
        id_col,
        part_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("bin_id"),
        (cum - F.col("n_tokens")).alias("start_offset"),
    )


# ---------------------------------------------------------------------------
# weighted source mixing
# ---------------------------------------------------------------------------


def source_mix_rates(
    counts: DataFrame, weight: Column, count_col: str = "n_docs"
) -> DataFrame:
    """Per-source keep rates that reshape the corpus toward relative
    ``weight``s: the most-underrepresented source (min count/weight)
    keeps everything, every other source downsamples proportionally.
    ``counts`` is group-scale (one row per source) so the min is a
    2-row crossJoin of aggregates, and the rates broadcast back to the
    document side."""
    c = counts.withColumn("mix_weight", weight)
    base = c.agg(
        F.min(F.col(count_col).cast("double") / F.col("mix_weight")).alias("c_base")
    )
    return c.crossJoin(F.broadcast(base)).select(
        *counts.columns,
        "mix_weight",
        F.least(
            F.lit(1.0),
            F.col("c_base") * F.col("mix_weight") / F.col(count_col).cast("double"),
        ).alias("keep_rate"),
    )


# ---------------------------------------------------------------------------
# embedding quantization
# ---------------------------------------------------------------------------


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5) clamped to [-127, 127]. floor(x+0.5)
    (not round()) so both engines use the identical away-from-half rule
    on exact IEEE doubles. Returns (scale, quantized int array)."""
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x))).cast("double")
    scale = F.greatest(max_abs, F.lit(1e-12)) / F.lit(127.0)
    q = F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") / scale + 0.5).cast("int")),
        ),
    )
    return scale, q

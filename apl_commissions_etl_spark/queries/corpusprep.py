"""Corpus-preparation queries: the operations a production pretraining
data pipeline runs between raw ingest and shard writing — repetition
filtering, stratified + weighted sampling, sequence packing,
benchmark-contamination detection, embedding quantization.

Every query has a full DuckDB value-hash oracle. Cross-engine parity
rules used throughout:

- ratios are raw IEEE double divisions of exact integer counts (no
  round() step — Spark rounds half-up, DuckDB half-even, and e.g.
  k/128 hits an exact 7th-decimal 5);
- sampling is md5-hex-prefix bucketing (same bytes both engines), with
  numeric thresholds compared as ints (Spark conv(hex,16,10), DuckDB
  CAST('0x'||hex AS INT));
- quantization uses floor(x/scale + 0.5), not round(), for an
  engine-independent halfway rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus, textanalysis as ta
from ..registry import query
from ..sources.testdata import load_table
from .llmdata import _NORM, _SHINGLES_CTE, _WORDS, _doc_signals, _docs

# DuckDB-side mirrors of the shared text normalization -----------------------

_DUCK_U12 = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS INT)"

_WORDS_CTE = f"""
w AS (
  SELECT doc_id, {_WORDS} AS w, len({_WORDS}) AS n_words
  FROM documents)
"""


@query(
    "corpus_repetition_filter",
    oracle=f"""
    WITH {_WORDS_CTE},
    topw AS (
      SELECT doc_id, MAX(cnt) AS max_freq FROM (
        SELECT doc_id, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM w)
        GROUP BY doc_id, tok)
      GROUP BY doc_id),
    sh AS (
      SELECT doc_id,
             CASE WHEN n_words >= 3
                  THEN list_transform(range(1, n_words - 1),
                       i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))
                  ELSE [] END AS sh
      FROM w)
    SELECT w.doc_id,
           w.n_words,
           1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / w.n_words
             AS dup_word_frac,
           CAST(t.max_freq AS DOUBLE) / w.n_words AS top_word_frac,
           CASE WHEN len(sh.sh) > 0
                THEN 1.0 - CAST(len(list_distinct(sh.sh)) AS DOUBLE) / len(sh.sh)
                ELSE 0.0 END AS dup_3gram_frac,
           CAST(
             (1.0 - CAST(len(list_distinct(w.w)) AS DOUBLE) / w.n_words) <= 0.95
             AND CAST(t.max_freq AS DOUBLE) / w.n_words <= 0.2
             AS BOOLEAN) AS keep
    FROM w JOIN topw t USING (doc_id) JOIN sh USING (doc_id)
    """,
    survey_ref="north-star: Gopher/MassiveText repetition filters "
    "(dup-word / top-word / dup-3-gram fractions) as codegen folds — "
    "no explode shuffle on the Spark side",
)
def corpus_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    m = corpus.repetition_metrics(d, "doc_id", "text")
    return m.select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        "top_word_frac",
        "dup_3gram_frac",
        ((F.col("dup_word_frac") <= 0.95) & (F.col("top_word_frac") <= 0.2)).alias(
            "keep"
        ),
    )


#: per-language keep rates out of 4096 hash buckets (en downsampled 4x,
#: everything else kept) — the "rebalance a web-heavy crawl" move
_STRAT_THRESH = {"en": 1024, "de": 4096, "es": 4096, "fr": 4096, "zh": 4096}


@query(
    "corpus_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_DUCK_U12} <
      CASE lang WHEN 'en' THEN 1024 ELSE 4096 END
    """,
    survey_ref="north-star: deterministic stratified sampling — "
    "per-stratum md5-bucket thresholds, reproducible on any executor "
    "with no RNG state (O3's hash-sample generalized per stratum)",
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", 1024).otherwise(4096)
    return d.filter(corpus.hash_bucket("doc_id") < thresh).select(
        "doc_id", "lang", "source"
    )


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_WORDS}) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin_id,
           CAST(cum - n_tokens AS BIGINT) AS start_offset
    FROM c
    """,
    survey_ref="north-star: token-budget sequence packing — per-source "
    "streams cut into 512-token bins by one window cumsum; each "
    "executor packs its shard independently",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    from ..operators import textanalysis as ta

    return corpus.pack_sequences(
        d, "doc_id", "source", ta.token_count_ws("text"), budget=512
    )


#: every 29th doc plays the held-out benchmark; the rest are "train"
_BENCH_PRED = "doc_id % 29 = 0"


@query(
    "corpus_contamination_ngram",
    oracle=f"""
    WITH {_WORDS_CTE},
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(CASE WHEN n_words >= 3
                    THEN list_transform(range(1, n_words - 1),
                         i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))
                    ELSE [] END) AS s
        FROM w)),
    bench AS (SELECT DISTINCT s FROM sh WHERE {_BENCH_PRED}),
    train AS (SELECT doc_id, s FROM sh WHERE NOT ({_BENCH_PRED})),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_overlap
      FROM train t JOIN bench b ON t.s = b.s
      GROUP BY t.doc_id)
    SELECT s.doc_id, s.n_shingles,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / s.n_shingles
             AS overlap_frac,
           CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / s.n_shingles >= 0.5
             AS contaminated
    FROM sizes s LEFT JOIN hits h USING (doc_id)
    """,
    survey_ref="north-star: benchmark-contamination detection — train "
    "docs vs held-out shingle set via broadcast semi-structured join "
    "(the benchmark side is tiny at any corpus scale)",
)
def corpus_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    from ..operators import textanalysis as ta

    # project the token array FIRST: inlining the split into the
    # per-shingle lambda re-evaluates it O(tokens) times per row
    # (dedup.word_shingles documents the same 10x trap)
    toks = d.select("doc_id", ta.words("text").alias("w"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(corpus.word_shingles(F.col("w"), F.size("w")))
        ).alias("s"),
    )
    is_bench = F.col("doc_id") % 29 == 0
    bench = sh.filter(is_bench).select("s").distinct()
    train = sh.filter(~is_bench)
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    out = sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_shingles")
    return out.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        frac.alias("overlap_frac"),
        (frac >= 0.5).alias("contaminated"),
    )


@query(
    "corpus_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, label, embedding,
             greatest(CAST(list_max(list_transform(embedding, x -> abs(x)))
                           AS DOUBLE), 1e-12) / CAST(127 AS DOUBLE) AS scale
      FROM embeddings)
    SELECT vec_id, label, scale,
           array_to_string(list_transform(embedding,
             x -> CAST(greatest(-127, least(127,
                  CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)))
                  AS VARCHAR)), ',') AS q8
    FROM s
    """,
    survey_ref="north-star: symmetric per-vector int8 quantization of "
    "the embedding column — pure array lambdas in the scan stage, the "
    "compression step before ANN index build",
)
def corpus_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    scale, q = corpus.quantize_int8(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        scale.alias("scale"),
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q8"),
    )


_MIX_RATES_SQL = """
counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
wts AS (
  SELECT source, n_docs,
         CASE WHEN source IN ('src0','src1','src2','src3','src4')
              THEN CAST(2 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS mix_weight
  FROM counts),
base AS (SELECT MIN(CAST(n_docs AS DOUBLE) / mix_weight) AS c_base FROM wts),
rates AS (
  SELECT w.source, w.n_docs, w.mix_weight,
         least(CAST(1 AS DOUBLE),
               b.c_base * w.mix_weight / CAST(w.n_docs AS DOUBLE)) AS keep_rate
  FROM wts w CROSS JOIN base b)
"""


def _mix_weight() -> F.Column:
    return F.when(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 2.0
    ).otherwise(1.0)


@query(
    "corpus_mix_rates",
    oracle=f"WITH {_MIX_RATES_SQL} SELECT source, n_docs, mix_weight, "
    "keep_rate FROM rates",
    survey_ref="north-star: weighted source mixing — temperature-style "
    "rebalancing rates from a group-scale count aggregate (one tiny "
    "shuffle; rates broadcast back to the corpus side)",
)
def corpus_mix_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return corpus.source_mix_rates(counts, _mix_weight())


@query(
    "corpus_mix_weighted",
    oracle=f"""
    WITH {_MIX_RATES_SQL}
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3) AS INT)
          < CAST(floor(r.keep_rate * 4096) AS INT)
    """,
    survey_ref="north-star: weighted source mixing applied — "
    "deterministic md5-bucket downsampling against the per-source "
    "rates; the decision is a pure function of (doc_id, rate), no "
    "coordination across executors",
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    rates = corpus.source_mix_rates(counts, _mix_weight()).select(
        "source", "keep_rate"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            corpus.hash_bucket("doc_id")
            < F.floor(F.col("keep_rate") * 4096).cast("int")
        )
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# corpus statistics + the round's flagship composition
# ---------------------------------------------------------------------------


@query(
    "corpus_ngram_topk",
    oracle=f"""
    WITH {_WORDS_CTE},
    grams AS (
      SELECT unnest(CASE WHEN n_words >= 3
                 THEN list_transform(range(1, n_words - 1),
                      i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))
                 ELSE [] END) AS gram
      FROM w),
    counts AS (SELECT gram, COUNT(*) AS n FROM grams GROUP BY gram)
    SELECT gram, n FROM counts ORDER BY n DESC, gram LIMIT 25
    """,
    survey_ref="north-star: corpus-level heavy hitters — top-k 3-grams "
    "via map-side partial counts + TakeOrderedAndProject (per-partition "
    "top-k, no global sort); the vocabulary/boilerplate profiling pass",
)
def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textanalysis as ta

    d = _docs(spark, sf_dir)
    # token array projected first — see corpus_contamination_ngram
    toks = d.select(ta.words("text").alias("w"))
    grams = toks.select(
        F.explode(corpus.word_shingles(F.col("w"), F.size("w"))).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(25)
    )


@query(
    "corpus_dup_rate_by_source",
    oracle=f"""
    WITH fp AS (
      SELECT source, md5({_NORM}) AS fp FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup_docs,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)
             AS dup_rate
    FROM fp GROUP BY source
    """,
    survey_ref="north-star: per-source exact-duplicate rates (the "
    "corpus-health dashboard aggregate over the dedup fingerprint); "
    "one combinable shuffle on (source, fp)",
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import textanalysis as ta

    d = load_table(spark, sf_dir, "documents")
    fp = d.select("source", ta.fingerprint_exact("text").alias("fp"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("fp")).alias("n_dup_docs"),
        (
            (F.count("*") - F.countDistinct("fp")).cast("double") / F.count("*")
        ).alias("dup_rate"),
    )


@query(
    "pipeline_finetune_pack",
    oracle=f"""
    WITH {_WORDS_CTE},
    topw AS (
      SELECT doc_id, MAX(cnt) AS max_freq FROM (
        SELECT doc_id, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM w)
        GROUP BY doc_id, tok)
      GROUP BY doc_id),
    clean AS (
      SELECT d.doc_id, d.lang, d.source, ww.n_words
      FROM documents d
      JOIN w ww USING (doc_id) JOIN topw t USING (doc_id)
      WHERE 1.0 - CAST(len(list_distinct(ww.w)) AS DOUBLE) / ww.n_words <= 0.95
        AND CAST(t.max_freq AS DOUBLE) / ww.n_words <= 0.2),
    sampled AS (
      SELECT * FROM clean
      WHERE {_DUCK_U12} < CASE lang WHEN 'en' THEN 1024 ELSE 4096 END),
    counts AS (SELECT source, COUNT(*) AS n_docs FROM sampled GROUP BY source),
    wts AS (
      SELECT source, n_docs,
             CASE WHEN source IN ('src0','src1','src2','src3','src4')
                  THEN CAST(2 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS mix_weight
      FROM counts),
    base AS (SELECT MIN(CAST(n_docs AS DOUBLE) / mix_weight) AS c_base FROM wts),
    rates AS (
      SELECT w2.source,
             least(CAST(1 AS DOUBLE),
                   b.c_base * w2.mix_weight / CAST(w2.n_docs AS DOUBLE))
               AS keep_rate
      FROM wts w2 CROSS JOIN base b),
    mixed AS (
      SELECT s.doc_id, s.source, s.n_words
      FROM sampled s JOIN rates r USING (source)
      WHERE CAST('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 3) AS INT)
            < CAST(floor(r.keep_rate * 4096) AS INT)),
    packed AS (
      SELECT doc_id, source, n_words AS n_tokens,
             SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM mixed)
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin_id,
           CAST(cum - n_tokens AS BIGINT) AS start_offset
    FROM packed
    """,
    survey_ref="north-star FLAGSHIP composition #2: the fine-tuning "
    "shard-prep pipeline in one plan — repetition gate, stratified "
    "rebalance, weighted source mixing, token-budget packing; every "
    "stage is the already-verified round-4 operator, composed",
)
def pipeline_finetune_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second end-to-end composition: what a fine-tuning data pipeline
    runs — repetition filter -> stratified sample -> weighted mix ->
    sequence packing — as one composed dataflow (the packing window is
    the only shuffle after the repetition metric folds)."""
    d = load_table(spark, sf_dir, "documents")
    m = corpus.repetition_metrics(d, "doc_id", "text")
    clean = (
        d.join(m, "doc_id")
        .filter((F.col("dup_word_frac") <= 0.95) & (F.col("top_word_frac") <= 0.2))
        .select("doc_id", "lang", "source", "n_words")
    )
    thresh = F.when(F.col("lang") == "en", 1024).otherwise(4096)
    sampled = clean.filter(corpus.hash_bucket("doc_id") < thresh)
    counts = sampled.groupBy("source").agg(F.count("*").alias("n_docs"))
    rates = corpus.source_mix_rates(counts, _mix_weight()).select(
        "source", "keep_rate"
    )
    mixed = (
        sampled.join(F.broadcast(rates), "source")
        .filter(
            corpus.hash_bucket("doc_id")
            < F.floor(F.col("keep_rate") * 4096).cast("int")
        )
        .select("doc_id", "source", "n_words")
    )
    return corpus.pack_sequences(
        mixed, "doc_id", "source", F.col("n_words"), budget=512
    )


@query(
    "corpus_length_buckets",
    oracle=f"""
    WITH {_WORDS_CTE},
    b AS (
      SELECT doc_id, n_words,
             CAST(length(bin(n_words)) - 1 AS INT) AS bucket_log2
      FROM w WHERE n_words > 0)
    SELECT bucket_log2,
           CAST(POW(2, bucket_log2) AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           MIN(n_words) AS min_tokens,
           MAX(n_words) AS max_tokens,
           CAST(SUM(n_words) AS BIGINT) * 1.0 / COUNT(*) AS avg_tokens
    FROM b GROUP BY bucket_log2
    """,
    survey_ref="north-star: sequence-length bucketing for packing/"
    "curriculum — power-of-two token-length histogram. The bucket id "
    "is derived from the binary-string width (length(bin(n)) - 1 == "
    "floor(log2 n)) so both engines bucket by exact integer math, "
    "never float log2; one combinable groupBy on a <64-value key",
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram with power-of-two buckets: the sizing
    pass a packing/curriculum scheduler reads (how many docs fit each
    context-length class, token mass per class)."""
    d = _docs(spark, sf_dir)
    n_words = F.size(ta.words("text")).cast("long")
    b = d.select(
        "doc_id", n_words.alias("n_words")
    ).filter(F.col("n_words") > 0).withColumn(
        "bucket_log2", (F.length(F.bin("n_words")) - 1).cast("int")
    )
    return b.groupBy("bucket_log2").agg(
        F.pow(F.lit(2), F.col("bucket_log2")).cast("long").alias("bucket_lo"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        F.min("n_words").alias("min_tokens"),
        F.max("n_words").alias("max_tokens"),
        (F.sum("n_words") * 1.0 / F.count(F.lit(1))).alias("avg_tokens"),
    ).select(
        "bucket_log2", "bucket_lo", "n_docs", "total_tokens",
        "min_tokens", "max_tokens", "avg_tokens",
    )


@query(
    "corpus_perplexity_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM w GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT w.doc_id, COUNT(*) AS n_tokens,
             SUM(-log2(v.c * 1.0 / t.total)) AS nll
      FROM w JOIN vocab v ON w.tok = v.tok CROSS JOIN tot t
      GROUP BY w.doc_id)
    SELECT doc_id, n_tokens,
           CAST(round(nll / n_tokens, 6) AS DOUBLE) AS avg_nll_bits,
           CASE WHEN round(nll / n_tokens, 6) < 5.5 THEN 'typical'
                WHEN round(nll / n_tokens, 6) < 6.5 THEN 'unusual'
                ELSE 'outlier' END AS ppl_band
    FROM scored
    """,
    survey_ref="north-star: perplexity filtering — self-trained unigram "
    "LM (one vocab aggregation), per-doc average negative log2 "
    "likelihood, banded for keep/drop routing. The vocab join is a "
    "plain token equi-join (shuffle-partitioned at corpus scale, "
    "hot tokens are exactly what AQE skew split handles); the 1-row "
    "corpus total rides a broadcast. 6-dp rounding absorbs "
    "last-ulp libm/accumulation-order drift, as in entropy routing",
)
def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc term frequencies from the shared signals frame (r13,
    # guide §2.3): the r12 form folded the token stream per run — one
    # corpus tokenize+explode per consumer subtree (vocab AND rollup
    # re-derive it). The stored map starts per-call work at (doc, tok)
    # scale; the token total is the sum of the stored per-doc word
    # counts (n_words IS size(words(text)) — the identical integer).
    # sum(tf * term) float-add order remains absorbed by the 6-dp
    # round exactly as in r12 (proven hash-identical at all three SFs).
    sig = _doc_signals(spark, sf_dir)
    tf = sig.select("doc_id", F.explode("tf")).select(
        "doc_id", F.col("key").alias("tok"), F.col("value").alias("tf")
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    tot = sig.agg(F.sum("n_words").cast("long").alias("total"))
    nll = F.round(
        F.sum(F.col("tf") * -F.log2(F.col("c") * 1.0 / F.col("total")))
        / F.sum("tf"),
        6,
    ).cast("double")
    scored = (
        tf.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            nll.alias("avg_nll_bits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_nll_bits",
        F.when(F.col("avg_nll_bits") < 5.5, "typical")
        .when(F.col("avg_nll_bits") < 6.5, "unusual")
        .otherwise("outlier")
        .alias("ppl_band"),
    )


@query(
    "corpus_mix_temperature",
    oracle="""
    WITH n AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM n)
    SELECT source, n_docs,
           CAST(round(n_docs * 1.0 / t.total, 6) AS DOUBLE) AS p_raw,
           CAST(round(
             pow(n_docs * 1.0 / t.total, 0.5)
             / SUM(pow(n_docs * 1.0 / t.total, 0.5)) OVER (), 6)
             AS DOUBLE) AS p_temperature
    FROM n CROSS JOIN t
    """,
    survey_ref="north-star: temperature-scaled source mixing — "
    "p_i^(1/T) renormalized (T=2 flattens the source distribution, "
    "the standard multilingual/multi-source upsampling rule). "
    "Source-cardinality input, so the whole computation is one tiny "
    "aggregate + a window over a handful of rows",
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = n.agg(F.sum("n_docs").cast("long").alias("total"))
    p = F.col("n_docs") * 1.0 / F.col("total")
    half = F.pow(p, 0.5)
    return (
        n.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(p, 6).cast("double").alias("p_raw"),
            F.round(
                half / F.sum(half).over(W.partitionBy()), 6
            ).cast("double").alias("p_temperature"),
        )
    )


#: shared SQL fragments for the composed quality gate (mirrors of the
#: standalone text_quality_score / text_lang_id / perplexity oracles)
_PPL_CTES = f"""
wt AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
vocab AS (SELECT tok, COUNT(*) AS c FROM wt GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
ppl AS (
  SELECT wt.doc_id,
         round(SUM(-log2(v.c * 1.0 / t.total)) / COUNT(*), 6) AS nll
  FROM wt JOIN vocab v ON wt.tok = v.tok CROSS JOIN tot t
  GROUP BY wt.doc_id)"""

_QUALITY_CTES = f"""
qt AS (
  SELECT doc_id, length(trim(text)) AS n, {_WORDS} AS w FROM documents),
qm AS (
  SELECT doc_id,
         least(n / 200.0, 1.0) AS len_score,
         len(list_filter(w, x -> x IN ('the','a','of','and','in','to')))
           * 1.0 / len(w) AS sw,
         list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w) AS wl
  FROM qt),
q AS (
  SELECT doc_id,
         round(greatest(0.0,
           len_score * 0.4
           + greatest(1.0 - abs(sw - 0.15) * 2, 0.0) * 0.3
           + (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.5 END) * 0.3
         ), 6) AS quality
  FROM qm)"""

_LANG_CTES = f"""
ls AS (
  SELECT doc_id, lang AS labeled_lang,
    len(list_filter({_WORDS}, x -> x IN ('the','a','of','and','value'))) AS en_s,
    len(list_filter({_WORDS}, x -> x IN ('el','la','de','que','los'))) AS es_s,
    len(list_filter({_WORDS}, x -> x IN ('de5','le5','shi4','zai4','he2'))) AS zh_s
  FROM documents),
lg AS (
  SELECT doc_id, labeled_lang,
         CASE WHEN greatest(en_s, es_s, zh_s) = 0 THEN 'und'
              WHEN es_s > en_s AND zh_s <= es_s THEN 'es'
              WHEN zh_s > en_s AND zh_s > es_s THEN 'zh'
              ELSE 'en' END AS detected_lang
  FROM ls)"""

_REP_CTES = f"""
rw AS (
  SELECT doc_id, {_WORDS} AS w, len({_WORDS}) AS n_words FROM documents),
rtop AS (
  SELECT doc_id, MAX(cnt) AS max_freq FROM (
    SELECT doc_id, COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest(w) AS tok FROM rw)
    GROUP BY doc_id, tok)
  GROUP BY doc_id),
rep AS (
  SELECT rw.doc_id,
         1.0 - CAST(len(list_distinct(rw.w)) AS DOUBLE) / rw.n_words
           AS dup_word_frac,
         CAST(t.max_freq AS DOUBLE) / rw.n_words AS top_word_frac
  FROM rw JOIN rtop t USING (doc_id))"""


@query(
    "pipeline_quality_gate",
    oracle=f"""
    WITH {_PPL_CTES},
    {_QUALITY_CTES},
    {_LANG_CTES},
    {_REP_CTES}
    SELECT d.doc_id,
           CAST(rep.dup_word_frac <= 0.95 AND rep.top_word_frac <= 0.2
                AS BOOLEAN) AS pass_repetition,
           CAST(ppl.nll < 6.5 AS BOOLEAN) AS pass_perplexity,
           CAST(lg.detected_lang = lg.labeled_lang
                OR lg.detected_lang = 'und' AS BOOLEAN) AS pass_lang,
           CAST(q.quality >= 0.3 AS BOOLEAN) AS pass_quality,
           CAST(rep.dup_word_frac <= 0.95 AND rep.top_word_frac <= 0.2
                AND ppl.nll < 6.5
                AND (lg.detected_lang = lg.labeled_lang
                     OR lg.detected_lang = 'und')
                AND q.quality >= 0.3 AS BOOLEAN) AS keep
    FROM documents d
    JOIN ppl USING (doc_id)
    JOIN q USING (doc_id)
    JOIN lg USING (doc_id)
    JOIN rep USING (doc_id)
    """,
    survey_ref="north-star flagship composition #3: the pre-shard "
    "quality gate — repetition metrics, self-trained unigram "
    "perplexity, lang-id agreement, and heuristic quality score fused "
    "into one keep/drop verdict per document (every signal a "
    "broadcast-free codegen fold or a single token equi-join; the "
    "four gates then join on doc_id, all co-partitioned)",
)
def pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repetition, lang-id, and quality are ALL per-row projections (no
    # explode, no shuffle), fused onto ONE scan in the session's
    # shared signal frame (llmdata._doc_signals — also read by
    # pipeline_pretrain_corpus); only the perplexity signal (which
    # genuinely needs the corpus-level vocabulary) joins
    sig = _doc_signals(spark, sf_dir)
    base = sig.select(
        "doc_id",
        ((F.col("dup_word_frac") <= 0.95) & (F.col("top_word_frac") <= 0.2))
        .alias("pass_repetition"),
        (
            (F.col("detected_lang") == F.col("lang"))
            | (F.col("detected_lang") == "und")
        ).alias("pass_lang"),
        (F.col("quality") >= 0.3).alias("pass_quality"),
    )
    # perplexity from the signals frame's per-doc tf MAP (r13): the
    # r12 form re-tokenized the corpus in TWO subtrees (the tf fold is
    # consumed by both vocab and the rollup; Spark re-derives it per
    # consumer) plus a THIRD scan for the token total. Exploding the
    # stored map starts per-call work at (doc, tok) scale — same rows,
    # same counts as the explode+fold it replaces (map built from the
    # identical words() expression at signals-build time).
    tf = sig.select("doc_id", F.explode("tf")).select(
        "doc_id", F.col("key").alias("tok"), F.col("value").alias("tf")
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    # total corpus tokens == sum of the per-doc word counts already on
    # the signals frame — n_words IS size(words(text)), the exact
    # integer the r12 per-scan sum produced (guide §2.3: no third
    # pass over the corpus for one number)
    tot = sig.agg(F.sum("n_words").cast("long").alias("total"))
    ppl = (
        tf.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * -F.log2(F.col("c") * 1.0 / F.col("total")))
                / F.sum("tf"),
                6,
            ).alias("nll")
        )
        .select("doc_id", (F.col("nll") < 6.5).alias("pass_perplexity"))
    )
    return base.join(ppl, "doc_id").select(
        "doc_id",
        "pass_repetition",
        "pass_perplexity",
        "pass_lang",
        "pass_quality",
        (
            F.col("pass_repetition")
            & F.col("pass_perplexity")
            & F.col("pass_lang")
            & F.col("pass_quality")
        ).alias("keep"),
    )


#: count-min sketch geometry: 4 hash rows x 256 buckets (md5-derived,
#: engine-identical). Width 256 is fixture-sized; at corpus scale the
#: same plan runs with width 2^20+ — the sketch table stays
#: (depth x width) rows regardless of input size.
_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket_sql(row: int, tok: str = "tok") -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({row} AS VARCHAR) || {tok}), 1, 2) "
        "AS INT)"
    )


@query(
    "corpus_countmin_sketch",
    oracle=f"""
    WITH w AS (SELECT unnest({_WORDS}) AS tok FROM documents),
    rows_ AS (
      {" UNION ALL ".join(
        f"SELECT {i} AS sketch_row, {_cms_bucket_sql(i)} AS bucket, tok FROM w"
        for i in range(_CMS_DEPTH)
      )})
    SELECT sketch_row, bucket, COUNT(*) AS n
    FROM rows_ GROUP BY sketch_row, bucket
    """,
    survey_ref="north-star: count-min sketch build — a {_CMS_DEPTH}x"
    "256 token-frequency sketch from md5-derived bucket hashes "
    "(deterministic, engine-identical, so even the sketch CONTENTS "
    "are value-hash-checkable). The sketch table is (depth x width) "
    "rows no matter how large the corpus: the constant-size summary "
    "that answers frequency queries without a second scan at 100 TB",
)
def corpus_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = d.select(F.explode(ta.words("text")).alias("tok"))
    out = None
    for i in range(_CMS_DEPTH):
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.lit(str(i)), F.col("tok"))), 1, 2),
            16,
            10,
        ).cast("int")
        part = w.select(
            F.lit(i).alias("sketch_row"), bucket.alias("bucket"), "tok"
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("sketch_row", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "corpus_countmin_estimate",
    oracle=f"""
    WITH w AS (SELECT unnest({_WORDS}) AS tok FROM documents),
    rows_ AS (
      {" UNION ALL ".join(
        f"SELECT {i} AS sketch_row, {_cms_bucket_sql(i)} AS bucket, tok FROM w"
        for i in range(_CMS_DEPTH)
      )}),
    cms AS (
      SELECT sketch_row, bucket, COUNT(*) AS n
      FROM rows_ GROUP BY sketch_row, bucket),
    probes AS (
      SELECT unnest(['the','a','of','and','in','to','value','table']) AS tok),
    truth AS (
      SELECT p.tok, CAST(COUNT(w.tok) AS BIGINT) AS true_count
      FROM probes p LEFT JOIN w ON w.tok = p.tok
      GROUP BY p.tok),
    est AS (
      SELECT p.tok, MIN(c.n) AS cms_estimate
      FROM probes p
      JOIN (
        {" UNION ALL ".join(
          f"SELECT {i} AS sketch_row, tok, {_cms_bucket_sql(i)} AS bucket FROM probes"
          for i in range(_CMS_DEPTH)
        )}) pb ON pb.tok = p.tok
      JOIN cms c ON c.sketch_row = pb.sketch_row AND c.bucket = pb.bucket
      GROUP BY p.tok)
    SELECT t.tok, t.true_count, e.cms_estimate,
           CAST(e.cms_estimate >= t.true_count AS BOOLEAN) AS never_undercounts
    FROM truth t JOIN est e ON e.tok = t.tok
    """,
    survey_ref="north-star: count-min point estimates vs ground truth "
    "for a probe token list — min over the sketch's depth rows; the "
    "one-sided error guarantee (estimate >= truth) is emitted as a "
    "checked column. Probe lookups touch (depth) sketch rows, never "
    "the corpus",
)
def corpus_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    w = d.select(F.explode(ta.words("text")).alias("tok"))
    cms = None
    for i in range(_CMS_DEPTH):
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.lit(str(i)), F.col("tok"))), 1, 2),
            16,
            10,
        ).cast("int")
        part = w.select(
            F.lit(i).alias("sketch_row"), bucket.alias("bucket")
        )
        cms = part if cms is None else cms.unionByName(part)
    cms = cms.groupBy("sketch_row", "bucket").agg(F.count(F.lit(1)).alias("n"))

    probe_toks = ["the", "a", "of", "and", "in", "to", "value", "table"]
    probes = d.sparkSession.createDataFrame(
        [(t,) for t in probe_toks], "tok string"
    )
    truth = (
        probes.join(w, "tok", "left")
        .groupBy(probes.tok)
        .agg(F.count(w.tok).cast("long").alias("true_count"))
    )
    pb = None
    for i in range(_CMS_DEPTH):
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.lit(str(i)), F.col("tok"))), 1, 2),
            16,
            10,
        ).cast("int")
        part = probes.select(
            "tok", F.lit(i).alias("sketch_row"), bucket.alias("bucket")
        )
        pb = part if pb is None else pb.unionByName(part)
    est = (
        pb.join(F.broadcast(cms), ["sketch_row", "bucket"])
        .groupBy("tok")
        .agg(F.min("n").alias("cms_estimate"))
    )
    return truth.join(est, "tok").select(
        "tok",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("true_count")).alias(
            "never_undercounts"
        ),
    )


@query(
    "corpus_split_train_val_test",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, source, {_DUCK_U12} AS bucket
      FROM documents)
    SELECT doc_id, lang, source,
           CASE WHEN bucket < 3686 THEN 'train'
                WHEN bucket < 3891 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    survey_ref="north-star: deterministic train/val/test split — "
    "90/5/5 by md5 hash bucket (same bytes both engines), so the "
    "assignment is reproducible on any executor, stable under "
    "re-partitioning, and disjoint by construction; the split column "
    "becomes a partition key at shard-write time",
)
def corpus_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = corpus.hash_bucket("doc_id")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.when(bucket < 3686, "train")
        .when(bucket < 3891, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLES_CTE.strip().rstrip()},
    dfs AS (SELECT s, COUNT(*) AS d FROM sh GROUP BY s),
    per AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN dfs.d = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
      FROM sh JOIN dfs USING (s)
      GROUP BY sh.doc_id)
    SELECT doc_id, n_shingles, n_unique,
           n_unique * 1.0 / n_shingles AS novelty
    FROM per
    """,
    survey_ref="north-star: per-document n-gram novelty — the fraction "
    "of a doc's distinct 3-gram shingles appearing in NO other "
    "document (novelty 1.0 = fully original, ~0 = assembled from "
    "corpus boilerplate; the inverse signal of dedup). Shingle df from "
    "one aggregation, re-joined on the shingle key — raw double "
    "division of exact counts, no rounding step needed",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    d = _docs(spark, sf_dir)
    sh = dedup.word_shingles(d, "doc_id", "text", n=3)
    dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("d"))
    return (
        sh.join(dfs, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            (F.col("n_unique") * 1.0 / F.col("n_shingles")).alias("novelty"),
        )
    )


#: KMV (k-minimum-values) sketch size
_KMV_K = 64


@query(
    "corpus_kmv_distinct",
    oracle=f"""
    WITH w AS (SELECT DISTINCT unnest({_WORDS}) AS tok FROM documents),
    h AS (SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hv
          FROM w),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    stats AS (
      SELECT (SELECT COUNT(*) FROM h) AS exact_distinct,
             (SELECT COUNT(*) FROM k) AS k_used,
             (SELECT MAX(hv) FROM k) AS kth_hash)
    SELECT exact_distinct, CAST(k_used AS INT) AS k_used, kth_hash,
           CASE WHEN k_used < {_KMV_K} THEN CAST(exact_distinct AS DOUBLE)
                ELSE (k_used - 1) * 4294967296.0 / kth_hash END
             AS kmv_estimate
    FROM stats
    """,
    survey_ref="north-star: KMV distinct-count sketch — the k smallest "
    "md5-derived hash values estimate corpus vocabulary as "
    "(k-1)/max_kth_fraction (exact when distinct < k). Deterministic "
    "bytes both engines, so the sketch AND its estimate value-hash "
    "match; the k-row state is mergeable across shards (union + "
    "re-take-k), the distributed-distinct answer that never holds the "
    "full value set",
)
def corpus_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(ta.words("text")).alias("tok")).distinct()
    h = toks.select(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
        .cast("long")
        .alias("hv")
    )
    k = h.orderBy("hv").limit(_KMV_K)
    stats = h.agg(F.count(F.lit(1)).alias("exact_distinct")).crossJoin(
        k.agg(
            F.count(F.lit(1)).cast("int").alias("k_used"),
            F.max("hv").alias("kth_hash"),
        )
    )
    return stats.select(
        "exact_distinct",
        "k_used",
        "kth_hash",
        F.when(
            F.col("k_used") < _KMV_K,
            F.col("exact_distinct").cast("double"),
        )
        .otherwise(
            (F.col("k_used") - 1) * 4294967296.0 / F.col("kth_hash")
        )
        .alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (completes the sketch family next to
# count-min frequency and KMV distinct-count)
# ---------------------------------------------------------------------------

#: bloom geometry: 1024 bits as 32 x 32-bit words in BIGINT cells, 3
#: md5-derived hash functions. Fixture-sized; at corpus scale the same
#: plan runs with 2^30+ bits -- the bitmap stays (bits/32) rows and is
#: mergeable across shards via bit_or, the property that matters at
#: 100 TB (build once per shard, OR the word tables together).
_BLOOM_K = 3
_BLOOM_BITS = 1024

#: probes: half present in every fixture corpus, half absent
_BLOOM_PROBES = [
    "the", "table", "value", "row",
    "zzz_absent", "qqq_missing", "bloomfoo", "xy_zzy",
]


def _bloom_pos_sql(i: int, tok: str = "tok") -> str:
    return (
        f"(CAST('0x' || substr(md5(CAST({i} AS VARCHAR) || {tok}), 1, 3) "
        f"AS INT) % {_BLOOM_BITS})"
    )


@query(
    "corpus_bloom_filter",
    oracle=f"""
    WITH w AS (SELECT DISTINCT unnest({_WORDS}) AS tok FROM documents),
    bits AS (
      {" UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(i)} >> 5 AS word,"
        f" {_bloom_pos_sql(i)} & 31 AS bit FROM w"
        for i in range(_BLOOM_K)
      )}),
    bloom AS (
      SELECT word, bit_or(CAST(1 AS BIGINT) << bit) AS bits
      FROM bits GROUP BY word),
    probes AS (SELECT unnest({_BLOOM_PROBES!r}) AS tok),
    pb AS (
      {" UNION ALL ".join(
        f"SELECT tok, {_bloom_pos_sql(i)} >> 5 AS word,"
        f" {_bloom_pos_sql(i)} & 31 AS bit FROM probes"
        for i in range(_BLOOM_K)
      )}),
    hit AS (
      SELECT pb.tok,
             MIN(CASE WHEN b.bits IS NOT NULL
                       AND (b.bits >> pb.bit) & 1 = 1
                 THEN 1 ELSE 0 END) AS all_set
      FROM pb LEFT JOIN bloom b ON b.word = pb.word
      GROUP BY pb.tok),
    truth AS (
      SELECT p.tok,
             MAX(CASE WHEN w.tok IS NOT NULL THEN 1 ELSE 0 END) AS present
      FROM probes p LEFT JOIN w ON w.tok = p.tok
      GROUP BY p.tok)
    SELECT t.tok,
           CAST(t.present = 1 AS BOOLEAN) AS in_corpus,
           CAST(h.all_set = 1 AS BOOLEAN) AS bloom_positive,
           CAST(h.all_set = 1 OR t.present = 0 AS BOOLEAN)
             AS no_false_negative
    FROM truth t JOIN hit h ON h.tok = t.tok
    """,
    survey_ref="north-star: Bloom-filter membership sketch -- a "
    f"{_BLOOM_BITS}-bit / {_BLOOM_K}-hash bitmap built as 32-bit words "
    "in BIGINT cells via one bit_or aggregation (md5-derived positions, "
    "deterministic, engine-identical -- the bitmap CONTENTS are "
    "value-hash-checkable). Probes are answered from the word table "
    "alone; the no-false-negative guarantee is emitted as a checked "
    "column. The word table is (bits/32) rows regardless of corpus "
    "size and merges across shards with another bit_or -- the "
    "distributed-membership answer that never holds the value set",
)
def corpus_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(ta.words("text")).alias("tok")).distinct()

    def pos(i: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(str(i)), F.col("tok"))), 1, 3),
                16,
                10,
            ).cast("int")
            % _BLOOM_BITS
        )

    def word_bits(src: DataFrame, keep_tok: bool) -> DataFrame:
        out = None
        for i in range(_BLOOM_K):
            cols = [
                F.shiftright(pos(i), 5).alias("word"),
                pos(i).bitwiseAND(F.lit(31)).alias("bit"),
            ]
            if keep_tok:
                cols.insert(0, F.col("tok"))
            part = src.select(*cols)
            out = part if out is None else out.unionByName(part)
        return out

    bloom = (
        word_bits(toks, keep_tok=False)
        .groupBy("word")
        # shiftleft by a COLUMN needs the SQL form (the Python helper
        # takes only a literal shift amount)
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("bits")
        )
    )
    probes = d.sparkSession.createDataFrame(
        [(t,) for t in _BLOOM_PROBES], "tok string"
    )
    hit = (
        word_bits(probes, keep_tok=True)
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("tok")
        .agg(
            F.min(
                F.when(
                    F.col("bits").isNotNull()
                    & (F.expr("shiftright(bits, bit) & 1") == 1),
                    1,
                ).otherwise(0)
            ).alias("all_set")
        )
    )
    truth = (
        probes.join(toks.withColumnRenamed("tok", "ct"),
                    probes.tok == F.col("ct"), "left")
        .groupBy("tok")
        .agg(
            F.max(F.when(F.col("ct").isNotNull(), 1).otherwise(0)).alias(
                "present"
            )
        )
    )
    return truth.join(hit, "tok").select(
        "tok",
        (F.col("present") == 1).alias("in_corpus"),
        (F.col("all_set") == 1).alias("bloom_positive"),
        ((F.col("all_set") == 1) | (F.col("present") == 0)).alias(
            "no_false_negative"
        ),
    )


# ---------------------------------------------------------------------------
# URL / domain filtering (the C4 / RefinedWeb provenance-filter stage)
# ---------------------------------------------------------------------------

#: deterministic provenance synthesis: the fixture corpus carries no
#: URL column, so each document's origin derives from its id over a
#: literal domain catalog (same list both engines) -- the FILTER logic
#: (domain blocklist + TLD blocklist + regexp extraction) is the real
#: operator under test
_URL_DOMAINS = [
    "en.wikipedia.org", "github.com", "spam-ads.example.com",
    "docs.python.org", "casino.bet", "arxiv.org", "tracker.adsnet.io",
]
_BLOCKED_DOMAINS = ["spam-ads.example.com", "tracker.adsnet.io"]
_BLOCKED_TLDS = ["bet"]


@query(
    "corpus_url_filter",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source,
             {_URL_DOMAINS!r}[CAST(doc_id % {len(_URL_DOMAINS)} AS INT) + 1]
               AS domain
      FROM documents)
    SELECT doc_id,
           'https://' || domain || '/' || source || '/'
             || CAST(doc_id AS VARCHAR) AS url,
           domain,
           regexp_extract(domain, '\\.([a-z]+)$', 1) AS tld,
           CASE WHEN domain IN {tuple(_BLOCKED_DOMAINS)!r}
                  THEN 'domain-blocklist'
                WHEN regexp_extract(domain, '\\.([a-z]+)$', 1)
                     IN {tuple(_BLOCKED_TLDS + ['__never__'])!r}
                  THEN 'tld-blocklist'
           END AS block_reason,
           CAST(domain NOT IN {tuple(_BLOCKED_DOMAINS)!r}
                AND regexp_extract(domain, '\\.([a-z]+)$', 1)
                    NOT IN {tuple(_BLOCKED_TLDS + ['__never__'])!r}
             AS BOOLEAN) AS kept
    FROM u
    """,
    survey_ref="north-star: URL/domain provenance filtering -- domain "
    "extraction (JVM regexp in the scan projection), a broadcast-free "
    "literal blocklist for bad domains and TLDs, per-document "
    "keep/drop verdict with reason. At corpus scale the blocklist "
    "rides the closure (or a broadcast join when it outgrows it) and "
    "the whole filter is a single codegen stage ahead of every "
    "downstream pass; deterministic id-derived provenance stands in "
    "for the URL column the fixture lacks",
)
def corpus_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    domain = F.element_at(
        F.array(*[F.lit(x) for x in _URL_DOMAINS]),
        (F.col("doc_id") % len(_URL_DOMAINS)).cast("int") + 1,
    )
    u = d.select("doc_id", "source", domain.alias("domain"))
    tld = F.regexp_extract("domain", r"\.([a-z]+)$", 1)
    blocked_domain = F.col("domain").isin(*_BLOCKED_DOMAINS)
    blocked_tld = tld.isin(*_BLOCKED_TLDS)
    return u.select(
        "doc_id",
        F.concat(
            F.lit("https://"), "domain", F.lit("/"), "source", F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "domain",
        tld.alias("tld"),
        F.when(blocked_domain, "domain-blocklist")
        .when(blocked_tld, "tld-blocklist")
        .alias("block_reason"),
        (~blocked_domain & ~blocked_tld).alias("kept"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (completes the sketch family:
# count-min = frequency, KMV = distinct via order statistics, Bloom =
# membership, HLL = distinct via register maxima — the one that
# actually ships in every production engine)
# ---------------------------------------------------------------------------

_HLL_M = 256  # registers (bucket = first md5 byte)
#: alpha_m * m^2 * 2^55 precomputed in Python: ONE double literal both
#: engines parse identically (the raw-estimate numerator; 2^55 is the
#: exact-integer scale of the register sum below)
_HLL_NUMER = repr(0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * 2.0**55)
_HLL_EMPTY_SCALED = 1 << 55  # an empty register contributes 2^(55-0)


@query(
    "corpus_hll_distinct",
    oracle=f"""
    WITH w AS (SELECT DISTINCT unnest({_WORDS}) AS tok FROM documents),
    h AS (SELECT CAST('0x' || substr(md5(tok), 1, 2) AS INT) AS bucket,
                 CAST('0x' || substr(md5(tok), 3, 13) AS BIGINT) AS wv
          FROM w),
    r AS (SELECT bucket,
                 MAX(CASE WHEN wv = 0 THEN 53
                          ELSE 53 - length(bin(wv)) END) AS rho
          FROM h GROUP BY bucket),
    s AS (SELECT CAST(COUNT(*) AS INT) AS n_used,
                 CAST(SUM(CAST(pow(2, 55 - rho) AS BIGINT)) AS BIGINT)
                   AS used_scaled
          FROM r),
    x AS (SELECT COUNT(*) AS exact_distinct FROM w),
    e AS (
      SELECT n_used, exact_distinct,
             used_scaled
               + ({_HLL_M} - n_used) * CAST({_HLL_EMPTY_SCALED} AS BIGINT)
               AS total_scaled,
             {_HLL_M} - n_used AS n_zero
      FROM s, x),
    est AS (
      SELECT n_used, n_zero, total_scaled, exact_distinct,
             round({_HLL_NUMER} / total_scaled, 6) AS hll_raw,
             CASE WHEN n_zero > 0
                  THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / n_zero), 6)
                  END AS linear_count
      FROM e)
    SELECT n_used, n_zero, total_scaled,
           CAST(hll_raw AS DOUBLE) AS hll_raw,
           CAST(linear_count AS DOUBLE) AS linear_count,
           CAST(CASE WHEN n_zero > 0 AND hll_raw <= 2.5 * {_HLL_M}
                     THEN linear_count ELSE hll_raw END AS DOUBLE)
             AS estimate,
           exact_distinct
    FROM est
    """,
    survey_ref="north-star: HyperLogLog distinct-count sketch — 256 "
    "md5-derived registers (bucket = first hash byte, rho = leading "
    "zeros of the next 52 bits + 1) built by one max-combinable "
    "groupBy. The register sum is EXACT integer math (2^(55-rho) fits "
    "BIGINT, worst case 256*2^54 < 2^63) so the estimate is "
    "partition-order- and engine-independent; ln() only in the "
    "small-range linear-counting branch, 6-dp rounded to absorb libm "
    "last-ulp drift. The 256-row register table is the whole sketch "
    "state — mergeable across shards with another MAX, the "
    "constant-size distributed-distinct answer next to KMV's "
    "order-statistics variant",
)
def corpus_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(ta.words("text")).alias("tok")).distinct()
    h = toks.select(
        F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("int").alias("bucket"),
        F.conv(F.substring(F.md5("tok"), 3, 13), 16, 10).cast("long").alias("wv"),
    )
    regs = h.groupBy("bucket").agg(
        F.max(
            F.when(F.col("wv") == 0, 53).otherwise(53 - F.length(F.bin("wv")))
        ).alias("rho")
    )
    s = regs.agg(
        F.count(F.lit(1)).cast("int").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), 55 - F.col("rho")).cast("long")).alias(
            "used_scaled"
        ),
    )
    x = toks.agg(F.count(F.lit(1)).alias("exact_distinct"))
    e = s.crossJoin(x).select(
        "n_used",
        (F.lit(_HLL_M) - F.col("n_used")).alias("n_zero"),
        (
            F.col("used_scaled")
            + (F.lit(_HLL_M) - F.col("n_used")).cast("long")
            * F.lit(_HLL_EMPTY_SCALED)
        ).alias("total_scaled"),
        "exact_distinct",
    )
    hll_raw = F.round(F.lit(float(_HLL_NUMER)) / F.col("total_scaled"), 6)
    linear = F.when(
        F.col("n_zero") > 0,
        F.round(
            _HLL_M * F.log(F.lit(float(_HLL_M)) / F.col("n_zero")), 6
        ),
    )
    est = e.select(
        "n_used", "n_zero", "total_scaled",
        hll_raw.cast("double").alias("hll_raw"),
        linear.cast("double").alias("linear_count"),
        "exact_distinct",
    )
    return est.select(
        "n_used", "n_zero", "total_scaled", "hll_raw", "linear_count",
        F.when(
            (F.col("n_zero") > 0) & (F.col("hll_raw") <= 2.5 * _HLL_M),
            F.col("linear_count"),
        )
        .otherwise(F.col("hll_raw"))
        .cast("double")
        .alias("estimate"),
        "exact_distinct",
    )


_HLL_RHO = "CASE WHEN wv = 0 THEN 53 ELSE 53 - length(bin(wv)) END"
_HLL_H = f"""
      SELECT doc_id % 2 AS shard,
             CAST('0x' || substr(md5(tok), 1, 2) AS INT) AS bucket,
             CAST('0x' || substr(md5(tok), 3, 13) AS BIGINT) AS wv
      FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
"""


@query(
    "corpus_hll_merge",
    oracle=f"""
    WITH h AS ({_HLL_H}),
    shard_regs AS (
      SELECT shard, bucket, MAX({_HLL_RHO}) AS rho
      FROM h GROUP BY shard, bucket),
    merged AS (
      SELECT bucket, MAX(rho) AS rho FROM shard_regs GROUP BY bucket),
    direct AS (
      SELECT bucket, MAX({_HLL_RHO}) AS rho FROM h GROUP BY bucket),
    cmp AS (
      SELECT m.bucket, m.rho,
             CAST(m.rho = d.rho AS BOOLEAN) AS matches_direct
      FROM merged m JOIN direct d USING (bucket))
    SELECT CAST(COUNT(*) AS INT) AS n_registers,
           CAST(SUM(rho) AS BIGINT) AS rho_sum,
           CAST(MIN(matches_direct) AS BOOLEAN) AS all_match
    FROM cmp
    """,
    survey_ref="north-star: HLL shard merge — per-shard register "
    "tables (the 256-row sketch state of corpus_hll_distinct, built "
    "per doc_id-parity shard) merged with a second MAX and PROVEN "
    "register-identical to the direct whole-corpus build "
    "(all_match=true). MAX is idempotent/commutative/associative, so "
    "the merge is exact at any shard count and order — the property "
    "that lets 1000 executors (or 10 datacenters) sketch "
    "independently and combine in one tiny exchange; the twin of "
    "agg_partial_merge for non-algebraic distinct counting",
)
def corpus_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(
        (F.col("doc_id") % 2).alias("shard"),
        F.explode(ta.words("text")).alias("tok"),
    )
    h = toks.select(
        "shard",
        F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("int").alias("bucket"),
        F.conv(F.substring(F.md5("tok"), 3, 13), 16, 10).cast("long").alias("wv"),
    )
    rho = F.when(F.col("wv") == 0, 53).otherwise(53 - F.length(F.bin("wv")))
    shard_regs = h.groupBy("shard", "bucket").agg(F.max(rho).alias("rho"))
    merged = shard_regs.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = h.groupBy("bucket").agg(F.max(rho).alias("d_rho"))
    cmp = merged.join(direct, "bucket").select(
        "bucket", "rho", (F.col("rho") == F.col("d_rho")).alias("matches_direct")
    )
    return cmp.agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum("rho").alias("rho_sum"),
        F.min("matches_direct").alias("all_match"),
    )

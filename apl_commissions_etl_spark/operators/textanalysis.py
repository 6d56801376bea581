"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, fingerprinting.

All pure JVM expressions (whole-stage codegen) -- at 100 TB these run
inside the parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lists for the n-gram/stopword heuristic.
# Real pipelines plug in fastText etc.; the heuristic IS the operator
# shape: score per language, argmax with deterministic tie-break.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "value"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form: trim, collapse whitespace, lowercase."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def words(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text (no empty tokens)."""
    return F.split(normalize_text(col), " ")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish subword proxy: alternating alnum / non-alnum runs.
    Splitting on every boundary between letter-runs and digit/punct
    runs approximates subword segmentation without a vocab."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.trim(c), r"[^A-Za-z0-9]+")
    return F.size(F.filter(pieces, lambda x: x != ""))


def stopword_ratio(col: Column | str) -> Column:
    w = words(col)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return (hits * F.lit(1.0) / F.size(w)).cast("double")


def avg_word_len(col: Column | str) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return (total * F.lit(1.0) / F.size(w)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite doc-quality heuristic in [0,1]: penalize very short
    docs, extreme stopword ratios, and very long 'words' (binary/URL
    junk). Weights are illustrative; the operator shape (pure column
    math over tokenized text) is the point."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(F.trim(c))
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.15)) * 2
    wl = avg_word_len(col)
    wl_score = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.5)
    return F.round(
        F.greatest(
            F.lit(0.0),
            (len_score * 0.4 + F.greatest(sw_score, F.lit(0.0)) * 0.3 + wl_score * 0.3),
        ),
        6,
    ).cast("double")


def _marker_hits(w: Column, markers: tuple[str, ...]) -> Column:
    def pred(x: Column) -> Column:  # single-param: element-only lambda form
        return x.isin(*markers)

    return F.size(F.filter(w, pred))


def lang_scores(col: Column | str) -> dict[str, Column]:
    w = words(col)
    return {
        lang: _marker_hits(w, markers) for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Argmax language with deterministic tie-break (alphabetical
    language order, 'und' when no marker hits)."""
    scores = lang_scores(col)
    best = None
    best_score = None
    for lang in sorted(scores):  # alphabetical priority on ties
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint_exact(col: Column | str) -> Column:
    """MD5 of normalized text: whitespace/case-insensitive exact
    fingerprint."""
    return F.md5(normalize_text(col))


def fingerprint_bow(col: Column | str) -> Column:
    """Bag-of-words fingerprint: MD5 over the sorted token multiset --
    word-order-insensitive (rolling-hash-style doc identity)."""
    return F.md5(F.array_join(F.array_sort(words(col)), " "))


#: PII patterns, chosen to parse identically under Java regex (Spark)
#: and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{7,}"


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking: one output row per (doc,
    window), the shape LLM pretraining pipelines feed to tokenizers.
    ``stride < size`` yields ``size - stride`` tokens of overlap.

    Pure narrow expressions (split -> sequence -> explode -> slice):
    runs inside the scan stage with zero shuffles, so at 100 TB the
    chunker is I/O-bound. The explode multiplies rows ~n_tokens/stride
    per doc -- partition sizing should budget for that fan-out, not the
    input row count."""
    toks = df.select(F.col(id_col), words(text_col).alias("toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(stride)
    )
    ex = toks.select(F.col(id_col), "toks", F.explode(starts).alias("start"))
    chunk = F.slice("toks", F.col("start") + 1, F.lit(size))
    return ex.select(
        F.col(id_col),
        (F.col("start") / stride).cast("int").alias("chunk_seq"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails then long digit runs, reporting per-doc match
    counts -- the standard pre-training scrub pass. Single projection,
    no shuffle; regex work is JVM-side codegen."""
    c = F.col(text_col)
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE)).cast("int")
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_longnums = F.regexp_count(after_email, F.lit(LONGNUM_RE)).cast("int")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_longnums.alias("n_longnums"),
        F.regexp_replace(after_email, LONGNUM_RE, "<NUM>").alias("scrubbed"),
    )

"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All pure Catalyst expressions (regex/length/
array built-ins) — zero Python in the hot path, and every rule is
reproducible in ANSI-ish SQL so the DuckDB oracles verify them exactly."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import ngram_set, tokens_expr


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def token_count_expr(text_col):
    """Whitespace token count; blank → 0 (cross-engine rule)."""
    return F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text_col), " +"))
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


# quality scoring: length/punctuation/stopword ratios -----------------------

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def quality_exprs(text_col):
    n_chars = F.length(text_col)
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[.,;:!?]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS)))
    avg_tok_len = F.when(
        n_tokens > 0,
        (F.length(F.regexp_replace(text_col, " ", "")).cast("double") / n_tokens),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return n_tokens, punct_ratio, stop_ratio, avg_tok_len


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc-quality features + a bucketed score, mirroring
    length/punct/stopword heuristics used in web-corpus filtering."""
    docs = _t(spark, sf_dir, "documents")
    n_tokens, punct_ratio, stop_ratio, avg_tok_len = quality_exprs(F.col("text"))
    score = (
        F.when(n_tokens < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * 0.5
            + stop_ratio * 0.3
            + F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 10.0), 0.2).otherwise(0.0)
        )
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


# within-document repetition (C4/Gopher-style filters) -----------------------


def repetition_exprs(text_col):
    """Duplicate-word and duplicate-bigram fractions per document — the
    standard within-doc repetition signals web-corpus filters threshold
    on (boilerplate and generator spam repeat tokens and n-grams far
    above natural text).  Entirely narrow: token/bigram sets come from
    array built-ins on the split column, so the whole scorer is one
    zero-shuffle whole-stage-codegen projection at any corpus size."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    d = F.size(F.array_distinct(toks))
    dup_word = F.when(n > 0, F.lit(1.0) - d.cast("double") / n).otherwise(F.lit(0.0))
    db = F.size(ngram_set(text_col, 2))
    dup_bigram = F.when(n > 1, F.lit(1.0) - db.cast("double") / (n - 1)).otherwise(F.lit(0.0))
    return n, dup_word, dup_bigram


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition features + a binary keep/drop flag (thresholds chosen
    to actually discriminate on the fixture: word fraction spans 0–0.72,
    bigram fraction 0–0.13).  The flag compares the UNROUNDED fractions,
    mirrored exactly in the DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    n, dup_word, dup_bigram = repetition_exprs(F.col("text"))
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(dup_word, 4).alias("dup_word_frac"),
        F.round(dup_bigram, 4).alias("dup_bigram_frac"),
        F.when((dup_word > 0.6) | (dup_bigram > 0.1), 1).otherwise(0).alias("flag_repetitive"),
    )


# language ID: stopword-list n-gram heuristic --------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def langid_expr(text_col):
    """Guess language from stopword hit counts; ties break by language
    priority (en > de > fr > es), 'und' when no marker hits.  The exact
    nested-CASE shape is mirrored in the DuckDB oracle."""
    toks = F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    s = {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }
    return (
        F.when((s["en"] >= F.greatest(s["de"], s["fr"], s["es"])) & (s["en"] > 0), "en")
        .when((s["de"] >= F.greatest(s["fr"], s["es"])) & (s["de"] > 0), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", langid_expr(F.col("text")).alias("lang_guess"))


# fingerprinting --------------------------------------------------------------


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: full md5 + a 32-bit integer prefix (the join
    key for shard-local dedup maps)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long").alias("fp32"),
    )


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data cleaning pipeline over ``documents`` —
    the three stages a web-corpus pass actually chains: exact dedup
    (lowest-id winner per text fingerprint, narrow-payload election),
    quality filtering (``n_tokens >= 25`` and ``punct_ratio <= 0.2`` —
    thresholds chosen to actually discriminate on the fixture),
    then language ID on the survivors.  One projected groupBy + one
    semi-join + pure Catalyst expressions; at 100 TB nothing here
    shuffles a document body except the semi-join's single pass."""
    docs = _t(spark, sf_dir, "documents")
    winners = (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(winners, "doc_id", "left_semi")
    n_tokens, punct_ratio, _stop, _avg = quality_exprs(F.col("text"))
    return (
        kept.withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .filter((F.col("n_tokens") >= 25) & (F.col("punct_ratio") <= 0.2))
        .withColumn("lang_guess", langid_expr(F.col("text")))
        .select("doc_id", "n_tokens", "punct_ratio", "lang_guess")
    )

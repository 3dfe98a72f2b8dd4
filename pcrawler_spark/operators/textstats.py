"""Text-analysis operators for training-data pipelines over ``documents``.

All are pure JVM-side column expressions (whole-stage codegen, no Python in
the hot path) with exact ANSI-SQL equivalents for the DuckDB oracle:

* token counting — whitespace tokenization;
* quality scoring — length/punctuation/stopword ratios (the reference's
  quality filters are N/A-density and junk-text checks, merge_files.py:50-76,
  list_crawler.py:222-224; this generalizes them to web-text quality);
* language ID — stopword-marker heuristic (deterministic, vocabulary-based);
* document fingerprinting — md5 of whitespace-normalized lowercased text
  (md5 is available and identical in Spark and DuckDB, making the
  fingerprint portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword marker sets (heuristic lang-id)
EN_MARKERS = ("the", "a", "of", "and", "is")
VI_MARKERS = ("và", "của", "là", "các", "cho")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.trim(F.col(text_col)), " "))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text_col)), " ")).cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length + punctuation-ratio + stopword-ratio quality signals.

    Ratios are emitted as integer parts-per-million via ``floor`` rather
    than ``round``: IEEE-754 division is correctly rounded in every engine,
    so ``floor(1e6 * a / b)`` is bit-deterministic cross-engine, whereas
    ``round(x, 6)`` differs between half-up and half-even implementations
    exactly on representable ties (found via a real Spark/DuckDB mismatch).

    quality_ppm = 500000*stopword_ratio + 300000*(1-punct_ratio)
                + min(400*n_chars, 200000)   (all floored term-wise)
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    toks = F.split(F.trim(text), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_MARKERS)))
    c = F.greatest(n_chars, F.lit(1))
    t = F.greatest(n_tokens, F.lit(1))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("punct_ppm", F.floor(F.lit(1_000_000.0) * n_punct / c).cast("long"))
        .withColumn("stopword_ppm", F.floor(F.lit(1_000_000.0) * n_stop / t).cast("long"))
        .withColumn(
            "quality_ppm",
            (
                F.floor(F.lit(500_000.0) * n_stop / t)
                + F.floor(F.lit(300_000.0) * (n_chars - n_punct) / c)
                + F.least(F.lit(400).cast("long") * n_chars, F.lit(200_000).cast("long"))
            ).cast("long"),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-vocabulary language guess: en vs vi vs unknown."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    en = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    vi = F.size(F.filter(toks, lambda t: t.isin(*VI_MARKERS)))
    return df.withColumn(
        "lang_pred",
        F.when(en > vi, "en").when(vi > en, "vi").otherwise("unknown"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Portable exact-dup fingerprint: md5 of lower(whitespace-normalized)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fp", F.md5(norm))

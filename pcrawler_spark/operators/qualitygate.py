"""Row-quality gates and completeness checks (SURVEY.md F6/F7/X5).

* ``na_density_filter`` — drop rows where more than ``threshold`` of the
  inspected columns are null/empty/``N/A`` (reference: merge_files.py:50-76,
  70% cutoff before final export).
* ``sequence_gaps`` — per-group detection of missing values in a 1..max
  integer sequence (reference: the checkpoint pagination-gap validator,
  app/main.py:19-77, which flags industries whose collected listing pages
  skip page numbers).
* ``sanitize_name_col`` — the reference's industry-name sanitizer
  (tasks.py:104-107): non-word chars → ``_``, runs of ``-``/space → ``_``,
  strip ``_``.
* ``error_url_flag`` — the reference's error-URL heuristic (X11,
  app/main.py:59-66): URL whose lowercase form contains any of
  ``error|404|not-found|timeout|failed``.
* ``checkpoint_completeness`` — the full F7 validator (app/main.py:19-77):
  per group, pagination gaps, link density ≥5/page, error-URL rate ≤10%,
  and the small/large size heuristics, in the reference's check order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def na_flag(col: Column) -> Column:
    """1 when the value counts as missing (null / '' / 'N/A'), else 0."""
    return F.when(col.isNull() | col.cast("string").isin("", "N/A", "n/a"), 1).otherwise(0)


def na_density_filter(df: DataFrame, cols: Sequence[str], threshold: float = 0.7,
                      keep: str = "dense") -> DataFrame:
    """Keep rows whose N/A ratio across ``cols`` is ≤ threshold
    (merge_files.py:50-76 drops rows with >70% N/A fields)."""
    total = len(cols)
    n_na = sum(na_flag(F.col(c)) for c in cols)
    ratio = n_na / F.lit(float(total))
    cond = ratio <= threshold
    return df.filter(cond if keep == "dense" else ~cond)


def sequence_gaps(df: DataFrame, group_col: str, seq_col: str) -> DataFrame:
    """Per group: the values missing from 1..max(seq_col).

    Pure DataFrame ops: collect the observed set per group (one shuffle),
    diff against ``sequence(1, max)``, explode the gaps.  Returns
    (group, missing) rows — empty when every sequence is complete."""
    agg = df.groupBy(group_col).agg(
        F.max(seq_col).alias("_mx"),
        F.collect_set(seq_col).alias("_seen"),
    )
    return (
        agg.withColumn(
            "missing",
            F.array_except(F.sequence(F.lit(1), F.col("_mx")), F.col("_seen")),
        )
        .filter(F.size("missing") > 0)
        .select(group_col, F.explode(F.col("missing").cast("array<long>")).alias("missing"))
    )


ERROR_URL_MARKERS = ["error", "404", "not-found", "timeout", "failed"]


def error_url_flag(url_col: Column) -> Column:
    """X11 (app/main.py:59-66): ``any(marker in url.lower() ...)`` — plain
    substring containment, expressed as one codegen'd rlike (the markers
    contain no regex metacharacters, so rlike == substring search)."""
    return F.lower(url_col).rlike("|".join(ERROR_URL_MARKERS))


def error_url_filter(df: DataFrame, url_col: str = "canon_url",
                     keep: str = "clean") -> DataFrame:
    """Drop (keep='clean') or select (keep='errors') error-marker URLs."""
    flag = error_url_flag(F.col(url_col))
    return df.filter(~flag if keep == "clean" else flag)


def checkpoint_completeness(df: DataFrame, group_col: str,
                            url_col: str = "url") -> DataFrame:
    """F7 in full (app/main.py:19-77): per group, emit
    (group, n_links, n_pages, n_missing_pages, n_error_links, complete, reason)
    applying the reference's checks in order:

    1. pagination gaps (missing ``page=N`` between 1..max) → incomplete;
    2. link density: links/page < 5 → incomplete;
    3. error-URL rate > 10% → incomplete;
    4. < 20 links → complete ("small industry");
    5. > 1000 links → complete ("large industry");
    6. otherwise complete.

    One shuffle (groupBy), all checks as aggregate expressions."""
    page = F.regexp_extract(F.col(url_col), r"page=(\d+)", 1)
    flagged = df.select(
        F.col(group_col).alias("grp"),
        F.when(page != "", page.cast("int")).alias("_page"),
        error_url_flag(F.col(url_col)).cast("int").alias("_err"),
    )
    agg = flagged.groupBy("grp").agg(
        F.count("*").alias("n_links"),
        F.max("_page").alias("_mx"),
        F.collect_set("_page").alias("_pages"),
        F.sum("_err").alias("n_error_links"),
    )
    n_pages = F.size(F.array_distinct("_pages"))
    missing = F.when(
        F.col("_mx").isNotNull(),
        F.size(F.array_except(F.sequence(F.lit(1), F.col("_mx")), F.col("_pages"))),
    ).otherwise(F.lit(0))
    density_low = (n_pages > 0) & ((F.col("n_links") / n_pages) < 5)
    error_high = F.col("n_error_links") > F.col("n_links") * 0.1
    out = agg.select(
        F.col("grp").alias(group_col),
        "n_links",
        n_pages.cast("long").alias("n_pages"),
        missing.cast("long").alias("n_missing_pages"),
        F.col("n_error_links").cast("long").alias("n_error_links"),
        F.when(missing > 0, F.lit("missing_pages"))
        .when(density_low, F.lit("low_link_density"))
        .when(error_high, F.lit("high_error_rate"))
        .when(F.col("n_links") < 20, F.lit("small_industry"))
        .when(F.col("n_links") > 1000, F.lit("large_industry"))
        .otherwise(F.lit("complete"))
        .alias("reason"),
    )
    return out.withColumn(
        "complete",
        ~F.col("reason").isin("missing_pages", "low_link_density", "high_error_rate"),
    )


def sanitize_name_col(col: Column) -> Column:
    """tasks.py:104-107: re.sub(r'[^\\w\\s-]','_') → re.sub(r'[-\\s]+','_')
    → strip('_')."""
    # (?U): Java \w is ASCII-only by default; Python's is Unicode — without
    # the flag Vietnamese letters would be replaced (parity bug found in test)
    s = F.regexp_replace(col, r"(?U)[^\w\s-]", "_")
    s = F.regexp_replace(s, r"(?U)[-\s]+", "_")
    return F.regexp_replace(F.regexp_replace(s, r"^_+", ""), r"_+$", "")

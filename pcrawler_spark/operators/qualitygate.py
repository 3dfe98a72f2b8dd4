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


def sanitize_name_col(col: Column) -> Column:
    """tasks.py:104-107: re.sub(r'[^\\w\\s-]','_') → re.sub(r'[-\\s]+','_')
    → strip('_')."""
    # (?U): Java \w is ASCII-only by default; Python's is Unicode — without
    # the flag Vietnamese letters would be replaced (parity bug found in test)
    s = F.regexp_replace(col, r"(?U)[^\w\s-]", "_")
    s = F.regexp_replace(s, r"(?U)[-\s]+", "_")
    return F.regexp_replace(F.regexp_replace(s, r"^_+", ""), r"_+$", "")

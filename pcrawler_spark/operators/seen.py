"""URL-seen set operators — the core frontier dedup (SURVEY.md J3/J4).

The reference batches ``SELECT url ... WHERE url IN (...)`` probes against
SQLite (db_manager.py:65-105) and relies on a UNIQUE constraint as the final
arbiter (db_manager.py:119-128).  Spark-first equivalent:

* exact dedup = LEFT ANTI join of candidates against the ``seen`` table on
  the 64-bit canonical url hash — one shuffle, no driver involvement;
* optional Bloom pre-filter: build a Bloom filter over ``seen.url_hash``
  (driver-built, broadcast to executors), drop obvious hits BEFORE the
  anti-join shuffle.  False positives only let a few extra rows into the
  anti-join (which is exact), never drop a new URL — so correctness is
  unconditional and the Bloom just cuts shuffle volume.  At 10^10 seen URLs
  the filter is built per host-bucket partition and only the relevant
  buckets broadcast; at sandbox scale one filter suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_prefilter(candidates: DataFrame, seen: DataFrame,
                    hash_col: str = "url_hash",
                    expected_items: int | None = None,
                    fpp: float = 0.03) -> DataFrame:
    """Drop candidates that are *probably* seen, keeping all definitely-new
    rows.  Must be followed by anti_join_seen for exactness (Bloom false
    positives would otherwise drop new URLs — we use it only as a volume
    reducer the other way: rows failing the filter are definitely unseen and
    skip nothing; rows passing it go to the exact anti-join)."""
    if expected_items is None:
        expected_items = max(seen.count(), 1)
    bf = seen.stat.bloomFilter(hash_col, expected_items, fpp)
    b = candidates.sparkSession.sparkContext.broadcast(bf)

    @F.pandas_udf("boolean")
    def maybe_seen(h):
        import pandas as pd

        f = b.value
        return pd.Series([f.mightContain(int(x)) if x is not None else True for x in h])

    return candidates.withColumn("_maybe_seen", maybe_seen(F.col(hash_col)))


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   hash_col: str = "url_hash",
                   use_bloom: bool = False) -> DataFrame:
    """Exact new-URL filter: candidates ∖ seen on the url hash (left anti).

    With ``use_bloom`` the definitely-new rows (Bloom miss) bypass the
    shuffle entirely and only possible-hits are anti-joined — a large win
    when the frontier epoch is small relative to the seen set."""
    if not use_bloom:
        return candidates.join(seen.select(hash_col), on=hash_col, how="left_anti")
    flagged = bloom_prefilter(candidates, seen, hash_col)
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = maybe.join(seen.select(hash_col), on=hash_col, how="left_anti")
    return definitely_new.unionByName(confirmed_new)

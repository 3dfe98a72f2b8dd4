"""URL-seen set operators — the core frontier dedup (SURVEY.md J3/J4).

The reference batches ``SELECT url ... WHERE url IN (...)`` probes against
SQLite (db_manager.py:65-105) and relies on a UNIQUE constraint as the final
arbiter (db_manager.py:119-128).  Spark-first equivalent:

* exact dedup = LEFT ANTI join of candidates against the ``seen`` table on
  the 64-bit canonical url hash — one shuffle, no driver involvement;
* a *partitioned Bloom pre-filter* (the north_star's "partitioned
  bloom/cuckoo URL-seen filter"): each partition of ``seen`` builds a numpy
  bitmap over its url hashes (map-side), the bitmaps OR-reduce to one filter
  that is broadcast; candidates that miss the filter are DEFINITELY new and
  skip the anti-join shuffle entirely, candidates that hit go through the
  exact anti-join (false positives cost a probe, never a lost URL).

Sizing: m bits (power of two) ≈ 10× expected items gives ~1% fpp with k=7.
At 10^10 seen URLs a single bitmap is ~12 GB — there the filter is built
per host-bucket and only the buckets referenced by the epoch's candidates
are broadcast; at sandbox scale one bitmap suffices (the build path is the
same map-side OR-reduce either way).

PySpark 4 exposes neither ``df.stat.bloomFilter`` nor ``bloom_filter_agg``
SQL — this implementation is self-contained (numpy + double hashing).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the two double-hashing streams."""
    h = h.astype(np.uint64, copy=True)
    h = (h + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    h ^= h >> np.uint64(30)
    h = (h * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    h ^= h >> np.uint64(27)
    h = (h * np.uint64(0x94D049BB133111EB)) & _MASK64
    h ^= h >> np.uint64(31)
    return h


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int):
    h1 = _mix(hashes)
    h2 = _mix(h1) | np.uint64(1)  # odd → full-period stride
    mod = np.uint64(m_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % mod).astype(np.int64)


def build_bloom(seen: DataFrame, hash_col: str = "url_hash",
                expected_items: int | None = None, fpp: float = 0.01):
    """Map-side partition bitmaps OR-reduced into one numpy bitset."""
    if expected_items is None:
        expected_items = max(seen.count(), 1)
    m_bits = 1 << max(10, math.ceil(math.log2(expected_items * abs(math.log(fpp)) / (math.log(2) ** 2))))
    k = max(1, round((m_bits / expected_items) * math.log(2)))

    def partition_bitmap(rows):
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        hs = np.fromiter((r[0] for r in rows), dtype=np.int64)
        if len(hs):
            for pos in _bloom_positions(hs.view(np.uint64), m_bits, k):
                np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield bytes(bitmap.tobytes())

    parts = seen.select(hash_col).rdd.mapPartitions(partition_bitmap).collect()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for p in parts:
        merged |= np.frombuffer(p, dtype=np.uint8)
    return merged, m_bits, k


def bloom_might_contain_udf(spark, bitmap: np.ndarray, m_bits: int, k: int):
    b = spark.sparkContext.broadcast(bitmap.tobytes())

    @F.pandas_udf("boolean")
    def might_contain(h):
        import pandas as pd

        bm = np.frombuffer(b.value, dtype=np.uint8)
        hs = h.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
        hit = np.ones(len(hs), dtype=bool)
        for pos in _bloom_positions(hs, m_bits, k):
            hit &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hit)

    return might_contain


def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   hash_col: str = "url_hash",
                   use_bloom: bool = False, fpp: float = 0.01) -> DataFrame:
    """Exact new-URL filter: candidates ∖ seen on the url hash (left anti).

    With ``use_bloom`` the definitely-new rows (Bloom miss) bypass the
    anti-join shuffle entirely; only possible-hits are joined — a large win
    when the frontier epoch is small relative to the seen set."""
    if not use_bloom:
        return candidates.join(seen.select(hash_col), on=hash_col, how="left_anti")
    bitmap, m_bits, k = build_bloom(seen, hash_col, fpp=fpp)
    might = bloom_might_contain_udf(candidates.sparkSession, bitmap, m_bits, k)
    flagged = candidates.withColumn("_maybe_seen", might(F.col(hash_col)))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = maybe.join(seen.select(hash_col), on=hash_col, how="left_anti")
    return definitely_new.unionByName(confirmed_new)


# back-compat alias used in earlier revisions/tests
def bloom_prefilter(candidates: DataFrame, seen: DataFrame,
                    hash_col: str = "url_hash", expected_items: int | None = None,
                    fpp: float = 0.03) -> DataFrame:
    bitmap, m_bits, k = build_bloom(seen, hash_col, expected_items, fpp)
    might = bloom_might_contain_udf(candidates.sparkSession, bitmap, m_bits, k)
    return candidates.withColumn("_maybe_seen", might(F.col(hash_col)))

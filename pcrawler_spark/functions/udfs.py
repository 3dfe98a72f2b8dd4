"""Vectorized pandas/Arrow UDF wrappers around the pure-Python kernels.

The reference loops Python-side over rows (SURVEY.md §1.3); here every
extraction runs inside Arrow-batched pandas UDFs — the only Python in the
hot path, with all relational work staying JVM-side.  Per the input_hint:
"pyspark.sql DataFrame + vectorized pandas/Arrow UDFs (no per-row Python)".

The 64-bit url_hash is Spark's built-in ``xxhash64`` over the canonical URL
string (JVM-side, codegen'd) so frontier/seen tables agree everywhere.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels import (
    canonicalize_url,
    extract_company_details,
    extract_company_links,
    extract_emails,
    extract_pagination_links,
    extract_text,
    split_phones,
)
from ..kernels.details import DETAIL_FIELDS

# Struct returned by the detail extractor (company_name/company_url are
# joined in from the frontier, not re-extracted, so they're excluded here).
_EXTRACT_FIELDS = [f for f in DETAIL_FIELDS if f not in ("company_name", "company_url")]
DETAILS_SCHEMA = T.StructType(
    [T.StructField("company_name", T.StringType())]
    + [T.StructField(f, T.StringType()) for f in _EXTRACT_FIELDS]
)


@pandas_udf(DETAILS_SCHEMA)
def extract_details_udf(html: pd.Series) -> pd.DataFrame:
    rows = [extract_company_details(h) for h in html]
    return pd.DataFrame(
        {c: [r[c] for r in rows] for c in ["company_name"] + _EXTRACT_FIELDS}
    )


@pandas_udf(T.ArrayType(T.StringType()))
def extract_emails_udf(html: pd.Series, url_type: pd.Series) -> pd.Series:
    return pd.Series([extract_emails(h, t) for h, t in zip(html, url_type)])


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text(h) for h in html])


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_company_links(h) for h in html])


@pandas_udf(T.ArrayType(T.StringType()))
def extract_pagination_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_pagination_links(h) for h in html])


@pandas_udf(T.StringType())
def canonicalize_url_udf(url: pd.Series) -> pd.Series:
    return pd.Series([canonicalize_url(u) for u in url])


@pandas_udf(T.ArrayType(T.StringType()))
def normalize_phones_udf(phone_text: pd.Series) -> pd.Series:
    return pd.Series([split_phones(p) for p in phone_text])


def with_url_hash(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canon_url``/``url_hash``/``host`` columns.  Hashing stays
    JVM-side (xxhash64); only canonicalization crosses into Arrow."""
    return (
        df.withColumn("canon_url", canonicalize_url_udf(F.col(url_col)))
        .withColumn("url_hash", F.xxhash64(F.col("canon_url")))
        .withColumn(
            "host",
            F.regexp_extract(F.col("canon_url"), r"^https?://([^/:]+)", 1),
        )
    )

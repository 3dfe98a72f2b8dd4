"""Phase-6 export: 3-way left join + email explode (SURVEY.md J1 + E1).

Reference: company_details LEFT JOIN detail_html_storage LEFT JOIN
email_extraction on the *normalized expression key* LOWER(TRIM(company_name))
(tasks.py:709-732), then one output row per email capped at 5, ``N/A`` when
none (tasks.py:738-770), fixed 17-column order (tasks.py:773-778), ordered by
company name (tasks.py:731).

Spark shape: emails aggregate is grouped per company first (replacing the
reference's correlated per-row lookup, db_manager.py:490-531 — J6 → one hash
join), the dimension side is broadcast when small (AQE re-plans otherwise),
and the final total sort is range-partitioned by Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPORT_COLUMNS = [
    "industry_name", "name", "address", "website", "phone", "created_year",
    "revenue", "scale", "link", "facebook", "linkedin", "tiktok", "youtube",
    "instagram", "email", "email_source",
]


def export_contacts(
    company_details: DataFrame,
    detail_pages: DataFrame,
    email_extraction: DataFrame,
    max_emails: int = 5,
) -> DataFrame:
    """Build the final (company × email) export.

    ``company_details``: one row per company (extracted 14 fields incl.
    company_name, company_url, industry).
    ``detail_pages``: url + industry backfill (COALESCE 'Unknown',
    tasks.py:713).
    ``email_extraction``: company_name, emails array<string>, email_source.
    """
    # one email_extraction row per (company, source); the LEFT JOIN fans a
    # company out to one row per source, exactly like the reference's SQL
    # (tasks.py:709-732) — each row explodes its own ≤5 emails with its own
    # email_source.  This is a plain hash join (J6's per-row lookup is gone).
    email_rows = email_extraction.select(
        F.lower(F.trim(F.col("company_name"))).alias("_key"),
        "emails",
        "email_source",
    )

    base = (
        company_details.withColumn("_key", F.lower(F.trim(F.col("company_name"))))
        .join(
            detail_pages.select(
                F.col("url").alias("company_url"),
                F.col("industry").alias("_page_industry"),
            ),
            on="company_url",
            how="left",
        )
        .join(email_rows, on="_key", how="left")
    )

    exploded = base.withColumn(
        "email",
        F.explode_outer(F.slice(F.coalesce("emails", F.array()), 1, max_emails)),
    )

    return (
        exploded.select(
            F.coalesce(
                F.nullif(F.col("industry"), F.lit("")),
                F.nullif(F.col("_page_industry"), F.lit("")),
                F.lit("Unknown"),
            ).alias("industry_name"),
            F.col("company_name").alias("name"),
            F.coalesce("address", F.lit("N/A")).alias("address"),
            F.coalesce("website", F.lit("N/A")).alias("website"),
            F.coalesce("phone", F.lit("N/A")).alias("phone"),
            F.coalesce("created_year", F.lit("N/A")).alias("created_year"),
            F.coalesce("revenue", F.lit("N/A")).alias("revenue"),
            F.coalesce("scale", F.lit("N/A")).alias("scale"),
            F.col("company_url").alias("link"),
            F.coalesce("facebook", F.lit("N/A")).alias("facebook"),
            F.coalesce("linkedin", F.lit("N/A")).alias("linkedin"),
            F.coalesce("tiktok", F.lit("N/A")).alias("tiktok"),
            F.coalesce("youtube", F.lit("N/A")).alias("youtube"),
            F.coalesce("instagram", F.lit("N/A")).alias("instagram"),
            F.coalesce("email", F.lit("N/A")).alias("email"),
            F.coalesce("email_source", F.lit("N/A")).alias("email_source"),
        )
        .orderBy("name", "email_source", "email")
    )

from .udfs import (
    DETAILS_SCHEMA,
    canonicalize_url_udf,
    extract_details_udf,
    extract_emails_udf,
    extract_links_udf,
    extract_text_udf,
    normalize_phones_udf,
    with_url_hash,
)

__all__ = [
    "DETAILS_SCHEMA",
    "canonicalize_url_udf",
    "extract_details_udf",
    "extract_emails_udf",
    "extract_links_udf",
    "extract_text_udf",
    "normalize_phones_udf",
    "with_url_hash",
]

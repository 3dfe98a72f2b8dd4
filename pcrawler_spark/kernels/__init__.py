from .details import DETAIL_FIELDS, extract_company_details
from .emails import extract_emails, is_valid_email
from .links import extract_company_links, extract_pagination_links
from .text import extract_text
from .urlnorm import canonicalize_url, url_host
from .phones import normalize_phone, split_phones

__all__ = [
    "DETAIL_FIELDS",
    "extract_company_details",
    "extract_emails",
    "is_valid_email",
    "extract_company_links",
    "extract_pagination_links",
    "extract_text",
    "canonicalize_url",
    "url_host",
    "normalize_phone",
    "split_phones",
]

"""Email extraction kernel (pure Python, no Spark).

Same computation as the reference's regex path
(/root/reference/app/extractor/email_extractor.py:25-29, :59-72, :149-161):
two extraction regexes unioned, stripped, deduplicated, then filtered by the
four invalid anti-patterns (lowercased search).

Ordering contract: the reference returns ``list(set(...))`` — order
nondeterministic (email_extractor.py:64, :125, :159).  The verified contract
(FIXTURES.md §5b) is the SORTED email array; this kernel returns sorted.
"""

from __future__ import annotations

import re
from typing import List, Optional, Union

# email_extractor.py:25-28 — byte-identical pattern strings
EMAIL_PATTERNS = [
    re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"),
    re.compile(r"[\w\.-]+@[\w\.-]+\.[A-Za-z]{2,}"),
]

# email_extractor.py:29
INVALID_EMAIL_PATTERNS = [
    re.compile(r"noreply@"),
    re.compile(r"no-reply@"),
    re.compile(r"example\.com"),
    re.compile(r"@\d+\.\d+"),
]


def is_valid_email(email: str) -> bool:
    """email_extractor.py:66-72 — reject if any invalid pattern matches the
    lowercased email."""
    email_lower = email.lower()
    return not any(p.search(email_lower) for p in INVALID_EMAIL_PATTERNS)


def find_emails_regex(text: Optional[str]) -> List[str]:
    """email_extractor.py:59-64 — union of both patterns, stripped, distinct
    (returned sorted per the verified contract)."""
    emails = []
    for pattern in EMAIL_PATTERNS:
        emails.extend(pattern.findall(text or ""))
    return sorted({e.strip() for e in emails if e})


def extract_emails(html: Union[str, bytes, None], url_type: str = "website") -> List[str]:
    """Extract the valid-email set from one contact page.

    The reference unions a browser deep-crawl pass with a raw-HTML regex pass
    (email_extractor.py:149-161); without a browser the deep-crawl pass
    contributes the same regex over the same bytes, so the computed set is
    regex(html) filtered by validity.  ``url_type`` steers nothing here (it
    only selected deep-crawl keywords, 1900comvn.yml:50-76) but is kept for
    signature parity.  Returns sorted distinct valid emails."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return [e for e in find_emails_regex(html) if is_valid_email(e)]

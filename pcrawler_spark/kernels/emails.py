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
    """Extract the valid-email set from one contact page (the regex pass of
    email_extractor.py:149-161).  The deep-crawl half of the reference's
    union is the ENGINE's job: :func:`score_contact_links` surfaces the
    keyword-scored subpage links and the epoch frontier fetches them, so
    emails living only on /contact-style subpages are still found — then the
    per-company email sets union at export, matching
    ``list(set(crawling_emails + regex_emails))``.  ``url_type`` selects the
    deep-crawl keyword set (1900comvn.yml:50-76), not the regexes.  Returns
    sorted distinct valid emails."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return [e for e in find_emails_regex(html) if is_valid_email(e)]


# email keywords per url_type — 1900comvn.yml:50-76 / email_extractor.py:37-48
EMAIL_KEYWORDS = {
    "website": [
        "contact", "email", "mail", "lien he", "lienhe", "about", "gioi thieu",
        "info", "support", "help", "reach", "get in touch", "connect",
    ],
    "facebook": [
        "about", "contact", "email", "mail", "info", "business", "company",
        "lien he", "lienhe", "thong tin", "thongtin",
    ],
}

# BestFirstCrawlingStrategy config — 1900comvn.yml:44-47 (max_depth 1,
# max_pages 3 = landing page + 2 best subpages, include_external false)
BEST_FIRST_MAX_PAGES = 3


def score_contact_links(html: Union[str, bytes, None], base_url: str,
                        url_type: str = "website",
                        max_pages: int = BEST_FIRST_MAX_PAGES,
                        root=None) -> List[str]:
    """Best-first deep-crawl candidate links from a contact landing page
    (email_extractor.py:149-225: KeywordRelevanceScorer over same-host
    links, BestFirstCrawlingStrategy with include_external=False).

    Scoring contract (documented engine semantics for the browser scorer):
    a link's score is the number of keyword hits in its lowercased
    href + anchor text; links scoring 0 are never followed; ties break by
    document order; the top ``max_pages - 1`` links are returned (the
    landing page itself is page 1 of the budget) as absolute same-host URLs.
    """
    from ..html import parse_html
    from .urlnorm import canonicalize_url, url_host

    if root is None:
        root = parse_html(html)
    if root is None:
        return []
    base = canonicalize_url(base_url)
    host = url_host(base) if base else None
    if not host:
        return []
    keywords = EMAIL_KEYWORDS.get(url_type or "website", EMAIL_KEYWORDS["website"])
    seen = set()
    scored = []  # (-score, doc_order, url)
    order = 0
    anchors = (root.tag_index.get("a", ()) if root.tag_index is not None
               else (el for el in root.iter() if el.tag == "a"))
    for el in anchors:
        href = el.get("href")
        if not href or href.startswith(("#", "mailto:", "javascript:")):
            continue
        if href.startswith("/"):
            absu = f"https://{host}{href}"
        elif "://" in href:
            absu = href
        else:
            continue  # relative-path links are outside the corpus contract
        absu = canonicalize_url(absu)
        if not absu or url_host(absu) != host or absu == base or absu in seen:
            continue  # include_external=False: same-host only
        seen.add(absu)
        blob = f"{href} {el.text_content()}".lower()
        score = sum(1 for k in keywords if k in blob)
        if score > 0:
            scored.append((-score, order, absu))
        order += 1
    scored.sort()
    return [u for _, _, u in scored[: max(max_pages - 1, 0)]]

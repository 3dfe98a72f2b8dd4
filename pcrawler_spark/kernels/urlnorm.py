"""URL canonicalization kernel — the key under the seen-set and frontier.

The reference normalizes URLs ad hoc: strip + prepend ``https://`` when the
scheme is missing (/root/reference/app/crawler/detail_crawler.py:21-25,
app/main.py:166-172, app/crawler/contact_crawler.py:20-24) and treats
null/``'N/A'``/empty as invalid.  At frontier scale the canonical form must
also be stable under trivial variation, so this kernel additionally
lowercases scheme+host, drops default ports and fragments, and normalizes an
empty path to ``/`` — documented engine contract (SURVEY.md §2.8 X4).

The 64-bit ``url_hash`` is computed Spark-side as ``xxhash64(canon_url)`` so
the seen table and frontier always agree; this module only produces the
canonical string.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urlsplit, urlunsplit

_INVALID = {None, "", "N/A", "n/a"}


def canonicalize_url(url: Optional[str]) -> Optional[str]:
    """Canonical form, or None when the reference would reject the URL."""
    if url is None:
        return None
    u = url.strip()
    if u in _INVALID:
        return None
    if "://" not in u:
        u = "https://" + u  # detail_crawler.py:24-25
    try:
        parts = urlsplit(u)
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https"):
            return None
        # userinfo URLs ('user@host') are outside the crawl-corpus contract:
        # reject them outright so the JVM twin (functions/udfs.py) and this
        # kernel agree by rejection instead of diverging on the host
        if "@" in parts.netloc:
            return None
        host = parts.hostname
        if not host:
            return None
        host = host.lower()
        # .port/.hostname raise ValueError on malformed netlocs (e.g. '0::',
        # found by fuzzing) — keep them inside the guard
        port = parts.port
    except ValueError:
        return None
    if port and not ((scheme == "http" and port == 80) or (scheme == "https" and port == 443)):
        netloc = f"{host}:{port}"
    else:
        netloc = host
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def url_host(url: Optional[str]) -> Optional[str]:
    c = canonicalize_url(url)
    if c is None:
        return None
    return urlsplit(c).hostname

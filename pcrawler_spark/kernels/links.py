"""Link extraction kernels for frontier expansion.

* ``extract_company_links`` — the reference's listing-page selector
  ``a[href*='tong-quan']`` (/root/reference/config/configs/1900comvn.yml:33,
  used at app/crawler/list_crawler.py:342-394): every <a> whose href contains
  the substring, hrefs in document order, de-duplicated first-wins (the
  reference dedups with an insertion-ordered seen set,
  list_crawler.py:432,493-496).
* ``extract_pagination_links`` — ``//li[@class='page-item']//a[@class='page-link']``
  (1900comvn.yml:30, list_crawler.py:32-54): pagination hrefs in document
  order plus the max page number parsed from trailing digits.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple, Union

from ..html import parse_html, xpath

_PAGE_NUM_RE = re.compile(r"(\d+)\s*$")
_PAGE_PARAM_RE = re.compile(r"page=(\d+)")


def extract_company_links(html: Union[str, bytes, None], root=None) -> List[str]:
    if root is None:
        root = parse_html(html)
    if root is None:
        return []
    seen = set()
    out: List[str] = []
    # parse-time tag index (document order) when the root carries one;
    # subtree roots fall back to the walk
    anchors = (root.tag_index.get("a", ()) if root.tag_index is not None
               else (el for el in root.iter() if el.tag == "a"))
    for el in anchors:
        href = el.get("href")
        if href and "tong-quan" in href and href not in seen:
            seen.add(href)
            out.append(href)
    return out


def extract_pagination_links(html: Union[str, bytes, None], root=None) -> List[str]:
    if root is None:
        root = parse_html(html)
    if root is None:
        return []
    seen = set()
    out: List[str] = []
    for a in xpath(root, "//li[@class='page-item']//a[@class='page-link']"):
        href = a.get("href")
        if href and href not in seen:
            seen.add(href)
            out.append(href)
    return out


def page_number(url: Optional[str]) -> Optional[int]:
    """Parse a page number from a pagination URL: the ``page=N`` param if
    present (app/main.py:33-37), else trailing digits
    (list_crawler.py:32-34)."""
    if not url:
        return None
    m = _PAGE_PARAM_RE.search(url)
    if m:
        return int(m.group(1))
    m = _PAGE_NUM_RE.search(url)
    return int(m.group(1)) if m else None


def build_page_url(base_url: str, page: int) -> str:
    """Add or replace the ``?page=N`` parameter (list_crawler.py:330-340)."""
    if _PAGE_PARAM_RE.search(base_url):
        return _PAGE_PARAM_RE.sub(f"page={page}", base_url)
    sep = "&" if "?" in base_url else "?"
    return f"{base_url}{sep}page={page}"

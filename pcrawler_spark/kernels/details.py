"""Company-detail field extraction kernel (pure Python, no Spark).

Computes the same 14-field record as the reference's per-row extractor
(/root/reference/app/extractor/company_details_extractor.py:99-135) driven by
the same XPath config (/root/reference/config/configs/1900comvn.yml:7-36):

* each field tries its patterns in order, first non-empty match wins
  (company_details_extractor.py:68-97);
* ``website``/``facebook`` return the matched element's stripped ``href``
  when present (company_details_extractor.py:85-89), all other fields the
  stripped lxml-style ``text_content()`` (``:91-93``);
* string/bytes XPath results are stripped and returned as-is (``:79-83``);
* unparseable HTML yields all-null fields (``:101-104``, ``:127-128``).

This module is the byte-identity invariant: its outputs must equal the
expected values embedded by the synthetic page generator, byte for byte.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from ..html import parse_html, xpath
from ..html.dom import Element

# The XPath pattern table, field -> ordered pattern list.  Values mirror the
# reference config 1900comvn.yml:16-27 exactly (they are config data, i.e.
# WHAT to compute).
XPATHS: Dict[str, list[str]] = {
    "address": [
        "//div[@class='box-body']//div[@class='item'][1]//div[@class='desc']",
        "//ul[contains(@class,'company-details')]//li[label[contains(text(),'Trụ sở')]]/span",
    ],
    "phone": ["//div[@class='box-caption']/p//a[starts-with(@href,'tel:')]"],
    "website": ["//div[@class='box-caption']/p//a[starts-with(@href,'http')]"],
    "facebook": ["//div[contains(@class,'social-media-container')]//a[contains(@href,'facebook.com')]"],
    "linkedin": ["//div[contains(@class,'social-media-container')]//a[contains(@href,'linkedin.com')]"],
    "tiktok": ["//div[contains(@class,'social-media-container')]//a[contains(@href,'tiktok.com')]"],
    "youtube": ["//div[contains(@class,'social-media-container')]//a[contains(@href,'youtube.com')]"],
    "instagram": ["//div[contains(@class,'social-media-container')]//a[contains(@href,'instagram.com')]"],
    "industry": ["//ul[contains(@class,'company-details')]//li[label[contains(text(),'Ngành')]]/a"],
    "created_year": ["//ul[contains(@class,'company-details')]//li[label[contains(text(),'Thành lập')]]/span"],
    "revenue": ["//ul[contains(@class,'company-details')]//li[label[contains(text(),'Doanh thu')]]/span"],
    "scale": ["//div[contains(@class,'company-subdetail')]//div[contains(@class,'company-subdetail-info')][2]//span[2]"],
    "name": ["//h1[contains(@class,'company-detail-name')]/span[1]"],
}

# href-valued fields (company_details_extractor.py:86)
_HREF_FIELDS = frozenset({"website", "facebook"})

# Output field order (schema contract; schema.sql:17-35 column order).
DETAIL_FIELDS = (
    "company_name",
    "company_url",
    "address",
    "phone",
    "website",
    "facebook",
    "linkedin",
    "tiktok",
    "youtube",
    "instagram",
    "industry",
    "created_year",
    "revenue",
    "scale",
)


def _first_match(root: Element, patterns: list[str], field: str) -> Optional[str]:
    for pattern in patterns:
        if not pattern.strip():
            continue
        try:
            nodes = xpath(root, pattern)
        except Exception:
            continue
        if not nodes:
            continue
        first = nodes[0]
        if isinstance(first, (str, bytes)):
            val = first.decode() if isinstance(first, bytes) else first
            val = val.strip()
            if val:
                return val
            continue
        if field in _HREF_FIELDS:
            href = first.get("href")
            if href and href.strip():
                return href.strip()
        text_val = first.text_content().strip()
        if text_val:
            return text_val
    return None


def extract_company_details(
    html: Union[str, bytes, None],
    company_name: Optional[str] = None,
    company_url: Optional[str] = None,
    root: Optional[Element] = None,
) -> Dict[str, Optional[str]]:
    """Extract the 14-field company record from one detail page.

    ``company_name``/``company_url`` are carried through when provided (the
    reference receives them from the link-collection phase); when absent the
    name is extracted from the page's h1 (the reference collects it from the
    same node during phase 1, list_crawler.py selector usage).  Pass ``root``
    to reuse an already-parsed DOM (the fused extract stage parses once and
    shares it across the detail/text/link kernels)."""
    if root is None:
        root = parse_html(html)
    rec: Dict[str, Optional[str]] = {f: None for f in DETAIL_FIELDS}
    rec["company_url"] = company_url
    if root is not None:
        for field, patterns in XPATHS.items():
            if field == "name":
                continue
            val = _first_match(root, patterns, field)
            if val:
                rec[field] = val
        rec["company_name"] = company_name or _first_match(root, XPATHS["name"], "name")
    else:
        rec["company_name"] = company_name
    return rec

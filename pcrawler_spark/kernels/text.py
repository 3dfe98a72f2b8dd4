"""Page-text extraction kernel — the byte-identical ``text`` invariant.

Contract (documented, deterministic, and used by both the synthetic page
generator and this kernel as independent implementations):

    extract_text(html) = "\\n".join of every text node of the document, in
    document order, each stripped of leading/trailing whitespace, skipping
    text nodes that are empty after stripping and any text inside
    <script>/<style>/<noscript>/<template>.

This mirrors what the reference pipeline ultimately extracts from a page
(visible text content; lxml ``text_content()`` semantics per node) while
being exactly reproducible.  The synthetic ``pages.text`` column is generated
from the same rule applied to the template fragments; the engine must
reproduce it byte-for-byte from ``pages.html``.
"""

from __future__ import annotations

from typing import Optional, Union

from ..html import parse_html
from ..html.dom import Element, SKIP_TEXT_TAGS


def _walk(el: Element, out: list[str]) -> None:
    if el.tag in SKIP_TEXT_TAGS:
        return
    for c in el.children:
        if isinstance(c, str):
            s = c.strip()
            if s:
                out.append(s)
        else:
            _walk(c, out)


def extract_text(html: Union[str, bytes, None], root: Element | None = None) -> str:
    if root is None:
        root = parse_html(html)
    if root is None:
        return ""
    parts: list[str] = []
    _walk(root, parts)
    return "\n".join(parts)

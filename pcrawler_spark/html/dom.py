"""Minimal HTML DOM built on the stdlib ``html.parser``.

The reference engine uses ``lxml.html`` for per-row extraction
(/root/reference/app/extractor/company_details_extractor.py:102); lxml is not
available in this environment, so this module provides a small, deterministic
DOM with lxml-compatible ``text_content()`` semantics (string-value of the
element: concatenation of all descendant text nodes in document order, no
separators inserted).  If ``lxml`` is importable the kernels cross-check
against it in tests, but never require it.

This is a fresh implementation, not a port: the parser is tolerant (unmatched
end tags are ignored, void elements never push onto the stack) because crawl
HTML is messy, and every node carries a document-order ordinal so XPath
evaluation can return nodes in document order.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional, Union

# HTML void elements: never have children, never appear on the open stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose text is markup/code, not page text (used by the page-text
# kernel; text_content() itself includes them, matching lxml's string-value).
SKIP_TEXT_TAGS = frozenset({"script", "style", "noscript", "template"})


class Element:
    """One element node. ``children`` holds Elements and str text nodes.

    ``tag_index`` is populated only on the #document root by
    :func:`parse_html`: tag → list of elements in document order, built
    incrementally DURING parsing (no extra walk).  Kernels that evaluate
    many descendant-axis XPath patterns against one page (the 13-field
    detail extractor) use it instead of re-walking the whole tree per
    pattern — the walks were ~50% of per-page extraction CPU (r7 profile).
    """

    __slots__ = ("tag", "attrs", "children", "parent", "ordinal", "tag_index")

    def __init__(self, tag: str, attrs: dict, parent: Optional["Element"], ordinal: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Union[Element, str]] = []
        self.parent = parent
        self.ordinal = ordinal
        self.tag_index: Optional[dict] = None

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def iter(self):
        """Yield self and all descendant elements in document order
        (iterative — recursion via yield-from costs a frame per level)."""
        stack = [self]
        while stack:
            el = stack.pop()
            yield el
            stack.extend(
                c for c in reversed(el.children) if isinstance(c, Element)
            )

    def iter_descendants(self):
        stack = [c for c in reversed(self.children) if isinstance(c, Element)]
        while stack:
            el = stack.pop()
            yield el
            stack.extend(
                c for c in reversed(el.children) if isinstance(c, Element)
            )

    def child_elements(self):
        return [c for c in self.children if isinstance(c, Element)]

    def text_content(self) -> str:
        """lxml-compatible string-value: all descendant text, no separators."""
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                c._collect_text(parts)

    def own_text(self) -> str:
        return "".join(c for c in self.children if isinstance(c, str))

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Element {self.tag} ord={self.ordinal} attrs={self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._ordinal = 0
        self.root = Element("#document", {}, None, self._ordinal)
        self._stack = [self.root]
        # document-order tag index, built as elements are created
        self.tags: dict = {}

    def _next_ordinal(self) -> int:
        self._ordinal += 1
        return self._ordinal

    def updatepos(self, i, j):
        # line/column tracking exists only for getpos(), which nothing in
        # this engine calls — the per-chunk newline counting it does was a
        # measured ~6% of parse CPU (r7).  Contract: return the end index.
        return j

    def handle_starttag(self, tag, attrs):
        parent = self._stack[-1]
        el = Element(tag, dict(attrs), parent, self._next_ordinal())
        parent.children.append(el)
        idx = self.tags.get(tag)
        if idx is None:
            self.tags[tag] = [el]
        else:
            idx.append(el)
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        parent = self._stack[-1]
        el = Element(tag, dict(attrs), parent, self._next_ordinal())
        parent.children.append(el)
        idx = self.tags.get(tag)
        if idx is None:
            self.tags[tag] = [el]
        else:
            idx.append(el)

    def handle_endtag(self, tag):
        # Pop to the nearest matching open tag; ignore stray end tags.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: Union[str, bytes, None]) -> Optional[Element]:
    """Parse HTML into a DOM root; returns None on empty/undecodable input
    (mirrors the reference's tree=None failure path,
    company_details_extractor.py:101-104)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        try:
            html = bytes(html).decode("utf-8", errors="replace")
        except Exception:
            return None
    if not html.strip():
        return None
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        # unterminated comment: libxml2 swallows '<!--' to EOF as comment
        # text; stdlib HTMLParser would flush the pending '<!-- ...' tail
        # back as DATA on close(), leaking it into text_content().  The
        # parser's own buffer says whether it is REALLY inside an open
        # comment at EOF (a '<!--' inside closed <script>/<style> CDATA is
        # script data and never lands in rawdata) — only then terminate it.
        if builder.rawdata.startswith("<!--"):
            builder.feed("-->")
        builder.close()
    except Exception:
        return None
    builder.root.tag_index = builder.tags
    return builder.root

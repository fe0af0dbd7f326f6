"""Minimal stdlib HTML DOM with just the selector algebra the engine needs.

The reference uses parsel/lxml selectors; neither is available in this
environment, so this module provides a tiny permissive DOM:

- fast path: ``xml.etree.ElementTree`` (C expat) for well-formed
  (XHTML-ish) pages — the common case for our corpus;
- fallback: ``html.parser.HTMLParser`` (pure Python, permissive —
  handles unclosed void tags, stray end tags, named entities).

Both build the same :class:`Node` model: ``tag``, ``attrib`` and an
ordered ``children`` list interleaving child elements and text chunks
(the shape parsel's ``./*|./text()`` iteration exposes —
``spiders/base.py:146``).

Only the query primitives the reference's spiders actually use are
implemented (direct-child filters, descendant search by tag/class/id,
descendant text in document order). Parsing is row-local and runs
inside ``map_batches`` actor stages; per-actor state (compiled
nothing — parsers are cheap to instantiate) is not required.
"""

from __future__ import annotations

from html.parser import HTMLParser
from xml.etree import ElementTree as ET

__all__ = ["Node", "parse_html"]

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrib", "children", "_desc", "_by_tag")

    def __init__(self, tag: str, attrib: dict | None = None):
        self.tag = tag
        self.attrib = attrib or {}
        self.children: list = []  # Node | str interleaved, document order
        self._desc: list | None = None  # lazy descendant cache (find/find_all)
        self._by_tag: dict | None = None  # lazy tag → descendants index

    # --- attribute / class helpers -------------------------------------
    def get(self, name: str, default=None):
        return self.attrib.get(name, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrib.get("class") or "").split()

    def has_class(self, cls: str) -> bool:
        """CSS ``.cls`` semantics: class *token* match."""
        return cls in self.classes

    # --- child access ---------------------------------------------------
    def child_elems(self, tag: str | None = None) -> list["Node"]:
        """Direct child elements, optionally filtered by tag (xpath ``./tag``)."""
        return [c for c in self.children
                if isinstance(c, Node) and (tag is None or c.tag == tag)]

    def child_texts(self) -> list[str]:
        """Direct text children (xpath ``./text()``)."""
        return [c for c in self.children if isinstance(c, str)]

    # --- descendant access ----------------------------------------------
    def iter_elems(self):
        """All descendant elements, document order, self excluded.

        Iterative (explicit stack) — generator recursion costs ~3x in
        the hot extraction path."""
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            advanced = False
            for c in it:
                if isinstance(c, Node):
                    yield c
                    stack.append(iter(c.children))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    def iter_texts(self):
        """All descendant text chunks, document order (xpath ``.//text()``)."""
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            advanced = False
            for c in it:
                if isinstance(c, str):
                    yield c
                else:
                    stack.append(iter(c.children))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    def _candidates(self, tag: str | None) -> list["Node"]:
        """Descendants to scan for a query — cached per node (trees are
        immutable after parse in this engine), with a tag-keyed index
        built on first use: repeated selector queries over the same
        subtree (the validator → parse-chain pattern, ~10 queries per
        page) traverse the tree ONCE instead of once per query."""
        desc = self._desc
        if desc is None:
            desc = self._desc = list(self.iter_elems())
        if tag is None:
            return desc
        idx = self._by_tag
        if idx is None:
            idx = self._by_tag = {}
            for el in desc:
                lst = idx.get(el.tag)
                if lst is None:
                    idx[el.tag] = [el]
                else:
                    lst.append(el)
        return idx.get(tag, ())

    def find_all(self, tag: str | None = None, cls: str | None = None,
                 id: str | None = None, pred=None) -> list["Node"]:
        """Descendant search (xpath ``.//``), AND of the given filters.

        ``cls`` matches a class *token* (CSS semantics).
        """
        out = []
        for el in self._candidates(tag):
            if cls is not None and not el.has_class(cls):
                continue
            if id is not None and el.attrib.get("id") != id:
                continue
            if pred is not None and not pred(el):
                continue
            out.append(el)
        return out

    def find(self, tag: str | None = None, cls: str | None = None,
             id: str | None = None, pred=None):
        """First matching descendant (document order preserved by the
        cached per-tag candidate list)."""
        for el in self._candidates(tag):
            if cls is not None and not el.has_class(cls):
                continue
            if id is not None and el.attrib.get("id") != id:
                continue
            if pred is not None and not pred(el):
                continue
            return el
        return None

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<Node {self.tag} {self.attrib}>"


# --- ElementTree fast path ------------------------------------------------

def _from_et(el) -> Node:
    # strip xmlns qualification ({uri}tag) — selectors use local names,
    # matching the HTML parser's view
    tag = el.tag
    if isinstance(tag, str) and "}" in tag:
        tag = tag.rsplit("}", 1)[1]
    attrib = {
        (k.rsplit("}", 1)[1] if "}" in k else k): v for k, v in el.attrib.items()
    }
    node = Node(tag, attrib)
    if el.text:
        node.children.append(el.text)
    for child in el:
        node.children.append(_from_et(child))
        if child.tail:
            node.children.append(child.tail)
    return node


# --- permissive fallback parser ------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


import re as _re

_VOID_OPEN_RE = _re.compile(
    r"<(meta|link|br|img|input|hr|col|area|base|embed|source|track|wbr|param)"
    r"(\s[^<>]*?)?\s*(?<!/)>",
    _re.IGNORECASE,
)
_VOID_CLOSE_RE = _re.compile(
    r"</(meta|link|br|img|input|hr|col|area|base|embed|source|track|wbr|param)\s*>",
    _re.IGNORECASE,
)
_SCRIPT_RE = _re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", _re.IGNORECASE | _re.DOTALL)
_ENTITY_RE = _re.compile(r"&([a-zA-Z][a-zA-Z0-9]{1,31});")
_BARE_AMP_RE = _re.compile(r"&(?!(?:[a-zA-Z][a-zA-Z0-9]{1,31}|#\d{1,7}|#x[0-9a-fA-F]{1,6});)")
_XML_ENTITIES = frozenset(("amp", "lt", "gt", "quot", "apos"))


def _repair_for_xml(text: str) -> str:
    """Best-effort rewrite of common HTML-isms into well-formed XML so
    the C expat parser can take real-web pages (the fast path). Applied
    only when raw expat fails; pages it can't fix fall through to the
    permissive pure-Python parser. Extraction equivalence between the
    two paths is pinned by tests over the real golden fixtures."""
    from html.entities import html5

    text = _SCRIPT_RE.sub("", text)  # raw JS/CSS is not XML; never extracted
    text = _VOID_CLOSE_RE.sub("", text)
    text = _VOID_OPEN_RE.sub(lambda m: f"<{m.group(1)}{m.group(2) or ''}/>", text)

    def entity(m):
        name = m.group(1)
        if name in _XML_ENTITIES:
            return m.group(0)
        ch = html5.get(name + ";")
        return ch if ch is not None else m.group(0)

    text = _ENTITY_RE.sub(entity, text)
    return _BARE_AMP_RE.sub("&amp;", text)


def parse_html(data: bytes | str) -> Node:
    """Parse a page into a :class:`Node` tree (root = document element).

    Three-step ladder: C expat on the raw markup (XHTML-ish corpora) →
    expat on a regex-repaired copy (most real-web pages: unclosed void
    tags, HTML entities, script blocks) → the permissive pure-Python
    ``html.parser`` tree builder (arbitrary tag soup). All paths build
    the same Node model; equivalence on real pages is golden-tested.
    """
    if isinstance(data, bytes):
        text = data.decode("utf-8", errors="replace")
    else:
        text = data
    stripped = text.lstrip()
    if stripped[:9].lower().startswith("<!doctype"):
        # expat chokes on HTML doctypes without a DTD; skip past it
        end = stripped.find(">")
        stripped = stripped[end + 1:].lstrip() if end != -1 else stripped
    try:
        return _from_et(ET.fromstring(stripped))
    except ET.ParseError:
        pass
    try:
        return _from_et(ET.fromstring(_repair_for_xml(stripped)))
    except ET.ParseError:
        pass
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    # unwrap the #document node when it has a single element child
    elems = builder.root.child_elems()
    if len(elems) == 1:
        return elems[0]
    return builder.root

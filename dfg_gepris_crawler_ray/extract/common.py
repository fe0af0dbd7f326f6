"""Structural HTML extraction operators (row-local, embarrassingly parallel).

Re-derivations of the reference's selector algebra over our mini-DOM
(:mod:`..kernels.htmlmini`). Each function cites the behavior source in
``/root/reference/gepris_crawler/spiders/base.py``. All functions accept
a single :class:`Node` or a list of nodes (the SelectorList shape).

These run inside ``map_batches`` UDFs; they are pure and raise
:class:`ValueError` on the same conditions the reference does (which the
stage converts to retry/error statuses).
"""

from __future__ import annotations

from ..kernels.htmlmini import Node
from ..kernels.strings import clean_string

__all__ = [
    "as_list",
    "non_empty_text",
    "extract_text_and_links",
    "attributes_pairs_list",
    "get_content_div",
    "extract_trees",
    "handle_tree_nodes",
    "first_attrib",
]


def as_list(sel) -> list[Node]:
    if sel is None:
        return []
    return sel if isinstance(sel, list) else [sel]


def first_attrib(sel, name: str):
    """SelectorList.attrib semantics: attributes of the first element."""
    nodes = as_list(sel)
    return nodes[0].get(name) if nodes else None


def non_empty_text(sel, err_mult: bool = True, err_none: bool = True):
    """Non-empty cleaned descendant text (base.py:208-234).

    Returns the single string, a list (``err_mult=False``), or None
    (``err_none=False``); raises ValueError otherwise, exactly like the
    reference.
    """
    texts = []
    for node in as_list(sel):
        for t in node.iter_texts():
            c = clean_string(t)
            if c != "":
                texts.append(c)
    if len(texts) == 0:
        if err_none:
            raise ValueError("No non empty text nodes")
        return None
    if len(texts) > 1:
        if err_mult:
            raise ValueError("Multiple non-empty textnodes found")
        return texts
    return texts[0]


def extract_text_and_links(sel):
    """Flatten children into cleaned strings and ``{value, path}`` refs.

    Mirrors ``base.py:120-160`` including the singleton collapse
    (``return values[0] if len(values) == 1 else values``) and the
    recursive flattening of non-link child elements.
    """
    values = []
    for node in as_list(sel):
        for child in node.children:
            if isinstance(child, str):
                cleaned = clean_string(child)
                if cleaned != "":
                    values.append(cleaned)
            elif child.get("href") is not None:
                values.append(
                    dict(
                        value=non_empty_text(child, err_mult=False, err_none=False),
                        path=child.get("href"),
                    )
                )
            else:
                child_value = extract_text_and_links(child)
                if isinstance(child_value, list):
                    values.extend(child_value)
                else:
                    values.append(child_value)
    return values[0] if len(values) == 1 else values


def attributes_pairs_list(span_nodes: list[Node]):
    """Sequential ``nameX``/``valueX`` span pairing (base.py:42-118).

    Handles: classless span (value for pending key), consecutive keys
    (first gets null value), value without key (dropped), mismatched
    X suffix (dropped), empty key text before a value (dropped),
    trailing key (null value).
    """
    attributes = []
    last_key = None
    for span in as_list(span_nodes):
        span_class = span.get("class")
        if span_class is None:
            if last_key is not None:
                attributes.append(
                    [non_empty_text(last_key), extract_text_and_links(span)]
                )
                last_key = None
            # else: expected a key, ignore (base.py:79-81)
        elif span_class.startswith("name"):
            if last_key is not None:
                attributes.append([non_empty_text(last_key), None])
            last_key = span
        elif span_class.startswith("value"):
            if last_key is None:
                pass  # value without key: dropped (base.py:92-95)
            elif last_key.get("class")[4:] != span_class[5:]:
                pass  # mismatched X suffix: dropped (base.py:96-99)
            else:
                last_key_text = non_empty_text(last_key, err_none=False)
                if last_key_text is not None:
                    attributes.append(
                        [last_key_text, extract_text_and_links(span)]
                    )
                last_key = None
        # else: neither nameX nor valueX: dropped (base.py:108-112)
    if last_key is not None:
        attributes.append([non_empty_text(last_key), None])
    return attributes


def get_content_div(root: Node) -> list[Node]:
    """``div.content_inside`` (CSS class-token match) — base.py:162-170."""
    return root.find_all(tag="div", cls="content_inside")


def extract_trees(content) -> dict:
    """All trees under ``./div[@class="content_frame"]/div[not(@class)]``.

    base.py:172-183 — note xpath ``@class="content_frame"`` is a
    full-string attribute equality, not a class-token match.
    """
    trees = {}
    for node in as_list(content):
        for frame in node.child_elems("div"):
            if frame.get("class") != "content_frame":
                continue
            for tree_div in frame.child_elems("div"):
                if tree_div.get("class") is not None:
                    continue
                nodes = [li for ul in tree_div.child_elems("ul")
                         for li in ul.child_elems("li")]
                trees[tree_div.attrib["id"]] = handle_tree_nodes(nodes)
    return trees


def handle_tree_nodes(nodes: list[Node]):
    """Recursive tree extraction (base.py:185-205)."""
    mapped = []
    for node in as_list(nodes):
        children = [li for ul in node.child_elems("ul") for li in ul.child_elems("li")]
        if len(children) == 0:
            mapped.append(extract_text_and_links(node))
        else:
            links = node.child_elems("a")
            mapped.append(
                {
                    "value": non_empty_text(links, err_mult=False),
                    "path": first_attrib(links, "href"),
                    "children": handle_tree_nodes(children),
                }
            )
    return mapped

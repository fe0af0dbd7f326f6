"""Search-results listing-page parser (spiders/search_results.py).

One listing page → a list of ``SearchResultItem`` dicts (with raw
German ``project_attributes`` keys), plus the page's total-result
count. Institution rows fan out into one item per sub-institution with
the parent embedded (search_results.py:91-100). Null-id rows
(``/gepris/{ctx}/null``) are skipped (search_results.py:50-51).
"""

from __future__ import annotations

from ..kernels.htmlmini import Node
from ..kernels.loadalg import Compose, Identity, MapCompose, RecordLoader, TakeFirst
from ..kernels.strings import clean_string, drop_search_result_attribute, filter_empty_string
from ..kernels.urls import extract_id
from .common import attributes_pairs_list, extract_text_and_links, first_attrib

_take_first = TakeFirst()


class SearchResultLoader(RecordLoader):
    """items.py:94-108"""

    input_processors = {
        "id": MapCompose(extract_id, MapCompose(int)),
        "project_attributes": MapCompose(
            lambda v: drop_search_result_attribute(v, "Antragsteller"),
            lambda v: drop_search_result_attribute(v, "Antragstellerin"),
            lambda v: drop_search_result_attribute(v, "Antragstellerinnen"),
            lambda v: drop_search_result_attribute(v, "Antragstellerinnen / Antragsteller"),
        ),
        "name_de": MapCompose(clean_string),
        "name_en": MapCompose(clean_string),
        "addresse": MapCompose(clean_string, filter_empty_string),
    }
    output_processors = {
        "project_attributes": Compose(dict),
        "addresse": Identity(),
        "uebergeordnete_institution": Compose(_take_first, dict),
    }


def extract_total_items(root: Node):
    """``#result-info@data-result-count`` with thousands dots stripped
    (search_results.py:69-79). Returns int or None on failure (the
    caller maps None to the had_error/0 path)."""
    el = next((e for e in root.iter_elems() if e.get("id") == "result-info"), None)
    if el is None:
        return None
    raw = el.get("data-result-count")
    if raw is None:
        return None
    try:
        return int(raw.replace(".", ""))
    except ValueError:
        return None


def _result_divs(root: Node) -> list[Node]:
    """``//*[@id="liste"]/div[@class!="pagination"]`` (search_results.py:45) —
    xpath ``@class!=`` requires the attribute to exist and differ."""
    liste = next((e for e in root.iter_elems() if e.get("id") == "liste"), None)
    if liste is None:
        return []
    return [
        d for d in liste.child_elems("div")
        if d.get("class") is not None and d.get("class") != "pagination"
    ]


def _h2_link(result: Node):
    for h2 in result.find_all(tag="h2"):
        links = h2.child_elems("a")
        if links:
            return links[0]
    return None


def parse_search_page(root: Node, context: str) -> list[dict]:
    """search_results.py:37-100 — all items of one listing page."""
    items: list[dict] = []
    for result in _result_divs(root):
        link = _h2_link(result)
        if link is None:
            continue
        if link.get("href") == f"/gepris/{context}/null":
            continue  # null-id row (search_results.py:50-51)
        loader = SearchResultLoader()
        loader.add_value("id", link.get("href"))
        loader.add_value("name_de", link.child_texts())
        if context == "projekt":
            for detail_line in (
                d for div in result.child_elems("div") if div.get("class") == "details"
                for d in div.child_elems("div")
            ):
                loader.add_value(
                    "project_attributes", attributes_pairs_list(detail_line.child_elems("span"))
                )
            items.append(loader.load_item())
        elif context == "person":
            beschr = [d for d in result.child_elems("div") if d.get("class") == "beschreibung"]
            loader.add_value("addresse", extract_text_and_links(beschr))
            items.append(loader.load_item())
        elif context == "institution":
            parent_item = loader.load_item()
            for sub in (d for d in result.child_elems("div") if d.get("class") == "subInstitution"):
                sub_loader = SearchResultLoader()
                sub_links = sub.child_elems("a")
                sub_loader.add_value("id", first_attrib(sub_links, "href"))
                sub_loader.add_value(
                    "name_de", sub_links[0].child_texts() if sub_links else None
                )
                sub_loader.add_value("addresse", sub.child_texts())
                sub_loader.add_value("uebergeordnete_institution", parent_item)
                items.append(sub_loader.load_item())
    return items

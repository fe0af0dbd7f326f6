"""Details-page parsers: projekt (de→en→result-de→result-en chain),
person, institution.

Re-expresses the reference's ``spiders/details.py`` callbacks and the
field pipelines of ``items.py:113-167`` over our mini-DOM. The Scrapy
request chain that threads a partial item through ``cb_kwargs``
(details.py:53-117) becomes a *row-local* function over the group of
language/result page variants of one entity — all variants are resolved
from the pages table and handed in together (SURVEY.md §2.10), so the
merge order ``{**de, **en}`` (details.py:89) is preserved without any
cross-task state.
"""

from __future__ import annotations

from ..kernels.htmlmini import Node
from ..kernels.loadalg import Compose, Identity, Join, MapCompose, RecordLoader, TakeFirst
from ..kernels.strings import (
    clean_string,
    filter_no_abstracts_found,
    filter_parenthesis,
    filter_strings,
    guess_gender_from_title,
    has_crucifix_prefix,
    is_list_with_single_string,
    remove_crucifix_suffix,
    to_list,
)
from ..normalise import institution as nm_institution
from ..normalise import person as nm_person
from ..normalise import project as nm_project
from ..normalise import project_result as nm_project_result
from ..normalise.trees import normalise_institution_trees, normalise_person_trees
from .common import (
    as_list,
    attributes_pairs_list,
    extract_text_and_links,
    extract_trees,
    first_attrib,
    get_content_div,
    non_empty_text,
)

_take_first = TakeFirst()


def _beschreibung_in():
    # items.py:123-128 / 141-148
    return Compose(
        lambda v: filter_no_abstracts_found(v[0]) if is_list_with_single_string(v) else v,
        MapCompose(clean_string),
    )


class ProjectDetailsLoader(RecordLoader):
    """items.py:118-131"""

    input_processors = {
        "id": MapCompose(int),
        "attributes": MapCompose(to_list),
        "beschreibung_de": _beschreibung_in(),
        "beschreibung_en": _beschreibung_in(),
    }
    output_processors = {
        "name_de": Join(),
        "name_en": Join(),
        "beschreibung_de": Join(),
        "beschreibung_en": Join(),
        "attributes": Compose(dict, nm_project.normalise, dict),
    }


class ProjectResultLoader(RecordLoader):
    """items.py:133-149"""

    input_processors = {
        "ergebnis_publikationen": Compose(
            MapCompose(filter_parenthesis, lambda v: filter_strings(v, "(Siehe online unter")),
            to_list,
        ),
        "ergebnis_zusammenfassung_de": _beschreibung_in(),
        "ergebnis_zusammenfassung_en": _beschreibung_in(),
    }
    output_processors = {
        "ergebnis_publikationen": Identity(),
        "ergebnis_zusammenfassung_de": Join(),
        "ergebnis_zusammenfassung_en": Join(),
        "attributes": Compose(dict, nm_project_result.normalise, dict),
    }


class PersonDetailsLoader(RecordLoader):
    """items.py:152-158"""

    input_processors = {
        "id": MapCompose(int),
        "name_de": MapCompose(remove_crucifix_suffix),
        "verstorben": MapCompose(has_crucifix_prefix),
        "gender": MapCompose(guess_gender_from_title),
        "attributes": MapCompose(to_list),
    }
    output_processors = {
        "attributes": Compose(dict, nm_person.normalise, dict),
        "trees": Compose(_take_first, normalise_person_trees),
    }


class InstitutionDetailsLoader(RecordLoader):
    """items.py:161-167"""

    input_processors = {
        "id": MapCompose(int),
        "attributes": MapCompose(to_list),
    }
    output_processors = {
        "name_de": Join(", "),
        "attributes": Compose(dict, nm_institution.normalise, dict),
        "trees": Compose(_take_first, normalise_institution_trees),
    }


# --- selector helpers ------------------------------------------------------

def get_name(root: Node, accept_none=False, accept_mult=False):
    """``//h1[@class="facelift"]`` text (details.py:142-144)."""
    h1s = root.find_all(tag="h1", pred=lambda e: e.get("class") == "facelift")
    return non_empty_text(h1s, err_none=not accept_none, err_mult=not accept_mult)


def _descr_div(content: list[Node]) -> list[Node]:
    """``.//div[@id="projektbeschreibung"]`` under the content div."""
    return [d for node in content for d in node.find_all(tag="div", id="projektbeschreibung")]


def _details_rows(content: list[Node]) -> list[Node]:
    """``./div[@class="details"]/div`` (details.py:74-76) — full-string class eq."""
    rows = []
    for node in content:
        for d in node.child_elems("div"):
            if d.get("class") == "details":
                rows.extend(d.child_elems("div"))
    return rows


# --- page parsers ----------------------------------------------------------

def parse_projekt_de(root: Node, element_id: int) -> dict:
    """details.py:59-79 (``parse_german`` + ``load_project``)."""
    loader = ProjectDetailsLoader()
    loader.add_value("id", element_id)
    loader.add_value("name_de", get_name(root, accept_none=True, accept_mult=True))
    content = get_content_div(root)
    descr = _descr_div(content)
    projekttext = [d for n in descr for d in n.child_elems("div") if d.get("id") == "projekttext"]
    loader.add_value("beschreibung_de", non_empty_text(projekttext, err_mult=False))
    for row in (d for n in descr for d in n.child_elems("div") if d.get("id") is None):
        loader.add_value("attributes", attributes_pairs_list(row.child_elems("span")))
    for row in _details_rows(content):
        loader.add_value("attributes", attributes_pairs_list(row.child_elems("span")))
    return loader.load_item()


def parse_projekt_en(root: Node) -> tuple[dict, str | None]:
    """details.py:81-96 (``parse_english_project``).

    Returns the english partial item and the result-page href (from the
    ``li#tabbutton2 a`` tab) or None.
    """
    loader = ProjectDetailsLoader()
    loader.add_value("name_en", get_name(root, accept_none=True, accept_mult=True))
    content = get_content_div(root)
    descr = _descr_div(content)
    projekttext = [d for n in descr for d in n.child_elems("div") if d.get("id") == "projekttext"]
    loader.add_value("beschreibung_en", non_empty_text(projekttext, err_mult=False))
    result_links = [
        a
        for node in content
        for li in node.find_all(tag="li", pred=lambda e: e.get("id") == "tabbutton2")
        for a in li.child_elems("a")
    ]
    href = first_attrib(result_links, "href") if len(result_links) == 1 else None
    return loader.load_item(), href


def parse_projekt_result(root: Node, english: bool = False):
    """details.py:98-117 (``parse_project_result``).

    German pass → partial result item (summary_de, attributes,
    publications); english pass → ``{'ergebnis_zusammenfassung_en': …}``.
    """
    loader = ProjectResultLoader()
    result_content = [e for e in root.iter_elems() if e.get("id") == "projektbeschreibung"]
    summary = non_empty_text(
        [p for n in result_content for p in n.child_elems("p")], err_mult=False
    )
    if english:
        loader.add_value("ergebnis_zusammenfassung_en", summary)
        return loader.load_item()
    loader.add_value("ergebnis_zusammenfassung_de", summary)
    for div in (d for n in result_content for d in n.child_elems("div")):
        loader.add_value("attributes", attributes_pairs_list(div.child_elems("span")))
    for publication in (
        li
        for n in result_content
        for ul in n.child_elems("ul")
        if ul.get("class") == "publications"
        for li in ul.child_elems("li")
    ):
        loader.add_value("ergebnis_publikationen", extract_text_and_links(publication))
    return loader.load_item()


def assemble_projekt(de_item: dict, en_item: dict,
                     result_de: dict | None = None,
                     result_en: dict | None = None) -> dict:
    """Merge the chain exactly like details.py:89,104-107."""
    item = {**de_item, **en_item}
    if result_de is not None:
        result = {**result_de, **(result_en or {})}
        item["result"] = result
    return item


def parse_person(root: Node, element_id: int) -> dict:
    """details.py:120-130 (``load_person``)."""
    loader = PersonDetailsLoader()
    loader.add_value("id", element_id)
    name = get_name(root, accept_none=False, accept_mult=False)
    loader.add_value("name_de", name)
    loader.add_value("verstorben", name)
    loader.add_value("gender", name)
    content = get_content_div(root)
    for node in content:
        for d in node.child_elems("div"):
            if d.get("class") == "details":
                for row in d.child_elems("p"):
                    loader.add_value("attributes", attributes_pairs_list(row.child_elems("span")))
    loader.add_value("trees", extract_trees(content))
    return loader.load_item()


def parse_person_details_raw(root: Node, element_id: int) -> dict:
    """The ``person_details`` spider's parse
    (reference spiders/person_details.py:54-63): id, first-text-node
    name (crucifix removed), the RAW per-row ``details`` pairs — one
    ``attributes_pairs_list`` per ``<p>`` row of the details div, NO
    ``nm_person`` normalisation — and the normalised trees.

    Fidelity note: the reference spider is an experimental
    politeness-workaround and is broken as shipped — it calls the
    nonexistent ``self.details_pairs_list`` (base.py defines only
    ``attributes_pairs_list``) and adds a ``details`` field that
    ``PersonItem`` does not declare (items.py:52-57), so ``load_item``
    would raise. This port implements the evident intent: the raw
    details pairs ride through unnormalised (recorded in COVERAGE.md).
    """
    # //h1[@class="facelift"]/text() .get() → FIRST text node (the
    # spider bypasses get_name's multi-text checks)
    h1s = root.find_all(tag="h1", pred=lambda e: e.get("class") == "facelift")
    name = None
    for h1 in h1s:
        for t in h1.iter_texts():
            c = clean_string(t)
            if c:
                name = remove_crucifix_suffix(c)
                break
        if name is not None:
            break
    content = get_content_div(root)
    details = []
    for node in content:
        for d in node.child_elems("div"):
            if d.get("class") == "details":
                for row in d.child_elems("p"):
                    details.append(attributes_pairs_list(row.child_elems("span")))
    return dict(
        id=element_id,
        name_de=name,
        details=details,
        trees=normalise_person_trees(extract_trees(content)),
    )


def parse_institution(root: Node, element_id: int) -> dict:
    """details.py:133-140 (``load_institute``)."""
    loader = InstitutionDetailsLoader()
    loader.add_value("id", element_id)
    loader.add_value("name_de", get_name(root, accept_none=False, accept_mult=True))
    content = get_content_div(root)
    for node in content:
        for addr in node.find_all(tag="div", pred=lambda e: e.get("id") == "address_data"):
            for row in addr.child_elems("p"):
                loader.add_value("attributes", attributes_pairs_list(row.child_elems("span")))
    loader.add_value("trees", extract_trees(content))
    return loader.load_item()

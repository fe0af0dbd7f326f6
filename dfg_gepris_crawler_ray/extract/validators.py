"""Per-page validators — the middleware checks as pure predicates.

Each raises the typed error the reference's spider middlewares raise
(``gepris_crawler/middlewares.py``); the extract stage converts raised
errors into retry-with-refresh attempts and finally ``error``/``moved``
status rows (``middlewares.py:15-66``).
"""

from __future__ import annotations

from ..kernels.htmlmini import Node
from .errors import (
    PageDoesNotExistAnymoreError,
    UnexpectedDetailsPageStructure,
    UnexpectedLanguageError,
)

_NOT_FOUND_TITLES = (
    "Die angeforderte Seite konnte nicht gefunden werden.",
    "The requested page was not found.",
)


def _first_direct_text(el: Node):
    for c in el.children:
        if isinstance(c, str):
            return c
    return None


def check_details_structure(root: Node, url: str = "") -> None:
    """Require the context title and the DFG abbreviation (middlewares.py:69-85).

    ``contains(@class, "h2-context-title")`` is a substring match on the
    class attribute (not a token match), replicated here.
    """
    title_el = root.find(pred=lambda e: "h2-context-title" in (e.get("class") or ""))
    context_title = _first_direct_text(title_el) if title_el is not None else None
    abbr = root.find(tag="abbr", pred=lambda e: e.get("title") == "Deutsche Forschungsgemeinschaft")
    dfg_abbreviation = _first_direct_text(abbr) if abbr is not None else None
    if context_title is None or dfg_abbreviation != "DFG":
        raise UnexpectedDetailsPageStructure(
            f"Details Page {url} has an unexpected structure"
        )


def check_details_exists(root: Node, url: str = "") -> None:
    """Page-not-found tombstone detection (middlewares.py:88-103).

    CSS ``*.h2-context-title::text`` — class-token match here.
    """
    el = root.find(cls="h2-context-title")
    context_title = _first_direct_text(el) if el is not None else None
    if context_title in _NOT_FOUND_TITLES:
        raise PageDoesNotExistAnymoreError(
            f"Page on {url} used to exist but was probably moved"
        )


def check_language(root: Node, expected_language: str, url: str = "") -> None:
    """Language-toggle check (middlewares.py:106-114).

    On an English page the toggle (an element with ``title="Language"``)
    must read 'Deutsch'; on a German page (``title="Sprache"``) it must
    read 'English'.
    """
    if expected_language == "en":
        el = root.find(pred=lambda e: e.get("title") == "Language")
        text = _first_direct_text(el) if el is not None else None
        if text != "Deutsch":
            raise UnexpectedLanguageError(
                f"Expected english language on page {url} but was german"
            )
    elif expected_language == "de":
        el = root.find(pred=lambda e: e.get("title") == "Sprache")
        text = _first_direct_text(el) if el is not None else None
        if text != "English":
            raise UnexpectedLanguageError(
                f"Expected german language on page {url} but was english"
            )

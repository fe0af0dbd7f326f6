"""Pure string kernels with the reference's exact semantics.

Each function mirrors one scalar transform of the reference crawler
(citations are ``/root/reference`` file:line). These carry the
byte-identical-text contract, so semantics (including odd edge cases
like kept trailing whitespace after crucifix removal) are preserved
exactly. All functions are row-local and side-effect free, so they can
run inside ``map_batches`` UDFs on any worker.
"""

from __future__ import annotations

__all__ = [
    "clean_string",
    "split_comma_space",
    "remove_http_prefix",
    "remove_crucifix_suffix",
    "has_crucifix_prefix",
    "guess_gender_from_title",
    "filter_strings",
    "filter_empty_string",
    "filter_parenthesis",
    "filter_no_abstracts_found",
    "filter_no_address_found",
    "is_list_with_single_string",
    "to_list",
    "drop_search_result_attribute",
]


def clean_string(string: str) -> str:
    """Drop non-printable chars, collapse runs of whitespace, strip.

    Mirrors ``gepris_crawler/data_transformations.py:123-132``: the
    non-printable filter runs per *character* (``str.isprintable``), so
    ``'a\\nb'`` becomes ``'ab'`` (the newline is removed, not replaced
    by a space), while ``'a \\n b'`` becomes ``'a b'``.
    """
    if not string.isprintable():  # C fast path: most strings are clean
        string = "".join(c for c in string if c.isprintable())
    return " ".join(string.split()).strip()


def split_comma_space(value: str) -> list[str]:
    """Split on the literal separator ``', '`` (data_transformations.py:56-57)."""
    return value.split(", ")


def remove_http_prefix(value: str) -> str:
    """Strip a leading ``http://`` or ``https://`` (data_transformations.py:101-102)."""
    return value.removeprefix("http://").removeprefix("https://")


def remove_crucifix_suffix(value: str) -> str:
    """Remove a trailing ``(†)`` marker (data_transformations.py:105-106).

    Note: only the marker is removed; a space before it survives
    (``'Name (†)'`` → ``'Name '``), exactly like the reference.
    """
    return value.removesuffix("(†)")


def has_crucifix_prefix(value: str) -> bool:
    """True when the name carries the deceased marker (data_transformations.py:109-110)."""
    return value.endswith("(†)")


def guess_gender_from_title(value: str) -> str:
    """Map an academic title prefix to a gender enum (data_transformations.py:113-120)."""
    first = value.split()[0]
    if first in ("Professor", "Privatdozent"):
        return "male"
    if first in ("Professorin", "Privatdozentin"):
        return "female"
    return "unknown"


def filter_strings(value, *strings):
    """None out sentinel values; pass everything else (data_transformations.py:69-71)."""
    if value not in strings:
        return value
    return None


def filter_empty_string(value):
    """data_transformations.py:74-75"""
    return filter_strings(value, "")


def filter_parenthesis(value):
    """data_transformations.py:78-79"""
    return filter_strings(value, "(", ")")


def filter_no_abstracts_found(value):
    """Drop the two no-abstract sentinels (data_transformations.py:82-83)."""
    return filter_strings(
        value, "Keine Zusammenfassung vorhanden", "No abstract available"
    )


def filter_no_address_found(value):
    """Drop the three no-address sentinels (data_transformations.py:86-87)."""
    return filter_strings(
        value,
        "Es liegt keine aktuelle Dienstanschrift vor.",
        "No current work address.",
        "null",
    )


def is_list_with_single_string(value):
    """Identity on ``[str]`` singletons, None otherwise (data_transformations.py:30-32)."""
    if isinstance(value, list) and len(value) == 1 and isinstance(value[0], str):
        return value
    return None


def to_list(value):
    """Wrap in a list (data_transformations.py:90-91)."""
    return [value]


def drop_search_result_attribute(value_list, attribute_key, wrap_in_list=True):
    """Drop a ``[key, value]`` pair whose key matches, else (wrapped) pass.

    Mirrors ``data_transformations.py:135-140``; the wrapping protects
    the pair structure through MapCompose's list flattening.
    """
    if value_list[0] != attribute_key:
        return [value_list] if wrap_in_list else value_list
    return None

"""The universal nested "reference" cell type and its accessors.

A reference is a plain dict ``{"value": str|..., "path": str}`` with an
optional recursive ``"children"`` list — the shape the reference
crawler produces for every extracted hyperlink
(``gepris_crawler/spiders/base.py:151-153``, ``base.py:200-204``) and
navigates with the helpers at ``data_transformations.py:35-66``.
Trees of these are serialised as canonical JSON when stored in Arrow
(Arrow has no recursive types; the reference stores the same shapes as
Postgres JSONB).
"""

from __future__ import annotations

__all__ = [
    "is_reference",
    "keep_only_references",
    "get_reference_value",
    "get_reference_path",
    "get_reference_children",
    "transform",
]


def is_reference(value) -> bool:
    """data_transformations.py:35-36"""
    return isinstance(value, dict) and "value" in value and "path" in value


def keep_only_references(value):
    """Identity on references, None (drop) otherwise (data_transformations.py:39-41)."""
    if is_reference(value):
        return value
    return None


def get_reference_value(value):
    """data_transformations.py:44-45"""
    return value["value"]


def get_reference_path(value):
    """data_transformations.py:48-49"""
    return value["path"]


def get_reference_children(value):
    """data_transformations.py:52-53"""
    return value.get("children")


def transform(value, func, only_on_types=None):
    """Apply ``func`` only when ``type(value)`` is whitelisted, else None.

    Mirrors ``data_transformations.py:60-62`` (exact ``type`` check,
    not isinstance).
    """
    if isinstance(only_on_types, list) and type(value) in only_on_types:
        return func(value)
    return None

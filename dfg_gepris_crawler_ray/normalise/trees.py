"""Tree normalisers (normalisation/trees.py) — whitelisted tree ids,
recursive id extraction, exact traversal order preserved.

Shape violations raise ValueError, exactly like the reference (the
extract stage converts them to retry/error statuses).
"""

from __future__ import annotations

from ..kernels.refs import (
    get_reference_children,
    get_reference_path,
    get_reference_value,
    is_reference,
)
from ..kernels.strings import remove_http_prefix
from ..kernels.urls import extract_id, extract_institution_id, is_gepris_path

ORIGINAL_INST_SUBINSTITUTIONS_KEY = "untergeordneteInstitutionen"
NORMALISED_INST_SUBINSTITUTIONS_KEY = "normalised_subinstitutions"
ORIGINAL_INST_PROJECTS_KEY = "projekteNachProgrammen"
NORMALISED_INST_PROJECTS_KEY = "normalised_projects"

ORIGINAL_PERS_PROJECTS_KEY = "projekteNachRolle"
NORMALISED_PERS_PROJECTS_KEY = "normalised_projects"
ORIGINAL_PERS_PRICES_KEY = "preise"
NORMALISED_PERS_PRICES_KEY = "normalised_prices"


def normalise_sub_institutions(institutions: list):
    """trees.py:16-34 — reference w/o children → id string; with children
    → ``{id: [...]}`` single-entry dict."""
    leaves = []
    for sub_inst in institutions:
        if is_reference(sub_inst):
            sub_inst_id = extract_institution_id(get_reference_path(sub_inst))
            if sub_inst_id is not None:
                sub_children = get_reference_children(sub_inst)
                if sub_children is None:
                    leaves.append(sub_inst_id)
                else:
                    leaves.append({sub_inst_id: normalise_sub_institutions(sub_children)})
            else:
                raise ValueError(
                    f"Unexpected subinstitution, should include a institution path, but was {sub_inst}"
                )
        else:
            raise ValueError(
                f"Unexpected subinstitution, should be a reference (path, name, [children])"
                f"but was {sub_inst} in {institutions}"
            )
    return leaves


def normalise_prices(price_categories: list) -> dict:
    """trees.py:37-51 — category reference → list of prices with
    http-stripped paths."""
    normalised_prices = {}
    for category in price_categories:
        if is_reference(category) and get_reference_children(category) is not None:
            prices = []
            for price in get_reference_children(category):
                if is_reference(price) and get_reference_children(price) is None:
                    price = dict(price)
                    price["path"] = remove_http_prefix(get_reference_path(price))
                    prices.append(price)
                else:
                    raise ValueError(
                        f"Expected price to be reference without children but was: {price}"
                    )
            normalised_prices[get_reference_value(category)] = prices
        else:
            raise ValueError(
                f"Expect price category to be reference with children but was: {category}"
            )
    return normalised_prices


def normalise_tree_leaves(entries: list, context_to_keep: str):
    """trees.py:54-77 — keep target-context references (→ id str) and
    named branches; nested lists are flattened by appending to the
    worklist mid-iteration (exact traversal order preserved)."""
    entries = list(entries)  # we extend the worklist while iterating
    leaves = []
    i = 0
    while i < len(entries):
        entry = entries[i]
        if (
            is_reference(entry)
            and get_reference_path(entry) is not None
            and is_gepris_path(get_reference_path(entry), context_to_check=context_to_keep)
        ):
            if get_reference_children(entry) is not None:
                raise ValueError(
                    f"References in tree should not have children. But this one has: {entry}"
                )
            leaves.append(extract_id(get_reference_path(entry)))
        elif is_reference(entry) and get_reference_children(entry) is not None:
            leaves.append(
                {get_reference_value(entry): normalise_tree_leaves(
                    get_reference_children(entry), context_to_keep
                )}
            )
        elif isinstance(entry, list):
            entries.extend(entry)
        i += 1
    return leaves


def normalise_institution_trees(institution_trees_dict: dict) -> dict:
    """trees.py:79-97 — whitelist + rename to ``normalised_*``."""
    unexpected = set(institution_trees_dict.keys()) - {
        ORIGINAL_INST_PROJECTS_KEY,
        ORIGINAL_INST_SUBINSTITUTIONS_KEY,
    }
    if unexpected:
        raise ValueError(f"There were unexpected trees on the page: {unexpected}")
    out = dict(institution_trees_dict)
    sub_institutions = out.pop(ORIGINAL_INST_SUBINSTITUTIONS_KEY, None)
    if sub_institutions is not None:
        out[NORMALISED_INST_SUBINSTITUTIONS_KEY] = normalise_sub_institutions(sub_institutions)
    projects = out.pop(ORIGINAL_INST_PROJECTS_KEY, None)
    if projects is not None:
        out[NORMALISED_INST_PROJECTS_KEY] = normalise_tree_leaves(projects, "projekt")
    return out


def normalise_person_trees(person_trees_dict: dict) -> dict:
    """trees.py:100-117"""
    unexpected = set(person_trees_dict.keys()) - {
        ORIGINAL_PERS_PROJECTS_KEY,
        ORIGINAL_PERS_PRICES_KEY,
    }
    if unexpected:
        raise ValueError(f"There were unexpected trees on the page: {unexpected}")
    out = dict(person_trees_dict)
    projects = out.pop(ORIGINAL_PERS_PROJECTS_KEY, None)
    if projects is not None:
        out[NORMALISED_PERS_PROJECTS_KEY] = normalise_tree_leaves(projects, "projekt")
    prices = out.pop(ORIGINAL_PERS_PRICES_KEY, None)
    if prices is not None:
        out[NORMALISED_PERS_PRICES_KEY] = normalise_prices(prices)
    return out

"""Closed-world dispatch: raw attribute dict → normalised record.

Mirrors ``gepris_crawler/normalisation/normalisation.py:4-17``: every
raw key must appear in its ATTRIBUTES_MAP (else
:class:`UnexpectedFieldError`), ``keys_to_process`` fan one raw key out
to several fields, ``keys_to_remove`` drop.
"""

from __future__ import annotations

from ..extract.errors import UnexpectedFieldError
from ..kernels.loadalg import RecordLoader


def normalise_attributes(
    unstructured: dict,
    loader: RecordLoader,
    attributes_map: dict,
    keys_to_process: dict | None = None,
    keys_to_remove=(),
) -> dict:
    keys_to_process = keys_to_process or {}
    for key, value in unstructured.items():
        normalised_key = attributes_map.get(key)
        if normalised_key is None:
            raise UnexpectedFieldError(
                f'Unknown attribute key found: "{key}", make sure to add it to '
                "the corresponding ATTRIBUTES_MAP"
            )
        if normalised_key in keys_to_process:
            processed = keys_to_process[normalised_key](value)
            for processed_key, processed_val in processed.items():
                loader.add_value(processed_key, processed_val)
        elif normalised_key in keys_to_remove:
            pass
        else:
            loader.add_value(normalised_key, value)
    return loader.load_item()

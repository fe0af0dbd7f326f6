"""Person attribute normalisation (person_attributes.py:25-48).

- ``adresse``: sentinel filter on single-string lists, joined ', '
- ``mail``: the page splits at '@' into two spans → ``Join('@')``
- ``internet``: reference path, http(s) prefix stripped
- ``orcid_id``: reference value
"""

from __future__ import annotations

from ..kernels.loadalg import Compose, Join, MapCompose, RecordLoader
from ..kernels.refs import get_reference_path, get_reference_value, transform
from ..kernels.strings import filter_no_address_found, is_list_with_single_string, remove_http_prefix
from .attribute_maps import PERSON_ATTRIBUTES_MAP
from .base import normalise_attributes


class PersonAttributesLoader(RecordLoader):
    input_processors = {
        "adresse": Compose(
            lambda v: filter_no_address_found(v[0]) if is_list_with_single_string(v) else v
        ),
        "internet": MapCompose(
            lambda v: transform(v, get_reference_path, only_on_types=[dict]),
            remove_http_prefix,
        ),
        "orcid_id": MapCompose(get_reference_value),
    }
    output_processors = {
        "adresse": Join(", "),
        "mail": Join("@"),
    }


def normalise(unstructured_attributes_dict: dict) -> dict:
    return normalise_attributes(
        unstructured_attributes_dict, PersonAttributesLoader(), PERSON_ATTRIBUTES_MAP
    )

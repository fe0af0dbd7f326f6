"""Institution attribute normalisation (institution_attributes.py:31-43)."""

from __future__ import annotations

from ..kernels.loadalg import Compose, Join, MapCompose, RecordLoader
from ..kernels.refs import get_reference_path, transform
from ..kernels.strings import filter_no_address_found, is_list_with_single_string, remove_http_prefix
from .attribute_maps import INSTITUTION_ATTRIBUTES_MAP
from .base import normalise_attributes


class InstitutionAttributesLoader(RecordLoader):
    input_processors = {
        "adresse": Compose(
            lambda v: filter_no_address_found(v[0]) if is_list_with_single_string(v) else v
        ),
        "internet": MapCompose(
            lambda v: transform(v, get_reference_path, only_on_types=[dict]),
            remove_http_prefix,
        ),
    }
    output_processors = {
        "adresse": Join(", "),
    }


def normalise(unstructured_attributes_dict: dict) -> dict:
    return normalise_attributes(
        unstructured_attributes_dict, InstitutionAttributesLoader(), INSTITUTION_ATTRIBUTES_MAP
    )

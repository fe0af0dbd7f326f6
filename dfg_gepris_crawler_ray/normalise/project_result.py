"""Project result attribute normalisation (project_result_attributes.py:16-23)."""

from __future__ import annotations

from ..kernels.loadalg import MapCompose, RecordLoader
from .attribute_maps import PROJEKT_RESULT_ATTRIBUTES_MAP
from .base import normalise_attributes


class ProjectResultAttributesLoader(RecordLoader):
    input_processors = {
        "ergebnis_erstellungsjahr": MapCompose(int),
    }


def normalise(unstructured_attributes_dict: dict) -> dict:
    return normalise_attributes(
        unstructured_attributes_dict,
        ProjectResultAttributesLoader(),
        PROJEKT_RESULT_ATTRIBUTES_MAP,
    )

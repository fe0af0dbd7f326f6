"""Project attribute normalisation (the widest normaliser).

Re-derivation of ``gepris_crawler/normalisation/project_attributes.py``:

- every person/institution reference field is
  ``MapCompose(keep_only_references, get_reference_path,
  extract_{person,institution}_id, int)`` (:343-353), producing
  ``list<int>`` of entity ids;
- the 5-way German funding-period parser (:301-316);
- ``projekt_kennung`` dropped (:319), ``foerderung_zeitraum`` split
  (:321-323);
- gender aggregation over raw keys via the gender map (:380-404) into
  ``male_personen`` / ``female_personen``.

Determinism note: the reference materialises the gender id sets with
``list(set)`` (CPython value-ordering for small ints); we emit sorted
lists so output is stable across processes — documented divergence,
order-insensitive consumers (SQL ``jsonb_array_elements`` edges) are
unaffected.
"""

from __future__ import annotations

from ..kernels.loadalg import Compose, Identity, MapCompose, RecordLoader, TakeFirst
from ..kernels.refs import get_reference_path, get_reference_value, keep_only_references, transform
from ..kernels.strings import split_comma_space
from ..kernels.urls import extract_institution_id, extract_person_id, extract_projekt_id
from .attribute_maps import (
    FEMALE,
    INSTITUTIONEN_REFERENCES,
    MALE,
    PERSONEN_REFERENCES,
    PROJEKT_ATTRIBUTES_MAP,
    PROJEKT_PERSON_GENDER_MAP,
)
from .base import normalise_attributes


def parse_foerderung_zeitraum(value: str) -> dict:
    """5-way funding-period parser (project_attributes.py:301-316)."""
    if value.startswith("Förderung von "):
        begin, end = value.removeprefix("Förderung von ").split(" bis ")
        return {"foerderung_beginn": begin, "foerderung_ende": end}
    if value.startswith("Förderung seit "):
        return {"foerderung_beginn": value.removeprefix("Förderung seit ")}
    if value.startswith("Förderung in "):
        year = value.removeprefix("Förderung in ")
        return {"foerderung_beginn": year, "foerderung_ende": year}
    if value.startswith("Förderung: Bis "):
        return {"foerderung_ende": value.removeprefix("Förderung: Bis ")}
    if value == "Befindet sich in der laufenden Förderung.":
        return {}
    raise ValueError(f"Expected parsable dates, but got {value}")


KEYS_TO_REMOVE = ("projekt_kennung",)
KEYS_TO_PROCESS = {"foerderung_zeitraum": parse_foerderung_zeitraum}

_identity = Identity()
_take_first = TakeFirst()


class ProjectAttributesLoader(RecordLoader):
    default_output = _identity

    input_processors = {
        **{
            field: MapCompose(keep_only_references, get_reference_path, extract_person_id, int)
            for field in PERSONEN_REFERENCES
        },
        **{
            field: MapCompose(keep_only_references, get_reference_path, extract_institution_id, int)
            for field in INSTITUTIONEN_REFERENCES
        },
        "teil_projekt": MapCompose(keep_only_references, get_reference_path, extract_projekt_id, int),
        "dfg_ansprechpartner": MapCompose(
            lambda v: transform(v, get_reference_value, only_on_types=[dict])
        ),
        "internationaler_bezug": MapCompose(split_comma_space),
        "gross_geraete": MapCompose(),
        "geraetegruppe": MapCompose(),
        "fachrichtungen": MapCompose(split_comma_space),
        "webseite": MapCompose(get_reference_path),
        "foerderung_beginn": MapCompose(int),
        "foerderung_ende": MapCompose(int),
    }
    output_processors = {
        "teil_projekt": _take_first,
        "dfg_ansprechpartner": _take_first,
        "dfg_verfahren": _take_first,
        "webseite": _take_first,
        "foerderung_beginn": _take_first,
        "foerderung_ende": _take_first,
        # golden-pinned scalar (test_details_spider.py:56): the only
        # fully-unprocessed attribute observed in the reference's
        # fixtures carries its single value unwrapped
        "fachliche_zuordnungen": lambda v: v[0] if len(v) == 1 else v,
    }


def normalise(unstructured_attributes_dict: dict) -> dict:
    """project_attributes.py:380-404 (incl. gender aggregation)."""
    item = normalise_attributes(
        unstructured_attributes_dict,
        ProjectAttributesLoader(),
        PROJEKT_ATTRIBUTES_MAP,
        keys_to_process=KEYS_TO_PROCESS,
        keys_to_remove=KEYS_TO_REMOVE,
    )
    male_personen: set[int] = set()
    female_personen: set[int] = set()
    seen_personen_keys: list[str] = []
    for key in unstructured_attributes_dict.keys():
        normalised_key = PROJEKT_ATTRIBUTES_MAP.get(key)
        if normalised_key in PERSONEN_REFERENCES:
            if normalised_key in seen_personen_keys:
                raise ValueError(
                    f'Normalised Key "{normalised_key}" for gepris key "{key}" exists '
                    f"multiples times in projekt attributes {unstructured_attributes_dict}"
                )
            seen_personen_keys.append(normalised_key)
            gender = PROJEKT_PERSON_GENDER_MAP[key]
            if gender == MALE:
                male_personen.update(item[normalised_key])
            elif gender == FEMALE:
                female_personen.update(item[normalised_key])
    item["male_personen"] = sorted(male_personen)
    item["female_personen"] = sorted(female_personen)
    return item

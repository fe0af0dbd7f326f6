"""Parity against the reference's OWN golden fixtures: real GEPRIS
pages stored under ``/root/reference/test/resources/responses/`` parsed
with OUR extractors, asserted against the reference's expected dicts
(transcribed as data from ``test/test_details_spider.py:43-226`` /
``test/test_search_results_spider.py``). This is the byte-identical
extraction contract of BASELINE.json ``input_hint`` exercised on
genuine (tag-soup) markup, not just the synthetic corpus.
"""

import os

import pytest

FIX = "/root/reference/test/resources/responses"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixtures not available"
)


def _root(relpath):
    from dfg_gepris_crawler_ray.kernels.htmlmini import parse_html

    with open(os.path.join(FIX, relpath), "rb") as f:
        return parse_html(f.read())


def test_projekt_de_en_golden():
    """test_details_spider.py:42-72 (projekt 289879542, de page then
    en merge)."""
    from dfg_gepris_crawler_ray.extract.details import (
        assemble_projekt,
        parse_projekt_de,
        parse_projekt_en,
    )

    expected = {
        "id": 289879542,
        "name_de": "Intergiertes Graduiertenkolleg (MGK)",
        "beschreibung_de": (
            "Das Teilprojekt bietet qualitativ hochwertige Doktorandenausbildung "
            "für SFB-Forscher, in Koordination mit der Saarbrücken Graduate "
            "School of Computer Science."
        ),
        "attributes": {
            "foerderung_beginn": 2016,
            "foerderung_ende": 2019,
            "dfg_verfahren": "Sonderforschungsbereiche",
            "teil_projekt": 272573906,
            "antragstellende_institutionen": [10335],
            "teilprojekt_leiter_personen": [1710561],
            "dfg_ansprechpartner": "Dr. Andreas Raabe",
            "fachliche_zuordnungen": "Softwaretechnik und Programmiersprachen",
            "male_personen": [1710561],
            "female_personen": [],
        },
    }
    de_item = parse_projekt_de(_root("details/projekt_289879542_de_22102021.html"), 289879542)
    assert de_item == expected

    en_item, result_href = parse_projekt_en(
        _root("details/projekt_289879542_en_22102021.html")
    )
    merged = assemble_projekt(de_item, en_item)
    expected["name_en"] = "Integrated Research Training Group (MGK)"
    expected["beschreibung_en"] = expected["beschreibung_de"]
    assert merged == expected


def test_projekt_mitverantwortliche_golden():
    """test_details_spider.py:74-80 (projekt 491343583)."""
    from dfg_gepris_crawler_ray.extract.details import parse_projekt_de

    item = parse_projekt_de(
        _root("details/projekt_491343583_de_12122021.html"), 491343583
    )
    assert set(item["attributes"]["female_personen"]) == {134389277, 1395277}
    assert item["attributes"]["mit_verantwortliche_personen"] == [1395277]


def test_projekt_igk_attributes_golden():
    """test_details_spider.py:82-89 (projekt 317513741)."""
    from dfg_gepris_crawler_ray.extract.details import parse_projekt_de

    item = parse_projekt_de(
        _root("details/projekt_317513741_de_15122021.html"), 317513741
    )
    attributes = item["attributes"]
    assert set(attributes["igk_institutionen"]) == {35982322, 20753636, 361115666}
    assert attributes["igk_personen"] == [242325003]
    assert 242325003 in attributes["female_personen"]


def test_projekt_attribute_without_key_golden():
    """test_details_spider.py:91-96 (projekt 443011404): a keyless
    span pair must be dropped, leaving exactly 7 attributes."""
    from dfg_gepris_crawler_ray.extract.details import parse_projekt_de

    item = parse_projekt_de(
        _root("details/projekt_443011404_de_15122021.html"), 443011404
    )
    assert len(item["attributes"]) == 7


def test_person_golden():
    """test_details_spider.py:100-132 (person 215969423)."""
    from dfg_gepris_crawler_ray.extract.details import parse_person

    expected = {
        "id": 215969423,
        "name_de": "Professor Dr. Oliver Cornely",
        "verstorben": False,
        "gender": "male",
        "attributes": {
            "adresse": (
                "Universitätsklinikum Köln, Zentrum für Klinische Studien Köln "
                "(ZKS), Herder Straße 52-54, 50931 Köln"
            ),
            "internet": "tinyurl.com/cornelylab",
        },
        "trees": {
            "normalised_projects": [
                {
                    "Als beteiligter Wissenschaftler": [
                        {"laufende Projekte": ["390661388"]},
                        {"abgeschlossene Projekte": ["39010820"]},
                    ]
                }
            ]
        },
    }
    item = parse_person(_root("details/person_215969423_de_22102021.html"), 215969423)
    assert item == expected


def test_person_with_price_tree_golden():
    """test_details_spider.py:134-173 (person 1835696)."""
    from dfg_gepris_crawler_ray.extract.details import parse_person

    expected = {
        "id": 1835696,
        "name_de": "Professor Dr. Eric Findlay Bell",
        "verstorben": False,
        "gender": "male",
        "attributes": {
            "adresse": (
                "University of Michigan, Department of Astronomy, 1085 S. "
                "University, Ann Arbor MI 48109-1107, USA"
            ),
            "telefon": "+1 734 764-3408",
            "telefax": "+1 734 763-6317",
            "mail": "ericbell@umich.edu",
            "internet": "www.lsa.umich.edu/mira/people/ci.belleric_ci.detail",
        },
        "trees": {
            "normalised_projects": [
                {
                    "Als Antragsteller": [
                        {"abgeschlossene Projekte": ["5448759", "17341944"]}
                    ]
                }
            ],
            "normalised_prices": {
                "Als Preisträger": [
                    {
                        "value": "Heinz Maier-Leibnitz-Preis 2007",
                        "path": (
                            "www.dfg.de/gefoerderte_projekte/wissenschaftliche_preise/"
                            "leibnitz-preis/2007/"
                        ),
                    }
                ]
            },
        },
    }
    item = parse_person(_root("details/person_1835696_de_05112021.html"), 1835696)
    assert item == expected


def test_person_orcid_golden():
    """test_details_spider.py:175-179 (person 470035085)."""
    from dfg_gepris_crawler_ray.extract.details import parse_person

    item = parse_person(_root("details/person_470035085_de_12122021.html"), 470035085)
    assert item["attributes"]["orcid_id"] == "0000-0001-8538-0038"


def test_search_projekt_golden():
    """test_search_results_spider.py:13-56 (three projekt listing
    variants: plain, reference-valued attribute, Antragsteller drop)."""
    from dfg_gepris_crawler_ray.extract.search import parse_search_page

    items = parse_search_page(_root("search_results/projekt_10_5_21102021.html"), "projekt")
    assert items[0] == {
        "id": 269379,
        "name_de": "GRK 60: Molekularbiologische Analyse pathophysiologischer Prozesse",
        "project_attributes": {
            "DFG-Verfahren": "Graduiertenkollegs",
            "Fachkollegium": "Grundlagen der Biologie und Medizin",
            "Förderung": "1996 bis 2002",
            "Sprecher": "Eberhard Günther",
        },
    }

    items = parse_search_page(_root("search_results/projekt_0_1_25112021.html"), "projekt")
    assert items[0] == {
        "id": 5076748,
        "name_de": "Hochauflösende mm-Beobachtungen massereicher Protosterne",
        "project_attributes": {
            "DFG-Verfahren": "Schwerpunktprogramme",
            "Fachliche Zuordnung": "Astrophysik und Astronomie",
            "Förderung": "1997 bis 2002",
            "Teilprojekt zu": {"path": "/gepris/projekt/5458045", "value": "SPP 471"},
        },
    }

    items = parse_search_page(_root("search_results/projekt_0_1_28112021.html"), "projekt")
    assert items[0] == {
        "id": 447999811,
        "name_de": (
            "Experimentelle und numerische Untersuchungen zu den Gründungen von "
            "Offshore-Windenergieanlagen in weichem marinem Taiwanesischem Ton "
            "unter kombinierter hochzyklischer und seismischer Belastung"
        ),
        "project_attributes": {
            "DFG-Verfahren": "Sachbeihilfen",
            "Fachliche Zuordnung": "Geotechnik, Wasserbau",
            "Förderung": "Seit 2021",
        },
    }


def test_search_projekt_empty_item_golden():
    """test_search_results_spider.py:58-60: one null-id row in a 5-row
    page is skipped."""
    from dfg_gepris_crawler_ray.extract.search import parse_search_page

    items = parse_search_page(
        _root("search_results/projekt_131490_5_03122021.html"), "projekt"
    )
    assert len(items) == 4


def test_search_person_golden():
    """test_search_results_spider.py:62-74."""
    from dfg_gepris_crawler_ray.extract.search import parse_search_page

    items = parse_search_page(_root("search_results/person_0_1_21102021.html"), "person")
    assert items[0] == {
        "id": 5132,
        "name_de": "Abromeit, Heidrun",
        "addresse": [
            "Technische Universität Darmstadt",
            "Fachbereich Gesellschafts- und Geschichtswissenschaften",
            "Institut für Politikwissenschaft",
        ],
    }


def test_search_institution_golden():
    """test_search_results_spider.py:76-98 (sub-institution fan-out with
    the parent embedded)."""
    from dfg_gepris_crawler_ray.extract.search import parse_search_page

    items = parse_search_page(
        _root("search_results/institution_9290_10_21102021.html"), "institution"
    )
    assert items[0] == {
        "id": 28761,
        "name_de": "Professur für Personalpolitik",
        "addresse": ["Hamburg", "Deutschland"],
        "uebergeordnete_institution": {"id": 10196, "name_de": "Helmut-Schmidt-Universität"},
    }
    assert items[4] == {
        "id": 28768,
        "name_de": (
            "Lehrstuhl für Strafrecht, Strafprozeßrecht, Rechtsphilosophie und "
            "Rechtssoziologie"
        ),
        "addresse": ["Frankfurt am Main", "Deutschland"],
        "uebergeordnete_institution": {
            "id": 10206,
            "name_de": "Goethe-Universität Frankfurt am Main",
        },
    }


def test_search_total_items_golden():
    """test_search_results_spider.py:100-114: total-count extraction and
    its failure path (page without #result-info → None)."""
    from dfg_gepris_crawler_ray.extract.search import extract_total_items

    assert extract_total_items(_root("search_results/projekt_0_1_12022022.html")) == 138127
    assert extract_total_items(_root("data_monitor/03112021.html")) is None


def test_reference_edges_sql_golden():
    """test_init_sql.py:18-50: the reference-edge views unnest one
    projekt item's person/institution arrays into typed edges."""
    import json

    import pandas as pd

    from dfg_gepris_crawler_ray.frontier.state import (
        institution_projekt_references,
        person_projekt_references,
    )

    latest = pd.DataFrame(
        [
            dict(
                id=1,
                context="projekt",
                item=json.dumps(
                    {
                        "name_de": "Testprojekt",
                        "attributes": {
                            "antragsteller_personen": [2, 3],
                            "unternehmen_institutionen": [4],
                            "partner_organisation_institutionen": [5],
                        },
                    }
                ),
            )
        ]
    )
    p = sorted(person_projekt_references(latest).itertuples(index=False, name=None))
    assert p == [(2, 1, "antragsteller_personen"), (3, 1, "antragsteller_personen")]
    i = sorted(institution_projekt_references(latest).itertuples(index=False, name=None))
    assert i == [
        (4, 1, "unternehmen_institutionen"),
        (5, 1, "partner_organisation_institutionen"),
    ]


def test_institution_hierarchy_sql_golden():
    """test_init_sql.py:51-87: nested subinstitution tree → the
    (id, parent_id, root_id) closure, root included with NULL parent."""
    import json

    import pandas as pd

    from dfg_gepris_crawler_ray.frontier.state import institution_hierarchy

    latest = pd.DataFrame(
        [
            dict(
                id=1,
                context="institution",
                item=json.dumps(
                    {
                        "name_de": "Testprojekt",
                        "trees": {
                            "normalised_subinstitutions": ["2", {"3": ["4", "5"]}, "6"]
                        },
                    }
                ),
            )
        ]
    )
    rows = sorted(
        (int(a), None if pd.isna(b) else int(b), int(c))
        for a, b, c in institution_hierarchy(latest).itertuples(index=False, name=None)
    )
    assert rows == [(1, None, 1), (2, 1, 1), (3, 1, 1), (4, 3, 1), (5, 3, 1), (6, 1, 1)]


def test_parser_paths_agree_on_real_pages():
    """The repaired-expat fast path and the permissive fallback must
    yield identical extraction results on every real fixture (the
    contract that lets parse_html pick whichever path works)."""
    import glob
    import json

    from dfg_gepris_crawler_ray.kernels import htmlmini as H
    from dfg_gepris_crawler_ray.kernels.jsoncanon import dumps_canonical

    def fallback_root(text):
        b = H._TreeBuilder()
        b.feed(text)
        b.close()
        elems = b.root.child_elems()
        return elems[0] if len(elems) == 1 else b.root

    def shape(node):
        """Extraction-relevant projection: tags, class/id/href/title
        attrs, cleaned text — script/style excluded (the fast path
        drops their bodies)."""
        from dfg_gepris_crawler_ray.kernels.strings import clean_string

        if node.tag in ("script", "style"):
            return None
        out = {
            "tag": node.tag,
            "attrs": {
                k: v
                for k, v in sorted(node.attrib.items())
                if k in ("class", "id", "href", "title", "data-result-count")
            },
            "children": [],
        }
        for c in node.children:
            if isinstance(c, str):
                t = clean_string(c)
                if t:
                    out["children"].append(t)
            else:
                s = shape(c)
                if s is not None:
                    out["children"].append(s)
        return out

    for f in sorted(glob.glob(os.path.join(FIX, "*", "*.html"))):
        data = open(f, "rb").read().decode("utf-8", errors="replace")
        fast = H.parse_html(data)
        slow = fallback_root(data)
        assert dumps_canonical(shape(fast)) == dumps_canonical(shape(slow)), f


def test_structure_validator_goldens():
    """test_middlewares.py:11-34: the V1 structure check fails on the
    one known-broken fixture and passes on good de/en pages."""
    from dfg_gepris_crawler_ray.extract.errors import UnexpectedDetailsPageStructure
    from dfg_gepris_crawler_ray.extract.validators import check_details_structure

    with pytest.raises(UnexpectedDetailsPageStructure):
        check_details_structure(_root("details/projekt_441512655_de_17122021.html"))
    check_details_structure(_root("details/projekt_258745513_en_06012022.html"))
    check_details_structure(_root("details/projekt_491343583_de_12122021.html"))


def test_data_monitor_goldens():
    """test_data_monitor_spider.py:22-55 (3 dated snapshots incl. the
    renamed-field variant and Europe/Berlin DST localization)."""
    from dfg_gepris_crawler_ray.extract.data_monitor import parse_data_monitor

    item = parse_data_monitor(_root("data_monitor/21102021.html"))
    assert str(item["last_update"]) == "2021-10-19"
    assert str(item["last_approval"]) == "2021-08-19"
    assert item["gepris_version"] == "18.5.6"
    assert item["current_index_version"] == "dd5213f6-d21e-4177-960f-0450db3fb750"
    assert item["current_index_date"] == "2021-10-19T07:47:33+02:00"
    assert item["finished_project_count"] == 34878
    assert item["project_count"] == 136387
    assert item["person_count"] == 87700
    assert item["institution_count"] == 37527
    assert item["humanities_count"] == 25080
    assert item["life_count"] == 48347
    assert item["natural_count"] == 35151
    assert item["engineering_count"] == 25475
    assert item["infrastructure_count"] == 11066

    item = parse_data_monitor(_root("data_monitor/03112021.html"))
    assert item["current_index_date"] == "2021-11-02T09:25:07+01:00"

    item = parse_data_monitor(_root("data_monitor/12122021.html"))
    assert item["finished_project_count"] == 35552
    assert item["research_infrastructure_count"] == 340
    assert "infrastructure_count" not in item


def test_institution_golden():
    """test_details_spider.py:181-226 (institution 12957)."""
    from dfg_gepris_crawler_ray.extract.details import parse_institution

    expected = {
        "id": 12957,
        "name_de": "Burg Giebichenstein Kunsthochschule Halle",
        "attributes": {
            "adresse": "Neuwerk 7, 06108 Halle, Deutschland",
            "telefon": "+49 345 7751-510",
            "telefax": "+49 345 7751-509",
            "mail": "kanzlerin@burg-halle.de",
            "internet": "www.burg-halle.de",
        },
        "trees": {
            "normalised_subinstitutions": [
                "980513",
                {"980512": ["981182"]},
                "460342185",
            ],
            "normalised_projects": [
                {
                    "Großgeräte der Länder": [
                        {"laufende Projekte": ["432830299", "453465585"]},
                        {
                            "abgeschlossene Projekte": [
                                "276335622",
                                "213855912",
                                "227997273",
                                "192182983",
                                "105287672",
                            ]
                        },
                    ]
                }
            ],
        },
    }
    item = parse_institution(_root("details/institution_12957_de_22102021.html"), 12957)
    assert item == expected

"""Golden details-page extraction tests (hand-derived expected items,
mirroring the scenarios of the reference's test_details_spider.py)."""

import pytest

from dfg_gepris_crawler_ray.extract.details import (
    assemble_projekt,
    parse_institution,
    parse_person,
    parse_projekt_de,
    parse_projekt_en,
    parse_projekt_result,
)
from dfg_gepris_crawler_ray.extract.validators import (
    check_details_exists,
    check_details_structure,
    check_language,
)
from dfg_gepris_crawler_ray.extract.errors import (
    PageDoesNotExistAnymoreError,
    UnexpectedDetailsPageStructure,
    UnexpectedLanguageError,
)
from dfg_gepris_crawler_ray.kernels.htmlmini import parse_html


def _details_page(body, lang="de", title="x"):
    toggle = (
        '<a title="Sprache">English</a>' if lang == "de" else '<a title="Language">Deutsch</a>'
    )
    return parse_html(
        "<html><head></head><body>"
        f"{toggle}"
        '<abbr title="Deutsche Forschungsgemeinschaft">DFG</abbr>'
        f'<h2 class="h2-context-title">{title}</h2>'
        f"{body}"
        "</body></html>"
    )


PROJEKT_DE = """
<h1 class="facelift">Testprojekt Alpha</h1>
<div class="content_inside">
<div id="projektbeschreibung">
  <div id="projekttext">Dies ist die Beschreibung.</div>
  <div><span class="name">F&#246;rderung</span><span class="value">F&#246;rderung von 1996 bis 2002</span></div>
</div>
<div class="details">
  <div><span class="name">Antragsteller</span><span class="value"><a href="/gepris/person/1001">Professor Dr. A</a></span></div>
  <div><span class="name">Leiterin</span><span class="value"><a href="/gepris/person/1002">Professorin Dr. B</a></span></div>
  <div><span class="name">DFG-Verfahren</span><span class="value">Sachbeihilfen</span></div>
  <div><span class="name">Internationaler Bezug</span><span class="value">Frankreich, Italien</span></div>
  <div><span class="name">Projektkennung</span><span class="value">DFG - Projektnummer 5000</span></div>
</div>
</div>
"""

PROJEKT_EN = """
<h1 class="facelift">Test Project Alpha</h1>
<div class="content_inside">
<div id="projektbeschreibung">
  <div id="projekttext">This is the description.</div>
</div>
<ul><li id="tabbutton2"><a href="/gepris/projekt/5000/ergebnisse">Results</a></li></ul>
</div>
"""

RESULT_DE = """
<h1 class="facelift">Testprojekt Alpha</h1>
<div class="content_inside"></div>
<div id="projektbeschreibung">
  <p>Ergebniszusammenfassung deutsch.</p>
  <div><span class="name">Erstellungsjahr</span><span class="value">2003</span></div>
  <ul class="publications">
    <li>Paper One<a href="https://doi.example/1">doi:1</a></li>
    <li>(Siehe online unter<a href="https://doi.example/2">doi:2</a>)</li>
  </ul>
</div>
"""

RESULT_EN = """
<h1 class="facelift">Test Project Alpha</h1>
<div class="content_inside"></div>
<div id="projektbeschreibung">
  <p>English result summary.</p>
</div>
"""


def test_projekt_full_chain():
    de = parse_projekt_de(_details_page(PROJEKT_DE, "de"), 5000)
    assert de["id"] == 5000
    assert de["name_de"] == "Testprojekt Alpha"
    assert de["beschreibung_de"] == "Dies ist die Beschreibung."
    attrs = de["attributes"]
    assert attrs["foerderung_beginn"] == 1996 and attrs["foerderung_ende"] == 2002
    assert attrs["antragsteller_personen"] == [1001]
    assert attrs["leiter_personen"] == [1002]
    assert attrs["dfg_verfahren"] == "Sachbeihilfen"
    assert attrs["internationaler_bezug"] == ["Frankreich", "Italien"]
    assert "projekt_kennung" not in attrs
    assert attrs["male_personen"] == [1001]
    assert attrs["female_personen"] == [1002]

    en, result_href = parse_projekt_en(_details_page(PROJEKT_EN, "en"))
    assert en["name_en"] == "Test Project Alpha"
    assert en["beschreibung_en"] == "This is the description."
    assert result_href == "/gepris/projekt/5000/ergebnisse"

    rde = parse_projekt_result(_details_page(RESULT_DE, "de"))
    assert rde["ergebnis_zusammenfassung_de"] == "Ergebniszusammenfassung deutsch."
    assert rde["attributes"] == {"ergebnis_erstellungsjahr": 2003}
    assert rde["ergebnis_publikationen"] == [
        ["Paper One", {"value": "doi:1", "path": "https://doi.example/1"}],
        [{"value": "doi:2", "path": "https://doi.example/2"}],
    ]

    ren = parse_projekt_result(_details_page(RESULT_EN, "en"), english=True)
    assert ren == {"ergebnis_zusammenfassung_en": "English result summary."}

    item = assemble_projekt(de, en, rde, ren)
    assert item["result"]["ergebnis_zusammenfassung_en"] == "English result summary."
    assert item["name_de"] == "Testprojekt Alpha" and item["name_en"] == "Test Project Alpha"


def test_duplicate_same_normalised_person_key_raises():
    # two *different* raw keys mapping to the same normalised person field
    # must raise (project_attributes.py:393-395)
    html = PROJEKT_DE.replace(
        '<span class="name">Leiterin</span>',
        '<span class="name">Antragstellerinnen</span>',
    )
    with pytest.raises(ValueError):
        parse_projekt_de(_details_page(html, "de"), 5000)


PERSON = """
<h1 class="facelift">Professorin Dr. Erika Musterfrau (&#8224;)</h1>
<div class="content_inside">
<div class="details">
  <p><span class="name">Adresse</span><span class="value">Uni X<br/>Musterstra&#223;e 1</span></p>
  <p><span class="name">E-Mail</span><span class="value">erika<br/>example.de</span></p>
  <p><span class="name">Internet</span><span class="value"><a href="http://uni-x.de/erika">homepage</a></span></p>
  <p><span class="name">ORCID-ID</span><span class="value"><a href="https://orcid.org/0000-1">0000-1</a></span></p>
</div>
<div class="content_frame">
  <div id="projekteNachRolle"><ul>
    <li><a href="#">Als Antragstellerin</a><ul>
      <li><a href="/gepris/projekt/111">P A</a></li>
      <li><a href="/gepris/projekt/222">P B</a></li>
    </ul></li>
  </ul></div>
  <div id="preise"><ul>
    <li><a href="#">Leibniz-Preis</a><ul>
      <li><a href="https://www.dfg.de/leibniz">2001 Preis</a></li>
    </ul></li>
  </ul></div>
</div>
</div>
"""


def test_person():
    item = parse_person(_details_page(PERSON, "de"), 77)
    assert item["id"] == 77
    # crucifix removed, trailing space kept (reference semantics)
    assert item["name_de"] == "Professorin Dr. Erika Musterfrau "
    assert item["verstorben"] is True
    assert item["gender"] == "female"
    assert item["attributes"] == {
        "adresse": "Uni X, Musterstraße 1",
        "mail": "erika@example.de",
        "internet": "uni-x.de/erika",
        "orcid_id": "0000-1",
    }
    assert item["trees"] == {
        "normalised_projects": [{"Als Antragstellerin": ["111", "222"]}],
        "normalised_prices": {
            "Leibniz-Preis": [{"value": "2001 Preis", "path": "www.dfg.de/leibniz"}]
        },
    }


INSTITUTION = """
<h1 class="facelift">Uni X<br/>Fakult&#228;t Y</h1>
<div class="content_inside">
<div id="address_data">
  <p><span class="name">Adresse</span><span class="value">Campusweg 5<br/>12345 Stadt</span></p>
  <p><span class="name">Internet</span><span class="value"><a href="https://uni-x.de">uni-x.de</a></span></p>
</div>
<div class="content_frame">
  <div id="untergeordneteInstitutionen"><ul>
    <li><a href="/gepris/institution/2">Sub A</a></li>
    <li><a href="/gepris/institution/3">Sub B</a><ul>
      <li><a href="/gepris/institution/4">Sub B1</a></li>
    </ul></li>
  </ul></div>
</div>
</div>
"""


def test_institution():
    item = parse_institution(_details_page(INSTITUTION, "de"), 1)
    assert item["name_de"] == "Uni X, Fakultät Y"
    assert item["attributes"] == {
        "adresse": "Campusweg 5, 12345 Stadt",
        "internet": "uni-x.de",
    }
    assert item["trees"] == {"normalised_subinstitutions": ["2", {"3": ["4"]}]}


def test_validators():
    ok = _details_page(PROJEKT_DE, "de")
    check_details_structure(ok)
    check_details_exists(ok)
    check_language(ok, "de")
    with pytest.raises(UnexpectedLanguageError):
        check_language(ok, "en")
    broken = parse_html("<html><body><h1>x</h1></body></html>")
    with pytest.raises(UnexpectedDetailsPageStructure):
        check_details_structure(broken)
    moved = _details_page("", "de", title="Die angeforderte Seite konnte nicht gefunden werden.")
    with pytest.raises(PageDoesNotExistAnymoreError):
        check_details_exists(moved)

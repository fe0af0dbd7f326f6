"""Closed-world attribute dictionaries (data, not code).

These hand-maintained German-label → normalised-field maps are copied
as *data* from the reference (SURVEY.md §7.1 step 3):

- ``PROJEKT_ATTRIBUTES_MAP`` — normalisation/project_attributes.py:123-218
- ``PROJEKT_PERSON_GENDER_MAP`` — project_attributes.py:225-297
- ``PERSON_ATTRIBUTES_MAP`` — person_attributes.py:15-22
- ``INSTITUTION_ATTRIBUTES_MAP`` — institution_attributes.py:14-20
- ``PROJEKT_RESULT_ATTRIBUTES_MAP`` — project_result_attributes.py:7-9
- ``DATA_MONITOR_KEYS`` — gepris_helper.py:10-26
- reference-field enumerations — project_attributes.py:37-121 and the
  SQL enums at database/init/dfg-gepris.sql:66-97.

An attribute key missing from its map raises ``UnexpectedFieldError``
(closed-world contract, normalisation/normalisation.py:6-8).
"""

# --- person reference fields (project_attributes.py:11-55) ----------------
PERSONEN_REFERENCES = [
    "antragsteller_personen",
    "auslaendische_antragsteller_personen",
    "ehemalige_antragsteller_personen",
    "mit_antragsteller_personen",
    "sprecher_personen",
    "auslaendische_sprecher_personen",
    "co_sprecher_personen",
    "leiter_personen",
    "stellvertreter_personen",
    "teilprojekt_leiter_personen",
    "gastgeber_personen",
    "kooperationspartner_personen",
    "beteiligte_personen",
    "beteiligte_wissenschaftler_personen",
    "mit_verantwortliche_personen",
    "igk_personen",
    "stellvertreter_sprecher_personen",
]

# --- institution reference fields (project_attributes.py:57-88) -----------
INSTITUTIONEN_REFERENCES = [
    "antragstellende_institutionen",
    "mit_antragstellende_institutionen",
    "beteiligte_institutionen",
    "beteiligte_einrichtungen_institutionen",
    "beteiligte_hochschule_institutionen",
    "partner_institutionen",
    "partner_organisation_institutionen",
    "unternehmen_institutionen",
    "auslaendische_institutionen",
    "igk_institutionen",
]

# --- other project attributes (project_attributes.py:90-121) --------------
DFG_ANSPRECHPARTNER = "dfg_ansprechpartner"
INTERNATIONALER_BEZUG = "internationaler_bezug"
GROSS_GERAETE = "gross_geraete"
GERAETEGRUPPE = "geraetegruppe"
DFG_VERFAHREN = "dfg_verfahren"
FACHRICHTUNGEN = "fachrichtungen"
FACHLICHE_ZUORDNUNGEN = "fachliche_zuordnungen"
WEBSEITE = "webseite"
TEIL_PROJEKT = "teil_projekt"
PROJEKT_KENNUNG = "projekt_kennung"
FOERDERUNG_ZEITRAUM = "foerderung_zeitraum"
FOERDERUNG_BEGINN = "foerderung_beginn"
FOERDERUNG_ENDE = "foerderung_ende"

OTHER_PROJEKT_ATTRIBUTES = [
    DFG_ANSPRECHPARTNER,
    INTERNATIONALER_BEZUG,
    GROSS_GERAETE,
    GERAETEGRUPPE,
    DFG_VERFAHREN,
    FACHRICHTUNGEN,
    FACHLICHE_ZUORDNUNGEN,
    WEBSEITE,
    TEIL_PROJEKT,
    PROJEKT_KENNUNG,
    FOERDERUNG_ZEITRAUM,
    FOERDERUNG_BEGINN,
    FOERDERUNG_ENDE,
]

# --- the ~100-entry raw-label map (project_attributes.py:123-218) ---------
PROJEKT_ATTRIBUTES_MAP = {
    "Antragstellende Institution": "antragstellende_institutionen",
    "Antragsteller": "antragsteller_personen",
    "Antragstellerin": "antragsteller_personen",
    "Antragstellerinnen": "antragsteller_personen",
    "Antragstellerinnen / Antragsteller": "antragsteller_personen",
    "Anwendungspartner": "partner_institutionen",
    "Beteiligte Einrichtung": "beteiligte_einrichtungen_institutionen",
    "Beteiligte Fachrichtungen": "fachrichtungen",
    "Beteiligte Hochschule": "beteiligte_hochschule_institutionen",
    "Beteiligte Institution": "beteiligte_institutionen",
    "Beteiligte Person": "beteiligte_personen",
    "Beteiligte Personen": "beteiligte_personen",
    "Co-Sprecher": "co_sprecher_personen",
    "Co-Sprecherin": "co_sprecher_personen",
    "Co-Sprecherinnen": "co_sprecher_personen",
    "Co-Sprecherinnen / Co-Sprecher": "co_sprecher_personen",
    "DFG-Verfahren": "dfg_verfahren",
    "Ehemalige Antragsteller": "ehemalige_antragsteller_personen",
    "Ehemalige Antragstellerin": "ehemalige_antragsteller_personen",
    "Ehemalige Antragstellerinnen": "ehemalige_antragsteller_personen",
    "Ehemalige Antragstellerinnen / Ehemalige Antragsteller": "ehemalige_antragsteller_personen",
    "Ehemaliger Antragsteller": "ehemalige_antragsteller_personen",
    "Fachliche Zuordnung": "fachliche_zuordnungen",
    "Förderung": "foerderung_zeitraum",
    "Gastgeber": "gastgeber_personen",
    "Gastgeberin": "gastgeber_personen",
    "Gastgeberinnen": "gastgeber_personen",
    "Gastgeberinnen / Gastgeber": "gastgeber_personen",
    "Gerätegruppe": "geraetegruppe",
    "Großgeräte": "gross_geraete",
    "Internationaler Bezug": "internationaler_bezug",
    "Kooperationspartner": "kooperationspartner_personen",
    "Kooperationspartnerin": "kooperationspartner_personen",
    "Kooperationspartnerinnen": "kooperationspartner_personen",
    "Kooperationspartnerinnen / Kooperationspartner": "kooperationspartner_personen",
    "Leiter": "leiter_personen",
    "Leiterin": "leiter_personen",
    "Leiterinnen": "leiter_personen",
    "Leiterinnen / Leiter": "leiter_personen",
    "Mitantragstellende Institution": "mit_antragstellende_institutionen",
    "Mitantragsteller": "mit_antragsteller_personen",
    "Mitantragstellerin": "mit_antragsteller_personen",
    "Mitantragstellerinnen": "mit_antragsteller_personen",
    "Mitantragstellerinnen / Mitantragsteller": "mit_antragsteller_personen",
    "Mitverantwortlich": "mit_verantwortliche_personen",
    "Mitverantwortlich(e)": "mit_verantwortliche_personen",
    "Mitverantwortliche": "mit_verantwortliche_personen",
    "Partnerorganisation": "partner_organisation_institutionen",
    "Projektkennung": "projekt_kennung",
    "Sprecher": "sprecher_personen",
    "Sprecherin": "sprecher_personen",
    "Sprecherinnen": "sprecher_personen",
    "Sprecherinnen / Sprecher": "sprecher_personen",
    "Stellvertreter": "stellvertreter_personen",
    "Stellvertreterin": "stellvertreter_personen",
    "Stellvertreterinnen": "stellvertreter_personen",
    "Stellvertreterinnen / Stellvertreter": "stellvertreter_personen",
    "Teilprojekt zu": "teil_projekt",
    "Teilprojektleiter": "teilprojekt_leiter_personen",
    "Teilprojektleiterin": "teilprojekt_leiter_personen",
    "Teilprojektleiterinnen": "teilprojekt_leiter_personen",
    "Teilprojektleiterinnen / Teilprojektleiter": "teilprojekt_leiter_personen",
    "Unternehmen": "unternehmen_institutionen",
    "Webseite": "webseite",
    "ausländ. Mitantragstelleirinnen": "auslaendische_antragsteller_personen",
    "ausländ. Mitantragstelleirinnen / ausländische Mitantragsteller": "auslaendische_antragsteller_personen",
    "ausländ. Mitantragstellerinnen": "auslaendische_antragsteller_personen",
    "ausländ. Mitantragstellerinnen / ausländische Mitantragsteller": "auslaendische_antragsteller_personen",
    "ausländ. Mitantragstellerin": "auslaendische_antragsteller_personen",
    "ausländischer Mitantragsteller": "auslaendische_antragsteller_personen",
    "ausländische Mitantragsteller": "auslaendische_antragsteller_personen",
    "ausländische Institution": "auslaendische_institutionen",
    "ausländischer Sprecher": "auslaendische_sprecher_personen",
    "ausländische Sprecher": "auslaendische_sprecher_personen",
    "ausländische Sprecherin": "auslaendische_sprecher_personen",
    "ausländische Sprecherinnen": "auslaendische_sprecher_personen",
    "ausländische Sprecherinnen / ausländische Sprecher": "auslaendische_sprecher_personen",
    "beteiligte Wissenschaftler": "beteiligte_wissenschaftler_personen",
    "beteiligte Wissenschaftlerin": "beteiligte_wissenschaftler_personen",
    "beteiligte Wissenschaftlerinnen": "beteiligte_wissenschaftler_personen",
    "beteiligte Wissenschaftlerinnen / beteiligte Wissenschaftler": "beteiligte_wissenschaftler_personen",
    "beteiligter Wissenschaftler": "beteiligte_wissenschaftler_personen",
    "fachliche DFG-Ansprechpartnerin": "dfg_ansprechpartner",
    "fachlicher DFG-Ansprechpartner": "dfg_ansprechpartner",
    "Sprecher (IGK-Partner)": "igk_personen",
    "Sprecherin (IGK-Partner)": "igk_personen",
    "Sprecherinnen (IGK-Partner)": "igk_personen",
    "Sprecherinnen (IGK-Partner) / Sprecher (IGK-Partner)": "igk_personen",
    "IGK-Partnerinstitution": "igk_institutionen",
    "stellvertr. Sprecher": "stellvertreter_sprecher_personen",
    "stellvertr. Sprecherin": "stellvertreter_sprecher_personen",
    "stellvertr. Sprecherinnen": "stellvertreter_sprecher_personen",
    "stellvertr. Sprecherinnen / stellvertr. Sprecher": "stellvertreter_sprecher_personen",
}

MALE, FEMALE, UNKNOWN = "male", "female", "unknown"

# --- raw person-label → guessed gender (project_attributes.py:225-297) ----
PROJEKT_PERSON_GENDER_MAP = {
    "Antragsteller": MALE,
    "Antragstellerin": FEMALE,
    "Antragstellerinnen": FEMALE,
    "Antragstellerinnen / Antragsteller": UNKNOWN,
    "Beteiligte Person": UNKNOWN,
    "Beteiligte Personen": UNKNOWN,
    "Co-Sprecher": MALE,
    "Co-Sprecherin": FEMALE,
    "Co-Sprecherinnen": FEMALE,
    "Co-Sprecherinnen / Co-Sprecher": UNKNOWN,
    "Ehemalige Antragsteller": MALE,
    "Ehemalige Antragstellerin": FEMALE,
    "Ehemalige Antragstellerinnen": FEMALE,
    "Ehemalige Antragstellerinnen / Ehemalige Antragsteller": UNKNOWN,
    "Ehemaliger Antragsteller": MALE,
    "Gastgeber": MALE,
    "Gastgeberin": FEMALE,
    "Gastgeberinnen": FEMALE,
    "Gastgeberinnen / Gastgeber": UNKNOWN,
    "Kooperationspartner": MALE,
    "Kooperationspartnerin": FEMALE,
    "Kooperationspartnerinnen": FEMALE,
    "Kooperationspartnerinnen / Kooperationspartner": UNKNOWN,
    "Leiter": MALE,
    "Leiterin": FEMALE,
    "Leiterinnen": FEMALE,
    "Leiterinnen / Leiter": UNKNOWN,
    "Mitantragsteller": MALE,
    "Mitantragstellerin": FEMALE,
    "Mitantragstellerinnen": FEMALE,
    "Mitantragstellerinnen / Mitantragsteller": UNKNOWN,
    "Mitverantwortlich": MALE,
    "Mitverantwortlich(e)": FEMALE,
    "Mitverantwortliche": UNKNOWN,
    "Sprecher": MALE,
    "Sprecherin": FEMALE,
    "Sprecherinnen": FEMALE,
    "Sprecherinnen / Sprecher": UNKNOWN,
    "Stellvertreter": MALE,
    "Stellvertreterin": FEMALE,
    "Stellvertreterinnen": FEMALE,
    "Stellvertreterinnen / Stellvertreter": UNKNOWN,
    "Teilprojektleiter": MALE,
    "Teilprojektleiterin": FEMALE,
    "Teilprojektleiterinnen": FEMALE,
    "Teilprojektleiterinnen / Teilprojektleiter": UNKNOWN,
    "ausländ. Mitantragstelleirinnen": FEMALE,
    "ausländ. Mitantragstelleirinnen / ausländische Mitantragsteller": UNKNOWN,
    "ausländ. Mitantragstellerinnen": FEMALE,
    "ausländ. Mitantragstellerinnen / ausländische Mitantragsteller": UNKNOWN,
    "ausländ. Mitantragstellerin": FEMALE,
    "ausländischer Mitantragsteller": MALE,
    "ausländische Mitantragsteller": MALE,
    "ausländischer Sprecher": MALE,
    "ausländische Sprecher": MALE,
    "ausländische Sprecherin": FEMALE,
    "ausländische Sprecherinnen": FEMALE,
    "ausländische Sprecherinnen / ausländische Sprecher": UNKNOWN,
    "beteiligte Wissenschaftler": MALE,
    "beteiligte Wissenschaftlerin": FEMALE,
    "beteiligte Wissenschaftlerinnen": FEMALE,
    "beteiligte Wissenschaftlerinnen / beteiligte Wissenschaftler": UNKNOWN,
    "beteiligter Wissenschaftler": MALE,
    "Sprecher (IGK-Partner)": MALE,
    "Sprecherin (IGK-Partner)": FEMALE,
    "Sprecherinnen (IGK-Partner)": FEMALE,
    "Sprecherinnen (IGK-Partner) / Sprecher (IGK-Partner)": UNKNOWN,
    "stellvertr. Sprecher": MALE,
    "stellvertr. Sprecherin": FEMALE,
    "stellvertr. Sprecherinnen": FEMALE,
    "stellvertr. Sprecherinnen / stellvertr. Sprecher": UNKNOWN,
}

# --- person / institution / result maps -----------------------------------
PERSON_ATTRIBUTES_MAP = {
    "Adresse": "adresse",
    "E-Mail": "mail",
    "Internet": "internet",
    "Telefax": "telefax",
    "Telefon": "telefon",
    "ORCID-ID": "orcid_id",
}

INSTITUTION_ATTRIBUTES_MAP = {
    "Adresse": "adresse",
    "E-Mail": "mail",
    "Internet": "internet",
    "Telefax": "telefax",
    "Telefon": "telefon",
}

PROJEKT_RESULT_ATTRIBUTES_MAP = {
    "Erstellungsjahr": "ergebnis_erstellungsjahr",
}

# --- data monitor label map (gepris_helper.py:10-26) ----------------------
DATA_MONITOR_KEYS = {
    "Projekte mit Abschlussberichten": "finished_project_count",
    "Projekte f�r die Abschlussberichtsdaten in GEPRIS vorliegen": "finished_project_count",
    "Projekte für die Abschlussberichtsdaten in GEPRIS vorliegen": "finished_project_count",
    "Projekt": "project_count",
    "Projekte": "project_count",
    "Person": "person_count",
    "Personen": "person_count",
    "Institution": "institution_count",
    "Institutionen": "institution_count",
    "Geistes- und Sozialwissenschaften": "humanities_count",
    "Lebenswissenschaften": "life_count",
    "Naturwissenschaften": "natural_count",
    "Ingenieurwissenschaften": "engineering_count",
    "Infrastrukturförderung": "infrastructure_count",
    "Forschungsinfrastruktur": "research_infrastructure_count",
}

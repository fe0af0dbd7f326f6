from dfg_gepris_crawler_ray.kernels.htmlmini import parse_html


WELL_FORMED = "<html><body><div class='a b'><p>x</p>tail<br/>more</div></body></html>"
TAG_SOUP = "<!DOCTYPE html><html><body><div class=a><p>x<br>more</div></body></html>"


def test_fast_path_structure():
    root = parse_html(WELL_FORMED)
    div = root.find(tag="div")
    assert div.has_class("a") and div.has_class("b")
    assert [c for c in div.children if isinstance(c, str)] == ["tail", "more"]
    assert [e.tag for e in div.child_elems()] == ["p", "br"]
    assert list(div.iter_texts()) == ["x", "tail", "more"]


def test_fallback_parser_unclosed_tags():
    root = parse_html(TAG_SOUP)
    div = root.find(tag="div")
    assert div is not None and div.get("class") == "a"
    # <br> is void: 'more' is a sibling text, p absorbed 'x'
    assert "more" in list(div.iter_texts())
    assert "x" in list(div.iter_texts())


def test_bytes_input_and_entities():
    root = parse_html("<html><p>a &#228; b</p></html>".encode())
    assert list(root.iter_texts()) == ["a ä b"]


def test_named_entity_falls_back():
    root = parse_html("<html><p>a&nbsp;b</p></html>")
    assert "a\xa0b" in list(root.iter_texts())

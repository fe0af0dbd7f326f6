"""Tests for the ItemLoader mini-algebra (public itemloaders semantics)."""

from dfg_gepris_crawler_ray.kernels.loadalg import (
    Compose,
    Identity,
    Join,
    MapCompose,
    RecordLoader,
    TakeFirst,
    arg_to_iter,
)


def test_arg_to_iter():
    assert list(arg_to_iter(None)) == []
    assert list(arg_to_iter("ab")) == ["ab"]
    assert list(arg_to_iter({"a": 1})) == [{"a": 1}]
    assert list(arg_to_iter([1, 2])) == [1, 2]
    assert list(arg_to_iter(3)) == [3]


def test_mapcompose_drop_and_flatten():
    mc = MapCompose(lambda v: None if v == "x" else v, lambda v: [v, v] if v == "d" else v)
    assert mc(["x", "a", "d"]) == ["a", "d", "d"]


def test_mapcompose_nested():
    inner = MapCompose(int)
    outer = MapCompose(lambda p: p.split("/")[-1], inner)
    assert outer(["/gepris/projekt/123"]) == [123]


def test_compose_stop_on_none():
    c = Compose(lambda v: None, lambda v: 1 / 0)
    assert c([1]) is None


def test_take_first_skips_none_and_empty():
    assert TakeFirst()([None, "", "a", "b"]) == "a"
    assert TakeFirst()([]) is None


def test_join():
    assert Join(", ")(["a", "b"]) == "a, b"


class _L(RecordLoader):
    input_processors = {"tags": MapCompose(lambda v: None if v == "drop" else v)}
    output_processors = {"tags": Identity(), "name": Join()}


def test_record_loader_semantics():
    ld = _L()
    ld.add_value("name", "Max")
    ld.add_value("name", "Mustermann")
    ld.add_value("tags", ["a", "drop", "b"])
    ld.add_value("tags", "drop")  # fully dropped input → no effect
    ld.add_value("missing", None)  # None → [] → not collected
    item = ld.load_item()
    assert item == {"name": "Max Mustermann", "tags": ["a", "b"]}


def test_record_loader_none_output_omitted():
    class L2(RecordLoader):
        output_processors = {"x": Compose(lambda v: None)}

    ld = L2()
    ld.add_value("x", "v")
    assert ld.load_item() == {}

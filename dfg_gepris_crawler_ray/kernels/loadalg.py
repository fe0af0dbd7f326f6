"""A tiny re-implementation of the ItemLoader processor algebra.

The reference declares all its field pipelines with the ``itemloaders``
processors (``gepris_crawler/items.py:86-180``):
``MapCompose`` (per-element chain with None-drop + list flattening),
``Compose`` (whole-list chain, stop on None), ``TakeFirst``, ``Join``,
``Identity`` — plus the ``ItemLoader.add_value``/``load_item``
collection semantics (falsy processed inputs dropped, None outputs
omitted from the item). Those exact drop/flatten/collapse semantics
are load-bearing for byte-identical output, so we re-implement the
~60-line algebra here (public itemloaders behavior, no code copied)
and use it inside batch UDFs.
"""

from __future__ import annotations

__all__ = [
    "arg_to_iter",
    "Identity",
    "TakeFirst",
    "Join",
    "MapCompose",
    "Compose",
    "RecordLoader",
]


def arg_to_iter(value):
    """None → []; str/bytes/dict → [x]; other iterables → as-is; else [x]."""
    if value is None:
        return []
    if isinstance(value, (str, bytes, dict)):
        return [value]
    if hasattr(value, "__iter__"):
        return value
    return [value]


class Identity:
    def __call__(self, values):
        return values


class TakeFirst:
    """First value that is neither None nor the empty string."""

    def __call__(self, values):
        for value in values:
            if value is not None and value != "":
                return value
        return None


class Join:
    def __init__(self, separator: str = " "):
        self.separator = separator

    def __call__(self, values):
        return self.separator.join(values)


class MapCompose:
    """Per-element function chain with None-drop and list flattening."""

    def __init__(self, *functions):
        self.functions = functions

    def __call__(self, value):
        values = list(arg_to_iter(value))
        for func in self.functions:
            next_values = []
            for v in values:
                next_values.extend(arg_to_iter(func(v)))
            values = next_values
        return values


class Compose:
    """Whole-value function chain; stops when the value becomes None."""

    def __init__(self, *functions, stop_on_none: bool = True):
        self.functions = functions
        self.stop_on_none = stop_on_none

    def __call__(self, value):
        for func in self.functions:
            if value is None and self.stop_on_none:
                break
            value = func(value)
        return value


class RecordLoader:
    """Collects field values through (input, output) processor pairs.

    Semantics mirrored from the public ItemLoader behavior the
    reference relies on (items.py:86-180):

    - ``add_value``: the raw value is wrapped via ``arg_to_iter``, run
      through the field's input processor, and — only when the result
      is truthy — extended onto the field's value list.
    - ``load_item``: each collected field runs through its output
      processor; ``None`` results are omitted from the record.
    - defaults: input ``Identity``, output per-loader default
      (``TakeFirst`` for the reference's detail loaders).
    """

    #: field -> input processor (callable over an iterable of values)
    input_processors: dict = {}
    #: field -> output processor (callable over the collected list)
    output_processors: dict = {}
    default_input = Identity()
    default_output = TakeFirst()

    def __init__(self):
        self._values: dict[str, list] = {}

    def _in(self, field):
        return self.input_processors.get(field, self.default_input)

    def _out(self, field):
        return self.output_processors.get(field, self.default_output)

    def add_value(self, field: str, value) -> None:
        processed = self._in(field)(list(arg_to_iter(value)))
        if processed:
            self._values.setdefault(field, [])
            self._values[field].extend(arg_to_iter(processed))

    def load_item(self) -> dict:
        item = {}
        for field in tuple(self._values):
            out = self._out(field)(self._values[field])
            if out is not None:
                item[field] = out
        return item

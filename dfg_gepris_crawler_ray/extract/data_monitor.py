"""Data-monitor page parser (spiders/data_monitor.py + items.py:172-180).

Produces the 15-field stats item: 10 int counters, two dates, version
strings and the Europe/Berlin-localised index timestamp. Dates and
datetimes are returned as ISO strings (canonical JSON storage).
"""

from __future__ import annotations

import re

from ..kernels.dates import to_datetime
from ..kernels.htmlmini import Node
from ..kernels.loadalg import Compose, RecordLoader, TakeFirst
from ..normalise.attribute_maps import DATA_MONITOR_KEYS

_take_first = TakeFirst()


class DataMonitorLoader(RecordLoader):
    """items.py:172-180 — default output ``Compose(TakeFirst(), int)``."""

    default_output = Compose(_take_first, int)
    output_processors = {
        "last_update": Compose(
            _take_first, lambda x: to_datetime(x, "%d.%m.%Y", only_date=True).isoformat()
        ),
        "last_approval": Compose(
            _take_first, lambda x: to_datetime(x, "%d.%m.%Y", only_date=True).isoformat()
        ),
        "gepris_version": _take_first,
        "current_index_version": _take_first,
        "current_index_date": Compose(
            _take_first,
            lambda x: to_datetime(
                x, "%a %b %d %H:%M:%S %Y", only_date=False, remove_timezone=True
            ).isoformat(),
        ),
    }


def _extract_date(root: Node, prefix: str):
    """``//*[starts-with(text(), prefix)]/text()`` (data_monitor.py:30-31)."""
    def first_text(el):
        for c in el.children:
            if isinstance(c, str):
                return c
        return None

    for el in root.iter_elems():
        t = first_text(el)
        if t is not None and t.startswith(prefix):
            return t.removeprefix(prefix)
    return None


def _extract_index_data(root: Node, regex: str):
    """regex over ``.geprisversionsinfo`` text (data_monitor.py:33-34)."""
    pattern = re.compile(regex)
    for el in root.iter_elems():
        if el.get("class") == "geprisversionsinfo":
            for t in el.child_texts():
                m = pattern.search(t)
                if m:
                    return m.group(1) if m.groups() else m.group(0)
    return None


def parse_data_monitor(root: Node) -> dict:
    """data_monitor.py:16-28"""
    loader = DataMonitorLoader()
    loader.add_value("last_update", _extract_date(root, "Letzte Aktualisierung der Daten: "))
    loader.add_value("last_approval", _extract_date(root, "Aktuellstes Bewilligungsdatum: "))
    loader.add_value("gepris_version", _extract_index_data(root, r"aktuelle Gepris-Version: (.*)"))
    loader.add_value(
        "current_index_version", _extract_index_data(root, r"aktuelle Index-Version: (.*) \(")
    )
    loader.add_value(
        "current_index_date",
        _extract_index_data(root, r"aktuelle Index-Version: (?:.*) \((.*)\)"),
    )
    for tbody in root.find_all(tag="tbody"):
        for row in tbody.child_elems("tr"):
            texts = [t for td in row.child_elems("td") for t in td.child_texts()]
            if len(texts) != 2:
                continue
            page_key, value = texts
            item_key = DATA_MONITOR_KEYS[page_key.strip()]
            loader.add_value(item_key, value)
    return loader.load_item()

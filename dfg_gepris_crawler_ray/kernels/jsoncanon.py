"""Canonical JSON encoding for nested item cells.

Arrow has no recursive types, so the reference's recursive structures
(reference trees — ``spiders/base.py:172-205``; normalised trees —
``normalisation/trees.py``) and the whole item payload are stored as
canonical JSON strings — the same information Postgres JSONB holds in
the reference (``database/init/dfg-gepris.sql:28,40``).

Canonical = sorted keys, no whitespace, UTF-8 (ensure_ascii=False),
dates/datetimes as ISO-8601 strings. Two semantically equal items
serialise to byte-identical strings, which makes change detection
(J2's ``IS DISTINCT FROM`` — ``database.py:80-96``) a plain string
comparison.
"""

from __future__ import annotations

import json
from datetime import date, datetime


def _default(o):
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    if isinstance(o, set):
        return sorted(o)
    raise TypeError(f"not JSON serialisable: {type(o)!r}")


def dumps_canonical(obj) -> str:
    """Deterministic JSON string for equality/change-detection."""
    return json.dumps(obj, sort_keys=True, ensure_ascii=False,
                      separators=(",", ":"), default=_default)


def loads(s: str):
    return json.loads(s)

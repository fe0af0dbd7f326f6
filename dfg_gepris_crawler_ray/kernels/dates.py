"""Date/time kernels (Europe/Berlin localisation like the reference).

Mirrors ``gepris_crawler/data_transformations.py:6,94-98``: parse with
``strptime``, localise to Europe/Berlin, optionally reduce to a date,
optionally strip a ``CEST``/``CET`` token first. Used by the
data-monitor extractor (``items.py:172-180``).

For Arrow/Parquet storage we serialise these as ISO strings inside the
canonical item JSON (what Postgres JSONB effectively stores), keeping
Arrow timestamp columns tz-naive everywhere else.
"""

from __future__ import annotations

import re
from datetime import datetime

from pytz import timezone

CEST = timezone("Europe/Berlin")


def to_datetime(value: str, dateformat: str, only_date: bool = False,
                remove_timezone: bool = False):
    """data_transformations.py:94-98"""
    if remove_timezone:
        value = re.sub(r"CES?T ", "", value)
    dt = CEST.localize(datetime.strptime(value, dateformat))
    return dt.date() if only_date else dt

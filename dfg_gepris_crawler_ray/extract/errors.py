"""Typed extraction/validation errors.

Mirrors ``gepris_crawler/custom_exceptions.py``: these drive the
retry-with-refresh / moved-tombstone / error-record paths
(``middlewares.py:15-66``). In our engine they are raised inside the
per-row extract UDF and converted into ``status`` values
(``success`` / ``error`` / ``moved``) after bounded retries — errors
become data, not job failures.
"""


class UnexpectedLanguageError(Exception):
    """Page language does not match the request's expectation (middlewares.py:106-114)."""


class PageDoesNotExistAnymoreError(Exception):
    """Page-not-found title on a formerly existing page (middlewares.py:88-103)."""


class UnexpectedDetailsPageStructure(Exception):
    """Details page misses the invariant markers (middlewares.py:69-85)."""


class UnexpectedFieldError(Exception):
    """Closed-world normalisation hit an unknown key (normalisation/normalisation.py:6-8)."""

"""Run-outcome classification — the EmailNotifierPipeline semantics
(pipelines.py:60-139) minus SMTP.

The reference emails a subject line per run; which line (or none) is a
pure function of the run's counters, the expected-item lookup (J11,
pipelines.py:127-139), and the data-monitor version change (ST7). This
module reproduces that decision table and exact subject format so a
driver loop can route the result to any alerting sink. No network.
"""

from __future__ import annotations

from .runs import get_latest_dm_stat

DETAIL_MAIL_SUCCESS_MIN_ITEMS = 10_000  # pipelines.py:63


def expected_items(
    spider: str,
    context: str | None,
    store=None,
    total_items: int | None = None,
    num_ids: int | None = None,
) -> int | None:
    """J11 (pipelines.py:127-139): data_monitor → 1; search projekt →
    latest data-monitor project_count, falling back to the listing's
    reported total; search person/institution → listing total (the
    search listing is known-incomplete for those contexts); details →
    the frontier batch size."""
    if spider == "data_monitor":
        return 1
    if spider == "search_results":
        if context == "projekt" and store is not None:
            dm = get_latest_dm_stat(store, "project_count")
            if dm is not None:
                return int(dm)
        return total_items
    if spider == "details":
        return num_ids
    raise ValueError(f"unknown spider {spider!r}")


def build_subject(
    spider: str,
    context: str | None,
    status: str,
    actual_items: int,
    expected: int | None,
    additional_message: str | None = None,
) -> str:
    """pipelines.py:109-125 — byte-identical subject format."""
    context_string = "" if spider == "data_monitor" else f" - context '{context}'"
    difference = actual_items - (expected or 0)
    if difference != 0:
        items_string = f" - {actual_items} ({difference}) items"
    else:
        items_string = f" - {actual_items} items"
    additional = "" if additional_message is None else f" - {additional_message}"
    return (
        f"{status} - GeprisCrawler - Spider '{spider}'"
        f"{context_string}{items_string}{additional}"
    )


def classify_run(
    spider: str,
    context: str | None,
    scraped_items: int,
    moved_items: int = 0,
    expected: int | None = None,
    had_error: bool = False,
    new_gepris_version: str | None = None,
) -> tuple[str, str] | None:
    """The close_spider decision table (pipelines.py:91-107):

    - had_error                        → ('Error',   subject)
    - scraped+moved != expected        → ('Warning', subject)
    - data_monitor & version changed   → ('Warning', subject + version)
    - details & > 10k items            → ('Success', subject)
    - else                             → None  (no notification)

    ``scraped_items + moved_items`` is the reference's actual count
    (item_scraped_count + item_moved_count, pipelines.py:92-93).
    """
    actual = scraped_items + moved_items
    if had_error:
        status, extra = "Error", None
    elif expected is None or actual != expected:
        status, extra = "Warning", None
    elif spider == "data_monitor" and new_gepris_version is not None:
        status, extra = "Warning", f"new gepris version {new_gepris_version}"
    elif spider == "details" and actual > DETAIL_MAIL_SUCCESS_MIN_ITEMS:
        status, extra = "Success", None
    else:
        return None
    return status, build_subject(spider, context, status, actual, expected, extra)


def notify_run(
    sink,
    spider: str,
    context: str | None,
    scraped_items: int,
    moved_items: int = 0,
    expected: int | None = None,
    had_error: bool = False,
    new_gepris_version: str | None = None,
    body: str | None = None,
) -> tuple[str, str] | None:
    """Delivery side of the notifier (reference pipelines.py:60-107):
    classify the finished run and, when a notification is due, invoke
    ``sink(status, subject, body)`` — the injectable replacement for
    the reference's SMTP send (``send_mail``, pipelines.py:69-77).
    Any callable works: SMTP, webhook, a test recorder. Returns the
    classification (None = no notification, like the reference's
    silent close)."""
    result = classify_run(
        spider,
        context,
        scraped_items,
        moved_items=moved_items,
        expected=expected,
        had_error=had_error,
        new_gepris_version=new_gepris_version,
    )
    if result is not None:
        status, subject = result
        sink(status, subject, body)
    return result

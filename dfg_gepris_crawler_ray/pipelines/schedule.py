"""The reference's cron cadence as a driver loop.

``docker/scheduler_cronfile`` schedules, per day: the data monitor,
then per context a search run followed by a budget-bounded
``db:needed`` details run (institution 200, person 200, projekt 500 —
cronfile:5-18), plus a monthly re-index rotation of ``db:all`` runs
(day-of-month mod 10 picks the context; cronfile:19-33). Each run is
one batch job here; a production deployment calls these from whatever
scheduler it has (cron, Airflow, a driver while-loop) — the cadence is
data, not infrastructure.
"""

from __future__ import annotations

from .notify import classify_run, expected_items
from .runs import run_data_monitor, run_details, run_search

#: cronfile:9-18 — daily incremental budgets, in schedule order
DAILY_NEEDED_BUDGETS = (("institution", 200), ("person", 200), ("projekt", 500))

#: cronfile:19-33 — day-of-month (mod 10) → (context, budget)
REINDEX_ROTATION = {
    1: ("institution", 50_000),
    2: ("projekt", 20_000),
    3: ("projekt", 20_000),
    4: ("projekt", 20_000),
    5: ("person", 50_000),
    6: ("projekt", 20_000),
    7: ("projekt", 20_000),
    8: ("projekt", 20_000),
    9: ("projekt", 20_000),
    0: ("person", 50_000),
}


def reindex_plan(day_of_month: int):
    """(context, budget) for the monthly rotation; None on the 31st
    (cronfile:23 — 'except for 31. of month, where nothing is done')."""
    if day_of_month == 31:
        return None
    return REINDEX_ROTATION[day_of_month % 10]


def run_daily_cycle(
    store,
    pages_dir: str,
    day_of_month: int | None = None,
    host_lookup=None,
    backend: str = "pandas",
) -> dict:
    """One scheduler day: monitor → per-context search + needed-details
    (+ the re-index run when ``day_of_month`` is given). Returns per-run
    results plus the notifier classification each run would have mailed
    (pipelines.notify).

    ``backend="ds"`` routes every search/details run through the
    Dataset-resident forms (``run_search_ds`` / ``run_details_ds``) so
    the cron cadence exercises the 10^10-key scale path end-to-end;
    the budgets and notifier classifications are identical (equivalence
    pinned in tests/test_schedule.py)."""
    if backend == "ds":
        from .runs import run_details_ds as _details
        from .runs import run_search_ds as _search
    elif backend == "pandas":
        _details, _search = run_details, run_search
    else:
        raise ValueError(f"unknown backend {backend!r}")
    out: dict = {"notifications": []}

    dm = run_data_monitor(store, pages_dir)
    out["data_monitor"] = dm
    note = classify_run(
        "data_monitor", None, scraped_items=1,
        expected=expected_items("data_monitor", None),
    )
    if note:
        out["notifications"].append(note)

    for context, budget in DAILY_NEEDED_BUDGETS:
        search = _search(store, pages_dir, context)
        out[f"search_{context}"] = search
        n_items = int(search["manifest"]["items"])
        note = classify_run(
            "search_results", context, scraped_items=n_items,
            expected=expected_items(
                "search_results", context, store,
                total_items=(search["totals"][0] if search["totals"] else None),
            ),
        )
        if note:
            out["notifications"].append(note)

        details = _details(
            store, pages_dir, context,
            ids_spec=f"db:needed:{budget}", host_lookup=host_lookup,
        )
        out[f"details_{context}"] = details
        counts = details["manifest"]["status_counts"]
        note = classify_run(
            "details", context,
            scraped_items=int(counts.get("success", 0)),
            moved_items=int(counts.get("moved", 0)),
            expected=expected_items(
                "details", context, num_ids=int(details["manifest"]["frontier_size"])
            ),
            had_error=bool(counts.get("error", 0)),
        )
        if note:
            out["notifications"].append(note)

    if day_of_month is not None:
        plan = reindex_plan(day_of_month)
        out["reindex_plan"] = plan
        if plan is not None:
            context, budget = plan
            out["reindex"] = _details(
                store, pages_dir, context,
                ids_spec=f"db:all:{budget}", host_lookup=host_lookup,
            )

    if backend == "ds":
        # standing store maintenance: every incremental ds save can
        # leave one file per upsert bucket; compact (crash-atomic
        # pointer-swap republish, no-op while the table is small) so
        # read amplification doesn't grow with cron days
        out["compacted_files"] = {
            t: store.compact_table_ds(t) for t in ("state", "history")
        }
    return out

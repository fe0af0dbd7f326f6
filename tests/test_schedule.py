"""Scheduler cadence (pipelines.schedule ≙ docker/scheduler_cronfile)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def test_reindex_rotation_matches_cronfile():
    from dfg_gepris_crawler_ray.pipelines.schedule import reindex_plan

    assert reindex_plan(1) == ("institution", 50_000)
    assert reindex_plan(11) == ("institution", 50_000)
    assert reindex_plan(2) == ("projekt", 20_000)
    assert reindex_plan(5) == ("person", 50_000)
    assert reindex_plan(10) == ("person", 50_000)
    assert reindex_plan(30) == ("person", 50_000)
    assert reindex_plan(31) is None


def test_daily_cycle_end_to_end(tmp_path):
    from dfg_gepris_crawler_ray.frontier import state as S
    from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
    from dfg_gepris_crawler_ray.pipelines.schedule import run_daily_cycle
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages, host_of

    store = CrawlStore(str(tmp_path / "store"))
    pages = ensure_pages(SF)
    out = run_daily_cycle(
        store, pages, day_of_month=2,
        host_lookup=lambda c, i: host_of(i - 1000),
    )
    # monitor ran and recorded the expected-count oracle for later days
    assert out["data_monitor"]["item"]["project_count"] == 136266
    # all three contexts searched and detail-crawled within budget
    for ctx, budget in (("institution", 200), ("person", 200), ("projekt", 500)):
        assert out[f"search_{ctx}"]["run_id"] > 0
        assert out[f"details_{ctx}"]["manifest"]["frontier_size"] <= budget
    # day 2 → projekt re-index
    assert out["reindex_plan"] == ("projekt", 20_000)
    assert out["reindex"]["manifest"]["context"] == "projekt"
    # state now has all three contexts durable
    state = store.load_table("state", S.empty_state())
    assert set(state["context"]) == {"projekt", "person", "institution"}
    # budget-bounded details on fresh state → scraped != expected or
    # errors → every details run produced a notification
    kinds = [n[0] for n in out["notifications"]]
    assert kinds.count("Error") + kinds.count("Warning") >= 1


def test_daily_cycle_ds_backend_matches_pandas(tmp_path):
    """The cron cadence through the Dataset-resident runs: identical
    frontier sizes, status counts, and durable state vs the pandas
    backend over the same corpus."""
    import pandas as pd

    from dfg_gepris_crawler_ray.frontier import state as S
    from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
    from dfg_gepris_crawler_ray.pipelines.schedule import run_daily_cycle
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages = ensure_pages(SF)
    a = CrawlStore(str(tmp_path / "pandas"))
    b = CrawlStore(str(tmp_path / "ds"))
    oa = run_daily_cycle(a, pages, day_of_month=2)
    ob = run_daily_cycle(b, pages, day_of_month=2, backend="ds")
    for ctx in ("institution", "person", "projekt"):
        ma = oa[f"details_{ctx}"]["manifest"]
        mb = ob[f"details_{ctx}"]["manifest"]
        assert ma["frontier_size"] == mb["frontier_size"], ctx
        assert ma["status_counts"] == mb["status_counts"], ctx
        assert oa[f"search_{ctx}"]["manifest"]["items"] == \
            ob[f"search_{ctx}"]["manifest"]["items"], ctx
    assert [n[0] for n in oa["notifications"]] == [n[0] for n in ob["notifications"]]

    def norm(df):
        df = df[S.STATE_COLUMNS].copy()
        for c in ("last_available_seen", "last_available_change", "last_detail_check"):
            df[c] = df[c].astype("Float64")
        for c in df.columns:
            df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
        return sorted(map(tuple, df.to_numpy().tolist()))

    sa = a.load_table("state", S.empty_state())
    sb = b.load_table_ds("state", S.empty_state()).to_pandas()
    assert norm(sa) == norm(sb)


def test_following_days_are_incremental(tmp_path):
    """Unchanged corpus: day 2 re-checks only what day 1's post-jobs
    flagged (J8 roots of moved sub-institutions — flagged AFTER that
    day's institution crawl); day 3 finds the frontier fully drained."""
    from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
    from dfg_gepris_crawler_ray.pipelines.schedule import run_daily_cycle
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    store = CrawlStore(str(tmp_path / "store"))
    pages = ensure_pages(SF)
    run_daily_cycle(store, pages)
    out2 = run_daily_cycle(store, pages)
    # persons/projekts were drained on day 1 (budgets exceed the corpus)
    assert out2["details_person"]["manifest"]["frontier_size"] == 0
    assert out2["details_projekt"]["manifest"]["frontier_size"] == 0
    # institutions: exactly the J8-flagged roots come back
    assert 0 < out2["details_institution"]["manifest"]["frontier_size"] < 10
    out3 = run_daily_cycle(store, pages)
    for ctx in ("institution", "person", "projekt"):
        assert out3[f"details_{ctx}"]["manifest"]["frontier_size"] == 0

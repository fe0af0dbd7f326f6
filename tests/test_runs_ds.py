"""The Dataset-resident details run equals the pandas run — full
lifecycle equivalence across J1/J3/J4/J5/J7/J8 (pipelines.runs
run_details_ds vs run_details)."""

import pandas as pd
import pytest

from dfg_gepris_crawler_ray.frontier import state as S
from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
from dfg_gepris_crawler_ray.pipelines.runs import (
    run_details,
    run_details_ds,
    run_search,
)
from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _norm_state(df: pd.DataFrame) -> list:
    df = df[S.STATE_COLUMNS].copy()
    for c in ("last_available_seen", "last_available_change", "last_detail_check"):
        df[c] = df[c].astype("Float64")
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    return sorted(map(tuple, df.to_numpy().tolist()))


def _norm_history(df: pd.DataFrame) -> list:
    df = df[S.HISTORY_COLUMNS].copy()
    df["created_at"] = df["created_at"].astype("Int64")
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    return sorted(map(tuple, df.to_numpy().tolist()))


def test_run_details_ds_matches_pandas(tmp_path):
    pages = ensure_pages(SF)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    person_ids = [1000 + d for d in range(n_docs) if d % 3 == 1]
    inst_ids = [1000 + d for d in range(n_docs) if d % 3 == 2]

    stores = {}
    for name in ("pandas", "ds"):
        store = CrawlStore(str(tmp_path / name))
        run_search(store, pages, "projekt")  # identical J2 state seed
        stores[name] = store

    # projekt run (J1 db-source + J3 + J4 + J5 expansion), then person
    # (J7) and institution (J7 + J8) runs over explicit id lists
    ra = run_details(stores["pandas"], pages, "projekt", ids_spec="db:all:0")
    rb = run_details_ds(stores["ds"], pages, "projekt", ids_spec="db:all:0")
    # db:all:0 is the frontier-resident regime: the selection never
    # collects, so only its cardinality is observable driver-side (the
    # J1 ORDER contract is pinned by test_state_ds's get_ids_ds tests
    # and the crawl_frontier_order gate query)
    assert rb["frontier"] is None and rb["manifest"]["frontier_resident"]
    assert rb["frontier_size"] == len(ra["frontier"])

    run_details(stores["pandas"], pages, "person", ids_spec=person_ids)
    run_details_ds(stores["ds"], pages, "person", ids_spec=person_ids)
    run_details(stores["pandas"], pages, "institution", ids_spec=inst_ids)
    run_details_ds(stores["ds"], pages, "institution", ids_spec=inst_ids)

    state_a = stores["pandas"].load_table("state", S.empty_state())
    state_b = stores["ds"].load_table_ds("state", S.empty_state()).to_pandas()
    assert _norm_state(state_b) == _norm_state(state_a)

    hist_a = stores["pandas"].load_table("history", S.empty_history())
    hist_b = stores["ds"].load_table_ds("history", S.empty_history()).to_pandas()
    assert _norm_history(hist_b) == _norm_history(hist_a)

    # a second identical projekt run must dedup history identically
    run_details(stores["pandas"], pages, "projekt", ids_spec="db:all:0")
    run_details_ds(stores["ds"], pages, "projekt", ids_spec="db:all:0")
    hist_a2 = stores["pandas"].load_table("history", S.empty_history())
    hist_b2 = stores["ds"].load_table_ds("history", S.empty_history()).to_pandas()
    assert _norm_history(hist_b2) == _norm_history(hist_a2)
    assert len(hist_a2) == len(hist_a)  # nothing changed → nothing appended


def test_run_search_ds_matches_pandas(tmp_path):
    """J2 change detection + J6 marking through the Dataset path equal
    the pandas search run, including across a second (changed) run."""
    from dfg_gepris_crawler_ray.pipelines.runs import run_search_ds

    pages = ensure_pages(SF)
    a = CrawlStore(str(tmp_path / "a"))
    b = CrawlStore(str(tmp_path / "b"))
    ra = run_search(a, pages, "projekt")
    rb = run_search_ds(b, pages, "projekt")
    assert ra["duplicate_ids"] == rb["duplicate_ids"]
    assert ra["totals"] == rb["totals"]
    state_a = a.load_table("state", S.empty_state())
    state_b = b.load_table_ds("state", S.empty_state()).to_pandas()
    assert _norm_state(state_b) == _norm_state(state_a)

    # second run: identical listings → seen advances, nothing flagged
    run_search(a, pages, "projekt")
    run_search_ds(b, pages, "projekt")
    state_a2 = a.load_table("state", S.empty_state())
    state_b2 = b.load_table_ds("state", S.empty_state()).to_pandas()
    assert _norm_state(state_b2) == _norm_state(state_a2)


def test_mixed_mode_store_interop(tmp_path):
    """A store written by the Dataset-resident runs is readable by the
    pandas runs and vice versa (handoff in both directions)."""
    from dfg_gepris_crawler_ray.pipelines.runs import run_search_ds

    pages = ensure_pages(SF)
    store = CrawlStore(str(tmp_path / "mix"))
    run_search_ds(store, pages, "projekt")  # ds-mode seed
    r = run_details(store, pages, "projekt", ids_spec="db:all:0")  # pandas takeover
    assert r["n_success"] > 0
    state = store.load_table("state", S.empty_state())
    assert (state["context"] == "projekt").sum() > 0
    # and back: a ds run on the pandas-era tables
    r2 = run_details_ds(store, pages, "projekt", ids_spec="db:all:0")
    assert r2["n_success"] == r["n_success"]


def test_run_search_ds_all_duplicates_caps_diagnostic(tmp_path):
    """On a corpus where EVERY listed id duplicates, the ds run's
    duplicate diagnostic stays bounded: the manifest/return carry the
    exact duplicate_count plus a first-64 ascending id SAMPLE — never
    the full state-cardinality list (the old path take_all()'d every
    duplicate id onto the driver and into the manifest)."""
    import glob
    import shutil

    from dfg_gepris_crawler_ray.pipelines.runs import run_search_ds

    pages = ensure_pages(SF)
    dup_dir = tmp_path / "dup_pages"
    dup_dir.mkdir()
    for f in glob.glob(f"{pages}/*.parquet"):
        base = f.split("/")[-1]
        shutil.copy(f, dup_dir / base)
        if base.startswith("search_pages"):
            # second copy of every listing page: every id now appears
            # twice across pages -> an all-duplicates pathology
            shutil.copy(f, dup_dir / f"search_pages-dup-{base.split('-')[-1]}")

    store = CrawlStore(str(tmp_path / "s"))
    r = run_search_ds(store, str(dup_dir), "projekt")

    # full duplicate census from the pandas reference run on the same
    # corpus (driver-resident by design — the small-mode backend)
    ra = run_search(CrawlStore(str(tmp_path / "a")), str(dup_dir), "projekt")
    full = ra["duplicate_ids"]
    assert len(full) > 64  # the pathology is big enough to exercise the cap

    assert r["duplicate_count"] == len(full)
    assert r["duplicate_ids"] == sorted(full)[:64]
    assert len(r["duplicate_ids"]) == 64
    assert r["manifest"]["duplicate_count"] == len(full)
    assert r["manifest"]["duplicate_ids"] == sorted(full)[:64]

"""Distributed state transitions equal the driver-side pandas ones
(frontier.state_ds)."""

import pandas as pd
import pytest

import ray.data

from dfg_gepris_crawler_ray.frontier import state as S
from dfg_gepris_crawler_ray.frontier.state_ds import (
    upsert_from_details_ds,
    upsert_from_search_ds,
)


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _norm(df: pd.DataFrame) -> list:
    df = df[S.STATE_COLUMNS].copy()
    for c in ("last_available_seen", "last_available_change", "last_detail_check"):
        df[c] = df[c].astype("Float64")  # int/float unification across splits
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    return sorted(map(tuple, df.to_numpy().tolist()))


def test_search_transition_matches_pandas():
    # run 1: 100 fresh keys; details run 2 clears flags; run 3: half the
    # keys disappear, a third change → J2 change detection + J6 marking
    obs1 = [(i, f'{{"id":{i}}}') for i in range(100)]
    st = S.upsert_from_search(S.empty_state(), obs1, "projekt", 1)
    st = S.upsert_from_details(st, [i for i, _ in obs1], "projekt", 2)
    obs3 = [
        (i, f'{{"id":{i},"v":2}}' if i % 3 == 0 else f'{{"id":{i}}}')
        for i in range(100)
        if i % 2 == 0
    ]
    want = S.mark_not_found(
        S.upsert_from_search(st.copy(), obs3, "projekt", 3), "projekt", 3
    )

    got = upsert_from_search_ds(
        ray.data.from_pandas(st),
        ray.data.from_pandas(pd.DataFrame(obs3, columns=["id", "item"])),
        "projekt",
        3,
    ).to_pandas()
    assert _norm(got) == _norm(want)


def test_history_append_matches_pandas():
    from dfg_gepris_crawler_ray.frontier.state_ds import insert_detail_items_ds

    runs = S.empty_runs()
    history = S.empty_history()
    for run in (1, 2):
        runs, run_id = S.store_run(runs, "details", "projekt", run)
        new = [
            dict(id=i, context="projekt", created_at=run_id,
                 item=f'{{"id":{i},"v":{run if i % 4 == 0 else 1}}}', status="success")
            for i in range(60)
        ]
        history = S.insert_detail_items(history, runs, new)
    # run 3: a third change again, the rest identical → only changes append
    runs, run_id = S.store_run(runs, "details", "projekt", 3)
    new3 = [
        dict(id=i, context="projekt", created_at=run_id,
             item=f'{{"id":{i},"v":{3 if i % 3 == 0 else (2 if i % 4 == 0 else 1)}}}',
             status="success")
        for i in range(60)
    ]
    want = S.insert_detail_items(history.copy(), runs, new3)
    got = insert_detail_items_ds(
        ray.data.from_pandas(history), runs, ray.data.from_pandas(pd.DataFrame(new3))
    ).to_pandas()
    key = lambda df: sorted(
        map(tuple, df[S.HISTORY_COLUMNS].astype(str).to_numpy().tolist())
    )
    assert key(got) == key(want)


def test_details_transition_matches_pandas():
    obs1 = [(i, f'{{"id":{i}}}') for i in range(50)]
    st = S.upsert_from_search(S.empty_state(), obs1, "person", 1)
    ids = set(range(25, 75))  # half known, half brand-new
    want = S.upsert_from_details(st.copy(), sorted(ids), "person", 2)
    got = upsert_from_details_ds(ray.data.from_pandas(st), ids, "person", 2).to_pandas()
    assert _norm(got) == _norm(want)

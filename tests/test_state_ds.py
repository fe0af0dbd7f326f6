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


def test_details_transition_matches_pandas():
    obs1 = [(i, f'{{"id":{i}}}') for i in range(50)]
    st = S.upsert_from_search(S.empty_state(), obs1, "person", 1)
    ids = set(range(25, 75))  # half known, half brand-new
    want = S.upsert_from_details(st.copy(), sorted(ids), "person", 2)
    got = upsert_from_details_ds(ray.data.from_pandas(st), ids, "person", 2).to_pandas()
    assert _norm(got) == _norm(want)

"""Distributed forms of the J5/J9 state operators match the
driver-side pandas forms."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def items(ray_session):
    from dfg_gepris_crawler_ray.pipelines.details import run_details_extraction
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    return run_details_extraction(ensure_pages(SF), num_buckets=8).materialize()


def test_all_reference_edges_matches_pandas_view(items, ray_session):
    from dfg_gepris_crawler_ray.frontier import state as S
    from dfg_gepris_crawler_ray.pipelines.derive import all_reference_edges

    latest = items.to_pandas()[["id", "context", "status", "item"]].assign(created_at=1)
    latest = latest[latest["status"] == "success"]
    for kind, view in (
        ("person", S.person_projekt_references),
        ("institution", S.institution_projekt_references),
    ):
        want = view(latest)
        got = all_reference_edges(items, kind).to_pandas()
        key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))
        assert key(got[want.columns]) == key(want)


def test_expand_person_frontier_via_seen_filter(items, ray_session):
    from dfg_gepris_crawler_ray.frontier.seen import SeenFilter
    from dfg_gepris_crawler_ray.pipelines.derive import (
        all_reference_edges,
        expand_person_frontier_ds,
    )

    referenced = sorted(
        set(all_reference_edges(items, "person").to_pandas()["person_id"])
    )
    known = referenced[: len(referenced) // 3]  # a third already crawled
    filt = SeenFilter(num_shards=4, mode="exact")
    filt.add([f"person/{i}" for i in known])

    new = sorted(expand_person_frontier_ds(items, filt).to_pandas()["person_id"])
    assert new == sorted(set(referenced) - set(known))
    # side effect: the survivors are now seen — a second expansion is empty
    again = expand_person_frontier_ds(items, filt).to_pandas()
    assert len(again) == 0

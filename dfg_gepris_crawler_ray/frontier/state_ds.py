"""Distributed forms of the crawl-state transitions.

``frontier.state`` holds the reference-faithful pandas semantics
(right for state tables up to ~10^6 keys on the driver). At 10^10-URL
scale the state itself is a Dataset; each transition here is the SAME
tested pandas function applied per key-hash bucket — keys are disjoint
across buckets, and every transition is key-local, so the bucketed
composition is exactly the driver-side semantics (equivalence tests in
tests/test_state_ds.py).

Shuffle key: 64-way bucket of ``(context, id)`` — the one partitioning
key the whole engine reuses (SURVEY.md §7.3).
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..kernels.hashing import stable_hash64
from . import state as S

NUM_BUCKETS = 64


def _bucket_of(context, ids) -> list[int]:
    return [stable_hash64(f"{c}/{int(i)}") % NUM_BUCKETS for c, i in zip(context, ids)]


def _with_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return df.assign(bucket=_bucket_of(df["context"], df["id"]))


def upsert_from_search_ds(
    state: "ray.data.Dataset", observations: "ray.data.Dataset", context: str, run_id: int
) -> "ray.data.Dataset":
    """J2 at state scale: state rows and this run's observations
    co-partition by key bucket; each bucket replays the exact pandas
    upsert (change detection included).

    ``observations``: Dataset of ``(id, item)`` rows (the search run's
    extracted items)."""

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="state")

    def tag_obs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["id"].astype("int64"), "_obs_item": df["item"]})
        out["context"] = context
        return _with_bucket(out).assign(_kind="obs")

    unioned = state.map_batches(tag_state, batch_format="pandas").union(
        observations.map_batches(tag_obs, batch_format="pandas")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        st = group[group["_kind"] == "state"]
        st = st[[c for c in S.STATE_COLUMNS]].reset_index(drop=True) if len(st) else S.empty_state()
        obs_rows = group[group["_kind"] == "obs"]
        obs = list(zip(obs_rows["id"].astype(int), obs_rows["_obs_item"]))
        out = S.upsert_from_search(st, obs, context, run_id)
        return S.mark_not_found(out, context, run_id)  # J6 is key-local too

    return unioned.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def insert_detail_items_ds(
    history: "ray.data.Dataset",
    runs: pd.DataFrame,
    rows: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """J4 at history scale: the dedup-on-append (only rows whose
    (status, item) differ from the key's latest are appended) replays
    per key bucket; the tiny runs ledger broadcasts by closure."""
    runs = runs.copy()

    def tag_hist(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="hist")

    def tag_new(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="new")

    unioned = history.map_batches(tag_hist, batch_format="pandas").union(
        rows.map_batches(tag_new, batch_format="pandas")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        hist = group[group["_kind"] == "hist"]
        hist = (
            hist[[c for c in S.HISTORY_COLUMNS]].reset_index(drop=True)
            if len(hist)
            else S.empty_history()
        )
        new = group[group["_kind"] == "new"]
        new_rows = [
            dict(id=int(r.id), context=r.context, created_at=r.created_at,
                 item=None if pd.isna(r.item) else r.item, status=r.status)
            for r in new.itertuples()
        ]
        return S.insert_detail_items(hist, runs, new_rows)

    return unioned.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def upsert_from_details_ds(
    state: "ray.data.Dataset", ids: set[int], context: str, run_id: int
) -> "ray.data.Dataset":
    """J3 at state scale: the processed-id set broadcasts (it is the
    run's frontier — budget-bounded by construction); the flag update
    is row-local. New keys append once via a driver-side diff of the
    tiny frontier set (insert-if-absent)."""
    import ray

    ids = {int(i) for i in ids}
    ids_ref = ray.put(ids)

    seen_ids: set[int] = set()
    for batch in state.map_batches(
        lambda df: df.loc[df["context"] == context, ["id"]], batch_format="pandas"
    ).iter_batches(batch_format="pandas"):
        seen_ids.update(int(i) for i in batch["id"])

    def update(df: pd.DataFrame) -> pd.DataFrame:
        known = ray.get(ids_ref)
        sel = (df["context"] == context) & df["id"].isin(known)
        df = df.copy()
        df.loc[sel, "last_detail_check"] = run_id
        df.loc[sel, "detail_check_needed"] = False
        return df

    updated = state.map_batches(update, batch_format="pandas")
    new_ids = sorted(ids - seen_ids)
    if not new_ids:
        return updated
    new_rows = S.upsert_from_details(S.empty_state(), new_ids, context, run_id)
    return updated.union(ray.data.from_pandas(new_rows))

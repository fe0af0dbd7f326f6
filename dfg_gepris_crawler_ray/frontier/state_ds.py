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
    # Both tag fns emit the SAME column set: a sorted block downstream
    # of the union can hold rows from only one side (sort partition
    # boundaries are sampled), and a single-side block carries only
    # that side's schema — an obs-only column like _obs_item would then
    # be missing from a state-only group (observed as a flaky KeyError).
    cols = list(S.STATE_COLUMNS) + ["_obs_item", "bucket", "_kind"]

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="state", _obs_item=None)[cols]

    def tag_obs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["id"].astype("int64"), "_obs_item": df["item"]})
        out["context"] = context
        out = _with_bucket(out).assign(_kind="obs")
        # object-typed None fillers (NOT reindex's float NaN): a float
        # filler column would coerce the state side's bool/int columns
        # on block concat (False -> 0.0)
        for c in cols:
            if c not in out.columns:
                out[c] = pd.Series([None] * len(out), dtype="object")
        return out[cols]

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
    is row-local. Insert-if-absent via a broadcast anti-join: each
    state batch reports only its INTERSECTION with the frontier set, so
    what returns to the driver is bounded by the frontier budget, never
    by state cardinality (the J5 pattern, not a full id stream)."""
    import ray

    ids = {int(i) for i in ids}
    ids_ref = ray.put(ids)

    def intersect(df: pd.DataFrame) -> pd.DataFrame:
        known = ray.get(ids_ref)
        sel = (df["context"] == context) & df["id"].isin(known)
        return pd.DataFrame({"id": df.loc[sel, "id"].astype("int64")})

    seen_ids: set[int] = set()
    for batch in state.map_batches(intersect, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
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


# --- J1: crawl-priority selection at state scale ----------------------------

def _j1_slim(
    state: "ray.data.Dataset",
    runs: pd.DataFrame,
    context: str,
    only_needed: bool = False,
) -> "ray.data.Dataset":
    """Column-pruned J1 candidate scan: (tier, staleness rank, id) —
    three ints per candidate row, never the item payloads. The runs
    ledger is tiny (one row per crawl run) and broadcasts by closure
    as a rank map."""
    ordered_runs = runs.sort_values("run_started_at", kind="stable")
    rank_of = {int(rid): pos for pos, rid in enumerate(ordered_runs["id"])}

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["context"] == context]
        never = sel["last_detail_check"].isna()
        if only_needed:
            sel = sel[never | sel["detail_check_needed"].astype(bool)]
            never = sel["last_detail_check"].isna()
        tier = (~never).astype("int64")
        rank = pd.Series(
            [
                -1 if pd.isna(c) else rank_of.get(int(c), -1)
                for c in sel["last_detail_check"]
            ],
            index=sel.index,
            dtype="int64",
        )
        return pd.DataFrame(
            {"tier": tier, "rank": rank, "id": sel["id"].astype("int64")}
        )

    return state.map_batches(prep, batch_format="pandas")


def get_frontier_ds(
    state: "ray.data.Dataset",
    runs: pd.DataFrame,
    context: str,
    only_needed: bool = False,
    limit: int = 0,
) -> "ray.data.Dataset":
    """J1 selection that STAYS a Dataset — the ``db:all:0`` form.

    With a limit the selection needs the global priority order (one
    distributed sort + limit — budget-bounded, but still returned as a
    Dataset); unbudgeted (``limit=0``) selection is order-free (every
    candidate crawls), so no sort runs at all. Rows: (tier, rank, id)
    so downstream host budgeting can reconstruct priority order
    per host without another global sort."""
    slim = _j1_slim(state, runs, context, only_needed)
    if limit > 0:
        slim = slim.sort(["tier", "rank", "id"]).limit(limit)
    return slim


def get_ids_ds(
    state: "ray.data.Dataset",
    runs: pd.DataFrame,
    context: str,
    only_needed: bool = False,
    limit: int = 0,
) -> list[int]:
    """J1 (reference database.py:43-64) over a Dataset-resident state:
    never-detail-checked keys first, then checked keys stalest-first
    (by the start time of their last check run), LIMIT on the union.

    Distributed shape: the :func:`_j1_slim` scan then ONE global sort +
    limit; the collected list is budget-bounded by the caller's limit.
    The tie-break inside each staleness tier is ``id`` ascending
    (deterministic under any partitioning); the pandas form's tie-break
    is state-table insertion order, which a 10^10-key distributed table
    cannot observe — callers that need byte-faithful insertion order
    must carry an explicit ``seq`` column. For the unbudgeted form use
    :func:`get_frontier_ds`, which never collects."""
    ordered = _j1_slim(state, runs, context, only_needed).sort(["tier", "rank", "id"])
    if limit > 0:
        ordered = ordered.limit(limit)
    return [int(i) for i in ordered.to_pandas()["id"]]


def upsert_from_details_bucketed(
    state: "ray.data.Dataset", processed: "ray.data.Dataset", context: str, run_id: int
) -> "ray.data.Dataset":
    """J3 with the processed-id set Dataset-resident (J2's union-tag
    shape): state rows and this run's processed ids co-partition by key
    bucket; each bucket replays the exact pandas upsert — the flag
    update and the insert-if-absent are both key-local, so the bucketed
    composition equals the driver semantics at any cardinality. This is
    the ``db:all:0`` form of :func:`upsert_from_details_ds`, whose
    broadcast id set is only safe when a J1 budget bounds the run."""

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="state")

    def tag_proc(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["id"].astype("int64")})
        out["context"] = context
        return _with_bucket(out).assign(_kind="proc")

    unioned = state.map_batches(tag_state, batch_format="pandas").union(
        processed.map_batches(tag_proc, batch_format="pandas")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        st = group[group["_kind"] == "state"]
        st = (
            st[[c for c in S.STATE_COLUMNS]].reset_index(drop=True)
            if len(st)
            else S.empty_state()
        )
        ids = (
            group.loc[group["_kind"] == "proc", "id"]
            .astype("int64")
            .drop_duplicates()
            .tolist()
        )
        return S.upsert_from_details(st, ids, context, run_id)

    return unioned.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


# --- A2: coalesce view at scale ---------------------------------------------

def latest_items_ds(
    latest_details: "ray.data.Dataset", state: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """A2 (dfg-gepris.sql:56-64) with both sides Dataset-resident:
    latest detail rows and state snapshots co-partition by key bucket;
    each bucket replays the exact pandas coalesce."""

    def tag_latest(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="latest")

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df).assign(_kind="state")

    unioned = latest_details.map_batches(tag_latest, batch_format="pandas").union(
        state.map_batches(tag_state, batch_format="pandas")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ld = group[group["_kind"] == "latest"]
        ld = (
            ld[[c for c in S.HISTORY_COLUMNS]].reset_index(drop=True)
            if len(ld)
            else S.empty_history()
        )
        st = group[group["_kind"] == "state"]
        st = (
            st[[c for c in S.STATE_COLUMNS]].reset_index(drop=True)
            if len(st)
            else S.empty_state()
        )
        return S.latest_items(ld, st)

    return unioned.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


# --- J7/J8: moved propagation at scale --------------------------------------

def _moved_ids_of_run(history: "ray.data.Dataset", run_id: int) -> set[int]:
    """The run's moved keys — bounded by the run's frontier budget, so
    a driver set is safe by construction; the filter runs distributed."""
    moved: set[int] = set()
    filt = history.map_batches(
        lambda df: pd.DataFrame(
            {
                "id": df.loc[
                    (df["created_at"] == run_id) & (df["status"] == "moved"), "id"
                ].astype("int64")
            }
        ),
        batch_format="pandas",
    )
    for batch in filt.iter_batches(batch_format="pandas"):
        moved.update(int(i) for i in batch["id"])
    return moved


def mark_projekts_for_moved_ds(
    state: "ray.data.Dataset",
    history: "ray.data.Dataset",
    run_id: int,
    context: str,
    references: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """J7 (reference database.py:163-187) at scale: moved persons /
    institutions re-check their projekts. The moved set (run-bounded)
    broadcasts; the reference-edge scan filters distributed; the flag
    update is row-local (matches on id only — faithful to the
    reference's missing context filter)."""
    import ray

    id_col = "person_id" if context == "person" else "institution_id"
    moved = _moved_ids_of_run(history, run_id)
    moved_ref = ray.put(moved)

    def edge_hits(df: pd.DataFrame) -> pd.DataFrame:
        mv = ray.get(moved_ref)
        sel = df[df[id_col].isin(mv)]
        return pd.DataFrame({"projekt_id": sel["projekt_id"].astype("int64")})

    projekt_ids: set[int] = set()
    for batch in references.map_batches(edge_hits, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        projekt_ids.update(int(i) for i in batch["projekt_id"])
    proj_ref = ray.put(projekt_ids)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        targets = ray.get(proj_ref)
        df = df.copy()
        df.loc[df["id"].isin(targets), "detail_check_needed"] = True
        return df

    return state.map_batches(flag, batch_format="pandas")


def mark_roots_for_moved_subinstitutions_ds(
    state: "ray.data.Dataset",
    history: "ray.data.Dataset",
    run_id: int,
    hierarchy: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """J8 (reference database.py:189-207) at scale: moved
    sub-institutions re-check their root. Same shape as J7 with the
    hierarchy closure as the edge table."""
    import ray

    moved = _moved_ids_of_run(history, run_id)
    moved_ref = ray.put(moved)

    def root_hits(df: pd.DataFrame) -> pd.DataFrame:
        mv = ray.get(moved_ref)
        sel = df[df["parent_id"].notna() & df["id"].isin(mv)]
        return pd.DataFrame({"root_id": sel["root_id"].astype("int64")})

    roots: set[int] = set()
    for batch in hierarchy.map_batches(root_hits, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        roots.update(int(i) for i in batch["root_id"])
    roots_ref = ray.put(roots)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        targets = ray.get(roots_ref)
        df = df.copy()
        df.loc[df["id"].isin(targets), "detail_check_needed"] = True
        return df

    return state.map_batches(flag, batch_format="pandas")

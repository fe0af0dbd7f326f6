"""Partition-count heuristics shared by the bucketed keyed exchanges.

Every keyed groupby in this repo shuffles into a fixed number of hash
buckets (64 by default — sized for a multi-node cluster where each
bucket should be a healthy block). At toy/test scale that fixed fanout
inverts: a 5k-row table shuffled into 64 reduce partitions pays ~60
near-empty tasks of pure scheduling overhead per exchange (measured
~2-4 s/exchange in Ray 2.49 local mode). The bucket count is a pure
performance knob for these ops — each op's per-bucket computation is
key-local (all rows of a key land in one bucket for ANY bucket count),
so output is bit-identical — which makes it safe to adapt to the
input size.
"""

from __future__ import annotations


def adaptive_buckets(
    n_rows: int,
    requested: int = 64,
    rows_per_bucket: int = 512,
    lo: int = 4,
) -> int:
    """Bucket count for a keyed exchange over ``n_rows`` input rows:
    at least ``lo`` (parallelism floor), at most ``requested`` (the
    cluster-scale fanout — wins whenever the input is big enough to
    fill it), roughly one bucket per ``rows_per_bucket`` rows between.

    Callers pass the driving table's row count (cheap via parquet
    metadata); the exchange's actual row volume may be a multiple of
    it (e.g. one row per doc×distinct-token), which only makes buckets
    fuller — never changes key-locality."""
    if n_rows <= 0:
        return lo
    return max(lo, min(requested, n_rows // rows_per_bucket + 1))


def cut_lineage(ds):
    """Rebuild a materialized Dataset from its object-store block refs.

    Ray 2.49's ``materialize()`` keeps the dataset's full logical plan
    (for lineage recreation); in an ITERATIVE loop (label propagation,
    power iteration) each round's plan therefore embeds the previous
    round's — planning time grows quadratically with rounds and deep
    loops hit RecursionError. Re-rooting on the blocks keeps every
    round's plan constant-depth; the blocks are referenced, NOT
    collected to the driver."""
    import ray.data

    return ray.data.from_pandas_refs(ds.to_pandas_refs())

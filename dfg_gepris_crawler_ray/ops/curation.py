"""End-to-end training-corpus curation — the composition the single
ops exist for, run as ONE streaming pipeline.

``corpus_curation``: quality filter → deterministic split → exact
dedup keep-one — the canonical "raw crawl → training corpus" funnel.
All row-local scoring fuses into a single ``map_batches`` pass over
the corpus (one read, no intermediate materialization); the only
exchange is the content-hash bucket groupby of the SURVIVORS (post-
filter, so the shuffle carries the kept subset only). Every step is
ANSI-SQL-reproducible, so the whole pipeline is oracle-checked
end-to-end — not just its parts.

``stratified_sample``: per-class deterministic hash sampling (e.g.
downsample the dominant event classes, keep the rare ones whole) —
row-local, reproducible, SQL-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .textstats import quality_batch

#: per-class keep rates for the stratified events sample (rebalancing:
#: dominant interaction classes downsampled, rare/important kept whole)
STRATA_RATES = {"click": 0.1, "view": 0.1, "purchase": 0.5, "signup": 1.0, "error": 1.0}


def corpus_curation(
    sf_dir: str,
    min_quality: float = 0.5,
    min_tokens: int = 30,
    split: str = "train",
    train: int = 80,
    valid: int = 10,
) -> "ray.data.Dataset":
    """documents → curated training corpus: (doc_id, n_tokens,
    quality_score) for docs that pass the quality bar, fall in the
    requested hash split, and are their duplicate-group's
    representative (min doc_id per exact content hash).

    Dedup runs AFTER the filters (smaller shuffle; the oracle mirrors
    the same order)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lo, hi = (0, train) if split == "train" else (
        (train, train + valid) if split == "valid" else (train + valid, 100)
    )

    def score_and_filter(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)  # doc_id, n_tokens, stopword_ratio, quality_score
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        split_bucket = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids),
            dtype=np.int64, count=len(ids),
        )
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        n_tok = np.asarray(q.column("n_tokens"))
        score = np.asarray(q.column("quality_score"))
        keep = (
            (score >= min_quality)
            & (n_tok >= min_tokens)
            & (split_bucket >= lo)
            & (split_bucket < hi)
        )
        kept_md5 = [m for m, k in zip(md5s, keep) if k]
        return pa.table(
            {
                "doc_id": pa.array([i for i, k in zip(ids, keep) if k], type=pa.int64()),
                "n_tokens": pa.array(n_tok[keep]),
                "quality_score": pa.array(score[keep]),
                "content_md5": pa.array(kept_md5, type=pa.string()),
                "bucket": pa.array(
                    [int(m[:2], 16) % 64 for m in kept_md5], type=pa.int32()
                ),
            }
        )

    scored = ds.map_batches(score_and_filter, batch_format="pyarrow", zero_copy_batch=True)

    def keep_representative(group: pd.DataFrame) -> pd.DataFrame:
        rep = group.loc[group.groupby("content_md5")["doc_id"].idxmin()]
        return rep[["doc_id", "n_tokens", "quality_score"]]

    return scored.groupby("bucket").map_groups(keep_representative, batch_format="pandas")


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None) -> "ray.data.Dataset":
    """Deterministic per-class sampling of the events stream: keep an
    event iff ``md5(str(event_id)) % 1000 < rate(class) * 1000``.
    Row-local (no shuffle, no RNG state); the same rows come back on
    every run and in SQL."""
    rates = STRATA_RATES if rates is None else rates
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        etypes = batch.column("event_type").to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 for i in ids),
            dtype=np.int64, count=len(ids),
        )
        cut = np.fromiter(
            (int(rates.get(t, 1.0) * 1000) for t in etypes), dtype=np.int64, count=len(etypes)
        )
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def sequence_packing(sf_dir: str, budget: int = 1024) -> "ray.data.Dataset":
    """Token-budget sequence packing: assign each document (in doc_id
    order) to a training sequence so every sequence holds ``budget``
    tokens of consecutive documents — the standard pre-tokenization
    packing step of an LLM data pipeline (here in its deterministic
    budgeted-chunking form: ``seq_id = floor(exclusive_prefix_tokens /
    budget)``, so a document may straddle two sequences — where the
    tokenizer would split it).

    Distributed shape — a GLOBAL ordered prefix sum in two passes, the
    scan-then-offset pattern that scales to any corpus:

    1. one pass emits per-batch partials ``(first doc_id, token sum)``
       — two ints per batch, collected to the driver (bounded by block
       count, never rows);
    2. the driver orders partials by first-doc-id and computes each
       batch's starting offset (a tiny cumulative sum), broadcast via
       ``ray.put``;
    3. a second identical-batching pass adds the local exclusive
       prefix to the batch's offset — row-local, no shuffle at all.

    Requires doc_id-clustered input (documents.parquet is written
    sorted; both passes read with the same block/batch layout so batch
    boundaries — keyed by first doc_id — line up). Token convention
    matches ``token_stats``: ``len(text.split(' '))``.
    """
    import ray

    path = f"{sf_dir}/documents.parquet"

    def _counts(batch: pa.Table) -> np.ndarray:
        texts = batch.column("text").to_pylist()
        return np.fromiter(
            (len(t.split(" ")) for t in texts), dtype=np.int64, count=len(texts)
        )

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"first_doc": pa.array([], type=pa.int64()),
                 "tokens": pa.array([], type=pa.int64())}
            )
        c = _counts(batch)
        return pa.table(
            {
                "first_doc": pa.array([int(batch.column("doc_id")[0].as_py())]),
                "tokens": pa.array([int(c.sum())]),
            }
        )

    def _read():
        return ray.data.read_parquet(path, columns=["doc_id", "text"])

    stats = (
        _read()
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("first_doc")
    )
    starts = stats["tokens"].cumsum().shift(fill_value=0)
    offsets = dict(zip(stats["first_doc"].astype(int), starts.astype(int)))
    off_ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tokens": pa.array([], type=pa.int64()),
                 "seq_id": pa.array([], type=pa.int64()),
                 "seq_offset": pa.array([], type=pa.int64())}
            )
        offs = ray.get(off_ref)
        c = _counts(batch)
        start = offs[int(batch.column("doc_id")[0].as_py())]
        prefix = start + np.concatenate([[0], np.cumsum(c[:-1])])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(c),
                "seq_id": pa.array(prefix // budget),
                "seq_offset": pa.array(prefix % budget),
            }
        )

    return _read().map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def text_chunking(
    sf_dir: str, chunk_tokens: int = 128, overlap: int = 32
) -> "ray.data.Dataset":
    """RAG-style sliding-window chunking: explode each document into
    token windows of ``chunk_tokens`` with ``overlap`` tokens shared
    between neighbours (stride = chunk_tokens − overlap). Row-local —
    a pure ``map_batches`` explode, no shuffle at any corpus size.

    Chunk grid (integer-exact, SQL-reproducible): with n tokens and
    stride s, ``n_chunks = 1 + max(0, ceil((n − chunk) / s))``; chunk i
    covers ``[i·s, min(i·s + chunk, n))``. Token convention matches
    ``token_stats`` (split on single space, empties kept)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        out_doc, out_idx, out_start, out_len = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n = len(text.split(" "))
            n_chunks = 1 + max(0, -(-(n - chunk_tokens) // stride))
            for i in range(n_chunks):
                start = i * stride
                out_doc.append(doc_id)
                out_idx.append(i)
                out_start.append(start)
                out_len.append(min(start + chunk_tokens, n) - start)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "chunk_idx": pa.array(out_idx, type=pa.int64()),
                "start_tok": pa.array(out_start, type=pa.int64()),
                "n_tok": pa.array(out_len, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_shards(sf_dir: str, n_shards: int = 8) -> "ray.data.Dataset":
    """Deterministic global training shuffle + shard packing: order the
    corpus by ``md5(doc_id)`` (a reproducible pseudo-random permutation
    — the standard seedable pre-training shuffle) and cut the rank
    sequence into ``n_shards`` contiguous, equal-size shards:
    ``shard = global_rank * n_shards // total``.

    Output: (doc_id, shuffle_key, global_rank, shard).

    Distributed shape: the permutation is Ray Data's native all-to-all
    ``Dataset.sort`` over the key column ONLY (doc_id + 32-byte key per
    row — text never moves); global ranks then come from the same
    scan-then-offset two-pass prefix pattern as ``sequence_packing``
    (per-block partials → tiny driver cumsum keyed by each block's
    first key → broadcast offsets; both passes run over the ONE
    materialized sorted index so block boundaries line up).  The
    materialization is the sorted (doc_id, key) index — blocks in the
    object store, never the driver.
    """
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({"doc_id": batch.column("doc_id"), "shuffle_key": pa.array(keys)})

    s = (
        ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .sort("shuffle_key")
        .materialize()
    )

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"first_key": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "first_key": pa.array([batch.column("shuffle_key")[0].as_py()]),
                "n": pa.array([batch.num_rows]),
            }
        )

    stats = (
        s.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("first_key")
    )
    total = int(stats["n"].sum())
    starts = stats["n"].cumsum().shift(fill_value=0)
    offsets = dict(zip(stats["first_key"], starts.astype(int)))
    off_ref = ray.put((offsets, total))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "shuffle_key": pa.array([], type=pa.string()),
                 "global_rank": pa.array([], type=pa.int64()),
                 "shard": pa.array([], type=pa.int64())}
            )
        offs, tot = ray.get(off_ref)
        start = offs[batch.column("shuffle_key")[0].as_py()]
        rank = start + np.arange(batch.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shuffle_key": batch.column("shuffle_key"),
                "global_rank": pa.array(rank),
                "shard": pa.array(rank * n_shards // total),
            }
        )

    return s.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

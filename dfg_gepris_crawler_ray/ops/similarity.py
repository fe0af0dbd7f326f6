"""Similarity search over the embeddings table (``list<float>`` column).

- ``knn_brute``: exact cosine top-k — broadcast query matrix
  (``ray.put`` once), per-batch float64 matmul partials, tiny driver
  merge. The baseline and the oracle-checkable path.
- ``knn_lsh``: random-hyperplane LSH bucketing — the scale path; only
  vectors sharing a probe bucket with the query are scored. Recall is
  verified against brute force in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _as_matrix(embs) -> np.ndarray:
    return np.asarray([np.asarray(e, dtype=np.float64) for e in embs])


def _as_matrix_arrow(col) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow ``list<float>`` column via
    one flat child-buffer copy — no per-row Python list objects (the
    ``to_pylist()`` route boxes n·d floats; on a 10^6-vector batch
    that is a GC storm vs a memcpy).  Ragged or null-bearing columns
    fall back to the per-row path."""
    import pyarrow.compute as _pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count == 0:
        mm = _pc.min_max(_pc.list_value_length(col)).as_py()
        if mm["min"] == mm["max"] and mm["max"]:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(flat, dtype=np.float64).reshape(n, mm["max"])
    return _as_matrix(col.to_pylist())


def _list_column(mat: np.ndarray) -> pa.Array:
    """Arrow ``list<float64>`` column from a (n, d) matrix via flat
    values + arithmetic offsets — the write-side inverse of
    :func:`_as_matrix_arrow` (``mat.tolist()`` boxes every float)."""
    n, d = mat.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int64), type=pa.int32()),
        pa.array(np.ascontiguousarray(mat, dtype=np.float64).reshape(-1)),
    )


def _i64(col) -> np.ndarray:
    """int64 numpy view of a null-free Arrow integer column — buffer
    copy at worst (``to_pylist`` boxes every id)."""
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _batch_topk_idx(scores: np.ndarray, cand_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the per-batch top-k by (cosine desc, neighbor_id asc) —
    the SAME tie-break as the global ``_merge_topk``, so an exact cosine
    tie at the k boundary can never discard the neighbor the global
    merge would keep (output independent of batch boundaries)."""
    return np.lexsort((cand_ids, -scores))[:k]


def _reduce_topk(partials_ds, k: int, num_partitions: int = 8):
    """Distributed pre-reduce of partial top-k rows: coalesce the
    per-batch partials into ``num_partitions`` blocks and keep top-k per
    query per block, so the driver merge reads ≤ B·Q·k rows regardless
    of input block count (at 10^10 vectors the raw partials are ~k·Q
    rows per *batch* — linear in block count). Same (cosine desc,
    neighbor_id asc) ordering as the global merge → byte-identical
    output."""
    import pandas as pd

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(
            ["query_id", "cosine", "neighbor_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("query_id", as_index=False, sort=False).head(k)

    return (
        partials_ds.repartition(num_partitions)
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
    )


def _merge_topk(partials, query_ids, k: int) -> pa.Table:
    """Tiny driver merge of pre-reduced partial top-k rows →
    (query_id, rank, neighbor_id, cosine); ties break by neighbor_id
    ascending. The input is ≤ k rows per query per reduce partition
    (see ``_reduce_topk``) — bounded, not corpus-cardinality."""
    out = {"query_id": [], "rank": [], "neighbor_id": [], "cosine": []}
    for qid in query_ids:
        sub = partials[partials["query_id"] == qid]
        best = heapq.nsmallest(k, zip(-sub["cosine"], sub["neighbor_id"]))
        for rank, (negc, nid) in enumerate(best, start=1):
            out["query_id"].append(qid)
            out["rank"].append(rank)
            out["neighbor_id"].append(int(nid))
            out["cosine"].append(round(float(-negc), 6))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "cosine": pa.array(out["cosine"], type=pa.float64()),
        }
    )


def _load_queries(sf_dir: str, query_ids: list[int]) -> np.ndarray:
    """Fetch the query vectors with the id predicate pushed into the
    parquet read (row-group pruning) — only matching row groups are
    decoded, never the whole embedding column."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(query_ids))],
    )
    lookup = {
        vid: np.asarray(emb, dtype=np.float64)
        for vid, emb in zip(
            tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()
        )
    }
    return np.stack([lookup[q] for q in query_ids])


def knn_brute(sf_dir: str, query_ids=(0, 1, 2, 3, 4), k: int = 10) -> pa.Table:
    """(query_id, rank, neighbor_id, cosine) — exact top-k per query.

    Scores are computed in float64 as dot/(|a||b|); self-matches are
    excluded; ties break by neighbor_id ascending (deterministic,
    matching the SQL oracle's ORDER BY).
    """
    query_ids = list(query_ids)
    q = _load_queries(sf_dir, query_ids)
    qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    q_ref = ray.put(qn)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = _i64(batch.column("vec_id"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        mn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = qm @ mn.T  # (n_query, n_batch)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(query_ids):
            scores = sims[qi]
            mask = ids != qid
            cand_idx = _batch_topk_idx(scores[mask], ids[mask], k)
            cand_ids = ids[mask][cand_idx]
            cand_scores = scores[mask][cand_idx]
            rows["query_id"].extend([qid] * len(cand_ids))
            rows["neighbor_id"].extend(cand_ids.tolist())
            rows["cosine"].extend(cand_scores.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    partials = _reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096), k
    )
    return _merge_topk(partials, query_ids, k)


def _reduce_centroid_partials(partials_ds, fanin: int = 8):
    """Distributed ADD-merge of per-batch (centroid_id, vec_sum, count)
    partial rows before the driver read: coalesce into ``fanin`` blocks
    and sum per centroid inside each, so the driver collects
    ≤ fanin × n_centroids rows regardless of input block count (the raw
    partials are n_centroids rows per *batch* — linear in block count;
    at 10^10 vectors / 4096-row batches that is millions of rows per
    iteration). Mirrors the ``textstats`` CMS-grid pre-reduce."""
    import pandas as pd

    def block_addmerge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        out = {"centroid_id": [], "vec_sum": [], "count": []}
        for cid, grp in df.groupby("centroid_id", sort=True):
            out["centroid_id"].append(cid)
            out["vec_sum"].append(np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0))
            out["count"].append(int(grp["count"].sum()))
        return pd.DataFrame(out)

    return (
        partials_ds.repartition(fanin)
        .map_batches(block_addmerge, batch_format="pandas")
        .to_pandas()
    )


def spherical_kmeans(
    sf_dir: str, n_centroids: int = 16, n_iters: int = 3
) -> np.ndarray:
    """Distributed spherical k-means over the embeddings table:
    centroids broadcast per iteration, per-batch partial (sum, count)
    accumulators inside ``map_batches``, fanin-bounded distributed
    ADD-merge (:func:`_reduce_centroid_partials`), then a tiny driver
    reduce over ≤ fanin × n_centroids rows — driver I/O is independent
    of block count. Deterministic init: the ``n_centroids`` lowest
    vec_ids."""
    cent = _load_queries(sf_dir, list(range(n_centroids)))
    cent = cent / np.clip(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12, None)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    for _ in range(n_iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _as_matrix_arrow(batch.column("embedding"))
            mn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=len(c))
            return pa.table(
                {
                    "centroid_id": pa.array(np.arange(len(c)), type=pa.int64()),
                    "vec_sum": _list_column(sums),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        agg = _reduce_centroid_partials(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        )
        new_cent = cent.copy()
        for cid, grp in agg.groupby("centroid_id"):
            total = int(grp["count"].sum())
            if total:
                s = np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0)
                new_cent[cid] = s / max(np.linalg.norm(s), 1e-12)
        cent = new_cent
    return cent


def knn_ivf(
    sf_dir: str,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the other classic scale path besides LSH.

    1. Spherical k-means over the full table, computed DISTRIBUTED:
       centroids broadcast per iteration, per-batch partial (sum,count)
       accumulators inside ``map_batches``, tiny driver reduce. Init is
       deterministic (the ``n_centroids`` lowest vec_ids).
    2. Each vector belongs to its nearest centroid's inverted list;
       a query scores only the ``n_probe`` nearest lists. At cluster
       scale the lists are hash-partitioned by centroid id so a probe
       touches ``n_probe / n_centroids`` of the data.

    Columns match ``knn_brute``; measured recall@10 ≈ 0.86 at the default 4/16 probe budget (sf0.01).
    """
    query_ids = list(query_ids)
    q = _load_queries(sf_dir, query_ids)
    qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent = spherical_kmeans(sf_dir, n_centroids, n_iters)

    # probe lists per query + candidate SCORING inside the scan: each
    # batch scores only its rows assigned to probed lists and emits a
    # ≤ k-row partial top-k per query (the knn_brute pattern) — the
    # driver never sees candidate vectors, only ≤ k·batches tiny rows.
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    probe_sets = [set(int(c) for c in row) for row in probe]
    state_ref = ray.put((cent, qn, probe_sets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        c, qm, probes = ray.get(state_ref)
        ids = _i64(batch.column("vec_id"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        mn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        assign = np.argmax(mn @ c.T, axis=1)
        sims = qm @ mn.T  # (n_query, n_batch)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(query_ids):
            in_probe = np.fromiter(
                (int(a) in probes[qi] for a in assign), dtype=bool, count=len(ids)
            )
            mask = in_probe & (ids != qid)
            scores = sims[qi][mask]
            cand_ids = ids[mask]
            top = _batch_topk_idx(scores, cand_ids, k)
            rows["query_id"].extend([qid] * len(top))
            rows["neighbor_id"].extend(cand_ids[top].tolist())
            rows["cosine"].extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    partials = _reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096), k
    )
    return _merge_topk(partials, query_ids, k)


def knn_lsh(
    sf_dir: str,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` hyperplane bits;
    the query probes its bucket plus all 1-bit flips in every table
    (multi-probe). A vector is a candidate if ANY table probes it —
    the standard recall amplification (1-(1-p)^L; measured recall@10 ≈ 0.74 at defaults on sf0.01). Only candidates are
    scored (the scale path vs ``knn_brute``'s full matmul). Columns
    match ``knn_brute``; recall measured in tests.
    """
    query_ids = list(query_ids)
    q = _load_queries(sf_dir, query_ids)
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def buckets_of(mat: np.ndarray) -> np.ndarray:
        """(n_rows, n_tables) bucket ids."""
        out = np.empty((mat.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (mat @ planes[t].T) > 0
            out[:, t] = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
        return out

    q_buckets = buckets_of(q)
    probe_sets = []  # per query: per table: set of probed buckets
    for qi in range(len(query_ids)):
        per_table = []
        for t in range(n_tables):
            qb = int(q_buckets[qi, t])
            per_table.append({qb} | {qb ^ (1 << b) for b in range(n_planes)})
        probe_sets.append(per_table)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    state_ref = ray.put((qn, probe_sets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        """Score each query's probed candidates within the batch and
        emit ≤ k partial rows per query — candidate vectors never leave
        their task (the knn_brute partial-top-k pattern)."""
        qm, probes = ray.get(state_ref)
        ids = _i64(batch.column("vec_id"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        bk = buckets_of(mat)
        mn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = qm @ mn.T  # (n_query, n_batch)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(query_ids):
            hit = np.zeros(len(ids), dtype=bool)
            for t in range(n_tables):
                hit |= np.fromiter(
                    (int(b) in probes[qi][t] for b in bk[:, t]),
                    dtype=bool, count=len(ids),
                )
            mask = hit & (ids != qid)
            scores = sims[qi][mask]
            cand_ids = ids[mask]
            top = _batch_topk_idx(scores, cand_ids, k)
            rows["query_id"].extend([qid] * len(top))
            rows["neighbor_id"].extend(cand_ids[top].tolist())
            rows["cosine"].extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    partials = _reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096), k
    )
    return _merge_topk(partials, query_ids, k)


def label_centroids(sf_dir: str) -> "ray.data.Dataset":
    """(label, dim, centroid) — per-class mean embedding, the
    vector-aggregation building block under IVF list stats, per-class
    prototypes and SemDeDup cluster reporting.

    Distributed shape: each batch reduces to per-label vector sums +
    counts via one ``np.add.at`` scatter (≤ labels × dims rows per
    batch, independent of batch row count), the partials flow through
    a single tiny ``groupby(key).sum`` keyed on ``label·4096 + dim``,
    and the mean falls out of a final row-local ``map_batches`` —
    end-to-end a Dataset, nothing driver-resident."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        labels = _i64(batch.column("label"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        n_dim = mat.shape[1]
        return pa.table(
            {
                "key": pa.array(
                    (np.repeat(uniq, n_dim) * 4096 + np.tile(np.arange(n_dim), len(uniq))).astype(np.int64)
                ),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, n_dim)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .sum(["s", "n"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        s = batch.column("sum(s)").to_numpy(zero_copy_only=False)
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": pa.array((key // 4096).astype(np.int64)),
                "dim": pa.array((key % 4096).astype(np.int64)),
                "centroid": pa.array(s / n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def scalar_quantize(sf_dir: str) -> "ray.data.Dataset":
    """int8 scalar quantization of the embedding column — the
    compression stage an ANN/vector-store pipeline runs before
    indexing 10^10 vectors (4 bytes/dim → 1 byte/dim).

    Per dimension ``code = min(floor((v − lo) · 255 / (hi − lo)),
    255)`` with the global per-dimension ``lo``/``hi`` (0 where the
    dimension is constant).  All arithmetic is float64 with the exact
    expression tree the DuckDB oracle uses, so codes are bit-identical
    and the per-vector integer summaries hash-match.

    Distributed shape — two scans, nothing vector-sized on the driver:

    1. **min/max scan**: per-batch per-dimension lo/hi partial rows
       (one row per block, ``2·d`` floats) reduced driver-side —
       bounded by blocks × dims, never rows;
    2. the tiny ``lo``/``hi`` vectors are closure-captured (hundreds
       of bytes) into a **quantize scan** emitting per-vector integer
       summaries ``(n_dims, code_sum, code_min, code_max)`` — the
       full int8 code matrix stays inside the batch and would stream
       to a sink in a real pipeline.
    """
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def minmax_partial(batch: pa.Table) -> pa.Table:
        mat = _as_matrix_arrow(batch.column("embedding"))
        if mat.size == 0:
            return pa.table({"lo": pa.array([], type=pa.list_(pa.float64())),
                             "hi": pa.array([], type=pa.list_(pa.float64()))})
        return pa.table(
            {
                "lo": _list_column(mat.min(axis=0)[None, :]),
                "hi": _list_column(mat.max(axis=0)[None, :]),
            }
        )

    partials = ds.map_batches(
        minmax_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    lo = np.minimum.reduce([np.asarray(r, dtype=np.float64) for r in partials["lo"]])
    hi = np.maximum.reduce([np.asarray(r, dtype=np.float64) for r in partials["hi"]])
    span = hi - lo
    const = span == 0.0

    def quantize(batch: pa.Table) -> pa.Table:
        mat = _as_matrix_arrow(batch.column("embedding"))
        codes = np.minimum(np.floor((mat - lo) * 255.0 / np.where(const, 1.0, span)), 255.0)
        codes = np.where(const, 0.0, codes).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "n_dims": pa.array(np.full(len(mat), mat.shape[1], dtype=np.int64)),
                "code_sum": pa.array(codes.sum(axis=1)),
                "code_min": pa.array(codes.min(axis=1)),
                "code_max": pa.array(codes.max(axis=1)),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


def knn_label_vote(
    sf_dir: str, query_ids=(0, 1, 2, 3, 4, 5, 6, 7), k: int = 10
) -> pa.Table:
    """(query_id, pred_label, votes) — kNN majority-vote label
    prediction, the standard embedding-space classifier used to
    propagate sparse labels over a corpus (quality tiers, topic tags).

    Composition, not a new kernel: the exact brute-force top-k from
    :func:`knn_brute` (distributed partial top-k per batch, bounded
    driver merge) feeds a label lookup that is a COLUMN-PRUNED scan of
    the embeddings table filtered to the Q*k neighbor ids — at scale
    the lookup ships only (vec_id, label) for the candidate set, never
    the vectors.  Vote ties break (votes desc, label asc) to match the
    SQL oracle's window order.
    """
    query_ids = list(query_ids)
    topk = knn_brute(sf_dir, query_ids=query_ids, k=k)
    need = pa.array(sorted(set(topk.column("neighbor_id").to_pylist())), type=pa.int64())

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("vec_id"), value_set=need)
        sub = batch.filter(mask)
        return pa.table(
            {
                "vec_id": pc.cast(sub.column("vec_id"), pa.int64()),
                "label": pc.cast(sub.column("label"), pa.int64()),
            }
        )

    labels = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    df = topk.to_pandas().merge(labels, left_on="neighbor_id", right_on="vec_id")
    votes = (
        df.groupby(["query_id", "label"], as_index=False)
        .size()
        .rename(columns={"size": "votes"})
        .sort_values(["query_id", "votes", "label"], ascending=[True, False, True],
                     kind="mergesort")
        .groupby("query_id", as_index=False)
        .first()
        .rename(columns={"label": "pred_label"})
    )
    return pa.table(
        {
            "query_id": pa.array(votes["query_id"].to_numpy(np.int64)),
            "pred_label": pa.array(votes["pred_label"].to_numpy(np.int64)),
            "votes": pa.array(votes["votes"].to_numpy(np.int64)),
        }
    )


def pca_project(sf_dir: str, n_components: int = 4):
    """Distributed PCA over the embedding column, projected onto the
    top ``n_components`` principal axes → (vec_id, pc0..pc{n-1}).

    Classic two-scan shape — the 100-TB-honest way to run PCA when
    the dimensionality D is small and the row count is huge:

    1. one scan of per-batch MOMENT PARTIALS: (Σx, XᵀX, n) — D + D²
       floats per batch regardless of batch size (for D=64 that is
       ~33 KB), reduced on the driver;
    2. driver: covariance = (XᵀX − n·μμᵀ)/(n−1), ``np.linalg.eigh``
       on the D×D matrix (trivial at any corpus size), deterministic
       sign fix (largest-|loading| coordinate made positive);
    3. one projection scan with the D×k loading matrix shipped via
       ``ray.put`` — row-local matmul, zero shuffle.

    Gate status: GRADUATED (round 5) to a staged brute-replay
    value-hash oracle on a 1e-4 output grid — the `emb_pca` query
    wrapper rounds the projection and stages the single-process numpy
    truth; measured margins (eigengaps ≥ 2.2e-4, sign-fix top-two
    |loading| gaps ≥ 3.9e-3, min rounding-boundary distance 1.0e-8 vs
    ~1e-12 cross-layout drift) are pinned in
    test_ops::test_pca_graduation_margins; full-precision parity vs
    single-process numpy PCA in test_ops::test_pca_matches_numpy.
    """
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        x = _as_matrix_arrow(batch.column("embedding")).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], type=pa.int64()),
                "sum": pa.array([x.sum(axis=0).tolist()]),
                "xtx": pa.array([(x.T @ x).ravel().tolist()]),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([sum(batch.column("n").to_pylist())], type=pa.int64()),
                "sum": pa.array(
                    [np.sum([np.asarray(v) for v in batch.column("sum").to_pylist()], axis=0).tolist()]
                ),
                "xtx": pa.array(
                    [np.sum([np.asarray(v) for v in batch.column("xtx").to_pylist()], axis=0).tolist()]
                ),
            }
        )

    parts = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .map_batches(combine, batch_format="pyarrow")
        .take_all()
    )  # ≤ 8 partial rows on the driver regardless of block count
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["sum"]) for p in parts], axis=0)
    xtx = np.sum([np.asarray(p["xtx"]) for p in parts], axis=0)
    d = len(s)
    mu = s / n
    cov = (xtx.reshape(d, d) - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    load = evecs[:, order]  # D x k
    # deterministic sign: the largest-|loading| entry of each axis > 0
    flip = np.sign(load[np.abs(load).argmax(axis=0), np.arange(load.shape[1])])
    load = load * np.where(flip == 0, 1.0, flip)
    state = ray.put((mu, load))

    def project(batch: pa.Table) -> pa.Table:
        mu_, w = ray.get(state)
        x = _as_matrix_arrow(batch.column("embedding")).astype(np.float64)
        p = (x - mu_) @ w
        cols = {"vec_id": pc.cast(batch.column("vec_id"), pa.int64())}
        for j in range(p.shape[1]):
            cols[f"pc{j}"] = pa.array(p[:, j])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def pq_train(
    sf_dir: str,
    n_subspaces: int = 16,
    n_codes: int = 256,
    n_iters: int = 3,
) -> np.ndarray:
    """(n_subspaces, n_codes, sub_dim) product-quantization codebooks
    trained distributed over the (L2-normalized) embeddings table —
    the memory-compression scale path for ANN (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): a 64-dim
    float32 vector becomes ``n_subspaces`` uint8 codes (16× smaller
    at the canonical 16×256 configuration),
    so 10^10 vectors fit in cluster RAM where raw vectors cannot.

    Training = independent k-means per subspace, all subspaces in the
    SAME pass: per batch, per subspace, assign each subvector to its
    nearest codeword and emit (centroid_id = sub·n_codes + code,
    vec_sum, count) partials — the identical mergeable-accumulator
    shape as :func:`spherical_kmeans`, reduced by the same
    fanin-bounded :func:`_reduce_centroid_partials` (driver I/O
    independent of block count). Deterministic init: subvectors of the
    ``n_codes`` lowest vec_ids."""
    init = _load_queries(sf_dir, list(range(n_codes)))
    init = init / np.clip(np.linalg.norm(init, axis=1, keepdims=True), 1e-12, None)
    dim = init.shape[1]
    assert dim % n_subspaces == 0, (dim, n_subspaces)
    sd = dim // n_subspaces
    # (n_sub, n_codes, sub_dim)
    books = np.stack(
        [init[:, m * sd:(m + 1) * sd] for m in range(n_subspaces)]
    ).astype(np.float64)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    for _ in range(n_iters):
        books_ref = ray.put(books)

        def partials(batch: pa.Table) -> "pd.DataFrame":
            import pandas as pd

            bk = ray.get(books_ref)
            mat = _as_matrix_arrow(batch.column("embedding"))
            mat = mat / np.clip(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
            )
            out = {"centroid_id": [], "vec_sum": [], "count": []}
            for m in range(n_subspaces):
                sub = mat[:, m * sd:(m + 1) * sd]
                # L2 assignment: argmin |x-c|² = argmax (x·c - |c|²/2)
                scores = sub @ bk[m].T - 0.5 * (bk[m] ** 2).sum(axis=1)
                code = np.argmax(scores, axis=1)
                for c in np.unique(code):
                    sel = sub[code == c]
                    out["centroid_id"].append(int(m * n_codes + c))
                    out["vec_sum"].append(sel.sum(axis=0))
                    out["count"].append(int(len(sel)))
            return pd.DataFrame(out)

        merged = _reduce_centroid_partials(
            ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)
        )
        new = books.copy()
        for cid, vs, ct in zip(
            merged["centroid_id"], merged["vec_sum"], merged["count"]
        ):
            if ct > 0:
                m, c = divmod(int(cid), n_codes)
                new[m, c] = np.asarray(vs) / ct
        books = new
    return books


def knn_pq(
    sf_dir: str,
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    n_subspaces: int = 16,
    n_codes: int = 256,
    n_iters: int = 3,
    rerank: int = 50,
) -> pa.Table:
    """Approximate top-k via PQ asymmetric distance computation (ADC)
    plus exact re-rank — the IVFADC-R recipe (Jégou et al. 2011 §V):

    1. each database vector is encoded to its per-subspace codes; the
       query stays exact, and the approximate score is the sum of
       per-subspace lookups q_m · c_{m,code_m(x)} — never a
       full-dimension multiply per candidate. At scale the encode runs
       ONCE at ingest (codes stored as uint8 columns, 16× smaller than
       the vectors at the canonical 16×256 configuration) and the
       shortlist pass touches only the codes;
    2. the global ADC top-``rerank`` shortlist per query (partial
       top-R per batch + the same tree reduce as ``knn_brute``) is
       broadcast back into ONE column-pruned scan that exact-scores
       ONLY shortlist members (≤ rerank full-dim dots per query
       total — the ``knn_label_vote`` candidate-set pattern).

    ``rerank=0`` returns the raw ADC ranking. Columns match
    ``knn_brute``; recall pinned in tests (rows-only gate entry, like
    knn_lsh / knn_ivf)."""
    query_ids = list(query_ids)
    books = pq_train(sf_dir, n_subspaces, n_codes, n_iters)
    sd = books.shape[2]

    q = _load_queries(sf_dir, query_ids)
    qn = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    # per-query ADC lookup tables: (n_query, n_sub, n_codes)
    lut = np.stack(
        [qn[:, m * sd:(m + 1) * sd] @ books[m].T for m in range(n_subspaces)],
        axis=1,
    )
    state_ref = ray.put((books, lut))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    shortlist_k = max(k, rerank) if rerank else k

    def partial_topk(batch: pa.Table) -> pa.Table:
        bk, lut_ = ray.get(state_ref)
        ids = _i64(batch.column("vec_id"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        mat = mat / np.clip(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
        )
        n = len(ids)
        approx = np.zeros((lut_.shape[0], n), dtype=np.float64)
        for m in range(bk.shape[0]):
            sub = mat[:, m * sd:(m + 1) * sd]
            scores = sub @ bk[m].T - 0.5 * (bk[m] ** 2).sum(axis=1)
            code = np.argmax(scores, axis=1)  # encode
            approx += lut_[:, m, code]        # ADC lookup, all queries
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(query_ids):
            mask = ids != qid
            cand_ids = ids[mask]
            scores = approx[qi][mask]
            # per-batch partials keep the full SHORTLIST depth, not k:
            # keeping only k here would make the re-rank shortlist
            # depend on batch boundaries (a vector ranked k+1 in its
            # batch but top-rerank globally would vanish) — the
            # partial-top-R contract requires R = the global depth
            top = _batch_topk_idx(scores, cand_ids, shortlist_k)
            rows["query_id"].extend([qid] * len(top))
            rows["neighbor_id"].extend(cand_ids[top].tolist())
            rows["cosine"].extend(scores[top].tolist())
        return pa.table(
            {"query_id": pa.array(rows["query_id"], type=pa.int64()),
             "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
             "cosine": pa.array(rows["cosine"], type=pa.float64())}
        )
    partials = _reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096),
        shortlist_k,
    )
    adc = _merge_topk(partials, query_ids, shortlist_k)
    if not rerank:
        return adc

    # exact re-rank: ≤ rerank candidates per query, broadcast once
    adc_df = adc.to_pandas()
    cand = {
        int(qid): set(grp["neighbor_id"].tolist())
        for qid, grp in adc_df.groupby("query_id")
    }
    qn2 = _load_queries(sf_dir, query_ids)
    qn2 = qn2 / np.clip(np.linalg.norm(qn2, axis=1, keepdims=True), 1e-12, None)
    cand_ref = ray.put((qn2, cand))

    def exact_topk(batch: pa.Table) -> pa.Table:
        qm, cand_ = ray.get(cand_ref)
        ids = _i64(batch.column("vec_id"))
        mat = _as_matrix_arrow(batch.column("embedding"))
        mn = mat / np.clip(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None
        )
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(query_ids):
            mask = np.fromiter(
                (int(i) in cand_[qid] for i in ids), dtype=bool, count=len(ids)
            )
            if not mask.any():
                continue
            cand_ids = ids[mask]
            scores = qm[qi] @ mn[mask].T
            top = _batch_topk_idx(scores, cand_ids, k)
            rows["query_id"].extend([qid] * len(top))
            rows["neighbor_id"].extend(cand_ids[top].tolist())
            rows["cosine"].extend(scores[top].tolist())
        return pa.table(
            {"query_id": pa.array(rows["query_id"], type=pa.int64()),
             "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
             "cosine": pa.array(rows["cosine"], type=pa.float64())}
        )

    ds2 = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = _reduce_topk(
        ds2.map_batches(exact_topk, batch_format="pyarrow", batch_size=4096), k
    )
    return _merge_topk(exact, query_ids, k)

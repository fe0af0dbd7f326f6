"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The scale trick is the clustering: a distributed spherical k-means
partitions the space so the O(m²) cosine comparisons run only WITHIN a
cluster (each a single group task), never across the corpus.  Within a
cluster, vectors are scanned in deterministic keep-priority order —
ascending similarity-to-centroid (the paper's "keep the example
farthest from the centroid" variant), vec_id tiebreak — and a vector
is dropped iff its cosine to an already-kept vector ≥ ``threshold``.

Output: one row per vector — (vec_id, cluster, keep).  Properties
(pinned in tests, brute-force checked):

- kept vectors within a cluster are pairwise < threshold;
- every dropped vector has a kept same-cluster neighbour ≥ threshold.

Cross-cluster near-dups are invisible by design (the paper's accepted
approximation); raise ``n_clusters`` quality via multi-assignment is
the IVF near-dup op's job (``ops/dedup.py::embedding_neardup_pairs``).

No SQL oracle (k-means is iterative/float) → rows-only gate entry +
the ground-truth pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .similarity import _as_matrix_arrow, _list_column, spherical_kmeans


def semantic_dedup(
    sf_dir: str,
    n_clusters: int = 16,
    threshold: float = 0.35,
    n_iters: int = 3,
) -> "ray.data.Dataset":
    """(vec_id, cluster, keep) — keep=0 marks semantic duplicates.

    One broadcast (centroids), one keyed exchange (cluster id); the
    per-cluster greedy scan is vectorised numpy over the cluster's
    similarity matrix.  Cluster sizes bound the quadratic term — at
    10^10 vectors raise ``n_clusters`` so m ≈ N / n_clusters stays
    ~10^5 (the paper runs 50k clusters for LAION-scale inputs).
    """
    cent = spherical_kmeans(sf_dir, n_clusters, n_iters)
    cent_ref = ray.put(cent)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _as_matrix_arrow(batch.column("embedding"))
        mn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = mn @ c.T
        cluster = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(cluster.astype(np.int32)),
                "cent_sim": pa.array(sims[np.arange(len(cluster)), cluster]),
                "normed": _list_column(mn),
            }
        )

    def per_cluster(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cent_sim", "vec_id"], kind="mergesort")
        ids = g["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["normed"]])
        keep = np.zeros(len(ids), dtype=bool)
        kept_rows: list[int] = []
        for i in range(len(ids)):
            if not kept_rows or float(np.max(mat[kept_rows] @ mat[i])) < threshold:
                keep[i] = True
                kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids.astype("int64"),
                "cluster": g["cluster"].to_numpy().astype("int32"),
                "keep": keep.astype("int64"),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pandas")
    )

"""Deterministic hashed-n-gram text embedder — the model-free
text→vector path (feature-hashing / "hashing trick" embedder; cf.
Weinberger et al. 2009).  Gives the embedding-space ops (SemDeDup,
kNN, PCA, quantize) an end-to-end text source without any external
model download, and exemplifies the stateful actor-pool stage over
text: the projection matrix is built ONCE per actor in ``__init__``
(the ST6 pattern), never per batch.

Vectorization: the whole batch's UTF-8 bytes are concatenated into one
numpy array; the char-trigram rolling hash is three shifted slices
combined arithmetically (no per-row Python, no per-gram loop); counts
scatter into the (docs × buckets) matrix with ``np.add.at`` using
per-doc segment offsets; the embedding is one (docs × buckets) @
(buckets × dim) float64 matmul, L2-normalized.  Doc-boundary-crossing
windows are masked out, so the output is the per-doc trigram count
projection — independent of batch size and parallelism up to float64
matmul accumulation order (~1e-13; pinned in test_ops, and the basis
of the text_hash_embed gate graduation on a 1e-4 output grid).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .similarity import _list_column

N_BUCKETS = 1024
DIM = 32
SEED = 0x5EED


def _projection(n_buckets: int = N_BUCKETS, dim: int = DIM) -> np.ndarray:
    """Seeded dense Gaussian projection (buckets × dim), float32 —
    ~128 KB at the defaults; per-actor state."""
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((n_buckets, dim)).astype(np.float32)


def trigram_counts(
    texts: list[str], n_buckets: int, dtype=np.float32
) -> np.ndarray:
    """(n, n_buckets) hashed char-trigram count matrix — the shared
    feature kernel (embedder projection input; classifier features).
    Fully vectorized: one rolling hash over the batch's concatenated
    UTF-8 bytes, doc-boundary-crossing windows masked out."""
    n = len(texts)
    counts = np.zeros((n, n_buckets), dtype=dtype)
    if n == 0:
        return counts
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    if len(flat) >= 3:
        # rolling char-trigram hash over the concatenated bytes
        h = (flat[:-2] * 31 * 31 + flat[1:-1] * 31 + flat[2:]) % n_buckets
        # window i belongs to the doc containing byte i, unless it
        # crosses into the next doc (the last 2 windows of each doc)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)[: len(h)]
        ends = starts + lens  # exclusive byte end per doc
        pos = np.arange(len(h), dtype=np.int64)
        ok = pos + 2 < ends[doc_of]
        np.add.at(counts, (doc_of[ok], h[ok]), 1.0)
    return counts


def embed_texts(texts: list[str], proj: np.ndarray) -> np.ndarray:
    """(n, dim) float64 embeddings for a list of texts — pure kernel
    shared by the Ray stage and the test/gate oracles. Accumulates in
    float64 (counts are exact integers, the float32 projection casts
    exactly), so cross-batch-layout drift is ~1e-13 absolute — the
    margin the text_hash_embed gate graduation rests on (vs the
    2.9e-9 minimum distance of any value from a 0.5e-4 rounding
    boundary, measured in test_hash_embed_graduation_margins)."""
    if len(texts) == 0:
        return np.empty((0, proj.shape[1]), dtype=np.float64)
    counts = trigram_counts(texts, proj.shape[0], dtype=np.float64)
    emb = counts @ proj.astype(np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    return emb / np.clip(norms, 1e-12, None)


class HashEmbedder:
    """Actor-pool stage: projection built once per actor."""

    def __init__(self, n_buckets: int = N_BUCKETS, dim: int = DIM):
        self.proj = _projection(n_buckets, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = embed_texts(batch.column("text").to_pylist(), self.proj)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "embedding": _list_column(emb.astype(np.float64)),
            }
        )


def hash_embed(sf_dir: str, concurrency: int = 4) -> "ray.data.Dataset":
    """(doc_id, embedding list<double>) — corpus-scale text embedding:
    column-pruned read → actor-pool ``map_batches`` (projection in
    ``__init__``), zero shuffle; streams straight to any downstream
    embedding op or a parquet sink."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        HashEmbedder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        # autoscaling pool (min 1): a fixed pool the size of the CPU
        # count can starve the upstream read tasks on small clusters
        concurrency=(1, concurrency),
    )

"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline staples, each a vectorised
``map_batches`` stage over Arrow batches:

- token counting (whitespace discipline matching SQL ``string_split``)
- quality scoring (length / stopword / mean-word-length ratios)
- language ID (stopword-profile heuristic, stateful actor stage)
- document fingerprinting (md5 content hash + 64-bit rolling hash)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"},
    "de": {"der", "die", "das", "und", "zu", "in", "ist", "auf", "für", "mit"},
    "fr": {"le", "la", "de", "et", "à", "dans", "est", "sur", "pour", "avec"},
    "es": {"el", "la", "de", "y", "a", "en", "es", "sobre", "para", "con"},
    "zh": {"的", "和", "在", "是", "了", "有", "我", "不", "人", "这"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, token_count, char_count, avg_token_len).

    ``token_count`` = elements of ``split(' ')`` (empties kept), exactly
    SQL ``len(string_split(text, ' '))``; ``avg_token_len`` =
    (chars − separators) / tokens, rounded to 6 so the float matches
    the SQL oracle bit-for-bit after rounding.
    """
    texts = batch.column("text").to_pylist()
    tokens = np.fromiter((len(t.split(" ")) for t in texts), dtype=np.int64, count=len(texts))
    chars = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
    avg = np.round((chars - (tokens - 1)) / tokens, 6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "token_count": pa.array(tokens),
            "char_count": pa.array(chars),
            "avg_token_len": pa.array(avg),
        }
    )


def token_stats(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, content_md5, rolling_hash) — md5 matches SQL ``md5(text)``;
    rolling_hash is a 64-bit polynomial rolling hash over tokens."""
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    P, M = 1099511628211, (1 << 61) - 1
    rolls = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = 14695981039346656037
        for tok in t.split(" "):
            h = (h * P + hash_token(tok)) % M
        rolls[i] = h
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "content_md5": pa.array(md5s),
            "rolling_hash": pa.array(rolls.astype(np.int64)),
        }
    )


def hash_token(tok: str) -> int:
    """Stable per-token hash (no process salt)."""
    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, stopword_ratio, quality_score) — heuristic
    quality scoring (length + stopword density)."""
    texts = batch.column("text").to_pylist()
    all_stop = set().union(*_STOPWORDS.values())
    n = len(texts)
    n_tokens = np.empty(n, dtype=np.int64)
    stop_ratio = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        toks = t.split()
        n_tokens[i] = len(toks)
        stop_ratio[i] = (
            sum(1 for w in toks if w in all_stop) / len(toks) if toks else 0.0
        )
    length_score = np.clip(n_tokens / 100.0, 0, 1)
    score = 0.7 * length_score + 0.3 * (1 - np.abs(stop_ratio - 0.4))

    def round6(x: np.ndarray) -> np.ndarray:
        # half-away-from-zero (SQL round semantics); np.round's
        # half-even diverges on exact .5 boundaries at the 6th decimal
        return np.floor(x * 1e6 + 0.5) / 1e6

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens),
            "stopword_ratio": pa.array(round6(stop_ratio)),
            "quality_score": pa.array(round6(score)),
        }
    )


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Stopword-profile language guesser — stateful actor stage
    (profiles built once per actor in ``__init__``)."""

    def __init__(self):
        self.profiles = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            toks = set(t.split())
            best_lang, best = "unknown", 0
            for lang, prof in self.profiles.items():
                hits = len(toks & prof)
                if hits > best:
                    best_lang, best = lang, hits
            preds.append(best_lang)
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)})


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=2)

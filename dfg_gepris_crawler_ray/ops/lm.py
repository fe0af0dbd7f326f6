"""N-gram language-model scoring over the documents table — the
CCNet-style "perplexity filter" stage of a web-corpus pipeline
(Wenzek et al. 2020 score every Common-Crawl paragraph under a
held-out-domain KenLM and keep the low-perplexity head; the same
shape appears in LLaMA/CCNet/RedPajama reproductions).

``lm_perplexity`` trains an add-one-smoothed bigram LM on the
deterministic train split of the corpus itself (``doc_id % 10 < 8``,
the split convention shared with ``corpus_curation``) and scores
EVERY document with its per-bigram average negative log-likelihood:

    p(w2 | w1) = (c(w1, w2) + 1) / (c(w1, ·) + V)

with ``V`` = number of distinct left-context tokens in training.
Output: ``(doc_id, n_bigrams, avg_nll)`` — low ``avg_nll`` = fluent
under the corpus LM, high = outlier (the filter consumes this as a
threshold or quantile cut).

Distributed shape — two scans, one model-sized shuffle, zero
doc-level exchange:

1. **counting scan**: each batch pre-aggregates its train-split
   bigrams to ``(bigram, c)`` partial rows (bounded by the batch's
   distinct-bigram count, not its token count) → ``groupby("bigram")
   .sum("c")`` — a shuffle of MODEL-sized rows, not corpus-sized —
   → the count table lands on the driver (it IS the model);
2. **model broadcast**: vocabulary, per-context totals and a sorted
   bigram-key array go into the object store once (``ray.put``);
3. **scoring scan**: per batch, tokens map to vocab ids, pair keys
   are formed vectorized, counts come from one ``np.searchsorted``
   against the broadcast key array, and per-doc sums fall out of
   ``np.add.reduceat`` over the doc boundaries.

At 100 TB the driver-resident model is the one size assumption:
exact string bigrams are kept here for SQL-oracle reproducibility;
production caps the model by feature-hashing bigrams to 2^20-2^24
buckets (the ``dsir_importance`` pattern in ``curation.py``), which
bounds both the shuffle and the broadcast irrespective of corpus
size.  Reference anchor: this engine's quality-filter family
(``textstats.quality_batch``; reference has no LM scoring — this is
part of the beyond-reference training-data layer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _doc_bigrams(texts: list[str]):
    """Per-doc token lists and bigram counts (len(toks)-1, min 0),
    mirroring SQL ``string_split(text, ' ')`` (empty tokens kept)."""
    toks_per_doc = [t.split(" ") for t in texts]
    n_bg = np.fromiter(
        (max(len(t) - 1, 0) for t in toks_per_doc), dtype=np.int64, count=len(texts)
    )
    return toks_per_doc, n_bg


def lm_perplexity(
    sf_dir: str, train_mod: int = 10, train_lt: int = 8
) -> "ray.data.Dataset":
    """(doc_id, n_bigrams, avg_nll) for every document with ≥1 bigram;
    model trained on ``doc_id % train_mod < train_lt``."""
    from collections import Counter

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        ctr: Counter = Counter()
        for i in np.flatnonzero(ids % train_mod < train_lt):
            toks = texts[i].split(" ")
            ctr.update(zip(toks, toks[1:]))
        if not ctr:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "bigram": pa.array([w1 + " " + w2 for w1, w2 in ctr]),
                "c": pa.array(list(ctr.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .sum("c")
        .to_pandas()
    )

    # driver-side model build (model-sized, not corpus-sized)
    w1 = counts["bigram"].str.split(" ", n=1).str[0]
    vocab_w1 = np.sort(w1.unique())
    V = len(vocab_w1)
    cu_series = counts.groupby(w1)["sum(c)"].sum()
    # vocab over ALL tokens seen in training (either position) so every
    # known token has a stable id; unseen tokens map to id -1
    w2 = counts["bigram"].str.split(" ", n=1).str[1]
    vocab = np.sort(np.union1d(vocab_w1, w2.unique()))
    tok_id = {t: i for i, t in enumerate(vocab)}
    cu = np.zeros(len(vocab) + 1, dtype=np.int64)  # last slot: unseen
    cu[[tok_id[t] for t in cu_series.index]] = cu_series.to_numpy()
    width = len(vocab) + 2  # ids shifted +1 so unseen (-1) becomes 0
    raw_keys = np.fromiter(
        (
            (tok_id[a] + 1) * width + (tok_id[b] + 1)
            for a, b in (bg.split(" ", 1) for bg in counts["bigram"])
        ),
        dtype=np.int64,
        count=len(counts),
    )
    order = np.argsort(raw_keys, kind="stable")
    keys = raw_keys[order]
    key_c = counts["sum(c)"].to_numpy()[order].astype(np.int64)
    model_ref = ray.put((tok_id, cu, keys, key_c, V, width))

    def score(batch: pa.Table) -> pa.Table:
        tok_id_, cu_, keys_, key_c_, V_, width_ = ray.get(model_ref)
        texts = batch.column("text").to_pylist()
        toks_per_doc, n_bg = _doc_bigrams(texts)
        ids_flat = np.fromiter(
            (tok_id_.get(t, -1) for toks in toks_per_doc for t in toks),
            dtype=np.int64,
        )
        n_tok = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts))
        # bigram pairs: drop each doc's last token as a left context
        tok_starts = np.concatenate(([0], np.cumsum(n_tok)))
        take_left = np.concatenate(
            [np.arange(tok_starts[i], tok_starts[i + 1] - 1) for i in range(len(texts))]
        ) if len(texts) else np.empty(0, dtype=np.int64)
        w1_ids = ids_flat[take_left]
        w2_ids = ids_flat[take_left + 1]
        pair_keys = (w1_ids + 1) * width_ + (w2_ids + 1)
        pos = np.searchsorted(keys_, pair_keys)
        pos_c = np.clip(pos, 0, max(len(keys_) - 1, 0))
        c = np.where(
            (len(keys_) > 0) & (keys_[pos_c] == pair_keys), key_c_[pos_c], 0
        ) if len(keys_) else np.zeros(len(pair_keys), dtype=np.int64)
        nll = -(np.log(c + 1.0) - np.log(cu_[w1_ids] + float(V_)))
        starts = np.concatenate(([0], np.cumsum(n_bg)[:-1]))
        sums = (
            np.where(
                n_bg > 0,
                np.add.reduceat(np.concatenate((nll, [0.0])), np.minimum(starts, len(nll))),
                0.0,
            )
            if len(nll)
            else np.zeros(len(texts))
        )
        keep = n_bg > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
                ),
                "n_bigrams": pa.array(n_bg[keep]),
                "avg_nll": pa.array(sums[keep] / np.maximum(n_bg[keep], 1)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

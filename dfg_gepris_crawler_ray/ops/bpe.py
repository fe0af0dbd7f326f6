"""BPE tokenizer training over the documents table — the tokenizer-
induction stage of a training-data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Production BPE trainers (HuggingFace tokenizers, fastBPE, SentencePiece
in BPE mode) all share one shape: the CORPUS-scale work is a word
histogram — count every distinct whitespace word once, with its
frequency — and the merge loop then runs over that histogram, whose
size is the word-vocabulary, not the corpus.  That is exactly the
split here:

1. **distributed word histogram**: per-batch ``Counter`` partials →
   ``groupby("word").sum("c")`` (a shuffle of vocabulary-sized rows —
   pre-aggregation means each batch emits its distinct words once) →
   the histogram lands on the driver.  At 100 TB the word-vocab of a
   cleaned corpus is 10^6–10^8 rows — the same driver-model-size
   assumption every real BPE trainer makes; cap with a frequency
   floor (``min_word_count``) if the tail explodes.
2. **driver merge loop** (vocab-sized, corpus-independent): classic
   greedy BPE over symbol sequences ``chars + '</w>'`` with a
   deterministic tie-break (max pair count, then lexicographically
   smallest pair), stopping at ``n_merges`` or when the best pair
   count drops below ``min_pair_count``.
3. **distributed apply** (``bpe_token_counts``): the learned merge
   ranks broadcast once via ``ray.put``; each scoring batch encodes
   every DISTINCT word once (memoized per batch), then sums per-doc
   token counts vectorized.

No reference counterpart (the reference has no tokenizer layer); part
of the beyond-reference training-data ops alongside
``textstats.bpe_token_count`` (which counts pre-tokenizer units with a
fixed GPT-2-ish regex — this module LEARNS the subword inventory).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray
import ray.data

#: end-of-word marker, per Sennrich et al. — lets merges distinguish
#: word-final from word-internal contexts
EOW = "</w>"


def _word_histogram(sf_dir: str, min_word_count: int = 1):
    """Distributed (word, count) histogram of the whitespace-tokenized
    corpus — the only corpus-scale pass of BPE training."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        ctr: Counter = Counter()
        for text in batch.column("text").to_pylist():
            ctr.update(text.split(" "))
        ctr.pop("", None)
        return pa.table(
            {
                "word": pa.array(list(ctr.keys()), type=pa.string()),
                "c": pa.array(list(ctr.values()), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .sum("c")
        .to_pandas()
    )
    hist = hist[hist["sum(c)"] >= min_word_count]
    return dict(zip(hist["word"], hist["sum(c)"].astype(int)))


def train_bpe(
    sf_dir: str,
    n_merges: int = 32,
    min_pair_count: int = 2,
    min_word_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list (rank = position)."""
    hist = _word_histogram(sf_dir, min_word_count)
    # symbol sequences: characters + end-of-word marker
    seqs: dict[tuple[str, ...], int] = {}
    for word, freq in hist.items():
        key = tuple(word) + (EOW,)
        seqs[key] = seqs.get(key, 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, freq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, freq in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == pair[0] and seq[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + freq
        seqs = new_seqs
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank-first (the
    standard BPE inference order — identical output to replaying the
    merges in training order)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_token_counts(sf_dir: str, n_merges: int = 32) -> "ray.data.Dataset":
    """(doc_id, n_words, n_bpe_tokens) under the corpus-trained BPE
    tokenizer: train (one histogram shuffle + driver merge loop),
    broadcast the merge ranks, and count tokens per document with
    per-batch word memoization (each distinct word encodes once per
    batch, then a vectorized weighted sum per doc)."""
    merges = train_bpe(sf_dir, n_merges=n_merges)
    ranks = {pair: i for i, pair in enumerate(merges)}
    ranks_ref = ray.put(ranks)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        r = ray.get(ranks_ref)
        cache: dict[str, int] = {}
        texts = batch.column("text").to_pylist()
        n_words = np.empty(len(texts), dtype=np.int64)
        n_tokens = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            words = [w for w in text.split(" ") if w]
            n_words[i] = len(words)
            total = 0
            for w in words:
                t = cache.get(w)
                if t is None:
                    t = cache[w] = len(encode_word(w, r))
                total += t
            n_tokens[i] = total
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_tokens),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)

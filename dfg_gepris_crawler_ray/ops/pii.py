"""PII / blocklist-term scrubbing over the documents table.

The standard pre-training redaction pass: scan every document for
sensitive patterns (emails, IPv4 addresses) and blocklisted terms,
count the hits, and emit the redacted text.  At 100 TB this is a pure
row-local ``map_batches`` scan — no shuffle, no state — so it costs one
read of the corpus and streams straight to a sink.

Engine notes:

- All matching/replacing runs through ``pyarrow.compute``'s
  ``count_substring_regex`` / ``replace_substring_regex`` kernels,
  which are RE2 underneath — the SAME regex engine DuckDB's
  ``regexp_extract_all`` / ``regexp_replace`` use, so the oracle is
  bit-identical (identical leftmost match selection, identical ``\\b``
  semantics).  No Python-level ``re`` loop anywhere.
- Patterns are compiled-free (RE2 kernels take the pattern string);
  the replacement order is part of the contract (email → ipv4 →
  blocklist) and is mirrored by the nested ``regexp_replace`` calls in
  the SQL oracle.
- The gate row carries ``md5(redacted)`` instead of the redacted text
  so the result stays tiny; a real pipeline would instead write the
  redacted column back out with ``write_parquet``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2-safe patterns (no lookaround, no backreferences) shared verbatim
# with the DuckDB oracle in __ray_entry__.oracle_sql().
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Blocklisted vocabulary — stands in for a toxic-/sensitive-term list;
# chosen to actually fire on the synthetic corpus so the gate hash is
# a non-trivial equality.
TERM_RE = r"\b(?:customer|supplier|part)\b"

SCRUB = "<SCRUB>"


def scrub_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n_email = pc.count_substring_regex(text, EMAIL_RE)
    n_ipv4 = pc.count_substring_regex(text, IPV4_RE)
    n_term = pc.count_substring_regex(text, TERM_RE)
    red = pc.replace_substring_regex(text, EMAIL_RE, SCRUB)
    red = pc.replace_substring_regex(red, IPV4_RE, SCRUB)
    red = pc.replace_substring_regex(red, TERM_RE, SCRUB)
    md5s = pa.array(
        [hashlib.md5(s.encode()).hexdigest() for s in red.to_pylist()]
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_email": pc.cast(n_email, pa.int64()),
            "n_ipv4": pc.cast(n_ipv4, pa.int64()),
            "n_term": pc.cast(n_term, pa.int64()),
            "n_chars_scrubbed": pc.cast(pc.utf8_length(red), pa.int64()),
            "scrub_md5": md5s,
        }
    )


def term_scrub(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_email, n_ipv4, n_term, n_chars_scrubbed, scrub_md5)
    — one row-local redaction scan over the corpus."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(scrub_batch, batch_format="pyarrow", zero_copy_batch=True)

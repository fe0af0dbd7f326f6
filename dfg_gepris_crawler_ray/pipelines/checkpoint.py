"""Per-partition checkpoint/resume for the details pipeline.

The reference resumes through durable Postgres upserts + an HTTP cache
(settings.py:130-138, database.py:66-116): a re-run redoes no network
work and re-upserting is idempotent. A batch engine over an immutable
pages corpus needs the equivalent as explicit artifacts
(BASELINE.json north_rule — "resumable from checkpoint with
per-partition lineage + metrics"):

    out_dir/shard=K/part-*.parquet    item rows of shard K (streamed)
    out_dir/shard=K/manifest.json     lineage: input dir, bucket set,
                                      row/status counts, content hash
    out_dir/_run.json                 run-level parameters

A shard is the unit of restart: shard K owns buckets
``{b : b % num_shards == K}`` of the canonical-entity-key hash space,
so every page variant of one entity lives in exactly one shard and a
shard is independently correct. Resume = skip every shard whose
manifest verifies (files present, row counts match), re-run the rest —
the anti-join of planned vs completed partitions (SURVEY.md §4 resume
row). Shards run as successive Ray Data streaming jobs, each
internally parallel across the cluster and never materialized on the
driver; at 100 TB pick shards ≈ a few hundred so one failure loses
<1% of work while per-shard datasets stay large enough to saturate
the cluster.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..sources.pages import DETAIL_KINDS, annotate_pages, filter_detail_pages, read_pages
from ..stages.extract_stage import extract_bucket


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard}")


def _part_files(shard_dir: str) -> list[str]:
    return sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )


def shard_completed(out_dir: str, shard: int) -> bool:
    """A shard counts as done iff its manifest verifies against the
    parquet actually on disk (a torn write fails verification)."""
    shard_dir = _shard_dir(out_dir, shard)
    path = os.path.join(shard_dir, "manifest.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        manifest = json.load(f)
    try:
        rows = sum(pq.read_metadata(p).num_rows for p in _part_files(shard_dir))
    except Exception:
        return False
    return rows == manifest["rows"]


def _shard_fingerprint(shard_dir: str) -> tuple[int, dict, str]:
    """(rows, status_counts, content hash) from the written parquet —
    a columnar read of 3 narrow columns, not the item payloads."""
    rows = 0
    status_counts: dict[str, int] = {}
    keys: list[str] = []
    for p in _part_files(shard_dir):
        t = pq.read_table(p, columns=["id", "context", "status"])
        rows += t.num_rows
        for i, c, s in zip(
            t.column("id").to_pylist(),
            t.column("context").to_pylist(),
            t.column("status").to_pylist(),
        ):
            status_counts[s] = status_counts.get(s, 0) + 1
            keys.append(f"{i}:{c}:{s}")
    digest = hashlib.sha256("\n".join(sorted(keys)).encode()).hexdigest()
    return rows, status_counts, digest


def run_details_sharded(
    pages_dir: str,
    out_dir: str,
    num_shards: int = 8,
    num_buckets: int = 64,
    max_shards: int | None = None,
) -> dict:
    """Details extraction with per-shard checkpointing.

    ``max_shards`` bounds how many *pending* shards this invocation
    processes (test hook simulating a mid-run failure). Returns
    ``{"completed": [...], "skipped": [...], "rows": N}``.
    """
    os.makedirs(out_dir, exist_ok=True)
    run_meta = os.path.join(out_dir, "_run.json")
    params = dict(pages_dir=pages_dir, num_shards=num_shards, num_buckets=num_buckets)
    if os.path.exists(run_meta):
        with open(run_meta) as f:
            prev = json.load(f)
        if prev != params:
            raise ValueError(f"resume parameter mismatch: {prev} vs {params}")
    else:
        with open(run_meta, "w") as f:
            json.dump(params, f)

    skipped = [s for s in range(num_shards) if shard_completed(out_dir, s)]
    pending = [s for s in range(num_shards) if s not in skipped]
    if max_shards is not None:
        pending = pending[:max_shards]

    completed = []
    for shard in pending:
        bucket_set = pa.array(
            [b for b in range(num_buckets) if b % num_shards == shard],
            type=pa.int32(),
        )
        ds = filter_detail_pages(annotate_pages(read_pages(pages_dir, kinds=DETAIL_KINDS), num_buckets))
        part = ds.map_batches(
            lambda b, vs=bucket_set: b.filter(pc.is_in(b.column("bucket"), value_set=vs)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        items = part.groupby("bucket").map_groups(extract_bucket, batch_format="pyarrow")

        shard_dir = _shard_dir(out_dir, shard)
        tmp_dir = shard_dir + ".tmp"
        for d in (tmp_dir, shard_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        items.write_parquet(tmp_dir)  # streamed, no driver materialization

        rows, status_counts, digest = _shard_fingerprint(tmp_dir)
        manifest = dict(
            shard=shard,
            num_shards=num_shards,
            pages_dir=pages_dir,
            buckets=bucket_set.to_pylist(),
            rows=rows,
            status_counts=status_counts,
            content_hash=digest,
        )
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_dir, shard_dir)  # atomic publish
        completed.append(shard)

    total_rows = 0
    for s in range(num_shards):
        if shard_completed(out_dir, s):
            with open(os.path.join(_shard_dir(out_dir, s), "manifest.json")) as f:
                total_rows += json.load(f)["rows"]
    return dict(completed=completed, skipped=skipped, rows=total_rows)


def read_sharded_items(out_dir: str) -> "ray.data.Dataset":
    """The committed (manifest-verified) item rows of a sharded run."""
    with open(os.path.join(out_dir, "_run.json")) as f:
        num_shards = json.load(f)["num_shards"]
    paths = [
        p
        for s in range(num_shards)
        if shard_completed(out_dir, s)
        for p in _part_files(_shard_dir(out_dir, s))
    ]
    return ray.data.read_parquet(paths)

"""The flagship details pipeline: pages corpus → extracted item rows.

Ray-native re-architecture of ``scrapy crawl details`` (SURVEY.md §3.4):

    read_parquet(pages)  [column-pruned]
      → annotate (canonical key, host, bucket)      [map_batches]
      → filter detail pages                          [map_batches]
      → optional frontier semi-join                  [broadcast, no shuffle]
      → groupby(bucket) → extract chain per entity   [the ONE keyed shuffle]
      → items Dataset (id, context, status, item, …)

The only all-to-all exchange is the bucket groupby keyed by the hashed
canonical entity key — chosen so all language/result variants and all
warc_ts copies of one entity co-locate (SURVEY.md §7.3). ``num_buckets``
bounds shuffle fan-in and sets extract parallelism; size it ≈ 2–4×
cluster cores.
"""

from __future__ import annotations

import ray
import ray.data

from ..sources.pages import (
    annotate_pages,
    filter_detail_pages,
    read_pages,
    semi_join_frontier,
)
from ..stages.extract_stage import extract_bucket


def run_details_extraction(
    pages_dir: str,
    frontier_keys=None,
    num_buckets: int = 64,
    strict: bool = False,
    politeness=None,
) -> "ray.data.Dataset":
    """Extract items for all (or the frontier-selected) entities.

    ``frontier_keys``: optional iterable of ``(context, id)`` tuples —
    the budget-bounded crawl frontier (broadcast, not shuffled).
    Returns a Dataset of item rows (see stages.extract_stage.RESULT_SCHEMA).
    """
    ds = read_pages(pages_dir)
    ds = annotate_pages(ds, num_buckets=num_buckets)
    ds = filter_detail_pages(ds)
    if frontier_keys is not None:
        keys_ref = ray.put(set(frontier_keys))
        ds = semi_join_frontier(ds, keys_ref)
    return ds.groupby("bucket").map_groups(
        lambda b: extract_bucket(b, strict=strict, politeness=politeness),
        batch_format="pyarrow",
    )


def write_items(items: "ray.data.Dataset", out_dir: str) -> None:
    """Partitioned parquet sink (resumable layout: one dir per run)."""
    items.write_parquet(out_dir)

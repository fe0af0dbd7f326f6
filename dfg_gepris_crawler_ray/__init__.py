"""dfg_gepris_crawler_ray — a Ray-Data-native crawl/extract engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference crawler (``primeapple/dfg-gepris-crawler``,
a Scrapy + Postgres pipeline) as ``ray.data.Dataset`` pipelines:

- input = Parquet tables of Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)``
- frontier + URL-seen + politeness as explicit state (Parquet tables +
  sharded actor pools)
- HTML extraction + attribute normalisation as vectorised
  ``map_batches`` stages over zero-copy Arrow batches
- incremental crawl state (upserts, change detection, frontier
  expansion, moved-propagation) as keyed groupby/anti-join jobs

Nothing in here imports from the reference; semantics are re-derived
from its observable behavior (file:line citations in docstrings).
"""

__version__ = "0.1.0"

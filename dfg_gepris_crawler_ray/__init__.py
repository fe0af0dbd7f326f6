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


def register_for_ray() -> None:
    """Make all package UDFs self-contained for Ray workers.

    Ray workers pickle ``map_batches`` UDFs by module reference; when
    the driver imported this package from a path the workers don't have
    (e.g. the repo root while cwd is elsewhere), deserialisation fails
    with ModuleNotFoundError. Registering every submodule for by-value
    cloudpickle serialisation removes the import requirement entirely
    (a few tens of KB per task submission — negligible against batch
    payloads). Idempotent; called by ``__ray_entry__`` and ``bench``.
    """
    import importlib
    import pkgutil

    from ray import cloudpickle

    pkg = importlib.import_module(__name__)
    for mod_info in pkgutil.walk_packages(pkg.__path__, prefix=__name__ + "."):
        try:
            cloudpickle.register_pickle_by_value(importlib.import_module(mod_info.name))
        except Exception:
            pass
    cloudpickle.register_pickle_by_value(pkg)

"""Stage-level stats report for the flagship pipeline.

Runs the details extraction chain over a pages corpus and prints the
executed Dataset's ``stats()`` — per-operator wall times, block
counts, task counts, and memory — the feedback loop the per-stage
tuning decisions in BASELINE.md came from (block sizing, exchange
fanout, repartition-before-groupby). Use it after touching any stage
of `pipelines/details.py` to see where wall time actually goes.

Usage::

    python tools/statsreport.py [--sf /root/testdata/sf0.01]
                                [--replicate 1] [--buckets 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import dfg_gepris_crawler_ray

    dfg_gepris_crawler_ray.register_for_ray()

    from dfg_gepris_crawler_ray.pipelines.details import run_details_extraction
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages_dir = ensure_pages(args.sf, replicate=args.replicate)
    t0 = time.perf_counter()
    items = run_details_extraction(
        pages_dir, num_buckets=args.buckets
    ).materialize()
    wall = time.perf_counter() - t0
    print(items.stats())
    print(f"\n== total: {items.count()} items in {wall:.2f}s "
          f"({args.cpus} CPUs, replicate={args.replicate}) ==")
    ray.shutdown()


if __name__ == "__main__":
    main()

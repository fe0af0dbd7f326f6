"""CLI — the engine's equivalent of the reference's run surface.

    scrapy crawl search_results -a context=projekt
        → python -m dfg_gepris_crawler_ray search --context projekt ...
    scrapy crawl details -a context=projekt -a ids=db:needed:500
        → python -m dfg_gepris_crawler_ray details --context projekt \
              --ids db:needed:500 ...
    scrapy crawl data_monitor
        → python -m dfg_gepris_crawler_ray monitor ...
    scrapy crawl details ... -O out.json   (feed export, README.md:58-65)
        → ... details --feed out.json
    the cron day (docker/scheduler_cronfile)
        → python -m dfg_gepris_crawler_ray daily --day 5 ...

Owns a Ray session (the only module besides bench.py and tests that
does); every command needs ``--pages`` (the corpus parquet dir) and
``--store`` (the durable crawl-state dir).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dfg_gepris_crawler_ray")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--pages", required=True, help="pages parquet dir")
        sp.add_argument("--store", required=True, help="crawl-state dir")
        sp.add_argument("--num-cpus", type=int, default=None)

    sp = sub.add_parser("search", help="search_results run")
    common(sp)
    sp.add_argument("--context", required=True,
                    choices=("projekt", "person", "institution"))

    sp = sub.add_parser("details", help="details run")
    common(sp)
    sp.add_argument("--context", required=True,
                    choices=("projekt", "person", "institution"))
    sp.add_argument("--ids", default="db:all:0",
                    help="[1,2] | file.json | db:all:N | db:needed:N")
    sp.add_argument("--max-per-host", type=int, default=None)
    sp.add_argument("--feed", default=None,
                    help="JSON feed export path (file.json → array, dir → JSONL)")
    sp.add_argument("--min-delay-ms", type=float, default=0.0,
                    help="per-host politeness delay (token bucket)")
    sp.add_argument("--robots", default=None,
                    help="JSON file mapping host → robots.txt body")

    sp = sub.add_parser(
        "person-details",
        help="person_details run (webcache-first alternate source)",
    )
    sp.add_argument("--pages", required=True, help="pages parquet dir")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--ids", default=None, help="comma-separated person ids")
    sp.add_argument("--ids-file", default=None, help="json file of {'id': ...} records")
    sp.add_argument("--out", default=None, help="output parquet dir (default: print counts)")

    sp = sub.add_parser("monitor", help="data_monitor run")
    common(sp)

    sp = sub.add_parser("daily", help="one scheduler day (cron cadence)")
    common(sp)
    sp.add_argument("--day", type=int, default=None, help="day of month for re-index")
    sp.add_argument("--backend", default="pandas", choices=("pandas", "ds"),
                    help="ds = Dataset-resident state forms (the 10^10-key "
                         "scale path) incl. end-of-day store compaction")

    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False)
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    import dfg_gepris_crawler_ray

    dfg_gepris_crawler_ray.register_for_ray()
    from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
    from dfg_gepris_crawler_ray.pipelines import runs as R

    store = CrawlStore(args.store) if getattr(args, "store", None) else None
    try:
        if args.command == "person-details":
            # stateless like the reference spider: items only, no store
            from dfg_gepris_crawler_ray.pipelines.person_details import run_person_details

            ids = [int(x) for x in args.ids.split(",")] if args.ids else None
            out_ds = run_person_details(args.pages, ids=ids, ids_file=args.ids_file)
            if args.out:
                out_ds.write_parquet(args.out)
                print(json.dumps(dict(out=args.out)))
            else:
                counts: dict[str, int] = {}
                for row in out_ds.map_batches(
                    lambda df: df.groupby(["source", "status"], as_index=False).size(),
                    batch_format="pandas",
                ).iter_rows():
                    key = f"{row['source']}/{row['status']}"
                    counts[key] = counts.get(key, 0) + int(row["size"])
                print(json.dumps(counts))
        elif args.command == "search":
            out = R.run_search(store, args.pages, args.context)
            print(json.dumps(dict(run_id=out["run_id"], items=len(out["items"]),
                                  duplicate_ids=out["duplicate_ids"])))
        elif args.command == "details":
            from dfg_gepris_crawler_ray.config import CrawlerConfig

            robots = {}
            if args.robots:
                with open(args.robots) as f:
                    robots = json.load(f)
            cfg = CrawlerConfig(min_delay_ms=args.min_delay_ms, robots=robots)
            out = R.run_details(store, args.pages, args.context,
                                ids_spec=args.ids, max_per_host=args.max_per_host,
                                politeness=cfg.make_politeness())
            if args.feed:
                import pyarrow as pa

                import ray.data

                from dfg_gepris_crawler_ray.pipelines.details import write_items_json

                write_items_json(
                    ray.data.from_arrow(pa.Table.from_pandas(out["delta"])), args.feed
                )
            print(json.dumps(dict(run_id=out["run_id"],
                                  **out["manifest"]["status_counts"])))
        elif args.command == "monitor":
            out = R.run_data_monitor(store, args.pages)
            print(out["monitor_json"])
        elif args.command == "daily":
            from dfg_gepris_crawler_ray.pipelines.schedule import run_daily_cycle

            out = run_daily_cycle(store, args.pages, day_of_month=args.day,
                                  backend=args.backend)
            print(json.dumps(dict(
                notifications=[s for _, s in out["notifications"]],
                reindex=out.get("reindex_plan"),
                compacted_files=out.get("compacted_files"),
            )))
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

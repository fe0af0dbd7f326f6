"""CLI smoke — the reference's `scrapy crawl ...` run surface
(__main__.py) end-to-end in a subprocess (owns its own Ray session,
like a real invocation)."""

import json
import os
import subprocess
import sys


def test_cli_search_then_details(tmp_path):
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    pages = ensure_pages("/root/testdata/sf0.001")
    store = str(tmp_path / "store")
    env = dict(os.environ, PYTHONPATH="/root/repo")

    out = subprocess.run(
        [sys.executable, "-m", "dfg_gepris_crawler_ray", "search",
         "--pages", pages, "--store", store, "--context", "projekt",
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["items"] > 0 and res["duplicate_ids"] == []

    out2 = subprocess.run(
        [sys.executable, "-m", "dfg_gepris_crawler_ray", "details",
         "--pages", pages, "--store", store, "--context", "projekt",
         "--ids", "db:all:5", "--feed", str(tmp_path / "feed.json"),
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp",
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    res2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert res2.get("success", 0) > 0
    feed = json.loads((tmp_path / "feed.json").read_text())
    assert isinstance(feed, list) and len(feed) > 0

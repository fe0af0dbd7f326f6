"""Run-outcome classification (pipelines.notify ≙ EmailNotifierPipeline
pipelines.py:60-139) and the S8 JSON feed export."""

import json

import pytest

SF = "/root/testdata/sf0.001"


def test_error_beats_everything():
    from dfg_gepris_crawler_ray.pipelines.notify import classify_run

    status, subject = classify_run(
        "details", "projekt", scraped_items=5, expected=5, had_error=True
    )
    assert status == "Error"
    assert subject == "Error - GeprisCrawler - Spider 'details' - context 'projekt' - 5 items"


def test_count_mismatch_warns_with_difference():
    from dfg_gepris_crawler_ray.pipelines.notify import classify_run

    status, subject = classify_run(
        "search_results", "person", scraped_items=90, expected=100
    )
    assert status == "Warning"
    assert subject == (
        "Warning - GeprisCrawler - Spider 'search_results'"
        " - context 'person' - 90 (-10) items"
    )


def test_moved_items_count_toward_actual():
    from dfg_gepris_crawler_ray.pipelines.notify import classify_run

    # scraped+moved == expected → no notification (pipelines.py:92-93)
    assert classify_run("details", "projekt", 95, moved_items=5, expected=100) is None


def test_big_details_run_succeeds():
    from dfg_gepris_crawler_ray.pipelines.notify import classify_run

    status, subject = classify_run("details", "projekt", 20000, expected=20000)
    assert status == "Success"
    assert "20000 items" in subject and "(" not in subject


def test_data_monitor_version_change():
    from dfg_gepris_crawler_ray.pipelines.notify import classify_run

    status, subject = classify_run(
        "data_monitor", None, 1, expected=1, new_gepris_version="21.5.0"
    )
    assert status == "Warning"
    assert subject == (
        "Warning - GeprisCrawler - Spider 'data_monitor'"
        " - 1 items - new gepris version 21.5.0"
    )
    # no version change, count matches → silence
    assert classify_run("data_monitor", None, 1, expected=1) is None


def test_expected_items_lookup(tmp_path):
    from dfg_gepris_crawler_ray.frontier.manifests import CrawlStore
    from dfg_gepris_crawler_ray.pipelines.notify import expected_items

    store = CrawlStore(str(tmp_path / "store"))
    # no data-monitor run yet → fall back to the listing total
    assert expected_items("search_results", "projekt", store, total_items=42) == 42
    import pandas as pd

    store.save_table(
        "data_monitor",
        pd.DataFrame(
            [
                dict(run_ended_at="2021-01-01", project_count=100),
                dict(run_ended_at="2021-06-01", project_count=136266),
            ]
        ),
    )
    assert expected_items("search_results", "projekt", store, total_items=42) == 136266
    # person/institution listings are known-incomplete → listing total
    assert expected_items("search_results", "person", store, total_items=7) == 7
    assert expected_items("data_monitor", None) == 1
    assert expected_items("details", "projekt", num_ids=500) == 500


def test_json_feed_export(ray_session, tmp_path):
    from dfg_gepris_crawler_ray.pipelines.details import (
        run_details_extraction,
        write_items_json,
    )
    from dfg_gepris_crawler_ray.testdata.gen_pages import ensure_pages

    items = run_details_extraction(ensure_pages(SF), num_buckets=8)
    out = str(tmp_path / "feed.json")
    write_items_json(items.limit(20), out)
    with open(out) as f:
        feed = json.load(f)
    assert isinstance(feed, list) and len(feed) == 20
    assert all(isinstance(r, dict) for r in feed)

    # directory path → distributed JSONL
    out_dir = str(tmp_path / "feed_dir")
    write_items_json(items.limit(50), out_dir)
    import glob

    files = glob.glob(out_dir + "/*.json")
    assert files
    n = sum(1 for f in files for line in open(f) if line.strip())
    assert n == 50


def test_delivery_hook_fires_at_reference_thresholds():
    """notify_run delivers through the injectable sink exactly when the
    reference's close_spider would email (pipelines.py:60-107):
    Error on crawler error, Warning on count mismatch, Success only for
    a details run above the 10k-item bar, silence otherwise."""
    from dfg_gepris_crawler_ray.pipelines.notify import notify_run

    sent = []
    sink = lambda status, subject, body: sent.append((status, subject, body))

    # Error beats everything
    r = notify_run(sink, "details", "projekt", 5, expected=5, had_error=True,
                   body="log tail")
    assert r[0] == "Error" and sent[-1][0] == "Error" and sent[-1][2] == "log tail"

    # count mismatch → Warning
    r = notify_run(sink, "search_results", "person", 90, expected=100)
    assert r[0] == "Warning" and sent[-1][1].startswith("Warning - GeprisCrawler")

    # big details run → Success (moved items count toward actual)
    r = notify_run(sink, "details", "projekt", 9_000, moved_items=1_500,
                   expected=10_500)
    assert r[0] == "Success"

    # small matching details run → silent close, sink NOT called
    n_before = len(sent)
    assert notify_run(sink, "details", "projekt", 100, expected=100) is None
    assert len(sent) == n_before

    # data-monitor version change → Warning with the version suffix
    r = notify_run(sink, "data_monitor", None, 1, expected=1,
                   new_gepris_version="2024.2")
    assert r[0] == "Warning" and "new gepris version 2024.2" in sent[-1][1]

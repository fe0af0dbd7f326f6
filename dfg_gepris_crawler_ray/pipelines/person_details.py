"""person_details run — the google-webcache alternate-source spider.

Reference: ``spiders/person_details.py:1-69`` — a politeness workaround
that fetches each person's details page from the google webcache first
and falls back to gepris per request via the errback chain
(person_details.py:64-67). Its parse (lines 54-63) emits the RAW
``details`` pairs (no ``nm_person`` normalisation) next to name and
trees; see :func:`...extract.details.parse_person_details_raw` for the
fidelity notes on the reference's own bugs.

Ray-Data shape: the id source is an explicit list/file (the spider
supports no ``db:`` source — person_details.py:20-33), so the id set
broadcasts; the pages scan classifies every URL into
``source='cache'`` (webcache-wrapped person-details URL,
gepris_helper.py:27,44-45) or ``source='gepris'``; ONE keyed shuffle by
entity bucket co-locates both sources per person, and the group task
prefers the cache copy, falling back per entity to the gepris copy when
the cache copy is absent or fails validation — the batch-world
observable of the spider's request-errback chain (a google error page
fails the GEPRIS structure check).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..extract.details import parse_person_details_raw
from ..extract.validators import (
    PageDoesNotExistAnymoreError,
    check_details_exists,
    check_details_structure,
    check_language,
)
from ..kernels.hashing import stable_hash64
from ..kernels.htmlmini import parse_html
from ..kernels.jsoncanon import dumps_canonical
from ..kernels.urls import parse_page_url, strip_google_cache
from ..sources.pages import read_pages

RESULT_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("name_de", pa.string()),
        ("details", pa.string()),  # canonical JSON of the raw pairs
        ("trees", pa.string()),  # canonical JSON
        ("source", pa.string()),  # 'cache' | 'gepris'
        ("status", pa.string()),  # success | moved | error
        ("attempts", pa.int64()),
    ]
)


def _parse_ids(ids, ids_file) -> set[int]:
    """Id source semantics of person_details.py:20-33 (comma string,
    list, or a json file of {"id": ...} records; duplicates collapse)."""
    if ids is not None:
        if isinstance(ids, str):
            ids = [int(x) for x in ids.split(",")]
    elif ids_file is not None:
        with open(ids_file) as f:
            ids = [p["id"] for p in json.load(f)]
    else:
        raise ValueError('Either "ids" or "ids_file" argument have to be not none')
    return {int(i) for i in ids}


def run_person_details(
    pages_dir: str,
    ids=None,
    ids_file=None,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """One person_details crawl over the pages corpus; returns the item
    Dataset (RESULT_SCHEMA rows, one per id found in the corpus)."""
    ids_set = _parse_ids(ids, ids_file)
    ids_ref = ray.put(ids_set)

    ds = read_pages(pages_dir)

    def classify(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        out = {"id": [], "source": [], "warc_ts": [], "html": [], "bucket": []}
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        htmls = batch.column("html").to_pylist()
        for url, t, html in zip(urls, ts, htmls):
            inner = strip_google_cache(url)
            source = "gepris" if inner is None else "cache"
            info = parse_page_url(inner if inner is not None else url)
            if info["kind"] != "details" or info["context"] != "person":
                continue
            if info["id"] not in wanted:
                continue
            out["id"].append(info["id"])
            out["source"].append(source)
            out["warc_ts"].append(t)
            out["html"].append(html)
            out["bucket"].append(stable_hash64(f"person/{info['id']}") % num_buckets)
        return pa.table(
            {
                "id": pa.array(out["id"], type=pa.int64()),
                "source": pa.array(out["source"], type=pa.string()),
                "warc_ts": pa.array(out["warc_ts"], type=batch.schema.field("warc_ts").type),
                "html": pa.array(out["html"], type=batch.schema.field("html").type),
                "bucket": pa.array(out["bucket"], type=pa.int32()),
            }
        )

    classified = ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)

    def extract_group(tbl: pa.Table) -> pa.Table:
        by_id: dict[int, dict[str, list]] = {}
        ids_l = tbl.column("id").to_pylist()
        src_l = tbl.column("source").to_pylist()
        ts_l = tbl.column("warc_ts").to_pylist()
        html_l = tbl.column("html").to_pylist()
        for i, s, t, h in zip(ids_l, src_l, ts_l, html_l):
            by_id.setdefault(int(i), {"cache": [], "gepris": []})[s].append((t, h))
        rows = []
        for eid in sorted(by_id):
            copies = by_id[eid]
            row = None
            attempts = 0
            last_error = None
            # cache first, gepris on failure — the errback chain
            for source in ("cache", "gepris"):
                variants = [h for _, h in sorted(copies[source], key=lambda p: p[0])]
                if not variants:
                    continue
                attempts += 1
                try:
                    root = parse_html(variants[0])
                    check_details_structure(root)
                    check_details_exists(root)
                    check_language(root, "de")
                    item = parse_person_details_raw(root, eid)
                    row = dict(
                        id=eid,
                        name_de=item["name_de"],
                        details=dumps_canonical(item["details"]),
                        trees=dumps_canonical(item["trees"]),
                        source=source,
                        status="success",
                        attempts=attempts,
                    )
                    break
                except PageDoesNotExistAnymoreError:
                    if source == "gepris":
                        row = dict(
                            id=eid, name_de=None, details=None, trees=None,
                            source=source, status="moved", attempts=attempts,
                        )
                        break
                    # a cached copy of the not-found page: distrust the
                    # cache, re-check against the live source
                    last_error = "moved"
                except Exception as exc:  # structure/language/parse
                    last_error = type(exc).__name__
            if row is None:
                row = dict(
                    id=eid, name_de=None, details=None, trees=None,
                    source="gepris", status="error", attempts=attempts,
                )
                row["details"] = dumps_canonical([["error", last_error]])
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=RESULT_SCHEMA)

    return classified.groupby("bucket").map_groups(
        extract_group, batch_format="pyarrow"
    )

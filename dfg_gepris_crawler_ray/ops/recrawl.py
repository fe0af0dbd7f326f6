"""Recrawl change detection over multi-snapshot pages — the refresh
side of a crawl scheduler: given every (url, warc_ts, html) snapshot a
crawler has fetched, decide per URL whether the latest fetch changed
the content (re-extract downstream) or not (skip, and lengthen the
refresh interval).

This is the reference's change-detection idea (search upsert diffing,
``database.py`` last_updated bumps only on item change; data monitor
comparing successive runs) applied to raw page content at corpus
scale: content fingerprints instead of item equality, so the decision
happens before any extraction work is spent.

Distributed shape — one scan, one keyed exchange over fingerprints:

1. **fingerprint scan**: per page emit ``(url, ts_us, h64)`` — an
   md5-derived 64-bit content fingerprint; HTML bytes never leave the
   scan;
2. **url-bucket groupby** (64 hash buckets, vectorized pandas inside
   each): per URL sort snapshots by ``warc_ts`` and compare the last
   two fingerprints. The exchange carries one tiny row per snapshot,
   not the corpus.

Output: one row per distinct URL —
``(url, n_snapshots, changed, latest_ts_us)`` where ``changed`` is
true iff the URL has ≥2 snapshots and the latest fingerprint differs
from the previous one.

At 10^10 URLs the groupby is the standard keyed all-to-all over
fingerprint rows (≈24 bytes each); no driver-side state. No SQL
oracle (pages are generated, not a gate view): ground truth is a
brute-force pandas pytest over the sf0.001 corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..testdata.gen_pages import ensure_pages


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big", signed=True)


def recrawl_delta(sf_dir: str, replicate: int = 1) -> "ray.data.Dataset":
    """(url, n_snapshots, changed, latest_ts_us) per distinct URL."""
    pages_dir = ensure_pages(sf_dir, replicate)
    ds = ray.data.read_parquet(pages_dir, columns=["url", "warc_ts", "html"])

    def fingerprint(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        ts = batch.column("warc_ts").cast(pa.int64())
        hs = np.fromiter(
            (_h64(h) for h in batch.column("html").to_pylist()),
            dtype=np.int64,
            count=len(batch),
        )
        buckets = np.fromiter(
            (_h64(u.encode()) % 64 for u in urls.to_pylist()),
            dtype=np.int64,
            count=len(batch),
        )
        return pa.table(
            {
                "url": urls,
                "ts_us": ts,
                "h64": pa.array(hs),
                "bucket": pa.array(buckets),
            }
        )

    def per_url(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(["url", "ts_us"], kind="stable")
        same_prev = g["url"].shift() == g["url"]
        row_changed = same_prev & (g["h64"].shift() != g["h64"])
        last = g.drop_duplicates("url", keep="last")
        counts = g.groupby("url", sort=False).size()
        out = pd.DataFrame(
            {
                "url": last["url"].to_numpy(),
                "n_snapshots": counts.loc[last["url"]].to_numpy(dtype=np.int64),
                "changed": row_changed.loc[last.index].to_numpy(dtype=bool),
                "latest_ts_us": last["ts_us"].to_numpy(dtype=np.int64),
            }
        )
        return out

    return (
        ds.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .groupby("bucket")
        .map_groups(per_url, batch_format="pandas")
    )


def recrawl_schedule(
    sf_dir: str,
    base_interval_s: int = 86_400,
    hot_host_ppm: int = 100_000,
) -> "ray.data.Dataset":
    """(url, host, changed, host_change_ppm, next_fetch_ts_us) — the
    refresh plan a production frontier feeds back into its priority
    queue: URLs that changed on the last fetch are revisited sooner,
    unchanged ones back off, and every URL on a "hot" host (≥
    ``hot_host_ppm`` parts-per-million of its URLs changed) gets its
    interval halved again. This is the reference's scheduler cadence
    (data monitor daily, search weekly — scheduler_cronfile) derived
    from observed change rates instead of a fixed crontab.

    Policy (integer-exact so the SQL oracle matches bit-for-bit):

    - interval = base/2 if changed else base*2
    - interval //= 2 again if the URL's host is hot
    - next_fetch_ts_us = latest_ts_us + interval * 1_000_000

    Shape: :func:`recrawl_delta` (one scan + one url-bucket exchange)
    → host tagged row-locally → ONE host-bucket keyed exchange where
    each group computes its hosts' change rates AND applies the policy
    in the same task — host stats never leave the bucket, nothing is
    broadcast, no driver state. At 10^8 hosts the exchange carries one
    row per URL-verdict (24 B class) keyed by host hash — the same
    skew profile as the politeness buckets (hash-partitioning on host,
    BASELINE.json north_rule) and far below the fetch exchange.
    """
    delta = recrawl_delta(sf_dir)

    def tag_host(df: pd.DataFrame) -> pd.DataFrame:
        hosts = df["url"].str.split("/", n=3).str[2]
        hb = np.fromiter(
            (_h64(h.encode()) % 64 for h in hosts),
            dtype=np.int64,
            count=len(df),
        )
        return df.assign(host=hosts, _hb=hb.astype(np.int32))

    def schedule_bucket(g: pd.DataFrame) -> pd.DataFrame:
        stats = g.groupby("host")["changed"].agg(["sum", "size"])
        ppm = (stats["sum"] * 1_000_000 // stats["size"]).astype("int64")
        host_ppm = g["host"].map(ppm).astype("int64")
        interval = np.where(
            g["changed"].to_numpy(), base_interval_s // 2, base_interval_s * 2
        ).astype(np.int64)
        interval = np.where(host_ppm.to_numpy() >= hot_host_ppm, interval // 2, interval)
        return pd.DataFrame(
            {
                "url": g["url"],
                "host": g["host"],
                "changed": g["changed"].astype(bool),
                "host_change_ppm": host_ppm,
                "next_fetch_ts_us": g["latest_ts_us"].astype("int64")
                + interval * 1_000_000,
            }
        )

    return (
        delta.map_batches(tag_host, batch_format="pandas")
        .groupby("_hb")
        .map_groups(schedule_bucket, batch_format="pandas")
    )

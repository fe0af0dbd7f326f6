"""Run ledger + per-partition manifests — checkpoint/resume/lineage.

The reference's resume story is durable Postgres state + an HTTP cache
(settings.py:130-138). A batch engine needs explicit artifacts
(BASELINE.json north_rule): every run writes

    <store>/runs/run=<id>/items/part-*.parquet     (history delta)
    <store>/runs/run=<id>/manifest.json            (lineage + counts)
    <store>/state.parquet, runs.parquet            (atomically replaced)

``manifest.json`` records the input corpus, frontier spec, per-status
row counts, a content hash of the delta, and the parent run id — the
per-partition lineage a resuming driver uses to skip completed runs
(anti-join frontier vs completed manifests).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd


class CrawlStore:
    """File-backed crawl state directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "runs"), exist_ok=True)

    # --- state tables ------------------------------------------------------
    def _table_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def load_table(self, name: str, empty: pd.DataFrame) -> pd.DataFrame:
        path = self._table_path(name)
        if os.path.exists(path):
            return pd.read_parquet(path)
        # interop: a Dataset-resident run may have published the
        # partitioned directory form — a pandas-scale consumer reads it
        # transparently (and vice versa via load_table_ds's fallback)
        d = self._table_dir(name)
        if os.path.isdir(d):
            return pd.read_parquet(d)
        return empty

    def save_table(self, name: str, df: pd.DataFrame) -> None:
        path = self._table_path(name)
        tmp = path + ".tmp"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)  # atomic publish
        # retire a Dataset-era directory form so both loaders see THIS
        # publish as the live table (mirror of save_table_ds)
        d = self._table_dir(name)
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)

    # --- Dataset-resident state tables (the 10^10-key form) ---------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, f"{name}_ds")

    def load_table_ds(self, name: str, empty: pd.DataFrame) -> "object":
        """State table as a ``ray.data.Dataset``: reads the partitioned
        ``<name>_ds/`` directory if present, falls back to the single
        pandas-era parquet, else the empty schema — so a ds-resident
        run can take over a store a pandas run started."""
        import ray.data

        d = self._table_dir(name)
        if os.path.isdir(d):
            return ray.data.read_parquet(d)
        if os.path.exists(self._table_path(name)):
            return ray.data.read_parquet(self._table_path(name))
        return ray.data.from_pandas(empty)

    def save_table_ds(self, name: str, ds: "object") -> None:
        """Partitioned parquet publish with atomic rename: the Dataset
        writes every block to ``<name>_ds.tmp/`` then the directory
        swaps in — a crashed writer never corrupts the live table."""
        import shutil

        d = self._table_dir(name)
        tmp = d + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        old = d + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(d):
            os.replace(d, old)
        os.replace(tmp, d)
        if os.path.isdir(old):
            shutil.rmtree(old)
        # the single-file form is now stale — remove so loads see the dir
        if os.path.exists(self._table_path(name)):
            os.remove(self._table_path(name))

    # --- run artifacts -----------------------------------------------------
    def run_dir(self, run_id: int) -> str:
        d = os.path.join(self.root, "runs", f"run={run_id}")
        os.makedirs(d, exist_ok=True)
        return d

    def write_run_delta(self, run_id: int, delta: pd.DataFrame) -> str:
        d = os.path.join(self.run_dir(run_id), "items")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        delta.to_parquet(path, index=False)
        return path

    def write_manifest(self, run_id: int, **fields) -> dict:
        manifest = dict(run_id=run_id, **fields)
        path = os.path.join(self.run_dir(run_id), "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, path)
        return manifest

    def read_manifest(self, run_id: int) -> dict | None:
        path = os.path.join(self.run_dir(run_id), "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def completed_runs(self) -> list[int]:
        runs_dir = os.path.join(self.root, "runs")
        out = []
        for name in os.listdir(runs_dir):
            if name.startswith("run=") and os.path.exists(
                os.path.join(runs_dir, name, "manifest.json")
            ):
                out.append(int(name.split("=")[1]))
        return sorted(out)


def content_hash(df: pd.DataFrame, cols: list[str] | None = None) -> str:
    """Order-insensitive content hash of a delta (lineage fingerprint)."""
    cols = cols or list(df.columns)
    h = hashlib.sha256()
    if len(df):
        # vectorized concat (a row-wise apply is ~100x slower on
        # 10^5-row deltas)
        joined = df[cols[0]].astype(str)
        for c in cols[1:]:
            joined = joined.str.cat(df[c].astype(str), sep="\x1f")
        payload = joined.tolist()
    else:
        payload = []
    for line in sorted(payload):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()

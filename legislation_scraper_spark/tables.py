"""Snapshot-versioned table store — Iceberg semantics over parquet.

The north rule requires Iceberg tables (atomic snapshot-per-crawl-round,
time travel for resume, per-partition lineage + metrics).  The sandbox
has no Iceberg runtime jar and no network, so this module provides a
minimal, swappable stand-in with the same *semantics*:

- every commit (append or overwrite) writes new parquet files under a
  unique directory, then atomically publishes a JSON manifest listing
  the table's live file-sets (``os.rename`` is atomic on POSIX);
- readers resolve the latest (or any historical) manifest → snapshot
  isolation and time travel;
- each manifest carries per-partition row-count lineage and free-form
  metrics, mirroring Iceberg snapshot summaries.

On a real cluster, ``Catalog`` is replaced by ``spark.table`` /
``df.writeTo(...).append()`` against an Iceberg catalog — the engine
code only touches the four methods below, so the swap is one class.
All data stays distributed: manifests hold file paths and small count
maps, never rows.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _footer_lineage(
    root: str, partition_cols: list[str] | None
) -> dict[str, int]:
    """Row counts per partition (or ``__all__``) from parquet footers."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        n = sum(
            pq.read_metadata(os.path.join(dirpath, f)).num_rows
            for f in files
            if f.endswith(".parquet")
        )
        if n == 0:
            continue
        if partition_cols:
            from urllib.parse import unquote

            rel = os.path.relpath(dirpath, root)
            vals = dict(
                p.split("=", 1) for p in rel.split(os.sep) if "=" in p
            )
            key = "|".join(unquote(vals.get(c, "")) for c in partition_cols)
        else:
            key = "__all__"
        counts[key] = counts.get(key, 0) + n
    return counts


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.rename(tmp, path)


@dataclass
class Snapshot:
    version: int
    file_sets: list[str]
    lineage: dict[str, Any]
    metrics: dict[str, Any]


class Table:
    """One snapshot-versioned table."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.name = name
        self.dir = os.path.join(root, name)
        self.snap_dir = os.path.join(self.dir, "snapshots")
        self.data_dir = os.path.join(self.dir, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- snapshot resolution -------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:6])
            for f in os.listdir(self.snap_dir)
            if f.endswith(".json") and f.startswith("v")
        )

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        with open(os.path.join(self.snap_dir, f"v{v:05d}.json")) as f:
            d = json.load(f)
        return Snapshot(d["version"], d["file_sets"], d["lineage"], d["metrics"])

    # -- read ----------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame | None:
        """DataFrame over the snapshot's file sets; None if table empty.

        Each commit's file set is its own partitioned parquet root, so
        multi-commit snapshots are unioned by name (Spark refuses mixed
        partition roots in one scan).  Partition pruning still applies
        within each set; Iceberg would give a single pruned scan.
        """
        snap = self.snapshot(version)
        if snap is None or not snap.file_sets:
            return None
        dfs = [self.spark.read.parquet(p) for p in snap.file_sets]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # -- write ---------------------------------------------------------------

    def _commit(
        self,
        df: DataFrame,
        mode: str,
        partition_cols: list[str] | None,
        metrics: dict[str, Any] | None,
    ) -> int:
        new_set = os.path.join(self.data_dir, uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(new_set)
        # per-partition lineage for THIS commit, read from parquet footer
        # metadata (driver-side file walk, no Spark job — the Iceberg
        # analogue is snapshot summary stats, likewise metadata-only)
        lineage = _footer_lineage(new_set, partition_cols)
        prev = self.snapshot()
        if mode == "append" and prev is not None:
            file_sets = prev.file_sets + [new_set]
        else:
            file_sets = [new_set]
        v = self.current_version() + 1
        _atomic_write_json(
            os.path.join(self.snap_dir, f"v{v:05d}.json"),
            {
                "version": v,
                "file_sets": file_sets,
                "lineage": lineage,
                "metrics": metrics or {},
            },
        )
        return v

    def append(
        self,
        df: DataFrame,
        partition_cols: list[str] | None = None,
        metrics: dict[str, Any] | None = None,
    ) -> int:
        return self._commit(df, "append", partition_cols, metrics)

    def overwrite(
        self,
        df: DataFrame,
        partition_cols: list[str] | None = None,
        metrics: dict[str, Any] | None = None,
    ) -> int:
        return self._commit(df, "overwrite", partition_cols, metrics)

    def approx_rows(self, version: int | None = None) -> int:
        """Row count from manifest lineage (no Spark job).

        Exact for append-only tables (sums every commit's lineage);
        equals the live count because appends never delete rows.
        """
        snap = self.snapshot(version)
        if snap is None:
            return 0
        total = 0
        live = set(snap.file_sets)
        for v in self.versions():
            if v > snap.version:
                break
            s = self.snapshot(v)
            new_sets = set(s.file_sets) - (
                set(self.snapshot(v - 1).file_sets) if v > 1 else set()
            )
            if new_sets & live:
                total += sum(s.lineage.values())
        return total

    def compact(self) -> int | None:
        """Fold a many-commit snapshot into one file set (the Iceberg
        rewrite_data_files maintenance action).  Semantically a no-op."""
        snap = self.snapshot()
        if snap is None or len(snap.file_sets) <= 1:
            return None
        return self.overwrite(self.read(), metrics={"compaction": True})

    def rollback(self, version: int) -> None:
        """Drop snapshots after ``version`` (time-travel restart)."""
        for v in self.versions():
            if v > version:
                os.remove(os.path.join(self.snap_dir, f"v{v:05d}.json"))


class Catalog:
    """Directory of snapshot tables (one crawl-store root).

    Also provides *multi-table checkpoints* (the Iceberg analogue is a
    multi-table transaction / WAP tag): after a crawl round commits all
    its tables, ``save_checkpoint`` records every table's snapshot
    version atomically.  ``restore_last_checkpoint`` rolls every table
    back to the last complete round, so a crash mid-round never leaves
    a torn multi-table state — this is what makes crawls resumable with
    exactly-once table effects (north rule: resumable from checkpoint
    with per-partition lineage).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.ckpt_dir = os.path.join(root, "_checkpoints")
        os.makedirs(root, exist_ok=True)
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def table(self, name: str) -> Table:
        return Table(self.spark, self.root, name)

    def save_checkpoint(self, tag: int, versions: dict[str, int],
                        metrics: dict[str, Any] | None = None) -> None:
        _atomic_write_json(
            os.path.join(self.ckpt_dir, f"c{tag:06d}.json"),
            {"tag": tag, "versions": versions, "metrics": metrics or {}},
        )

    def checkpoints(self) -> list[int]:
        return sorted(
            int(f[1:7])
            for f in os.listdir(self.ckpt_dir)
            if f.startswith("c") and f.endswith(".json")
        )

    def load_checkpoint(self, tag: int) -> dict:
        with open(os.path.join(self.ckpt_dir, f"c{tag:06d}.json")) as f:
            return json.load(f)

    def restore_last_checkpoint(self) -> int | None:
        """Roll every table back to the last complete checkpoint.
        Returns its tag, or None if no checkpoint exists."""
        tags = self.checkpoints()
        if not tags:
            return None
        ck = self.load_checkpoint(tags[-1])
        for name, version in ck["versions"].items():
            self.table(name).rollback(version)
        return ck["tag"]

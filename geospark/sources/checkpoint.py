"""Iceberg-shaped checkpoint store: snapshot dirs + JSON manifests +
per-partition lineage, with stage-level resume.

No Iceberg jars exist offline (SURVEY.md sandbox constraints), so the
layout is Iceberg-*shaped* on Parquet and the API takes a store object a
real Iceberg catalog can replace:

    <root>/<stage>/snapshots/snap-<id>/        part-*.parquet (data)
    <root>/<stage>/manifests/manifest-<id>.json
    <root>/<stage>/_lineage/snap-<id>.parquet  (partition_id, n_rows, wall info)
    <root>/_catalog.json                       stage -> current snapshot

Commit protocol is write-ahead + atomic rename (the manifest only becomes
visible after the data and lineage are fully on disk), so a killed run
resumes cleanly: committed stages are read back, uncommitted ones rerun
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import json
import os
import time
import uuid


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- catalog ----------------------------------------------------------
    def _catalog_path(self) -> str:
        return os.path.join(self.root, "_catalog.json")

    def _read_catalog(self) -> dict:
        try:
            with open(self._catalog_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_catalog(self, cat: dict) -> None:
        tmp = self._catalog_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(cat, f, indent=2, sort_keys=True)
        os.replace(tmp, self._catalog_path())

    # -- paths -------------------------------------------------------------
    def _snap_dir(self, stage: str, snap_id: str) -> str:
        return os.path.join(self.root, stage, "snapshots", f"snap-{snap_id}")

    def _manifest_path(self, stage: str, snap_id: str) -> str:
        return os.path.join(self.root, stage, "manifests",
                            f"manifest-{snap_id}.json")

    def _lineage_dir(self, stage: str, snap_id: str) -> str:
        return os.path.join(self.root, stage, "_lineage",
                            f"snap-{snap_id}.parquet")

    # -- inspection ---------------------------------------------------------
    def current_snapshot(self, stage: str) -> dict | None:
        cat = self._read_catalog()
        snap_id = cat.get(stage)
        if snap_id is None:
            return None
        try:
            with open(self._manifest_path(stage, snap_id)) as f:
                m = json.load(f)
            return m if m.get("status") == "committed" else None
        except FileNotFoundError:
            return None

    def lineage(self, spark, stage: str):
        m = self.current_snapshot(stage)
        if m is None:
            raise KeyError(f"no committed snapshot for stage {stage!r}")
        return spark.read.parquet(self._lineage_dir(stage, m["snapshot_id"]))

    # -- the stage runner ---------------------------------------------------
    def run_stage(self, spark, stage: str, fn, *,
                  inputs_fingerprint: str = "", force: bool = False):
        """Run (or resume) a pipeline stage.

        ``fn() -> DataFrame`` is only invoked when no committed snapshot
        with a matching inputs fingerprint exists. Returns
        (DataFrame, manifest, skipped: bool). Lineage rows record
        per-partition row counts; the manifest records total rows, bytes
        on disk, wall ms and the fingerprint."""
        from pyspark.sql import functions as F

        m = self.current_snapshot(stage)
        if m is not None and not force \
                and m.get("inputs_fingerprint", "") == inputs_fingerprint:
            df = spark.read.parquet(self._snap_dir(stage, m["snapshot_id"]))
            return df, m, True

        snap_id = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        snap_dir = self._snap_dir(stage, snap_id)
        t0 = time.monotonic()
        df = fn()
        df = df.persist()
        # per-partition lineage BEFORE the write re-partitions anything
        lineage = (df.groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(F.count(F.lit(1)).alias("n_rows")))
        df.write.mode("overwrite").parquet(snap_dir)
        lineage.write.mode("overwrite").parquet(
            self._lineage_dir(stage, snap_id))
        wall_ms = int((time.monotonic() - t0) * 1000)
        n_rows = df.count()
        df.unpersist()
        n_bytes = sum(
            os.path.getsize(os.path.join(dp, fn_))
            for dp, _, fns in os.walk(snap_dir) for fn_ in fns)
        manifest = {
            "snapshot_id": snap_id,
            "stage": stage,
            "status": "committed",
            "schema": df.schema.json(),
            "n_rows": n_rows,
            "n_bytes": n_bytes,
            "wall_ms": wall_ms,
            "inputs_fingerprint": inputs_fingerprint,
        }
        mp = self._manifest_path(stage, snap_id)
        os.makedirs(os.path.dirname(mp), exist_ok=True)
        tmp = mp + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, mp)  # atomic commit point
        cat = self._read_catalog()
        cat[stage] = snap_id
        self._write_catalog(cat)
        out = spark.read.parquet(snap_dir)
        return out, manifest, False


def diff_pending(current, done, keys: list[str]):
    """Set-op resume primitive (SURVEY.md §2.2): rows of ``current``
    whose keys are not in ``done`` — the still-pending work items.
    Plain left_anti; Catalyst broadcasts the done side when small."""
    return current.join(done.select(keys).distinct(), keys, "left_anti")


class Pipeline:
    """Stage DAG runner over a CheckpointStore: each stage's fingerprint
    chains the previous one's snapshot id, so editing an upstream stage
    (or force-rerunning it) invalidates everything downstream — the
    checkpoint/resume planner of SURVEY.md §4.2 item 5."""

    def __init__(self, spark, store: CheckpointStore):
        self.spark = spark
        self.store = store
        self._chain = ""
        self.report: list[dict] = []

    def stage(self, name: str, fn, *, force: bool = False):
        df, manifest, skipped = self.store.run_stage(
            self.spark, name, fn,
            inputs_fingerprint=self._chain, force=force)
        self._chain = manifest["snapshot_id"]
        self.report.append({"stage": name, "skipped": skipped,
                            "n_rows": manifest["n_rows"],
                            "n_bytes": manifest["n_bytes"],
                            "wall_ms": manifest["wall_ms"]})
        return df

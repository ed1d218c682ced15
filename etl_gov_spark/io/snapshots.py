"""Snapshot log: versioned commits, time-travel reads, vacuum.

Completes the transactional-table story started by io/cow.py. The
reference's warehouse loads (``dags/tutorial_dag.py`` load task,
``dags/tutorial_objectstorage.py`` publish step) overwrite output
in place — a reader racing a writer sees a torn table, and
yesterday's state is gone the moment today's lands. Real formats
(Delta/Iceberg) fix both with an append-only commit log; none of
those packages ship in this container, so this module implements
the same *mechanism* on plain parquet + JSON:

- a table directory holds immutable data files plus
  ``_snapshots/v{N}.json`` manifests; each manifest is the complete
  file list of one version (never a delta), so reading any version
  is one manifest read + one ``spark.read.parquet(*files)``;
- writers never delete or mutate data files — a MERGE stages new
  files and commits a new manifest whose list = untouched live
  files + staged files. Readers of version N are isolated from any
  concurrent writer because their file set is frozen in the
  manifest (snapshot isolation);
- the commit is a single atomic rename of the manifest JSON —
  torn-table states are unobservable;
- ``vacuum`` deletes data files no retained manifest references —
  storage reclaim is decoupled from correctness, exactly the
  Delta/Iceberg VACUUM contract;
- ``compact_snapshot`` rewrites the live version into fewer,
  range-clustered files as a new version (old versions stay
  readable until vacuumed) — the small-file compaction every
  streaming ingest needs at 100 TB.

Manifests stay O(files) — KBs for thousands of files; nothing here
scales with row count.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SNAPDIR = "_snapshots"


def _snap_dir(table_path: str) -> str:
    return os.path.join(table_path, _SNAPDIR)


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(_snap_dir(table_path), f"v{version:05d}.json")


def snapshot_versions(table_path: str) -> list[int]:
    """Committed versions, ascending. Empty if no log exists."""
    d = _snap_dir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n[1:-5]) for n in os.listdir(d) if n.startswith("v") and n.endswith(".json")
    )


def _read_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as fh:
        return json.load(fh)


def _commit(table_path: str, files: list[str], op: str) -> int:
    """Atomically commit a new version listing ``files`` (relative
    names). The JSON is staged then renamed — a reader either sees
    the complete manifest or the previous version, never a torn
    one."""
    os.makedirs(_snap_dir(table_path), exist_ok=True)
    versions = snapshot_versions(table_path)
    version = (versions[-1] + 1) if versions else 1
    manifest = {
        "version": version,
        "op": op,
        "parent": versions[-1] if versions else None,
        "files": sorted(files),
    }
    tmp = _manifest_path(table_path, version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, _manifest_path(table_path, version))
    return version


def snapshot_init(table_path: str) -> int:
    """Start a snapshot log over an existing parquet directory:
    v1 = every data file currently present."""
    files = [n for n in sorted(os.listdir(table_path)) if n.endswith(".parquet")]
    return _commit(table_path, files, "init")


def live_files(table_path: str, version: int | None = None) -> list[str]:
    """Absolute data-file paths of a version (latest if None)."""
    versions = snapshot_versions(table_path)
    if not versions:
        raise ValueError(f"no snapshot log at {table_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in log {versions}")
    return [os.path.join(table_path, f) for f in _read_manifest(table_path, v)["files"]]


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the exact file set version N committed.

    The file list is frozen at manifest-commit time, so this read is
    isolated from concurrent merges/compactions — they only ever add
    files and commit new manifests."""
    return spark.read.parquet(*live_files(table_path, version))


def merge_upsert_snapshot(
    spark: SparkSession, table_path: str, updates: DataFrame, key: str
) -> dict:
    """File-pruned COW MERGE as a snapshot commit.

    Same pruning as io/cow.merge_upsert_cow — parquet-footer key
    ranges (restricted to the CURRENT version's live files) pick the
    files an update key could live in; only those are read, merged
    and re-staged. Unlike the bare COW merge, superseded files are
    NOT deleted: the new manifest simply stops listing them, so
    every earlier version stays readable until ``vacuum``.
    """
    from etl_gov_spark.io.cow import file_key_ranges, touched_files
    from etl_gov_spark.operators.merge import merge_upsert

    live = live_files(table_path)
    ranges = [r for r in file_key_ranges(table_path, key) if r["file"] in set(live)]
    touched = touched_files(spark, ranges, updates, key)
    schema_src = spark.read.parquet(*live).schema
    if touched:
        base = spark.read.schema(schema_src).parquet(*touched)
    else:
        base = spark.createDataFrame([], schema_src)
    merged = merge_upsert(base, updates.select([f.name for f in schema_src]), key)

    staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
    merged.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(staging)
    new_files: list[str] = []
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            rel = f"merge-{len(new_files):05d}-{uuid.uuid4().hex}.parquet"
            shutil.move(os.path.join(staging, name), os.path.join(table_path, rel))
            new_files.append(rel)
    shutil.rmtree(staging)

    kept = [os.path.basename(p) for p in live if p not in set(touched)]
    version = _commit(table_path, kept + new_files, "merge")
    return {
        "version": version,
        "files_live_before": len(live),
        "files_rewritten": len(touched),
        "files_added": len(new_files),
        "files_kept": len(kept),
    }


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    cluster_col: str,
    target_files: int = 4,
) -> dict:
    """Small-file compaction as a new version: read the live set,
    rewrite range-clustered on ``cluster_col`` into ``target_files``
    files, commit. Old versions keep reading their old files."""
    live = live_files(table_path)
    df = spark.read.parquet(*live)
    staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
    (
        df.repartitionByRange(target_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(staging)
    )
    new_files: list[str] = []
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            rel = f"compact-{len(new_files):05d}-{uuid.uuid4().hex}.parquet"
            shutil.move(os.path.join(staging, name), os.path.join(table_path, rel))
            new_files.append(rel)
    shutil.rmtree(staging)
    version = _commit(table_path, new_files, "compact")
    return {
        "version": version,
        "files_before": len(live),
        "files_after": len(new_files),
    }


def vacuum(table_path: str, keep_last: int = 1) -> dict:
    """Delete data files referenced by NO retained manifest, and the
    manifests of expired versions. Retains the newest ``keep_last``
    versions. Never touches a file a retained version lists, so
    readers of retained versions are unaffected."""
    versions = snapshot_versions(table_path)
    if not versions:
        raise ValueError(f"no snapshot log at {table_path}")
    keep = versions[-max(1, keep_last):]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(table_path, v)["files"])
    removed = 0
    for name in sorted(os.listdir(table_path)):
        if name.endswith(".parquet") and name not in referenced:
            os.remove(os.path.join(table_path, name))
            removed += 1
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(table_path, v))
    return {"versions_kept": keep, "files_removed": removed}


def delete_where_snapshot(
    spark: SparkSession, table_path: str, keys: DataFrame, key: str
) -> dict:
    """File-pruned copy-on-write DELETE as a snapshot commit — the
    GDPR-erasure shape: given a set of subject keys, rewrite ONLY
    the files whose footer key-range can contain one, drop the
    matching rows there, and commit a new manifest. Untouched files
    are carried forward byte-identical; prior versions (including
    the pre-delete one, until ``vacuum``) stay readable for audit.

    Pruning is the same footer-stats mechanism as the snapshot
    MERGE: at 100 TB a delete of k subjects touches O(k) files of a
    range-clustered table, not the whole table.
    """
    from etl_gov_spark.io.cow import file_key_ranges, touched_files

    live = live_files(table_path)
    ranges = [r for r in file_key_ranges(table_path, key) if r["file"] in set(live)]
    touched = touched_files(spark, ranges, keys, key)
    new_files: list[str] = []
    if touched:
        schema_src = spark.read.parquet(*live).schema
        base = spark.read.schema(schema_src).parquet(*touched)
        survivors = base.join(
            keys.select(F.col(key)).distinct(), key, "left_anti"
        )
        staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
        survivors.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(
            staging
        )
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                rel = f"delete-{len(new_files):05d}-{uuid.uuid4().hex}.parquet"
                shutil.move(
                    os.path.join(staging, name), os.path.join(table_path, rel)
                )
                new_files.append(rel)
        shutil.rmtree(staging)
    kept = [os.path.basename(p) for p in live if p not in set(touched)]
    version = _commit(table_path, kept + new_files, "delete")
    return {
        "version": version,
        "files_live_before": len(live),
        "files_rewritten": len(touched),
        "files_added": len(new_files),
        "files_kept": len(kept),
    }


def rollback_snapshot(table_path: str, version: int) -> int:
    """Restore an earlier version as a NEW commit (Delta-style
    RESTORE): the target version's file list is re-committed at the
    head, so the rollback is itself audit-visible history — nothing
    is deleted, and the botched intermediate versions stay
    readable until ``vacuum``."""
    files = [os.path.basename(p) for p in live_files(table_path, version)]
    return _commit(table_path, files, f"rollback_to_v{version}")

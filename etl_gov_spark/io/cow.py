"""Copy-on-write MERGE over range-clustered parquet.

The reference's warehouse load (``dags/tutorial_dag.py`` load task)
rewrites whole output files on every run. At 100 TB that is the
wrong contract: a MERGE whose updates touch 0.1% of the key space
must not rewrite the other 99.9%. Transactional formats
(Delta/Iceberg) solve this with file-level stats in a commit log;
none of those packages ship in this container, so this module
implements the same *mechanism* with what parquet already has:

- tables are laid out with ``write_range_clustered`` (io/sinks.py),
  so every data file covers a disjoint range of the merge key;
- each file's key range is read from its parquet FOOTER row-group
  stats (pyarrow, metadata-only — no data IO);
- the footer ranges (one tiny row per file) are broadcast-joined
  against the updates to find the files an update key could live
  in; only those files are read, merged (same full-outer-join
  semantics as ``operators.merge.merge_upsert``) and replaced.
  Update keys beyond every file's range are new inserts and land
  in the merged output too.

Untouched files are never opened, never rewritten — they stay
byte-identical, which the test asserts with content hashes.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_key_ranges(table_path: str, key: str) -> list[dict]:
    """Per-file [min, max] of ``key`` from parquet footer stats.

    Metadata-only: reads each file's footer (KBs), not its data.
    This is the poor-man's manifest — the same per-file pruning
    stats a Delta/Iceberg commit log would carry.
    """
    import pyarrow.parquet as pq

    out: list[dict] = []
    for name in sorted(os.listdir(table_path)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(table_path, name)
        meta = pq.ParquetFile(path).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[key]
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                # no stats → cannot prune this file; treat as
                # covering everything so it is always merged
                lo, hi = None, None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append({"file": path, "key_min": lo, "key_max": hi})
    return out


def touched_files(
    spark: SparkSession,
    ranges: list[dict],
    updates: DataFrame,
    key: str,
    max_files: int | None = None,
) -> list[str] | None:
    """Files whose key range contains at least one update key.

    The ranges table is one row per file — broadcast it against the
    updates (which stay distributed) and aggregate the distinct hit
    file names. The collect is bounded by the FILE count, never the
    data size — and when ``max_files`` is set, the collect is
    LIMIT-bounded to ``max_files + 1`` rows in the same single job
    (no separate count pass) and ``None`` is returned once the hit
    list would exceed it, so a wide update against an 800k-file
    table never materializes a driver-side file list at all (the
    caller degrades to a full rewrite, which is the cheaper plan at
    that touch ratio anyway).
    """
    no_stats = [r["file"] for r in ranges if r["key_min"] is None]
    with_stats = [r for r in ranges if r["key_min"] is not None]
    if max_files is not None and len(no_stats) > max_files:
        return None
    if not with_stats:
        return no_stats
    rng = spark.createDataFrame(with_stats)
    hits = (
        updates.select(F.col(key).alias("_k"))
        .join(
            F.broadcast(rng),
            (F.col("_k") >= F.col("key_min")) & (F.col("_k") <= F.col("key_max")),
        )
        .select("file")
        .distinct()
    )
    if max_files is not None:
        bound = max_files - len(no_stats)
        rows = hits.limit(bound + 1).collect()
        if len(rows) > bound:
            return None
    else:
        rows = hits.collect()
    return sorted(no_stats + [r["file"] for r in rows])


def envelope_touched_files(
    ranges: list[dict], envelopes: list[tuple]
) -> list[str]:
    """Driver-side, zero-job variant of ``touched_files`` for callers
    that OBSERVE key envelopes on an already-running job (guide §1.5):
    a file is touched iff its footer [key_min, key_max] intersects ANY
    of the observed [lo, hi] envelopes. Still metadata-only — no store
    data is read to decide — but admits range-only false positives, so
    the caller MUST keep an exact key probe (leftsemi on the real key
    set) above the pruned read. Files without stats are always
    included; an all-None envelope (empty batch) matches nothing."""
    out = []
    for r in ranges:
        if r["key_min"] is None:
            out.append(r["file"])
            continue
        for lo, hi in envelopes:
            if lo is not None and hi >= r["key_min"] and lo <= r["key_max"]:
                out.append(r["file"])
                break
    return sorted(out)


def _merge_step(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    order_cols: list[str] | None,
) -> DataFrame:
    """One MERGE of updates into base. Without ``order_cols`` the
    update row wins on matched keys (classic MERGE — correct when
    the caller guarantees update batches arrive in order). With
    ``order_cols`` the row with the GREATER (order_cols) tuple wins
    across base ∪ updates — order-insensitive latest-wins, so
    out-of-order or replayed batches (FileStreamSource mtime ties,
    foreachBatch at-least-once) cannot regress a key to an older
    record."""
    from etl_gov_spark.operators.merge import latest_record_per_key, merge_upsert

    cols = base.columns
    upd = updates.select(cols)
    if order_cols is None:
        return merge_upsert(base, upd, key)
    return latest_record_per_key(
        base.unionByName(upd), [key], order_cols
    ).select(cols)


def merge_upsert_cow(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str,
    max_rewrite_files: int = 10_000,
    order_cols: list[str] | None = None,
) -> dict:
    """Copy-on-write MERGE: rewrite only files updates intersect.

    Returns ``{"files_total", "files_rewritten", "files_kept",
    "degraded_full_rewrite"}``. Matched keys take the update row
    (or, with ``order_cols``, the max-by-(order_cols) row across
    base and update — see ``_merge_step``), unmatched update keys
    are inserted; files outside every update key's range are left
    in place byte-identical.

    ``max_rewrite_files`` bounds the driver-side hit-file list: an
    update wide enough to touch more files than that degrades to a
    single full-table overwrite (one distributed merge + write, no
    per-file commit loop) — at that touch ratio the selective path
    has no IO advantage left and its metadata cost dominates.
    """
    ranges = file_key_ranges(table_path, key)
    touched = touched_files(spark, ranges, updates, key, max_files=max_rewrite_files)
    if touched is None or len(touched) > max_rewrite_files:
        return _merge_full_rewrite(
            spark, table_path, updates, key, len(ranges), order_cols
        )
    schema_src = spark.read.parquet(table_path).schema
    if touched:
        base = spark.read.schema(schema_src).parquet(*touched)
    else:
        base = spark.createDataFrame([], schema_src)
    merged = _merge_step(base, updates, key, order_cols)

    staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
    merged.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(staging)
    # commit: park the superseded originals in a recovery dir, move
    # the staged files in, then drop the recovery dir. Driver-side
    # file moves are metadata ops — the same shape as a transactional
    # format's commit step. Ordering matters for crash safety: at no
    # point are the superseded rows deleted before their replacements
    # are in place, and a failure mid-swap rolls the originals back
    # and drops the staged files, leaving the table exactly as it was
    # (so a foreachBatch at-least-once replay re-merges cleanly).
    superseded = os.path.join(table_path, f"_superseded-{uuid.uuid4().hex}")
    os.makedirs(superseded)
    moved: list[tuple[str, str]] = []
    placed: list[str] = []
    try:
        for path in touched:
            parked = os.path.join(superseded, os.path.basename(path))
            shutil.move(path, parked)
            moved.append((path, parked))
        n_new = 0
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                dest = os.path.join(
                    table_path, f"merge-{n_new:05d}-{uuid.uuid4().hex}.parquet"
                )
                shutil.move(os.path.join(staging, name), dest)
                placed.append(dest)
                n_new += 1
    except BaseException:
        for dest in placed:
            if os.path.exists(dest):
                os.remove(dest)
        for original, parked in moved:
            shutil.move(parked, original)
        shutil.rmtree(superseded, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(superseded)
    shutil.rmtree(staging)
    return {
        "files_total": len(ranges),
        "files_rewritten": len(touched),
        "files_kept": len(ranges) - len(touched),
        "degraded_full_rewrite": False,
    }


def _merge_full_rewrite(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str,
    files_total: int,
    order_cols: list[str] | None = None,
) -> dict:
    """Wide-update fallback: one distributed merge of the whole
    table, staged then swapped in — no driver-side file list.

    Commit order keeps the table readable through a crash: staging
    is written NEXT to the table first; the old dir renames out and
    staging renames in inside one try whose rollback restores the
    old dir — so at every instant except the two renames there is a
    complete table at ``table_path``, and a failed swap puts the
    original back instead of stranding data in a _superseded dir."""
    base = spark.read.parquet(table_path)
    merged = _merge_step(base, updates, key, order_cols)
    staging = os.path.join(
        os.path.dirname(table_path.rstrip("/")),
        f"_full-rewrite-{uuid.uuid4().hex}",
    )
    merged.write.mode("overwrite").parquet(staging)
    old = os.path.join(
        os.path.dirname(table_path.rstrip("/")),
        f"_superseded-{uuid.uuid4().hex}",
    )
    shutil.move(table_path, old)
    try:
        shutil.move(staging, table_path)
    except BaseException:
        shutil.move(old, table_path)
        raise
    shutil.rmtree(old)
    n_new = sum(1 for n in os.listdir(table_path) if n.endswith(".parquet"))
    return {
        "files_total": files_total,
        "files_rewritten": n_new,
        "files_kept": 0,
        "degraded_full_rewrite": True,
    }

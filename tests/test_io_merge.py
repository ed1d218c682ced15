"""Sink-layer scale properties + merge semantics.

The assertions here are about PLANS, not just rows: bucketed tables
must join without a shuffle, partitioned writes must prune, and
compaction must actually reduce file counts — the properties that
matter at 100 TB, checked at sf0.001.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from etl_gov_spark.io.sinks import (
    compact_parquet,
    write_bucketed_table,
    write_parquet,
)
from etl_gov_spark.io.sources import Catalog
from etl_gov_spark.operators import merge as M


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key ⇒ zero Exchange nodes."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c = Catalog(spark, sf_dir)
    try:
        write_bucketed_table(
            c.orders, "b_orders", ("o_orderkey",), 4, sort_cols=("o_orderkey",)
        )
        write_bucketed_table(
            c.lineitem, "b_lineitem", ("l_orderkey",), 4, sort_cols=("l_orderkey",)
        )
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = _plan(joined)
        # the join itself must not shuffle; only the final 1-row agg may
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune at plan time."""
    ev = Catalog(spark, sf_dir).events.withColumn(
        "day", F.to_date("ts").cast("string")
    )
    out = str(tmp_path / "ev_part")
    write_parquet(ev, out, partition_by=("day",))
    n_days = len(glob.glob(f"{out}/day=*"))
    assert n_days > 1
    rd = spark.read.parquet(out)
    one_day = rd.filter(F.col("day") == rd.select(F.min("day")).first()[0])
    files_read = one_day.select(F.input_file_name()).distinct().count()
    all_files = rd.select(F.input_file_name()).distinct().count()
    assert files_read < all_files  # pruned to one partition's files


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    Catalog(spark, sf_dir).orders.repartition(16).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 16
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == Catalog(spark, sf_dir).orders.count()


def test_merge_upsert_semantics(spark):
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, x double"
    )
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    got = {r.k: r for r in M.merge_upsert(cur, upd, "k").collect()}
    assert got[1].v == "a"  # untouched
    assert got[2].v == "B" and got[2].x == 99.0  # updated
    assert got[3].v == "c"  # inserted
    assert len(got) == 3


def test_scd2_runs_collapse_and_validity_chain(spark, tmp_path):
    rows = [
        (1, 100, "O", "1995-01-01"),
        (1, 101, "O", "1995-02-01"),  # same run
        (1, 102, "F", "1995-03-01"),  # change
        (1, 103, "O", "1995-04-01"),  # change back = new run
        (2, 200, "P", "1995-01-15"),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderstatus string, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    tmp = str(tmp_path / "scd")
    df.coalesce(1).write.parquet(f"{tmp}/orders.parquet")
    hist = sorted(
        M.scd2_order_status_history(spark, tmp).collect(),
        key=lambda r: (r.o_custkey, r.run_id),
    )
    c1 = [r for r in hist if r.o_custkey == 1]
    assert [r.o_orderstatus for r in c1] == ["O", "F", "O"]
    assert c1[0].n_orders == 2  # run collapsed two orders
    assert c1[0].valid_to == c1[1].valid_from  # contiguous chain
    assert [r.is_current for r in c1] == [0, 0, 1]
    assert c1[-1].valid_to == "9999-12-31"
    c2 = [r for r in hist if r.o_custkey == 2]
    assert len(c2) == 1 and c2[0].is_current == 1


def test_latest_record_per_key_semantics(spark):
    from etl_gov_spark.operators.merge import latest_record_per_key

    df = spark.createDataFrame(
        [(1, 1, "old", 1.0), (1, 2, "new", 2.0), (2, 5, "only", 3.0)],
        "k long, ver long, v string, x double",
    )
    got = {r.k: r for r in latest_record_per_key(df, ["k"], ["ver"]).collect()}
    assert got[1].v == "new" and got[1].ver == 2
    assert got[2].v == "only"
    assert len(got) == 2


def test_stream_upsert_foreachbatch(spark, sf_dir, tmp_path):
    """Stream → foreachBatch merge: target holds latest event per user."""
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.merge import latest_record_per_key
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.streaming.events_stream import _events_stream
    from etl_gov_spark.streaming.foreach_sink import stream_upsert_to_parquet

    target = str(tmp_path / "user_state")
    stream = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    stream_upsert_to_parquet(stream, target, ["user_id"], ["ts", "event_id"])

    got = {r.user_id: r for r in spark.read.parquet(target).collect()}
    batch = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type"
    )
    want = {
        r.user_id: r
        for r in latest_record_per_key(
            batch, ["user_id"], ["ts", "event_id"]
        ).collect()
    }
    assert set(got) == set(want)
    assert all(got[u].event_id == want[u].event_id for u in want)


def test_bucketed_catalog_end_to_end(spark, sf_dir):
    """Materialize the bucketed catalog, run the co-located demo
    query: the join must be a zero-Exchange SortMergeJoin AND the
    result must equal the plain path-based plan."""
    from etl_gov_spark.io.bucketize import BucketedCatalog, order_lineitem_revenue

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bc = BucketedCatalog(spark, sf_dir, num_buckets=4)
    try:
        created = bc.materialize()
        assert set(created) == {"bkt_orders", "bkt_lineitem"}
        q = order_lineitem_revenue(bc)
        rows = {(r.o_orderkey, r.o_orderstatus, r.net_revenue) for r in q.collect()}
        plan = _plan(q)
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part  # inputs arrive pre-bucketed

        c = Catalog(spark, sf_dir)
        plain = (
            c.orders.select("o_orderkey", "o_orderstatus")
            .join(
                c.lineitem.select(
                    "l_orderkey",
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey", "o_orderstatus")
            .agg(F.round(F.sum("net"), 4).alias("net_revenue"))
        )
        assert rows == {
            (r.o_orderkey, r.o_orderstatus, r.net_revenue) for r in plain.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        bc.drop()


def test_cow_merge_rewrites_only_touched_files(spark, sf_dir, tmp_path):
    """Copy-on-write MERGE: files outside the update key band are
    never rewritten — they stay byte-identical on disk — while the
    merged table carries the updates and inserts."""
    import hashlib
    import os

    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    table = str(tmp_path / "cust_cow")
    write_range_clustered(cust, table, ("c_custkey",), num_files=10)

    def file_hashes() -> dict[str, str]:
        return {
            f: hashlib.sha256(open(os.path.join(table, f), "rb").read()).hexdigest()
            for f in os.listdir(table)
            if f.endswith(".parquet")
        }

    before = file_hashes()
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]
    updates = cust.filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") * 5 <= F.lit(mx))
    ).withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    stats = merge_upsert_cow(spark, table, updates, "c_custkey")

    assert stats["files_total"] == len(before)
    # the band covers ~1/5 of the key space ⇒ most files untouched
    assert stats["files_kept"] >= stats["files_total"] // 2
    assert stats["files_rewritten"] >= 1
    after = file_hashes()
    kept = {f for f in before if f in after}
    assert len(kept) == stats["files_kept"]
    for f in kept:
        assert after[f] == before[f], f"untouched file {f} changed"

    # merged content == full-outer semantics over the whole table
    merged = {r["c_custkey"]: r for r in spark.read.parquet(table).collect()}
    base = {r["c_custkey"]: r for r in cust.collect()}
    upd = {r["c_custkey"]: r for r in updates.collect()}
    assert set(merged) == set(base) | set(upd)
    for k, row in merged.items():
        want = upd.get(k, base.get(k))
        assert abs(row["c_acctbal"] - want["c_acctbal"]) < 1e-9
        assert row["c_mktsegment"] == want["c_mktsegment"]


def test_cow_merge_inserts_beyond_all_ranges(spark, sf_dir, tmp_path):
    """Update keys past every file's max are pure inserts: zero
    existing files rewritten, one new file appended."""
    import os

    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    table = str(tmp_path / "cust_cow_ins")
    write_range_clustered(cust, table, ("c_custkey",), num_files=5)
    n_before = len([f for f in os.listdir(table) if f.endswith(".parquet")])

    inserts = c.nation.select(
        (F.lit(900000) + F.col("n_nationkey").cast("long")).alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    stats = merge_upsert_cow(spark, table, inserts, "c_custkey")
    assert stats["files_rewritten"] == 0
    assert stats["files_kept"] == n_before
    total = spark.read.parquet(table).count()
    assert total == cust.count() + inserts.count()


def test_incremental_rollup_merges_delta_without_history_rescan(spark, sf_dir, tmp_path):
    """Incremental view maintenance: the delta read is partition-
    pruned to the cutover day (plan-asserted), and state+delta
    merge equals the full recompute exactly."""
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    path = str(tmp_path / "ev_days")
    ev.write.partitionBy("day").parquet(path)
    part = spark.read.parquet(path)
    days = sorted(r.day for r in part.select("day").distinct().collect())
    cutoff = days[-1]

    delta_rows = part.filter(F.col("day") == F.lit(cutoff))
    plan = _plan(delta_rows)
    # the scan prunes on the partition column (inputFiles() reflects
    # the unfiltered relation, so the executed plan is the evidence)
    assert "PartitionFilters" in plan and str(cutoff) in plan, plan[:500]

    def rollup(df):
        return df.groupBy("event_type").agg(
            F.sum("value").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )

    merged = M.incremental_rollup_merge(
        rollup(part.filter(F.col("day") < F.lit(cutoff))),
        rollup(delta_rows),
        ["event_type"],
        ["revenue", "n_events"],
    )
    got = {r.event_type: (round(r.revenue, 4), r.n_events) for r in merged.collect()}
    want = {r.event_type: (round(r.revenue, 4), r.n_events) for r in rollup(part).collect()}
    assert got == want


def test_snapshot_merge_time_travel_and_vacuum(spark, sf_dir, tmp_path):
    """Snapshot log: a MERGE commits a new version without deleting
    the old one — v1 reads the exact pre-merge table, v2 the merged
    one, vacuum(keep_last=1) reclaims the superseded files and
    leaves v2 intact."""
    import os

    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        live_files,
        merge_upsert_snapshot,
        read_snapshot,
        snapshot_init,
        snapshot_versions,
        vacuum,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    table = str(tmp_path / "cust_snap")
    write_range_clustered(cust, table, ("c_custkey",), num_files=8)
    assert snapshot_init(table) == 1

    base = {r["c_custkey"]: r["c_acctbal"] for r in cust.collect()}
    mx = max(base)
    updates = cust.filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") * 5 <= F.lit(mx))
    ).withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    stats = merge_upsert_snapshot(spark, table, updates, "c_custkey")
    assert stats["version"] == 2
    assert stats["files_rewritten"] >= 1
    assert stats["files_kept"] >= stats["files_live_before"] // 2

    # v1 is the EXACT pre-merge state even though merge files now
    # share the directory
    v1 = {r["c_custkey"]: r["c_acctbal"] for r in read_snapshot(spark, table, 1).collect()}
    assert v1 == base
    # v2 carries every update
    v2 = {r["c_custkey"]: r["c_acctbal"] for r in read_snapshot(spark, table, 2).collect()}
    upd = {r["c_custkey"]: r["c_acctbal"] for r in updates.collect()}
    assert set(v2) == set(base)
    for k, bal in upd.items():
        assert abs(v2[k] - bal) < 1e-9
    # superseded files still on disk (v1 needs them) until vacuum
    on_disk = {f for f in os.listdir(table) if f.endswith(".parquet")}
    assert {os.path.basename(p) for p in live_files(table, 1)} <= on_disk

    res = vacuum(table, keep_last=1)
    assert res["files_removed"] == stats["files_rewritten"]
    assert snapshot_versions(table) == [2]
    v2b = {r["c_custkey"]: r["c_acctbal"] for r in read_snapshot(spark, table).collect()}
    assert v2b == v2


def test_snapshot_compaction_preserves_data_and_history(spark, sf_dir, tmp_path):
    """Compaction rewrites the live version into fewer files as a
    NEW version; row content is unchanged and the pre-compaction
    version stays readable."""
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        compact_snapshot,
        read_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_acctbal")
    table = str(tmp_path / "cust_compact")
    write_range_clustered(cust, table, ("c_custkey",), num_files=12)
    snapshot_init(table)
    res = compact_snapshot(spark, table, "c_custkey", target_files=3)
    assert res["files_after"] < res["files_before"]
    before = {r["c_custkey"]: r["c_acctbal"] for r in read_snapshot(spark, table, 1).collect()}
    after = {r["c_custkey"]: r["c_acctbal"] for r in read_snapshot(spark, table, 2).collect()}
    assert after == before


def test_snapshot_pruned_read_skips_files_per_version(spark, sf_dir, tmp_path):
    """Manifest-driven data skipping: a range predicate on the
    cluster key reads a strict subset of the version's files, and
    still returns exactly the full-scan-filter rows — on BOTH a
    pre-merge and post-merge version."""
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.skipping import prune_files, read_snapshot_pruned
    from etl_gov_spark.io.snapshots import (
        live_files,
        merge_upsert_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_acctbal")
    table = str(tmp_path / "cust_snap_prune")
    write_range_clustered(cust, table, ("c_custkey",), num_files=8)
    snapshot_init(table)
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]
    updates = cust.filter(F.col("c_custkey") <= mx // 4).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )
    merge_upsert_snapshot(spark, table, updates, "c_custkey")

    band = {"c_custkey": (1, mx // 8)}
    for version in (1, 2):
        files = live_files(table, version)
        sel, tot = prune_files(table, band, files)
        assert 0 < len(sel) < tot, f"v{version}: no skipping"
        got = {
            (r.c_custkey, round(r.c_acctbal, 4))
            for r in read_snapshot_pruned(spark, table, band, version).collect()
        }
        bump = 1.0 if version == 2 else 0.0
        want = {
            (r.c_custkey, round(r.c_acctbal + bump, 4))
            for r in cust.filter(
                (F.col("c_custkey") >= 1) & (F.col("c_custkey") <= mx // 8)
            ).collect()
        }
        assert got == want


def test_snapshot_delete_prunes_files_and_keeps_history(spark, sf_dir, tmp_path):
    """COW DELETE: only footer-range-hit files are rewritten (the
    rest stay byte-identical), the doomed keys are gone from the new
    version, and the pre-delete version still reads in full."""
    import hashlib
    import os

    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        delete_where_snapshot,
        read_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal")
    table = str(tmp_path / "cust_snapdel")
    write_range_clustered(cust, table, ("c_custkey",), num_files=10)
    snapshot_init(table)

    def file_hashes() -> dict[str, str]:
        return {
            f: hashlib.sha256(open(os.path.join(table, f), "rb").read()).hexdigest()
            for f in os.listdir(table)
            if f.endswith(".parquet")
        }

    before = file_hashes()
    n_total = cust.count()
    # delete a narrow key band: only the files covering it get rewritten
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]
    doomed = cust.filter(F.col("c_custkey") * 10 <= F.lit(mx)).select("c_custkey")
    n_doomed = doomed.count()
    stats = delete_where_snapshot(spark, table, doomed, "c_custkey")

    assert 0 < stats["files_rewritten"] < stats["files_live_before"]
    # COW invariant: no pre-existing file is ever mutated — superseded
    # ones just drop out of the new manifest (kept for time travel)
    after = file_hashes()
    assert all(before[f] == after[f] for f in before)
    from etl_gov_spark.io.snapshots import live_files

    live2 = {os.path.basename(p) for p in live_files(table)}
    kept_orig = [f for f in before if f in live2]
    assert len(kept_orig) == stats["files_kept"]
    assert len(live2) == stats["files_kept"] + stats["files_added"]

    v2 = read_snapshot(spark, table)
    assert v2.count() == n_total - n_doomed
    assert v2.filter(F.col("c_custkey") * 10 <= F.lit(mx)).count() == 0
    # time travel: the pre-delete version is intact
    assert read_snapshot(spark, table, 1).count() == n_total


def test_incremental_join_mv_matches_full_recompute(spark, sf_dir):
    from etl_gov_spark.operators.merge import q_incremental_join_mv

    got = {
        r.c_nationkey: (r.net_revenue, r.n_lines)
        for r in q_incremental_join_mv(spark, sf_dir).collect()
    }
    c = Catalog(spark, sf_dir)
    full = (
        c.lineitem.join(
            c.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("net"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {r.c_nationkey: (r.net, r.n) for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 0.02


def test_snapshot_rollback_restores_v1_and_keeps_history(spark, sf_dir, tmp_path):
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        merge_upsert_snapshot,
        read_snapshot,
        rollback_snapshot,
        snapshot_init,
        snapshot_versions,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_acctbal")
    table = str(tmp_path / "cust_rb")
    write_range_clustered(cust, table, ("c_custkey",), num_files=6)
    snapshot_init(table)
    before = cust.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]

    updates = cust.filter(F.col("c_custkey") % 4 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    merge_upsert_snapshot(spark, table, updates, "c_custkey")
    v3 = rollback_snapshot(table, 1)
    assert snapshot_versions(table) == [1, 2, 3] and v3 == 3

    head = read_snapshot(spark, table).agg(
        F.round(F.sum("c_acctbal"), 2)
    ).collect()[0][0]
    assert head == before  # restored exactly
    # the botched v2 stays readable for audit
    v2 = read_snapshot(spark, table, 2).agg(
        F.round(F.sum("c_acctbal"), 2)
    ).collect()[0][0]
    assert v2 != before


def test_cow_wide_update_degrades_to_full_rewrite(spark, sf_dir, tmp_path):
    """An update touching more files than max_rewrite_files must NOT
    build a driver-side hit-file list: the merge degrades to one
    distributed full rewrite, still upsert-correct (io/cow.py)."""
    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table = str(tmp_path / "cust_cow")
    write_range_clustered(cust, table, ("c_custkey",), num_files=8)
    # updates span every file's key range → 8 of 8 files touched,
    # over the cap of 2
    updates = cust.withColumn("c_acctbal", F.col("c_acctbal") + 1.0)
    stats = merge_upsert_cow(
        spark, table, updates, "c_custkey", max_rewrite_files=2
    )
    assert stats["degraded_full_rewrite"] is True
    assert stats["files_kept"] == 0
    merged = spark.read.parquet(table)
    assert merged.count() == cust.count()
    # every balance incremented exactly once
    before = dict(cust.collect())
    after = dict(merged.collect())
    assert all(abs(after[k] - (v + 1.0)) < 1e-6 for k, v in before.items())


def test_cow_narrow_update_still_selective(spark, sf_dir, tmp_path):
    """Same cap, narrow update: selective path keeps untouched files
    byte-identical (guard must not change the fast path)."""
    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    table = str(tmp_path / "cust_cow2")
    write_range_clustered(cust, table, ("c_custkey",), num_files=8)
    lo = cust.agg(F.min("c_custkey")).collect()[0][0]
    updates = cust.filter(F.col("c_custkey") == lo).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )
    stats = merge_upsert_cow(
        spark, table, updates, "c_custkey", max_rewrite_files=100
    )
    assert stats["degraded_full_rewrite"] is False
    assert stats["files_rewritten"] == 1 and stats["files_kept"] == 7


def test_cow_selective_commit_rolls_back_on_failure(spark, sf_dir, tmp_path, monkeypatch):
    """A crash mid-swap must leave the table exactly as it was:
    superseded originals restored, no staged or _superseded debris —
    so an at-least-once replay re-merges against uncorrupted state."""
    import hashlib
    import os
    import shutil as real_shutil
    import types

    from etl_gov_spark.io import cow
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import read_table

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    table = str(tmp_path / "cust_cow_crash")
    write_range_clustered(cust, table, ("c_custkey",), num_files=8)

    def file_hashes() -> dict[str, str]:
        return {
            f: hashlib.sha256(open(os.path.join(table, f), "rb").read()).hexdigest()
            for f in os.listdir(table)
            if f.endswith(".parquet")
        }

    before = file_hashes()
    lo = cust.agg(F.min("c_custkey")).collect()[0][0]
    updates = cust.filter(F.col("c_custkey") == lo).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )

    def failing_move(src, dst, *a, **kw):
        # the park moves (into _superseded-*) succeed; the first
        # staged-file move into the table blows up mid-commit
        if os.path.basename(str(dst)).startswith("merge-"):
            raise OSError("simulated crash mid-swap")
        return real_shutil.move(src, dst, *a, **kw)

    fake = types.SimpleNamespace(
        move=failing_move, rmtree=real_shutil.rmtree
    )
    monkeypatch.setattr(cow, "shutil", fake)
    with pytest.raises(OSError, match="simulated crash"):
        cow.merge_upsert_cow(spark, table, updates, "c_custkey")
    monkeypatch.setattr(cow, "shutil", real_shutil)

    after = file_hashes()
    assert after == before, "rollback must restore the exact file set"
    leftover = [d for d in os.listdir(table) if d.startswith(("_staging", "_superseded"))]
    assert leftover == []
    # and a clean retry (the replay) succeeds against intact state
    stats = cow.merge_upsert_cow(spark, table, updates, "c_custkey")
    assert stats["degraded_full_rewrite"] is False
    got = spark.read.parquet(table).filter(F.col("c_custkey") == lo).collect()
    base = cust.filter(F.col("c_custkey") == lo).collect()[0]["c_acctbal"]
    assert abs(got[0]["c_acctbal"] - (base + 1.0)) < 1e-9


def test_cdc_batches_out_of_order_converge(spark, sf_dir, tmp_path):
    """Order-insensitive latest-wins: applying the NEWER chunk first
    and the older chunk second must yield the same state as the
    in-order application (max-by-(order_cols) across state ∪ batch)."""
    from etl_gov_spark.streaming.cdc_stream import apply_cdc_batch

    rows = [
        (1, "2024-01-01", 10, "O", 100.0),
        (1, "2024-03-01", 30, "F", 300.0),
        (2, "2024-02-01", 20, "O", 200.0),
        (2, "2024-01-15", 15, "F", 150.0),
        (3, "2024-01-05", 5, "O", 50.0),
    ]
    cols = ["o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice"]
    df = spark.createDataFrame(rows, cols)
    old_batch = df.filter(F.col("o_orderkey") <= 15)
    new_batch = df.filter(F.col("o_orderkey") > 15)

    def run(order):
        state = str(tmp_path / f"state_{order[0].__hash__()}_{id(order)}")
        for b in order:
            apply_cdc_batch(
                spark, state, b, "o_custkey", ["o_orderdate", "o_orderkey"],
                num_files=2,
            )
        return {
            r["o_custkey"]: (r["o_orderkey"], r["o_totalprice"])
            for r in spark.read.parquet(state).collect()
        }

    in_order = run([old_batch, new_batch])
    reversed_order = run([new_batch, old_batch])
    assert in_order == reversed_order
    assert in_order == {1: (30, 300.0), 2: (20, 200.0), 3: (5, 50.0)}

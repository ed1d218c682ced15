"""Text metrics sanity, multimodal plumbing, stream/batch parity."""

from __future__ import annotations

import hashlib

import pytest

from etl_gov_spark.operators import multimodal as M
from etl_gov_spark.operators import text as T
from etl_gov_spark.operators.timeseries import q_tumbling_hourly
from etl_gov_spark.streaming.events_stream import stream_hourly_counts


def test_text_quality_bounds(spark, sf_dir):
    rows = T.text_quality(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_words > 0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0


def test_text_fingerprint_matches_hashlib(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table

    doc = read_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0]
    fp = T.text_fingerprint(spark, sf_dir).filter("doc_id = 0").collect()[0]
    assert fp.md5_raw == hashlib.md5(doc.text.encode()).hexdigest()


def test_mm_binary_meta_plumbing(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table

    docs = {r.doc_id: r.text for r in read_table(spark, sf_dir, "documents").collect()}
    metas = M.mm_binary_meta(spark, sf_dir).collect()
    assert len(metas) == len(docs)
    sample = next(m for m in metas if m.doc_id == 0)
    payload = docs[0].encode()
    expect = M.fake_decode_meta(payload)
    assert sample.n_bytes == expect["n_bytes"]
    assert sample.content_md5 == expect["content_md5"]
    assert sample.width == expect["width"] and sample.fmt == expect["fmt"]


def test_decode_stub_raises_without_media_libs():
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG")


def test_stream_batch_parity(spark, sf_dir):
    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in q_tumbling_hourly(spark, sf_dir).collect()
    }
    stream = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in stream_hourly_counts(spark, sf_dir).collect()
    }
    assert stream == batch


def test_frame_sample_fanout_and_determinism(spark, sf_dir):
    from etl_gov_spark.operators.multimodal import mm_frame_sample

    df = mm_frame_sample(spark, sf_dir)
    n_docs = df.select("doc_id").distinct().count()
    assert df.count() == n_docs * 4  # k frames per doc
    a = {(r.doc_id, r.frame_idx): r.frame_md5 for r in df.collect()}
    b = {(r.doc_id, r.frame_idx): r.frame_md5 for r in mm_frame_sample(spark, sf_dir).collect()}
    assert a == b


def test_feature_extract_shape_and_l1_norm(spark, sf_dir):
    """`feature` ships as a fixed-format JSON string (hashable for
    external comparison tooling) — parse it back to check the vector
    contract."""
    import json

    from etl_gov_spark.operators.multimodal import mm_feature_extract

    rows = mm_feature_extract(spark, sf_dir).collect()
    vecs = [json.loads(r.feature) for r in rows]
    assert all(len(v) == 8 for v in vecs)
    assert all(abs(sum(v) - 1.0) < 0.01 for v in vecs)  # L1-normalized
    assert all(0 < r.feat_norm <= 1.0 for r in rows)


def test_rate_source_micro_batch(spark):
    """Rate source (synthetic benchmark stream): one availableNow-style
    bounded pull into memory proves the source wiring."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .withColumn("bucket", F.pmod("value", F.lit(4)))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 20
        while time.monotonic() < deadline and spark.table("rate_sink").count() == 0:
            time.sleep(0.5)
        assert spark.table("rate_sink").count() > 0
    finally:
        q.stop()


def test_session_window_matches_batch_sessionize(spark, sf_dir):
    """Native session_window stream == batch gap-sessionization
    (same sessions, same per-session stats) on a finite source."""
    from etl_gov_spark.operators.timeseries import q_sessionize
    from etl_gov_spark.streaming.events_stream import stream_session_window

    stream = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in stream_session_window(spark, sf_dir).collect()
    }
    batch = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in q_sessionize(spark, sf_dir).collect()
    }
    assert stream == batch


def test_shard_manifest_partitions_every_doc_once(spark, sf_dir):
    from pyspark.sql import functions as F2

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.multimodal import SHARD_BYTES, mm_shard_manifest

    rows = mm_shard_manifest(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_items for r in rows) == n_docs
    for r in rows:
        assert r.first_doc <= r.last_doc
        # a shard only overflows by at most one item's bytes
        if r.n_items > 1:
            assert r.shard_bytes >= SHARD_BYTES * r.fill_ratio - 1


def test_feature_hash_stable_and_bounded(spark, sf_dir):
    from etl_gov_spark.operators.text import _FH_DIM, text_feature_hash

    a = {r.doc_id: r for r in text_feature_hash(spark, sf_dir).collect()}
    b = {r.doc_id: r for r in text_feature_hash(spark, sf_dir).collect()}
    assert {k: v.vec_md5 for k, v in a.items()} == {
        k: v.vec_md5 for k, v in b.items()
    }  # deterministic vectors
    for r in a.values():
        assert 1 <= r.nnz <= min(_FH_DIM, r.n_tokens)
        assert r.max_count <= r.n_tokens


def test_checkpointed_stream_restarts_incrementally(spark, tmp_path):
    """File-stream + checkpoint: a restarted query processes ONLY
    files that arrived since the last run (exactly-once incremental
    ingestion, the production loader contract)."""
    import glob as g

    from pyspark.sql import functions as F2

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id long, v string")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 2
    # new file arrives; restart must pick up ONLY the delta
    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    rows = {r.id for r in spark.read.parquet(out).collect()}
    assert rows == {1, 2, 3}
    assert spark.read.parquet(out).count() == 3  # no reprocessing duplicates


def test_scd2_temporal_join_covers_all_lines(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.merge import scd2_temporal_join

    rows = scd2_temporal_join(spark, sf_dir).collect()
    n_lines = read_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_lines for r in rows) == n_lines  # every line attributed
    assert {r.status_at_ship for r in rows} <= {"F", "O", "P", "unknown"}


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.streaming.events_stream import stream_static_enrich

    got = {r.tier: (r.n_events, r.total_value) for r in stream_static_enrich(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events")
    profile = (
        ev.groupBy("user_id")
        .agg(F2.avg("value").alias("_avg"))
        .withColumn("tier", F2.ntile(3).over(Window.orderBy(F2.asc("_avg"), F2.asc("user_id"))))
        .select("user_id", "tier")
    )
    batch = {
        r.tier: (r.n, round(r.v, 4))
        for r in ev.join(profile, "user_id")
        .groupBy("tier")
        .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("value").alias("v"))
        .collect()
    }
    assert got == batch


def test_watermark_drops_late_rows_across_restarts(spark, tmp_path):
    """Aggregation watermark semantics end-to-end: after batch 1
    advances the watermark, a restart feeding events older than
    (max_ts - watermark) must NOT change closed windows (append
    mode only emits finalized windows; late rows are dropped)."""
    import datetime

    from pyspark.sql import functions as F2

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, mode):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode(mode).parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F2.window("ts", "1 hour").alias("win"))
            .agg(F2.count(F2.lit(1)).alias("n"))
            .select(F2.col("win.start").alias("h"), "n")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = datetime.datetime(2024, 6, 1, 0, 30)
    late = datetime.datetime(2024, 6, 1, 1, 30)
    head = datetime.datetime(2024, 6, 1, 12, 0)  # advances watermark to 11:00
    write_batch([(1, t0, 1.0), (1, late, 1.0), (1, head, 1.0)], "overwrite")
    run_once()
    first = {r.h: r.n for r in spark.read.parquet(out).collect()}
    assert first.get(datetime.datetime(2024, 6, 1, 0, 0)) == 1  # closed window emitted
    assert first.get(datetime.datetime(2024, 6, 1, 1, 0)) == 1

    # batch 2: an event for the long-closed 00:00 window → dropped
    write_batch([(1, datetime.datetime(2024, 6, 1, 0, 45), 1.0)], "append")
    run_once()
    final = {r.h: r.n for r in spark.read.parquet(out).collect()}
    assert final.get(datetime.datetime(2024, 6, 1, 0, 0)) == 1  # unchanged: late row dropped


def test_mapinpandas_receives_bounded_arrow_batches(spark, sf_dir):
    """Batch-shape contract: with maxRecordsPerBatch=50, the
    mapInPandas UDF must see multiple bounded pandas batches, not
    one giant frame — the property that keeps Python memory flat
    when payloads are large."""
    import pandas as pd

    from etl_gov_spark.io.sources import Catalog

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
        docs = Catalog(spark, sf_dir).documents.select("doc_id").coalesce(1)

        def batch_sizes(it):
            for pdf in it:
                yield pd.DataFrame({"batch_len": [len(pdf)]})

        sizes = [
            r.batch_len
            for r in docs.mapInPandas(batch_sizes, "batch_len long").collect()
        ]
        assert len(sizes) > 1  # multiple batches for 500 rows
        assert max(sizes) <= 50  # bounded by the Arrow batch cap
        assert sum(sizes) == 500
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_modality_mix_partitions_all_payloads(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.multimodal import mm_modality_mix

    rows = mm_modality_mix(spark, sf_dir).collect()
    assert sum(r.n_payloads for r in rows) == read_table(spark, sf_dir, "documents").count()
    assert {r.fmt for r in rows} <= {"png", "jpeg", "webp"}


def test_frame_dedup_catches_shared_frames(spark, tmp_path_factory):
    """Two docs sharing identical leading bytes (a shared 'intro')
    collide on frame 0; unique docs contribute nothing."""
    from etl_gov_spark.operators.multimodal import mm_frame_dedup

    tmp = str(tmp_path_factory.mktemp("framededup"))
    intro = "SHAREDINTROBYTES"  # 16 bytes = exactly one frame window
    rows = [
        (0, intro + " unique tail one for document zero padded out", "en", "s", 60),
        (1, intro + " a different continuation for document one xx", "en", "s", 60),
        (2, "completely different content with no shared bytes", "en", "s", 50),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r.frame_md5: r for r in mm_frame_dedup(spark, tmp).collect()}
    import hashlib

    shared = hashlib.md5(intro.encode()).hexdigest()
    assert shared in got
    assert got[shared].n_docs == 2 and got[shared].canonical_doc == 0


def test_winnow_guarantee_detects_shared_substring(spark, tmp_path_factory):
    """Winnowing guarantee: any shared substring of >= k + w - 1
    chars yields a shared selected fingerprint, so the planted pair
    must surface; unrelated docs must not pair with rank 1."""
    from etl_gov_spark.operators.text import WINNOW_K, WINNOW_W, text_winnow_overlap

    tmp = str(tmp_path_factory.mktemp("winnow"))
    shared = "the quick brown fox jumped over the lazy dog again"  # 50 > 23
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    rows = [
        (0, "intro text first " + shared + " and a unique tail here", "en", "s", 90),
        (1, "other beginning " + shared + " different ending words", "en", "s", 90),
        (2, "completely unrelated content talking about parquet files and "
            "columnar formats for large analytical workloads", "en", "s", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = text_winnow_overlap(spark, tmp).collect()
    top = next(r for r in got if r.rank == 1)
    assert (top.doc_a, top.doc_b) == (0, 1)
    assert top.n_shared >= 1 and 0 < top.overlap_coeff <= 1.0


def test_readability_orders_simple_above_dense_text(spark, tmp_path_factory):
    """A short-word simple sentence must score higher Flesch than
    polysyllabic legalese; counts are exact on a known sentence."""
    from etl_gov_spark.operators.text import text_readability

    tmp = str(tmp_path_factory.mktemp("readability"))
    rows = [
        (0, "The cat sat on the mat. It was fat.", "en", "s", 36),
        (1, "Notwithstanding aforementioned administrative responsibilities, "
            "intergovernmental organizations habitually promulgate "
            "incomprehensible documentation.", "en", "s", 150),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r.doc_id: r for r in text_readability(spark, tmp).collect()}
    assert got[0].n_words == 9 and got[0].n_sentences == 2
    assert got[0].flesch > got[1].flesch
    assert got[0].band == "easy" and got[1].band == "difficult"


def test_scene_cuts_census(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.multimodal import mm_scene_cuts

    rows = mm_scene_cuts(spark, sf_dir).collect()
    assert rows
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_payloads for r in rows) == n_docs
    for r in rows:
        assert 1 <= r.n_scenes <= r.n_frames == 4


def test_stream_hourly_users_matches_batch_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.streaming.events_stream import stream_hourly_users

    got = {r.hour: r.n_users for r in stream_hourly_users(spark, sf_dir).collect()}
    want = {
        r.hour: r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_filter_cascade_monotone(spark, sf_dir):
    from etl_gov_spark.operators.multimodal import mm_filter_cascade

    r = mm_filter_cascade(spark, sf_dir).collect()[0]
    assert r.n_input >= r.after_size >= r.after_dims >= r.after_dedup >= 0
    assert 0.0 <= r.retention <= 1.0


def test_streaming_dedup_state_evicts(spark, tmp_path):
    """The stream_hourly_users dedup keys on the WATERMARKED window
    struct, so (user, hour) state is dropped once the watermark
    passes hour + 2h. Feed three files whose event times jump 6h
    apart, one file per micro-batch: by the last batch the watermark
    has passed the first file's windows, so the dedup state store
    must hold FEWER rows than the total distinct keys seen — the
    bounded-state contract a continuous run needs."""
    import datetime as dt

    from pyspark.sql import functions as F2

    src = str(tmp_path / "ev")
    base = dt.datetime(2026, 1, 1, 0, 30)
    for i, fname in enumerate(["a", "b", "c"]):
        rows = [
            (u, base + dt.timedelta(hours=6 * i, minutes=u))
            for u in range(10)
        ]
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(src)
        # one parquet part per write; rename-free ordering is by mod
        # time then path, and appends arrive in wall-clock order
    deduped = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .select("user_id", F2.window("ts", "1 hour").alias("win"))
        .dropDuplicates(["user_id", "win"])
    )
    agg = deduped.groupBy(F2.col("win.start").alias("hour")).agg(
        F2.count(F2.lit(1)).alias("n_users")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("dedup_evict_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert len(progresses) >= 3  # one micro-batch per file
    dedup_ops = [
        op
        for p in progresses
        for op in p["stateOperators"]
        if op["operatorName"] == "dedupe"
    ]
    final_rows = dedup_ops[-1]["numRowsTotal"]
    removed = sum(op["numRowsRemoved"] for op in dedup_ops)
    # 30 distinct (user, hour) keys were seen; eviction must have
    # dropped the first batch's 10 by the time the last batch ran
    assert final_rows < 30, f"state never evicted: {final_rows} rows"
    assert removed >= 10
    # and the answer is still exact
    got = {
        r.hour: r.n_users for r in spark.table("dedup_evict_sink").collect()
    }
    assert len(got) == 3 and all(n == 10 for n in got.values())


def test_stream_cdc_upsert_builds_state_incrementally(spark, sf_dir):
    """The CDC apply must merge one chunk per trigger through the
    copy-on-write state table and the final state must equal the
    batch change-log compaction exactly."""
    from etl_gov_spark.operators.merge import cdc_latest_order_state
    from etl_gov_spark.streaming import cdc_stream

    got = {
        r.o_custkey: (r.o_orderkey, r.o_orderdate, r.o_totalprice)
        for r in cdc_stream.stream_cdc_upsert(spark, sf_dir).collect()
    }
    want = {
        r.o_custkey: (r.o_orderkey, r.o_orderdate, r.o_totalprice)
        for r in cdc_latest_order_state(spark, sf_dir).collect()
    }
    assert got == want


def test_apply_cdc_batch_keeps_untouched_state_files_byte_identical(
    spark, tmp_path
):
    """A CDC batch whose keys live in one corner of the key space
    must rewrite only the state files those keys can hit — every
    other file stays byte-identical on disk (the merge_upsert_pruned
    hash-assert contract, now on the streaming apply path)."""
    import os

    from etl_gov_spark.streaming.cdc_stream import apply_cdc_batch

    schema = (
        "o_custkey long, o_orderdate string, o_orderkey long,"
        " o_orderstatus string, o_totalprice double"
    )
    state = str(tmp_path / "state")
    base = spark.createDataFrame(
        [
            (k, f"2024-01-0{1 + k % 5}", k * 10, "O", float(k))
            for k in range(1, 401)
        ],
        schema,
    )
    apply_cdc_batch(
        spark, state, base, "o_custkey", ["o_orderdate", "o_orderkey"],
        num_files=8,
    )

    def file_hashes() -> dict[str, str]:
        return {
            n: hashlib.md5(
                open(os.path.join(state, n), "rb").read()
            ).hexdigest()
            for n in os.listdir(state)
            if n.endswith(".parquet")
        }

    before = file_hashes()
    assert len(before) == 8
    batch = spark.createDataFrame(
        [
            (k, "2024-02-01", k * 10 + 1, "F", float(k) + 0.5)
            for k in range(380, 401)
        ],
        schema,
    )
    stats = apply_cdc_batch(
        spark, state, batch, "o_custkey", ["o_orderdate", "o_orderkey"],
        num_files=8,
    )
    assert stats["degraded_full_rewrite"] is False
    assert 0 < stats["files_rewritten"] < 8
    assert stats["files_kept"] == 8 - stats["files_rewritten"]

    after = file_hashes()
    kept = set(before) & set(after)
    assert len(kept) == stats["files_kept"]
    for name in kept:
        assert before[name] == after[name], name

    # state correctness: updated keys took the batch row, others kept
    final = {
        r.o_custkey: (r.o_orderkey, r.o_orderstatus)
        for r in spark.read.parquet(state).collect()
    }
    assert len(final) == 400
    assert final[390] == (3901, "F") and final[10] == (100, "O")


def test_stopword_profile_dominant_language(spark, sf_dir):
    """Shares are in [0,1]; every source has some stopword signal in
    at least one language list."""
    from etl_gov_spark.operators.text import text_stopword_profile

    rows = text_stopword_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        shares = [
            r.stop_share_en, r.stop_share_es, r.stop_share_fr, r.stop_share_de
        ]
        assert all(0.0 <= x <= 1.0 for x in shares)


def test_word_length_profile_ordering(spark, sf_dir):
    from etl_gov_spark.operators.text import text_word_length_profile

    rows = text_word_length_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 <= r.mean_len <= r.p90_len
        assert 0.0 <= r.long_word_share <= 1.0


def test_aspect_ratio_census_partitions_corpus(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.multimodal import mm_aspect_ratio_census

    rows = mm_aspect_ratio_census(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_items for r in rows) == read_table(
        spark, sf_dir, "documents"
    ).count()
    for r in rows:
        assert r.shape in ("wide", "landscape", "portrait", "tall")
        assert r.mean_aspect > 0


def test_hapax_profile_bounds(spark, sf_dir):
    from etl_gov_spark.operators.text import text_hapax_profile

    rows = text_hapax_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert 0.0 <= r.hapax_token_share <= r.hapax_type_share <= 1.0


def test_digit_density_ordering(spark, sf_dir):
    """pure-digit ⊆ any-digit and alnum-mix ⊆ any-digit."""
    from etl_gov_spark.operators.text import text_digit_density

    rows = text_digit_density(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pure_digit_share <= r.any_digit_share <= 1.0
        assert 0.0 <= r.alnum_mix_share <= r.any_digit_share


def test_outer_join_unmatched_emits_exactly_once(spark, tmp_path):
    """Stream-stream LEFT OUTER join semantics end-to-end: a click
    with no purchase in its 30-min window emits with NULL purchase
    exactly ONCE — when the global watermark passes its window — and
    never again on later batches; a matched click emits its pair and
    no null row. This is the eviction contract
    stream_click_attribution_outer's batch readout relies on."""
    import datetime

    from pyspark.sql import functions as F2

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, event_type string, ts timestamp"

    def write_batch(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)

    def run_once():
        ev = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        clicks = (
            ev.filter(F2.col("event_type") == "click")
            .select(
                F2.col("event_id").alias("click_id"),
                "user_id",
                F2.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            ev.filter(F2.col("event_type") == "purchase")
            .select(
                F2.col("event_id").alias("purchase_id"),
                F2.col("user_id").alias("p_user_id"),
                F2.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        q = (
            clicks.join(
                purchases,
                (F2.col("user_id") == F2.col("p_user_id"))
                & (F2.col("purchase_ts") >= F2.col("click_ts"))
                & (
                    F2.col("purchase_ts")
                    <= F2.col("click_ts") + F2.expr("INTERVAL 30 MINUTES")
                ),
                "leftOuter",
            )
            .select("user_id", "click_id", "purchase_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda h, m: datetime.datetime(2024, 6, 1, h, m)  # noqa: E731
    # batch 1: c1 (user 1) gets no purchase; c2 (user 2) converts
    write_batch(
        [
            (1, 1, "click", t(0, 0)),
            (2, 2, "click", t(0, 5)),
            (3, 2, "purchase", t(0, 20)),
        ],
        "overwrite",
    )
    run_once()
    # batch 2: head events on BOTH sides push the global watermark to
    # 05:00 — far past c1's 00:30 window end → the null row must emit
    write_batch([(4, 9, "click", t(6, 0)), (5, 9, "purchase", t(6, 0))], "append")
    run_once()
    rows = spark.read.parquet(out).collect()
    c1 = [r for r in rows if r.click_id == 1]
    assert len(c1) == 1 and c1[0].purchase_id is None  # emitted once, null-padded
    c2 = [r for r in rows if r.click_id == 2]
    assert len(c2) == 1 and c2[0].purchase_id == 3  # matched, no null twin

    # batch 3: watermark advances again — c1 must NOT re-emit
    write_batch([(6, 9, "click", t(12, 0)), (7, 9, "purchase", t(12, 0))], "append")
    run_once()
    final = spark.read.parquet(out).collect()
    assert len([r for r in final if r.click_id == 1]) == 1
    assert len([r for r in final if r.click_id == 2]) == 1


def test_langid_trigram_wider_label_set(spark, sf_dir):
    """text_langid_trigram: predictions come only from the 8
    declared languages (+ 'und'), every profile n-gram really is
    counted (a doc stuffed with one profile must predict that
    language via the synthetic path below is overkill — instead
    assert score columns are non-negative and pred matches the
    argmax with the declared tie precedence on a sample)."""
    from etl_gov_spark.operators.text import LANGID_PROFILES, text_langid_trigram

    langs = [lang for lang, _ in LANGID_PROFILES]
    rows = text_langid_trigram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        scores = {lang: r[f"s_{lang}"] for lang in langs}
        assert all(v >= 0 for v in scores.values())
        assert r.pred_lang in langs + ["und"]
        best = max(scores.values())
        if best == 0:
            assert r.pred_lang == "und"
        else:
            # fixed precedence: first declared lang hitting the max
            expect = next(lang for lang in langs if scores[lang] == best)
            assert r.pred_lang == expect, (r.doc_id, scores, r.pred_lang)


def test_stream_classifier_gate_matches_batch_scoring(spark, sf_dir):
    """stream_classifier_gate: the streaming census must equal the
    batch census computed by scoring the same docs with the same
    offline-fit coefficients (complete mode over a finite feed ≡
    batch agg), and accept+reject per source must cover all docs."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.corpus import _qc_dot, _qc_train
    from etl_gov_spark.streaming.events_stream import stream_classifier_gate

    got = {
        (r.source, r.decision): (r.n_docs, r.avg_p)
        for r in stream_classifier_gate(spark, sf_dir).collect()
    }
    feat, _n, bi, bw = _qc_train(spark, sf_dir)
    p6 = F.round(
        1.0 / (1.0 + F.exp(-F.round(F.lit(bi) + _qc_dot("xv", bw), 6))), 6
    )
    cat = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    batch = {
        (r.source, r.decision): (r.n_docs, r.avg_p)
        for r in feat.join(cat, "doc_id")
        .select("source", p6.alias("p"))
        .select(
            "source",
            "p",
            F.when(F.col("p") >= 0.5, "accept").otherwise("reject").alias("decision"),
        )
        .groupBy("source", "decision")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("p"), 4).alias("avg_p"))
        .collect()
    }
    assert got == batch
    per_src = {}
    for (s, _d), (n, _p) in got.items():
        per_src[s] = per_src.get(s, 0) + n
    total = sum(per_src.values())
    assert total == cat.count()


def test_shard_balance_consistent_with_manifest(spark, sf_dir):
    """mm_shard_balance: shard counts and byte totals must agree
    with mm_shard_manifest, and the ratio columns must bracket 1
    correctly (underfill <= 1 <= straggler; CV >= 0)."""
    from collections import defaultdict

    from etl_gov_spark.operators.multimodal import (
        mm_shard_balance,
        mm_shard_manifest,
    )

    bal = {r.source: r for r in mm_shard_balance(spark, sf_dir).collect()}
    man = defaultdict(lambda: [0, 0])
    for r in mm_shard_manifest(spark, sf_dir).collect():
        man[r.source][0] += 1
        man[r.source][1] += r.shard_bytes
    assert bal.keys() == set(man)
    for src, r in bal.items():
        assert r.n_shards == man[src][0]
        assert r.total_bytes == man[src][1]
        assert r.bytes_cv >= 0.0
        assert r.underfill_ratio <= 1.0 + 1e-9 <= r.straggler_ratio + 2e-9
        assert r.items_skew >= 1.0 - 1e-9


def test_stream_dedup_gate_cross_batch_continuation(spark, sf_dir):
    """stream_dedup_gate: the union of per-micro-batch ledgers over
    the finite feed must equal one-shot dedup_minhash_lsh row-for-
    row (a pair is ledgered exactly once, in the epoch where its
    later doc arrives); the feed must actually have run as multiple
    micro-batches (cross-batch continuation, not one big batch);
    and every post-first epoch's store probe must be footer-pruned
    (touched files present and bounded by the store's file count)."""
    from etl_gov_spark.operators.dedup import dedup_minhash_lsh
    from etl_gov_spark.streaming.events_stream import (
        N_DEDUP_GATE_CHUNKS,
        STREAM_DEDUP_PROBE_STATS,
        stream_dedup_gate,
    )

    got = {
        (r.doc_a, r.doc_b): (r.n_shared_bands, r.sig_agreement)
        for r in stream_dedup_gate(spark, sf_dir).collect()
    }
    oneshot = {
        (r.doc_a, r.doc_b): (r.n_shared_bands, r.sig_agreement)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert got == oneshot
    assert len(got) > 0, "feed produced no duplicate pairs to gate"

    # continuation: one epoch per chunk ran, and epochs after the
    # first probed a non-empty store through footer stats
    assert len(STREAM_DEDUP_PROBE_STATS) == N_DEDUP_GATE_CHUNKS
    later = [v for k, v in sorted(STREAM_DEDUP_PROBE_STATS.items())[1:]]
    assert later, "no post-first epochs recorded"
    for touched, total in later:
        assert total > 0, "store missing at a post-first epoch"
        assert 0 < touched <= total


def test_stream_dedup_gate_chunk_order_invariant(spark, sf_dir):
    """stream_dedup_gate: the ledger union must be identical for ANY
    feed arrival order (VERDICT r16 — the three chunk files are
    written concurrently, so FileStreamSource's mtime ordering can
    permute the epoch→chunk assignment run to run; this pins the
    arrival-order-invariance argument with two adversarial orders:
    ascending and a rotation that feeds the last chunk first)."""
    from etl_gov_spark.streaming.events_stream import stream_dedup_gate

    def run(order):
        return {
            (r.doc_a, r.doc_b): (r.n_shared_bands, r.sig_agreement)
            for r in stream_dedup_gate(spark, sf_dir, _chunk_order=order).collect()
        }

    asc = run((0, 1, 2))
    rot = run((2, 0, 1))
    assert asc == rot
    assert len(asc) > 0, "feed produced no duplicate pairs to gate"


def test_wav_parser_roundtrip_and_quarantine():
    """parse_wav: decodes a hand-built canonical WAV exactly,
    survives an extra unknown chunk before fmt/data (real RIFF
    files carry LIST/INFO chunks), and raises on corrupt payloads."""
    import struct

    import pytest

    from etl_gov_spark.operators.multimodal import parse_wav, synth_wav

    # hand-built: 3 frames, stereo, 8 kHz, one clipped sample
    samples = [0, -32768, 100, 200, 31999, -32000]
    data = struct.pack("<6h", *samples)
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(junk) + len(data)) + b"WAVE"
        + junk
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    m = parse_wav(wav)
    assert m["sample_rate"] == 8000 and m["channels"] == 2
    assert m["n_frames"] == 3 and m["n_samples"] == 6
    assert m["duration_ms"] == 3 * 1000 // 8000
    assert m["n_clipped"] == 2  # -32768 and -32000
    with pytest.raises(ValueError):
        parse_wav(b"OggS" + wav[4:])
    with pytest.raises(ValueError):
        parse_wav(wav[:20])  # truncated: no fmt/data

    # synth → parse round trip recovers the generator parameters
    payload = b"x" * 123
    m2 = parse_wav(synth_wav(payload))
    assert m2["sample_rate"] == (8000, 16000, 22050, 44100)[123 % 4]
    assert m2["channels"] == 123 % 2 + 1
    assert m2["n_frames"] == 123 % 256 + 64


def test_png_parser_roundtrip_crc_and_quarantine():
    """parse_png: decodes a hand-built canonical PNG exactly
    (signature, big-endian chunk walk, IHDR-first rule, IDAT
    totaling across MULTIPLE IDAT chunks), verifies CRC-32 and
    raises on corruption, wrong magic, and non-IHDR-first files."""
    import struct
    import zlib

    import pytest

    from etl_gov_spark.operators.multimodal import (
        PNG_SIG,
        parse_png,
        synth_png,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\x01" * 100)
        + chunk(b"IDAT", b"\x02" * 50)
        + chunk(b"IEND", b"")
    )
    m = parse_png(png)
    assert (m["width"], m["height"]) == (320, 200)
    assert m["bit_depth"] == 8 and m["color_type"] == 2
    assert m["n_chunks"] == 4 and m["idat_bytes"] == 150

    with pytest.raises(ValueError):
        parse_png(b"GIF89a" + png[6:])  # wrong magic
    corrupted = bytearray(png)
    corrupted[20] ^= 0xFF  # flip an IHDR body byte under its CRC
    with pytest.raises(ValueError):
        parse_png(bytes(corrupted))
    with pytest.raises(ValueError):  # IHDR must come first
        parse_png(PNG_SIG + chunk(b"IDAT", b"x") + chunk(b"IHDR", ihdr))

    # synth → parse round trip recovers the generator parameters
    n = 123
    m2 = parse_png(synth_png(b"x" * n))
    assert m2["width"] == n % 640 + 16
    assert m2["height"] == (n * 7) % 480 + 16
    assert m2["bit_depth"] == 16 and m2["color_type"] == (0, 2, 6)[n % 3]
    assert m2["idat_bytes"] == n % 512 + 32
    assert m2["n_chunks"] == 3  # 123 % 5 != 0 → no tEXt
    assert parse_png(synth_png(b"x" * 120))["n_chunks"] == 4


def test_code_detection_routes_planted_code(spark, tmp_path):
    """text_code_detection: a source of planted code documents must
    route as code (share 1.0) while plain prose routes as prose —
    and the feature profile must reflect the planted symbols."""
    from etl_gov_spark.operators.text import text_code_detection

    code = (
        "def fooBar(x): return do_thing(x) ; "
        "if (x > 0) { emit_value(x); } else { return None; } "
        "for i in range(10): total_sum = total_sum + values[i] ;"
    )
    prose = (
        "the quiet morning settled over the valley while the river "
        "carried small boats toward the distant harbor and the birds "
        "sang from the tall trees near the old stone bridge"
    )
    rows = [(i, code, "en", "src_code", len(code)) for i in range(5)]
    rows += [(100 + i, prose, "en", "src_prose", len(prose)) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.source: r for r in text_code_detection(spark, str(tmp_path)).collect()}
    assert got["src_code"].code_share == 1.0
    assert got["src_code"].n_routed_code == 5
    assert got["src_prose"].code_share == 0.0
    assert got["src_code"].mean_symbol_rate > got["src_prose"].mean_symbol_rate
    assert got["src_code"].mean_snake_rate > 0
    assert got["src_code"].mean_keyword_rate > 0


def test_stream_topk_hourly_ranks_and_shares(spark, sf_dir):
    """stream_topk_hourly: per hour at most 3 rows, ranks dense from
    1, counts non-increasing within an hour, ties broken by type
    name, and every share consistent with exact counts."""
    from etl_gov_spark.streaming.events_stream import stream_topk_hourly

    rows = stream_topk_hourly(spark, sf_dir).collect()
    assert rows, "no output"
    by_hour: dict = {}
    for r in rows:
        by_hour.setdefault(r.hour, []).append(r)
    for hour, rs in by_hour.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        for a, b in zip(rs, rs[1:]):
            assert (a.n, b.event_type) > (b.n, a.event_type) or a.n > b.n or (
                a.n == b.n and a.event_type < b.event_type
            )
        assert all(0 < r.hour_share <= 1 for r in rs)


def test_jpeg_parser_roundtrip_and_quarantine():
    """parse_jpeg: decodes a hand-built canonical JFIF exactly
    (marker walk, big-endian segment lengths, SOF0 dims +
    subsampling, Exif detection, post-SOS entropy scan with stuffed
    0xFF00 and RST markers), and raises on wrong magic, truncated
    segments and entropy data running off the end."""
    import struct

    import pytest

    from etl_gov_spark.operators.multimodal import parse_jpeg, synth_jfif

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    sof = struct.pack(">BHHB", 8, 480, 640, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    sos_body = bytes([3, 1, 0, 2, 0, 3, 0, 0, 0x3F, 0])
    entropy = b"\x12\x34" + b"\xff\x00" + b"\xff\xd0" + b"\x56"  # stuffed + RST
    jpeg = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00" + bytes(9))
        + seg(0xE1, b"Exif\x00\x00" + bytes(8))
        + seg(0xC0, sof)
        + seg(0xDA, sos_body)
        + entropy
        + b"\xff\xd9"
    )
    m = parse_jpeg(jpeg)
    assert (m["width"], m["height"]) == (640, 480)
    assert m["subsampling"] == "4:2:0" and m["orientation"] == "landscape"
    assert m["has_exif"] == 1
    assert m["entropy_bytes"] == len(entropy)

    with pytest.raises(ValueError):
        parse_jpeg(b"\x89PNG" + jpeg[4:])  # wrong magic
    with pytest.raises(ValueError):
        parse_jpeg(jpeg[:-2])  # EOI gone -> entropy runs off the end
    with pytest.raises(ValueError):
        parse_jpeg(jpeg[:20])  # truncated mid-segment
    bad = bytearray(jpeg)
    bad[4] = 0xFF  # blow up APP0's declared length past EOF
    with pytest.raises(ValueError):
        parse_jpeg(bytes(bad))

    # ITU T.81 B.1.1.2: 0xFF fill bytes may pad the stream before any
    # marker — a real-world JFIF with padding must parse, not quarantine
    padded = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes before APP0's marker
        + seg(0xE0, b"JFIF\x00" + bytes(9))[1:]
        + seg(0xC0, sof)
        + seg(0xDA, sos_body)
        + entropy
        + b"\xff\xff"  # fill before EOI
        + b"\xff\xd9"[1:]
    )
    mp = parse_jpeg(padded)
    assert (mp["width"], mp["height"]) == (640, 480)
    with pytest.raises(ValueError):  # fill bytes running off the end
        parse_jpeg(b"\xff\xd8" + b"\xff\xff\xff")

    n = 123
    m2 = parse_jpeg(synth_jfif(b"x" * n))
    assert m2["width"] == n % 512 + 16 and m2["height"] == (n * 11) % 512 + 16
    assert m2["subsampling"] == "4:4:4"  # 123 % 3 == 0
    assert m2["has_exif"] == 0 and m2["entropy_bytes"] == n % 384 + 32
    assert parse_jpeg(synth_jfif(b"x" * 119))["subsampling"] == "gray"


def test_mp4_parser_roundtrip_and_quarantine():
    """parse_mp4: decodes a hand-built ISO-BMFF file exactly
    (size+fourcc walk, moov recursion, version-1 mvhd, 64-bit
    largesize mdat, size==0 to-EOF), and raises on a missing ftyp,
    truncated box body, and a cut-off largesize header."""
    import struct

    import pytest

    from etl_gov_spark.operators.multimodal import parse_mp4, synth_mp4

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    mvhd1 = struct.pack(">B3x", 1) + bytes(16) + struct.pack(">IQ", 90000, 180000)
    mvhd1 += bytes(80)
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 100) + bytes(100)
    mp4 = box(b"ftyp", b"avc1" + struct.pack(">I", 0) + b"isom") + box(
        b"moov", box(b"mvhd", mvhd1)
    ) + big
    m = parse_mp4(mp4)
    assert m["brand"] == "avc1" and m["timescale"] == 90000
    assert m["duration_ms"] == 2000 and m["mdat_bytes"] == 100
    assert m["uses_largesize"] == 1

    # size==0 -> box runs to EOF
    tail = struct.pack(">I", 0) + b"mdat" + bytes(40)
    m0 = parse_mp4(mp4[: len(mp4) - len(big)] + tail)
    assert m0["mdat_bytes"] == 40 and m0["uses_largesize"] == 0

    with pytest.raises(ValueError):
        parse_mp4(box(b"moov", box(b"mvhd", mvhd1)))  # no leading ftyp
    with pytest.raises(ValueError):
        parse_mp4(mp4[:-1])  # truncated largesize body
    with pytest.raises(ValueError):
        parse_mp4(mp4[: len(mp4) - len(big) + 10])  # largesize header cut

    n = 123
    m2 = parse_mp4(synth_mp4(b"x" * n))
    assert m2["brand"] == "isom"  # 123 % 3 == 0
    assert m2["timescale"] == 90000  # (123 // 3) % 3 == 2
    assert m2["duration_ms"] == ((123 * 13) % 90000 + 90000) * 1000 // 90000
    assert m2["mdat_bytes"] == n % 512 + 64


def test_warc_gzip_parser_roundtrip_and_quarantine():
    """parse_warc_gz: the synthesized archives are REAL gzip (the
    stdlib gzip module inflates them), the member walk honors FNAME
    and verifies CRC-32 + ISIZE against the inflated bytes, WARC
    headers parse, and corruption (flipped CRC byte, truncation,
    wrong magic, bad NLEN framing) raises."""
    import gzip
    import io

    import pytest

    from etl_gov_spark.operators.multimodal import (
        _WARC_TYPES,
        parse_warc_gz,
        synth_warc_gz,
    )

    n = 123
    gz = synth_warc_gz(b"x" * n)
    recs = parse_warc_gz(gz)
    assert len(recs) == n % 4 + 1 == 4
    for k, r in enumerate(recs):
        assert r["warc_type"] == _WARC_TYPES[(n + k) % 4]
        assert r["content_length"] == (n * 3 + k * 17) % 200 + 10
        assert r["has_name"] == (1 if (n + k) % 3 == 0 else 0)

    with gzip.open(io.BytesIO(gz)) as f:  # genuine gzip framing
        assert f.read().startswith(b"WARC/1.0\r\n")

    with pytest.raises(ValueError):
        parse_warc_gz(b"PK\x03\x04" + gz[4:])  # zip magic, not gzip
    with pytest.raises(ValueError):
        parse_warc_gz(gz[: len(gz) // 2])  # truncated mid-member
    crc_flip = bytearray(gz)
    crc_flip[-8] ^= 0xFF  # last member's CRC-32
    with pytest.raises(ValueError):
        parse_warc_gz(bytes(crc_flip))
    isize_flip = bytearray(gz)
    isize_flip[-1] ^= 0xFF  # last member's ISIZE high byte
    with pytest.raises(ValueError):
        parse_warc_gz(bytes(isize_flip))
    nlen_flip = bytearray(gz)
    # NLEN of the FIRST member's stored block (header is 10 bytes +
    # optional FNAME; n=123, k=0 -> (123+0)%3==0 -> FNAME 'rec0.warc\0')
    off = 10 + len(b"rec0.warc\x00") + 1 + 2  # block byte + LEN
    nlen_flip[off] ^= 0xFF
    with pytest.raises(ValueError):
        parse_warc_gz(bytes(nlen_flip))

    # full FLG coverage: a hand-built member with FEXTRA + FNAME +
    # FCOMMENT + FHCRC must parse (real crawls set these)
    import struct
    import zlib

    body = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabc"
    header = (
        b"\x1f\x8b\x08" + bytes([0x02 | 0x04 | 0x08 | 0x10])
        + bytes(6)                       # MTIME/XFL/OS
        + struct.pack("<H", 4) + b"XTRA"  # FEXTRA
        + b"a.warc\x00"                  # FNAME
        + b"a comment\x00"               # FCOMMENT
    )
    fhcrc = struct.pack("<H", zlib.crc32(header) & 0xFFFF)  # RFC 1952 §2.3.1
    member = (
        header + fhcrc
        + b"\x01" + struct.pack("<HH", len(body), 0xFFFF ^ len(body)) + body
        + struct.pack("<II", zlib.crc32(body) & 0xFFFFFFFF, len(body))
    )
    recs = parse_warc_gz(member)
    assert len(recs) == 1
    assert recs[0]["warc_type"] == "response"
    assert recs[0]["content_length"] == 3
    assert recs[0]["has_name"] == 1
    assert recs[0]["payload"] == b"abc"  # body survives extraction
    # a corrupted header CRC-16 must quarantine, not silently pass
    bad_fhcrc = bytearray(member)
    bad_fhcrc[len(header)] ^= 0xFF
    with pytest.raises(ValueError, match="FHCRC"):
        parse_warc_gz(bytes(bad_fhcrc))


def test_wds_tar_parser_roundtrip_and_quarantine():
    """parse_wds_tar: synthesized shards are REAL USTAR (stdlib
    tarfile lists the same members), header checksums verify, sample
    grouping follows the WebDataset basename-key convention, and
    corruption (checksum-covered byte flip, truncation, bad magic,
    single zero-block terminator) raises."""
    import io
    import tarfile

    import pytest

    from etl_gov_spark.operators.multimodal import parse_wds_tar, synth_wds_tar

    n = 123
    t = synth_wds_tar(b"x" * n)
    recs = parse_wds_tar(t)
    assert len(recs) == n % 3 + 1 == 1
    assert recs[0]["kind"] == "jpg+txt"  # (123+0)%2 == 1 -> no json
    assert recs[0]["n_components"] == 2
    assert recs[0]["sample_bytes"] == (
        (n * 3) % 400 + 100 + (n * 7) % 80 + 20
    )

    with tarfile.open(fileobj=io.BytesIO(t)) as tf:
        assert sorted(m.split(".")[-1] for m in tf.getnames()) == ["jpg", "txt"]

    t2 = synth_wds_tar(b"x" * 124)  # 124%3+1 = 2 samples, k=0 gets json
    kinds = {r["kind"] for r in parse_wds_tar(t2)}
    assert kinds == {"jpg+json+txt", "jpg+txt"}

    with pytest.raises(ValueError):
        parse_wds_tar(t[:600])  # truncated member data
    bad = bytearray(t)
    bad[0] ^= 0xFF  # name byte under the checksum
    with pytest.raises(ValueError):
        parse_wds_tar(bytes(bad))
    magic = bytearray(t)
    magic[257] = ord("X")  # break ustar magic
    with pytest.raises(ValueError):
        parse_wds_tar(bytes(magic))
    with pytest.raises(ValueError):
        parse_wds_tar(t[:-512])  # only one terminator zero block


def test_bm25_ranks_rare_term_match_first(spark, tmp_path_factory):
    """text_bm25_topk: a candidate sharing the query's RARE term
    must outrank one sharing only its ubiquitous term (idf at work),
    self-matches are excluded, and ranks are contiguous."""
    tmp = str(tmp_path_factory.mktemp("bm25"))
    rows = [
        (0, "zebra apple the and", "en", "s", 0),        # the query (0 % 50 == 0)
        (1, "zebra runs far away today the", "en", "s", 0),   # shares rare 'zebra'
        (2, "apple pie is baked fresh the", "en", "s", 0),    # shares mid 'apple'
        (3, "the of with from into them", "en", "s", 0),      # only 'the'
        (4, "apple apple orchard grows the and", "en", "s", 0),
        (5, "completely unrelated words here only", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    from etl_gov_spark.operators.text import text_bm25_topk

    got = [r for r in text_bm25_topk(spark, tmp).collect() if r.q_id == 0]
    got.sort(key=lambda r: r.rank)
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert all(r.cand_id != 0 for r in got)  # no self-match
    by_id = {r.cand_id: r for r in got}
    assert 5 not in by_id  # shares no query term
    # zebra (df=2) match beats the ubiquitous-term-only match
    assert by_id[1].bm25 > by_id[3].bm25
    # and a rare+freq match beats pure-stopword too
    assert by_id[2].bm25 > by_id[3].bm25
    assert by_id[1].rank < by_id[3].rank


def test_stream_conformal_gate_census(spark, sf_dir):
    """stream_conformal_gate: the complete-mode census covers every
    document exactly once, routes both ways, and keep-side scores
    dominate drop-side scores within every source (the threshold is
    a single global cut)."""
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.streaming.events_stream import stream_conformal_gate

    rows = stream_conformal_gate(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == read_table(
        spark, sf_dir, "documents"
    ).count()
    assert {r.decision for r in rows} <= {"keep", "drop"}
    assert "keep" in {r.decision for r in rows}
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, {})[r.decision] = r.avg_score
    for src, d in per_src.items():
        if {"keep", "drop"} <= set(d):
            assert d["keep"] > d["drop"], (src, d)


def test_conformal_qhat_matches_batch_twin(spark, sf_dir):
    """The streaming gate's distributed rank-ladder threshold
    (`_conformal_qhat`, one scalar collected) equals BOTH the batch
    twin's α=0.1 `score_threshold` row and the naive
    sorted-collect reference it replaced — i.e. killing the O(N)
    driver collect changed the plan shape, not the statistic."""
    import math

    from pyspark.sql import functions as F

    from etl_gov_spark.operators.corpus import (
        _conformal_qhat,
        _qc_dot,
        _qc_train,
        corpus_conformal_quality,
    )
    from etl_gov_spark.streaming.events_stream import _CONF_GATE_ALPHA

    feat, _n, bi, bw = _qc_train(spark, sf_dir)
    cpos = (
        feat.filter(F.col("held"))
        .select(
            "doc_id",
            F.round(F.lit(bi) + _qc_dot("xv", bw), 6).alias("s"),
            F.col("y").cast("long").alias("yl"),
        )
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1).isin(
                *list("01234567")
            )
            & (F.col("yl") == 1)
        )
        .select((-F.col("s")).alias("nc"))
    )
    qhat = _conformal_qhat(cpos, _CONF_GATE_ALPHA)
    # naive reference: sort the full slice in Python
    ncs = sorted(r.nc for r in cpos.collect())
    k = math.ceil((len(ncs) + 1) * (1.0 - _CONF_GATE_ALPHA))
    ref = ncs[k - 1] if k <= len(ncs) else None
    assert qhat == ref
    # batch twin's α=0.1 row reports the same threshold (as -qhat)
    batch = {
        r.alpha: r.score_threshold
        for r in corpus_conformal_quality(spark, sf_dir).collect()
    }
    assert qhat is not None
    assert abs(batch[_CONF_GATE_ALPHA] - (-qhat)) < 1e-9

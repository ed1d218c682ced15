"""Property tests for the round-12 operator widening.

Each operator already has a value-exact DuckDB oracle (the
correctness gate); these tests pin the SEMANTIC invariants the hash
can't express — ranges, identities between columns, and the
statistical contracts the docstrings claim — so a future refactor
that stays hash-consistent with a wrong oracle still fails here.
(ann_ivf_incremental and stream_dedup_gate carry their own parity
tests in test_vectors_graphs.py / test_text_multimodal_streaming.py.)
"""

from __future__ import annotations


def test_ndcg_eval_bounds_and_anchor_counts(spark, sf_dir):
    """emb_ndcg_eval: nDCG in [0,1] by construction (DCG ≤ IDCG),
    DCG non-negative, and anchors present for every label."""
    from etl_gov_spark.operators.vectors import emb_ndcg_eval

    rows = emb_ndcg_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_anchors > 0
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert r.mean_dcg_at_10 >= 0.0


def test_decontaminate_13gram_purge_consistency(spark, sf_dir):
    """corpus_decontaminate_13gram: overlap fraction in [0,1], the
    purge flag is exactly any-collision, and every doc carries at
    least one gram (short docs contribute their full span)."""
    from etl_gov_spark.operators.corpus import corpus_decontaminate_13gram

    rows = corpus_decontaminate_13gram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_grams13 >= 1
        assert 0 <= r.n_overlap <= r.n_grams13
        assert 0.0 <= r.overlap_frac <= 1.0
        assert r.purge == (r.n_overlap > 0)


def test_radius_of_gyration_cohorts(spark, sf_dir):
    """geo_radius_of_gyration: all 10 cohorts, non-negative radii,
    max ≥ avg."""
    from etl_gov_spark.operators.geo import geo_radius_of_gyration

    rows = geo_radius_of_gyration(spark, sf_dir).collect()
    assert [r.cohort for r in rows] == list(range(10))
    for r in rows:
        assert r.n_users > 0 and r.n_pings >= r.n_users
        assert 0.0 <= r.avg_rg_km <= r.max_rg_km


def test_visit_entropy_bounds(spark, sf_dir):
    """geo_visit_entropy: entropy ≥ 0, uniformity ratio in (0, 1]
    (it is entropy / its own maximum), cells ≥ 1."""
    from etl_gov_spark.operators.geo import geo_visit_entropy

    rows = geo_visit_entropy(spark, sf_dir).collect()
    assert [r.cohort for r in rows] == list(range(10))
    for r in rows:
        assert r.avg_n_cells >= 1.0
        assert r.avg_entropy_bits >= 0.0
        assert 0.0 < r.avg_uniformity <= 1.0 + 1e-9


def test_jarque_bera_verdict_consistency(spark, sf_dir):
    """q_jarque_bera: JB ≥ 0 (sum of squares), and the 5% verdict
    agrees with the published statistic at the rounding grid."""
    from etl_gov_spark.operators.mlstats import q_jarque_bera

    rows = q_jarque_bera(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.jb_stat >= 0.0
        if r.jb_stat > 5.9915:
            assert r.reject_normal_5pct
        if r.jb_stat < 5.9914:
            assert not r.reject_normal_5pct


def test_wilcoxon_wplus_range(spark, sf_dir):
    """q_wilcoxon_signed_rank: W⁺ must lie in [0, n(n+1)/2] — the
    rank-sum identity — for every segment."""
    from etl_gov_spark.operators.mlstats import q_wilcoxon_signed_rank

    rows = q_wilcoxon_signed_rank(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pairs > 0
        assert 0.0 <= r.w_plus <= r.n_pairs * (r.n_pairs + 1) / 2.0


def test_ams_f2_identities(spark, sf_dir):
    """q_ams_f2_sketch: exact F₂ ≥ the user count (Σc² ≥ Σ1), the
    estimator is non-negative, and the relative error is the
    published |est−exact|/exact."""
    from etl_gov_spark.operators.sketches import q_ams_f2_sketch

    rows = q_ams_f2_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_f2 >= r.n_users
        assert r.est_f2 >= 0.0
        assert abs(r.rel_err - abs(r.est_f2 - r.exact_f2) / r.exact_f2) < 1e-3


def test_cluster_nmi_bounds(spark, sf_dir):
    """emb_cluster_nmi: purity in (0,1], NMI in [0,1] (sqrt-normalized
    MI cannot exceed either entropy)."""
    from etl_gov_spark.operators.vectors import emb_cluster_nmi

    [r] = emb_cluster_nmi(spark, sf_dir).collect()
    assert r.n_cells >= 1 and r.n_labels >= 2
    assert 0.0 < r.purity <= 1.0
    assert -1e-9 <= r.nmi <= 1.0 + 1e-9


def test_range_search_radius_contract(spark, sf_dir):
    """ann_range_search: every reported anchor has ≥1 match, all
    cosines respect the τ radius, and the same-label census is a
    subset count."""
    from etl_gov_spark.operators.vectors import RANGE_TAU, ann_range_search

    rows = ann_range_search(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_in_range >= 1
        assert r.max_cos >= RANGE_TAU - 1e-4
        assert r.mean_cos <= r.max_cos + 1e-9
        assert 0 <= r.n_same_label <= r.n_in_range


def test_randomized_response_estimator_identity(spark, sf_dir):
    """q_randomized_response: the published estimate is exactly the
    Warner transform of the reported share, and shares are in
    range. (Closeness to truth is a statistical, not exact, claim —
    bounded loosely.)"""
    from etl_gov_spark.operators.privacy import RR_P, q_randomized_response

    rows = q_randomized_response(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.true_share <= 1.0
        assert 0.0 <= r.reported_share <= 1.0
        est = (r.reported_share + RR_P - 1.0) / (2.0 * RR_P - 1.0)
        assert abs(r.estimated_share - est) < 1e-3
    # closeness is a statistical claim — per-cohort estimates are
    # unclipped (a 2-user cohort can land outside [0,1]); assert the
    # user-weighted POOLED estimate tracks the pooled truth
    n = sum(r.n_users for r in rows)
    pooled_est = sum(r.n_users * r.estimated_share for r in rows) / n
    pooled_true = sum(r.n_users * r.true_share for r in rows) / n
    assert abs(pooled_est - pooled_true) < 0.4


def test_forecast_mase_identity(spark, sf_dir):
    """q_forecast_mase: MASE is exactly the published MAE ratio and
    the verdict matches it."""
    from etl_gov_spark.operators.timeseries import q_forecast_mase

    rows = q_forecast_mase(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.mase - r.mae_seasonal / r.mae_naive1) < 1e-3
        if r.mase < 0.999:
            assert r.beats_naive
        if r.mase > 1.001:
            assert not r.beats_naive


def test_tracking_signal_envelope(spark, sf_dir):
    """q_tracking_signal: the worst |signal| dominates the final
    one, and the out-of-band census is bounded by the horizon."""
    from etl_gov_spark.operators.timeseries import q_tracking_signal

    rows = q_tracking_signal(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_abs_signal >= abs(r.final_signal) - 1e-9
        assert 0 <= r.n_out_of_band <= r.n_days_scored


def test_cmh_verdict_consistency(spark, sf_dir):
    """q_cmh_test: MH odds ratio positive, χ² non-negative, verdict
    agrees with the statistic at the rounding grid."""
    from etl_gov_spark.operators.mlstats import q_cmh_test

    [r] = q_cmh_test(spark, sf_dir).collect()
    assert r.n_strata >= 2
    assert r.or_mh > 0.0
    assert r.chi2_cmh >= 0.0
    if r.chi2_cmh > 3.8415:
        assert r.reject_indep_5pct
    if r.chi2_cmh < 3.8414:
        assert not r.reject_indep_5pct


def test_decision_stump_beats_majority(spark, sf_dir):
    """q_decision_stump: per-side majorities can never lose to the
    pooled majority (greatest(pl,nl)+greatest(pr,nr) ≥
    greatest(pt,nt)), so stump accuracy ≥ the baseline."""
    from etl_gov_spark.operators.mlstats import q_decision_stump

    rows = q_decision_stump(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.weighted_gini <= 0.5 + 1e-9
        assert r.stump_accuracy >= r.majority_baseline - 1e-4
        assert r.majority_baseline >= 0.5 - 1e-9


def test_hoeffding_audit_sample_shape(spark, sf_dir):
    """q_hoeffding_bound_audit: the md5 sample is a strict subset
    near the 10% rate, and the bound is positive."""
    from etl_gov_spark.operators.sampling import q_hoeffding_bound_audit

    rows = q_hoeffding_bound_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_sample < r.n_total
        assert 0.02 <= r.n_sample / r.n_total <= 0.25
        assert r.hoeffding_eps > 0.0


def test_mlm_masking_rates(spark, sf_dir):
    """corpus_mlm_masking: the action split partitions the selected
    set exactly, and the realized rates sit near 15% / 80-10-10
    (loose bands — md5 coins, not RNG, but still concentration)."""
    from etl_gov_spark.operators.corpus import corpus_mlm_masking

    rows = corpus_mlm_masking(spark, sf_dir).collect()
    assert rows
    tot_sel = sum(r.n_selected for r in rows)
    tot_tok = sum(r.n_tokens for r in rows)
    tot_mask = sum(r.n_mask for r in rows)
    for r in rows:
        assert r.n_selected == r.n_mask + r.n_random + r.n_keep
        assert r.pos_checksum >= 0
    assert 0.12 <= tot_sel / tot_tok <= 0.18
    assert 0.7 <= tot_mask / tot_sel <= 0.9


def test_negative_sampling_table_shares(spark, sf_dir):
    """corpus_negative_sampling: ranks are a prefix of 1..32,
    expected shares decrease with rank and sum to ~1, observed
    shares sum to ≤ 1."""
    from etl_gov_spark.operators.corpus import _NEG_VOCAB, corpus_negative_sampling

    rows = sorted(corpus_negative_sampling(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    assert all(1 <= r.rank <= _NEG_VOCAB for r in rows)
    assert len({r.rank for r in rows}) == len(rows)
    for a, b in zip(rows, rows[1:]):
        assert a.expected_share >= b.expected_share - 1e-9
    assert sum(r.observed_share for r in rows) <= 1.0 + 1e-6


def test_vlm_pack_mix_and_fill(spark, sf_dir):
    """mm_vlm_pack: patch share in [0,1], every bin non-empty, and
    within each source all bins except the last are filled to
    within one document of the budget (concat-and-chunk contract:
    a bin closes only when the NEXT doc's preceding-cum crosses the
    boundary, so it can undershoot by at most that doc's cost —
    bounded here by the token ceiling + the 256-patch cap)."""
    from collections import defaultdict

    from etl_gov_spark.operators.multimodal import mm_vlm_pack

    rows = mm_vlm_pack(spark, sf_dir).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        assert r.n_docs >= 1
        assert 0.0 <= r.patch_share <= 1.0
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.bin_id)
        for r in rs[:-1]:
            assert r.fill_ratio >= 0.5, (src, r.bin_id)


def test_boundary_overlap_detects_constructed_pairs(spark, tmp_path):
    """boundary_overlap_pairs on a constructed corpus: doc 2 starts
    with doc 1's last 8 tokens (a re-chunked shard) → exactly that
    ordered pair; doc 3 shares nothing → no pair; and the census op
    reports the pair count with consistent key-space numbers."""
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.dedup import (
        boundary_overlap_pairs,
        dedup_boundary_overlap,
    )

    tail = "t1 t2 t3 t4 t5 t6 t7 t8"
    rows = [
        (1, "intro words here then " + tail),
        (2, tail + " continuation of the same source document body"),
        (3, "completely different content with no shared boundary at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_a, r.doc_b)
        for r in boundary_overlap_pairs(
            docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
        ).collect()
    ]
    assert got == [(1, 2)]

    # census end-to-end on a parquet dir (the operator's real input)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    [r] = dedup_boundary_overlap(spark, str(tmp_path)).collect()
    assert r.n_docs == 3
    assert r.n_boundary_pairs == 1
    assert r.n_heads == 3 and r.n_tails == 3
    assert r.n_hot_heads == 0 and r.n_hot_tails == 0


def test_cka_bounds_and_dims(spark, sf_dir):
    """emb_cka_similarity: CKA in (0, 1] (the prefix is a literal
    subspace of the full representation, so similarity is high but
    the normalization caps it at 1), and the dims are as declared."""
    from etl_gov_spark.operators.vectors import CKA_PREFIX_DIM, emb_cka_similarity

    [r] = emb_cka_similarity(spark, sf_dir).collect()
    assert r.dim_x == CKA_PREFIX_DIM
    assert r.dim_y > r.dim_x
    assert r.n_vecs > 0
    assert 0.0 < r.cka <= 1.0 + 1e-9


def test_corpus_prep_funnel_monotone(spark, sf_dir):
    """pipeline_corpus_prep: the funnel only shrinks — per source,
    raw ≥ quality ≥ dedup; the split stage repartitions the dedup
    survivors exactly (sum over splits = dedup count per source);
    the packed stage preserves split counts and its bins satisfy
    n_bins ≥ ceil(tokens/budget)·(something ≤ docs) sanity: bins
    between 1 and n_docs."""
    from collections import defaultdict

    from etl_gov_spark.pipeline.demo import pipeline_corpus_prep

    rows = pipeline_corpus_prep(spark, sf_dir).collect()
    by = defaultdict(dict)
    for r in rows:
        by[(r.stage, r.split)][r.source] = r
    raw = by[("00_raw", "all")]
    qual = by[("01_quality", "all")]
    ded = by[("02_dedup", "all")]
    for src, r in raw.items():
        q = qual.get(src)
        d = ded.get(src)
        if q is not None:
            assert q.n_docs <= r.n_docs
        if d is not None and q is not None:
            assert d.n_docs <= q.n_docs
    # split partitions the dedup survivors exactly
    split_sum = defaultdict(int)
    for (stage, split), srcs in by.items():
        if stage == "03_split":
            for src, r in srcs.items():
                split_sum[src] += r.n_docs
    for src, r in ded.items():
        assert split_sum[src] == r.n_docs, src
    # packed rows mirror split rows with sane bin counts
    for (stage, split), srcs in by.items():
        if stage == "04_packed":
            for src, r in srcs.items():
                s = by[("03_split", split)][src]
                assert r.n_docs == s.n_docs and r.n_tokens == s.n_tokens
                assert 1 <= r.n_bins <= r.n_docs
    # the quality stage IS the conformal cut: per source, its
    # survivors equal the streaming gate's keep-side census (same
    # classifier trajectory, same α, same rank-ladder threshold)
    from etl_gov_spark.streaming.events_stream import stream_conformal_gate

    keep = {
        r.source: r.n_docs
        for r in stream_conformal_gate(spark, sf_dir).collect()
        if r.decision == "keep"
    }
    assert {s: r.n_docs for s, r in qual.items()} == keep

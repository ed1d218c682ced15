"""Audit-pack invariants: distribution sanity, Gini bounds,
Pareto dominance (oracle equality is the driver's gate)."""

from __future__ import annotations

import math

from etl_gov_spark.operators import audit as A


def test_benford_fracs_sum_to_one(spark, sf_dir):
    rows = A.q_benford_digits(spark, sf_dir).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r.observed_frac for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert abs(r.benford_frac - round(math.log10(1 + 1 / r.digit), 4)) < 1e-9
        # deviation was rounded from raw fracs; each 4-dp rounding
        # can shift the reconstructed value by up to 5e-5, and the
        # raw observed_frac differs from its rounded copy likewise
        assert abs(r.deviation - (r.observed_frac - r.benford_frac)) < 1e-3


def test_gini_bounded_and_zero_for_equal_revenues(spark, sf_dir, tmp_path_factory):
    for r in A.q_gini_concentration(spark, sf_dir).collect():
        assert -0.01 <= r.gini <= 1.0
        assert r.n_customers > 0
    # constructed equal-revenue nation → gini == 0
    tmp = str(tmp_path_factory.mktemp("gini"))
    import datetime

    orders = [
        (i, i % 3, "O", 100.0, datetime.datetime(2024, 1, 1), "1-URGENT")
        for i in range(9)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    spark.createDataFrame(
        [(i, i % 2) for i in range(3)], "c_custkey long, c_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey long, n_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/nation.parquet")
    for r in A.q_gini_concentration(spark, tmp).collect():
        assert r.gini == 0.0


def test_pareto_shares_are_nested_and_bounded(spark, sf_dir):
    r = A.q_pareto_share(spark, sf_dir).first()
    assert 0.0 < r.share_top1pct <= r.share_top10pct <= 1.0
    # top 10% must hold at least 10% of revenue (sorted dominance)
    assert r.share_top10pct >= 0.10


def test_chi2_marginals_reconstruct(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_chi2_segment_priority

    rows = q_chi2_segment_priority(spark, sf_dir).collect()
    # expected counts reproduce the observed total per segment
    per_seg_obs: dict = {}
    per_seg_exp: dict = {}
    for r in rows:
        per_seg_obs[r.c_mktsegment] = per_seg_obs.get(r.c_mktsegment, 0) + r.observed
        per_seg_exp[r.c_mktsegment] = per_seg_exp.get(r.c_mktsegment, 0.0) + r.expected
        assert r.chi2_contrib >= 0
    for seg in per_seg_obs:
        assert abs(per_seg_obs[seg] - per_seg_exp[seg]) < 0.1


def test_seasonality_indices_average_to_one(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_weekly_seasonality

    rows = q_weekly_seasonality(spark, sf_dir).collect()
    assert {r.dow for r in rows} == set(range(7))
    # day-count-weighted mean of indices == 1 by construction
    tot = sum(r.n_days for r in rows)
    wmean = sum(r.seasonal_index * r.n_days for r in rows) / tot
    assert abs(wmean - 1.0) < 1e-2


def test_duplicate_payments_detects_planted_dupe(spark, tmp_path_factory):
    import datetime

    from etl_gov_spark.operators.audit import dq_duplicate_payments

    tmp = str(tmp_path_factory.mktemp("dups"))
    d = datetime.datetime(2024, 3, 1)
    rows = [
        (1, 10, "O", 500.0, d, "1-URGENT"),
        (2, 10, "O", 500.0, d, "1-URGENT"),  # duplicate payment
        (3, 10, "O", 500.0, datetime.datetime(2024, 3, 2), "1-URGENT"),  # other day
        (4, 11, "O", 500.0, d, "1-URGENT"),  # other customer
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = dq_duplicate_payments(spark, tmp).collect()
    assert len(got) == 1
    assert got[0].n_payments == 2 and got[0].order_ids == "1,2"


def test_near_dup_payments_catches_bucket_straddling_pair(spark, tmp_path_factory):
    """Amounts within the 1% ratio filter whose log-gap exceeds the
    old 0.01 bucket width (max qualifying gap is −ln(0.99)≈0.01005):
    with 0.0101-wide buckets the pair lands ≤1 bucket apart and the
    ±1 probe finds it — the old width silently dropped it."""
    import datetime
    import math

    from etl_gov_spark.operators.audit import q_near_duplicate_payments

    a, b = 1002.22, 1012.33
    assert abs(a - b) / max(a, b) <= 0.01  # qualifies for the filter
    assert math.floor(math.log(b) / 0.01) - math.floor(math.log(a) / 0.01) == 2

    tmp = str(tmp_path_factory.mktemp("straddle"))
    rows = [
        (1, 10, "O", a, datetime.datetime(2024, 3, 1), "1-URGENT"),
        (2, 10, "O", b, datetime.datetime(2024, 3, 5), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = q_near_duplicate_payments(spark, tmp).collect()
    assert len(got) == 1 and (got[0].key_a, got[0].key_b) == (1, 2)


def test_structuring_screen_flags_near_threshold_clusters(spark, sf_dir):
    from etl_gov_spark.operators.audit import _STRUCT_THRESHOLD, q_structuring_screen

    rows = q_structuring_screen(spark, sf_dir).collect()
    for r in rows:
        assert r.n_near_threshold >= 3
        assert r.n_near_threshold > r.n_at_or_over
        assert 0 < r.near_share <= 1


def test_lorenz_curve_is_convex_and_ends_at_one(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_lorenz_deciles

    rows = sorted(q_lorenz_deciles(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.decile_share for r in rows]
    assert shares == sorted(shares)  # ascending-sorted deciles => convex
    assert abs(rows[-1].cum_share - 1.0) < 1e-3
    for a, b in zip(rows, rows[1:]):
        assert b.cum_share >= a.cum_share


def test_hhi_bounds(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_hhi_supplier_concentration

    for r in q_hhi_supplier_concentration(spark, sf_dir).collect():
        # HHI in (10000/n, 10000]; equality at perfect monopoly
        assert 10000.0 / r.n_suppliers - 1e-6 <= r.hhi <= 10000.0 + 1e-6
        assert (r.hhi > 2500.0) == (r.highly_concentrated == 1)


def test_cusum_detects_planted_level_shift(spark, tmp_path_factory):
    import datetime

    from etl_gov_spark.operators.audit import q_cusum_changepoint

    tmp = str(tmp_path_factory.mktemp("cusum"))
    rows, k = [], 0
    for d in range(60):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        n = 5 if d < 30 else 20  # level shift at day 30
        for _ in range(n):
            rows.append((k, 1, "O", 100.0, day, "1-URGENT"))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    top = min(q_cusum_changepoint(spark, tmp).collect(), key=lambda r: r.rank)
    shift_day = datetime.date(2024, 1, 31)
    assert abs((top.day - shift_day).days) <= 1  # |CUSUM| peaks at the shift


def test_novelty_declines_over_ingestion(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_ngram_novelty

    rows = sorted(corpus_ngram_novelty(spark, sf_dir).collect(), key=lambda r: r.ingest_bucket)
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_grams
    assert rows[0].novelty == max(r.novelty for r in rows)  # first bucket is most novel


def test_round_number_fracs_nested(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_round_number_bias

    for r in q_round_number_bias(spark, sf_dir).collect():
        # multiples nest: 1000s ⊆ 100s ⊆ whole dollars
        assert r.frac_mult_1000 <= r.frac_mult_100 <= r.frac_whole_dollar <= 1.0


def test_single_source_rates_consistent(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_single_source_risk

    for r in q_single_source_risk(spark, sf_dir).collect():
        assert 0 <= r.n_single_sourced <= r.n_parts
        assert r.avg_suppliers_per_part >= 1.0
        assert abs(r.single_source_rate - r.n_single_sourced / r.n_parts) < 1e-3


def test_benford_verdict_consistent_with_digit_table(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_benford_digits, q_benford_verdict

    v = q_benford_verdict(spark, sf_dir).first()
    digits = q_benford_digits(spark, sf_dir).collect()
    mad = sum(abs(r.deviation) for r in digits) / 9.0
    assert abs(v.mad - mad) < 2e-3
    assert v.verdict in {"close", "acceptable", "marginal", "nonconforming"}


def test_price_dispersion_ranked_and_sane(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_price_dispersion

    rows = sorted(q_price_dispersion(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    cvs = [r.cv for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r.n_buys >= 5 and r.cv >= 0 and r.mean_unit_price > 0


def test_near_dup_payments_bounds(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_near_duplicate_payments

    rows = q_near_duplicate_payments(spark, sf_dir).collect()
    for r in rows:
        assert r.days_apart != 0
        hi = max(r.amount_a, r.amount_b)
        assert abs(r.amount_a - r.amount_b) / hi <= 0.0101
        assert r.key_a < r.key_b


def test_payment_velocity_bursts_bounded(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_payment_velocity

    for r in q_payment_velocity(spark, sf_dir).collect():
        assert 1 <= r.max_orders_7d <= r.total_orders
        assert 0 < r.burst_share <= 1.0


def test_atkinson_in_unit_interval(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_atkinson_index

    rows = q_atkinson_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.atkinson < 1.0  # Jensen: (E sqrt y)^2 <= E y
        assert r.mean_value > 0


def test_fairness_ratio_bounds(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_fairness_fulfillment

    rows = q_fairness_fulfillment(spark, sf_dir).collect()
    assert rows
    assert any(r.impact_ratio == 1.0 for r in rows)  # the best segment
    for r in rows:
        assert 0.0 < r.impact_ratio <= 1.0
        assert r.breaches_80pct_rule == (r.impact_ratio < 0.8)


def test_last_digit_shares_sum_to_one(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_last_digit_uniformity

    rows = q_last_digit_uniformity(spark, sf_dir).collect()
    assert len(rows) == 10
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01
    for r in rows:
        assert 0 <= r.digit <= 9
        assert r.chi2_term >= 0


def test_indirect_standardization_centered(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_indirect_standardization

    rows = q_indirect_standardization(spark, sf_dir).collect()
    assert rows
    # expected totals reproduce observed totals in aggregate
    assert (
        abs(sum(r.observed for r in rows) - sum(r.expected for r in rows))
        < 1.0
    )
    for r in rows:
        assert r.standardized_ratio > 0


def test_benford_second_digit_shares(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_benford_second_digit

    rows = q_benford_second_digit(spark, sf_dir).collect()
    assert len(rows) == 10
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 0.01
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 0.01


def test_gini_by_brand_bounds(spark, sf_dir):
    from etl_gov_spark.operators.audit import q_gini_by_brand

    rows = q_gini_by_brand(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_parts > 0 and r.brand_revenue > 0

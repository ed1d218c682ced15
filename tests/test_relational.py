"""Relational pack invariants (oracle equality is the driver's gate;
these are semantic/determinism checks at sf0.001)."""

from __future__ import annotations

from etl_gov_spark.operators import relational as R


def test_q1_group_count(spark, sf_dir):
    rows = R.q1_pricing_summary(spark, sf_dir).collect()
    flags = {(r.l_returnflag, r.l_linestatus) for r in rows}
    assert len(rows) == len(flags) <= 6
    for r in rows:
        assert r.count_order > 0
        assert r.sum_disc_price <= r.sum_base_price


def test_q3_topk_deterministic(spark, sf_dir):
    a = R.q3_shipping_priority(spark, sf_dir).collect()
    b = R.q3_shipping_priority(spark, sf_dir).collect()
    assert a == b
    revs = [r.revenue for r in a]
    assert revs == sorted(revs, reverse=True)


def test_q6_single_row(spark, sf_dir):
    rows = R.q6_forecast_revenue(spark, sf_dir).collect()
    assert len(rows) == 1


def test_semi_anti_partition_customers(spark, sf_dir):
    rows = R.q_semi_anti(spark, sf_dir).collect()
    from etl_gov_spark.io.sources import read_table

    total = sum(r.n_with_orders + r.n_without_orders for r in rows)
    assert total == read_table(spark, sf_dir, "customer").count()


def test_rollup_has_grand_total(spark, sf_dir):
    rows = R.q_rollup_sales(spark, sf_dir).collect()
    grand = [r for r in rows if r.n_name is None and r.order_year is None]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(
        r.n_orders for r in rows if r.n_name is not None and r.order_year is not None
    )


def test_market_basket_internal_consistency(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import q_market_basket

    rows = q_market_basket(spark, sf_dir).collect()
    assert rows
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    n_orders = (
        read_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    for r in rows:
        assert 0 < r.confidence_a_to_b <= 1.0
        assert r.lift > 0
        assert r.part_a < r.part_b


def test_zipf_fit_shape(spark, sf_dir):
    from etl_gov_spark.operators.text import text_zipf_fit

    rows = text_zipf_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope <= 0  # frequency non-increasing in rank
        assert 0.0 <= r.zipf_r2 <= 1.0
        assert r.vocab_size > 1


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_histogram_equidepth

    rows = sorted(q_histogram_equidepth(spark, sf_dir).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 9))
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equi-depth by construction
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9  # non-overlapping, ordered ranges


def test_windowed_funnel_is_subset_of_unbounded(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_funnel, q_funnel_windowed

    un = q_funnel(spark, sf_dir).first()
    wd = q_funnel_windowed(spark, sf_dir).first()
    assert wd.n_signup == un.n_signup
    assert wd.n_click_7d <= un.n_signup_click
    assert wd.n_purchase_7d <= wd.n_click_7d or wd.n_purchase_7d <= un.n_full_funnel


def test_new_vs_returning_totals(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_new_vs_returning

    rows = q_new_vs_returning(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.new_users for r in rows) == n_users  # everyone is new exactly once
    first_day = min(r.day for r in rows)
    day0 = next(r for r in rows if r.day == first_day)
    assert day0.returning_users == 0


def test_item_item_cf_symmetric_and_ranked(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_item_item_cf

    rows = q_item_item_cf(spark, sf_dir).collect()
    assert rows
    per: dict = {}
    for r in rows:
        per.setdefault(r.part, []).append(r)
        assert r.pair_count >= 2 and r.lift > 0
        assert r.part != r.recommended_part
    for recs in per.values():
        ranks = sorted(r.rec_rank for r in recs)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        lifts = [r.lift for r in sorted(recs, key=lambda x: x.rec_rank)]
        assert lifts == sorted(lifts, reverse=True)


def test_nth_value_ordering_invariant(spark, sf_dir):
    from etl_gov_spark.operators.windows import q_nth_order_value

    for r in q_nth_order_value(spark, sf_dir).collect():
        if r.top2 is not None:
            assert r.top1 >= r.top2
        if r.top3 is not None:
            assert r.top2 >= r.top3


def test_mode_is_actual_maximum_count(spark, sf_dir):
    from collections import Counter

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.windows import q_mode_event_type

    got = {r.user_id: r for r in q_mode_event_type(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per: dict = {}
    for r in ev:
        per.setdefault(r.user_id, Counter())[r.event_type] += 1
    for uid, counter in per.items():
        top = max(counter.values())
        expected = min(t for t, c in counter.items() if c == top)
        assert got[uid].mode_event_type == expected
        assert got[uid].mode_count == top


def test_customer_migration_conserves_customers(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import _MIGRATION_SPLIT, q_customer_migration

    rows = q_customer_migration(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders")
    early_n = (
        orders.filter(F.col("o_orderdate") < F.lit(_MIGRATION_SPLIT).cast("timestamp"))
        .select("o_custkey").distinct().count()
    )
    late_n = (
        orders.filter(F.col("o_orderdate") >= F.lit(_MIGRATION_SPLIT).cast("timestamp"))
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows if r.early_tier != "absent") == early_n
    assert sum(r.n_customers for r in rows if r.late_tier != "absent") == late_n
    assert not any(r.early_tier == "absent" and r.late_tier == "absent" for r in rows)


def test_abc_classes_cover_everything(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import q_abc_classification

    rows = {r.abc_class: r for r in q_abc_classification(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"}
    n_parts = (
        read_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-2
    if "A" in rows and "C" in rows:
        # A parts out-earn C parts per part by construction
        a, c = rows["A"], rows["C"]
        assert a.class_revenue / a.n_parts > c.class_revenue / c.n_parts


def test_cohort_ltv_accumulates(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_cohort_ltv

    per = {}
    for r in q_cohort_ltv(spark, sf_dir).collect():
        per.setdefault(r.cohort_week, []).append(r)
    assert per
    for rows in per.values():
        rows.sort(key=lambda r: r.age_week)
        cum = 0.0
        for r in rows:
            cum += r.week_value
            assert abs(r.cumulative_ltv - cum) < 0.01  # monotone accumulation


def test_executive_summary_internally_consistent(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import q_executive_summary

    r = q_executive_summary(spark, sf_dir).first()
    orders = read_table(spark, sf_dir, "orders")
    assert r.n_orders == orders.count()
    assert abs(r.avg_order_value - r.total_revenue / r.n_orders) < 0.01
    assert r.latest_year == orders.agg(F.max(F.year("o_orderdate"))).first()[0]
    assert r.latest_year_revenue <= r.total_revenue


def test_discount_impact_bands_partition_lines(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import q_discount_impact

    rows = q_discount_impact(spark, sf_dir).collect()
    assert sum(r.n_lines for r in rows) == read_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.revenue_forgone >= 0
        if r.discount_band == "none":
            assert r.revenue_forgone == 0.0


def test_supplier_scorecard_ranked_by_revenue(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_supplier_scorecard

    rows = sorted(q_supplier_scorecard(spark, sf_dir).collect(), key=lambda r: r.rank)
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert 0.0 <= r.on_time_share <= 1.0
        assert r.price_index > 0


def test_price_volume_bridge_closes(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_price_volume_bridge

    rows = q_price_volume_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the bridge closes: volume + price effects explain the full delta
        assert abs(r.residual) < 0.02
        assert abs((r.rev_m1 - r.rev_m0) - (r.volume_effect + r.price_effect)) < 0.05


def test_xyz_classes_match_cv(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_xyz_variability

    rows = q_xyz_variability(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cv >= 0
        expect = "X" if r.cv < 0.5 else ("Y" if r.cv < 1.0 else "Z")
        assert r.xyz == expect


def test_order_aging_covers_open_orders(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.analytics import q_order_aging_buckets

    rows = q_order_aging_buckets(spark, sf_dir).collect()
    assert rows
    n_open = (
        Catalog(spark, sf_dir)
        .orders.filter(F.col("o_orderstatus") == "O")
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_open
    assert {r.age_bucket for r in rows} <= {"00-30", "31-60", "61-90", "90+"}


def test_abc_xyz_matrix_partition(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_abc_xyz_matrix

    rows = q_abc_xyz_matrix(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r.abc in "ABC" and r.xyz in "XYZ"
        assert r.n_brands >= 1
    # A-class cells carry more revenue per brand than C-class cells
    a_rev = sum(r.revenue_share for r in rows if r.abc == "A")
    c_rev = sum(r.revenue_share for r in rows if r.abc == "C")
    assert a_rev >= c_rev


def test_whatif_scenarios_ordered(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_scenario_whatif

    rows = q_scenario_whatif(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # both counterfactuals reduce revenue vs baseline
        assert r.price_minus_5pct < r.baseline
        assert r.discount_plus_1pp < r.baseline
        # -5% price cuts exactly 5%
        assert abs(r.price_minus_5pct / r.baseline - 0.95) < 1e-6


def test_dead_sku_census_partition(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_dead_sku_census

    rows = q_dead_sku_census(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dead <= r.n_parts
        assert 0.0 <= r.dead_share <= 1.0
        assert (r.n_dead == 0) == (r.dead_value == 0.0)


def test_peak_day_share_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_peak_day_contribution

    rows = q_peak_day_contribution(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # peak day carries at least the uniform share, at most all
        assert r.peak_share >= 1.0 / r.n_days - 1e-6
        assert r.peak_share <= 1.0
        assert r.peak_revenue <= r.month_revenue


def test_shift_share_decomposition_closes(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_shift_share

    rows = q_shift_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the three effects reconstruct the growth exactly
        total = r.national_effect + r.mix_effect + r.competitive_effect
        assert abs(total - r.growth) < 0.05


def test_location_quotient_flags_extremes_only(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_location_quotient

    rows = q_location_quotient(spark, sf_dir).collect()
    for r in rows:
        assert r.location_quotient >= 1.2 or r.location_quotient <= 0.8
        assert r.revenue > 0


def test_fisher_between_laspeyres_paasche(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_price_index_fisher

    rows = q_price_index_fisher(spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-4 <= r.fisher <= hi + 1e-4  # geometric mean bracket
        assert r.n_items >= 1


def test_price_change_frequency_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_price_change_frequency

    rows = q_price_change_frequency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_changed <= r.n_parts_priced
        assert 0.0 <= r.change_frequency <= 1.0
        if r.n_changed:
            assert r.avg_change_magnitude > 0.01


def test_raking_converges_toward_targets(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_survey_raking

    rows = q_survey_raking(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # after 3 IPF rounds the row marginals sit near target
        assert r.marginal_error < 0.05
        assert r.weighted_total > 0


def test_composite_index_ranked_unit_interval(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_composite_index

    rows = sorted(q_composite_index(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert len(rows) == 25
    prev = None
    for r in rows:
        assert 0.0 <= r.composite_index <= 1.0
        if prev is not None:
            assert r.composite_index <= prev + 1e-9
        prev = r.composite_index


def test_pareto_elbow_above_diagonal(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_pareto_elbow

    r = q_pareto_elbow(spark, sf_dir).collect()[0]
    assert 1 <= r.elbow_rank <= r.n_parts
    # the concentration curve sits above the diagonal at its elbow
    assert r.revenue_share_at_elbow >= r.elbow_rank_share


def test_topk_stability_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_topk_stability

    r = q_topk_stability(spark, sf_dir).collect()[0]
    assert 0 <= r.n_overlap <= r.k
    assert 0.0 <= r.jaccard <= 1.0
    assert 0 <= r.new_in_top10 <= 10


def test_parts_momentum_ranked(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_parts_momentum

    rows = sorted(q_parts_momentum(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert len(rows) == 10
    prev = None
    for r in rows:
        if prev is not None:
            assert r.acceleration <= prev + 1e-9
        prev = r.acceleration


def test_newsvendor_quantile_dominates_mean_at_08(spark, sf_dir):
    """At fractile 0.8, q* is >= the median and the safety stock is
    q* - mean by definition."""
    from etl_gov_spark.operators.analytics import q_newsvendor_quantile

    rows = q_newsvendor_quantile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_weeks > 0
        assert abs(r.safety_stock - (r.q_star - r.mean_weekly_demand)) < 1e-3


def test_fill_rate_bounds_and_sla(spark, sf_dir):
    from etl_gov_spark.operators.analytics import (
        _FILL_SLA_DAYS,
        q_fill_rate_service_level,
    )

    rows = q_fill_rate_service_level(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.fill_rate <= 1.0
        if r.mean_days_on_time is not None:
            assert 0 <= r.mean_days_on_time <= _FILL_SLA_DAYS


def test_order_line_pareto_shares_sum_to_one(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_order_line_pareto

    rows = q_order_line_pareto(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.order_share for r in rows) - 1.0) < 0.01
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 0.01


def test_dupont_product_reconstructs_revenue(spark, sf_dir):
    """The three factors must re-multiply to revenue per customer
    (within rounding)."""
    from etl_gov_spark.operators.analytics import q_dupont_decomposition

    rows = q_dupont_decomposition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        prod = r.orders_per_customer * r.lines_per_order * r.value_per_line
        assert abs(prod - r.revenue_per_customer) < 0.01 * r.revenue_per_customer


def test_customer_overlap_consistent(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_customer_overlap_segments

    rows = q_customer_overlap_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_both <= min(r.n_early, r.n_late)
        assert 0.0 <= r.jaccard_overlap <= 1.0
        assert 0.0 <= r.early_retained_share <= 1.0


def test_seasonal_index_averages_to_one(spark, sf_dir):
    """Day-weighted mean of the indices must be 1 by construction."""
    from etl_gov_spark.operators.analytics import q_seasonal_index_monthly

    rows = q_seasonal_index_monthly(spark, sf_dir).collect()
    assert len(rows) == 12
    total_days = sum(r.n_days for r in rows)
    wmean = sum(r.seasonal_index * r.n_days for r in rows) / total_days
    assert abs(wmean - 1.0) < 0.01


def test_cold_start_ramp_shares_bounded(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_cold_start_ramp

    rows = sorted(
        q_cold_start_ramp(spark, sf_dir).collect(), key=lambda r: r.quarter
    )
    assert rows
    # the first quarter is all debuts by definition
    assert rows[0].debut_revenue_share == 1.0
    for r in rows:
        assert 0.0 <= r.debut_revenue_share <= 1.0
        assert r.n_new_parts >= 0 and r.revenue > 0


def test_join_key_skew_census_sanity(spark, sf_dir):
    from etl_gov_spark.operators.skew import q_join_key_skew_census

    rows = {r.join_key: r for r in q_join_key_skew_census(spark, sf_dir).collect()}
    assert set(rows) == {"l_orderkey", "l_partkey"}
    for r in rows.values():
        assert 0 < r.top_key_share <= 1.0
        assert r.p99_over_p50 >= 1.0
        assert 0.0 <= r.top1pct_row_share <= 1.0
        assert r.max_key_rows * r.n_keys >= r.n_rows * r.top_key_share


def test_weekend_uplift_day_accounting(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_weekend_uplift

    rows = q_weekend_uplift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # ~2:5 weekend:weekday day ratio, loose bounds
        assert 0 < r.n_weekend_days < r.n_weekday_days
        assert r.weekend_uplift > 0


def test_tax_discount_grid_take_rate_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_tax_discount_grid

    rows = q_tax_discount_grid(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # (1-d)(1+t) with d,t in [0, ~0.1] stays near 1
        assert 0.8 <= r.mean_take_rate <= 1.2
        assert r.tax_pct % 2 == 0 and r.disc_pct % 2 == 0


def test_size_price_slope_r2_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_size_price_slope

    rows = q_size_price_slope(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0
        assert r.n_parts > 0


def test_supplier_tiers_partition_suppliers(spark, sf_dir):
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.analytics import q_supplier_balance_tiers

    rows = q_supplier_balance_tiers(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_suppliers for r in rows) == Catalog(
        spark, sf_dir
    ).supplier.count()
    assert {r.tier for r in rows} <= {"negative", "low", "mid", "high"}


def test_linenumber_profile_dense_from_one(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_linenumber_profile

    rows = sorted(
        q_linenumber_profile(spark, sf_dir).collect(),
        key=lambda r: r.linenumber,
    )
    assert rows[0].linenumber == 1
    nums = [r.linenumber for r in rows]
    assert nums == list(range(1, len(nums) + 1))
    for r in rows:
        assert r.n_lines > 0 and r.mean_qty > 0 and r.mean_line_revenue > 0


def test_part_name_tokens_topk(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_part_name_tokens

    rows = q_part_name_tokens(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    revs = [r.revenue for r in sorted(rows, key=lambda r: r.rank)]
    assert revs == sorted(revs, reverse=True)


def test_return_rate_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_return_rate_by_brand

    rows = q_return_rate_by_brand(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert 0.0 <= r.return_rate <= 1.0
        assert 0.0 <= r.revenue_at_risk_share <= 1.0


def test_discount_uptake_bounds(spark, sf_dir):
    from etl_gov_spark.operators.analytics import q_discount_uptake_by_segment

    rows = q_discount_uptake_by_segment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.discounted_share <= 1.0
        if r.mean_depth is not None:
            assert 0.0 < r.mean_depth <= 0.2
        assert r.discount_given >= 0.0


def test_skyline_parts_exact_dominance(spark, tmp_path):
    """q_skyline_parts equals the O(n²) dominance definition on a
    constructed table with every edge case: equal-price ties, equal
    (price, size) duplicates (neither dominates the other — both
    survive), and strictly dominated interior points."""
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.analytics import q_skyline_parts

    rows = [
        (1, "B1", "t", 10, 5.00),   # frontier (cheapest)
        (2, "B1", "t", 30, 5.00),   # frontier (same price, bigger)
        (3, "B2", "t", 30, 5.00),   # duplicate of 2 -> both survive
        (4, "B2", "t", 20, 6.00),   # dominated by 2 (cheaper, bigger)
        (5, "B3", "t", 40, 7.00),   # frontier (bigger than all cheaper)
        (6, "B3", "t", 40, 8.00),   # dominated by 5 (same size, pricier)
        (7, "B3", "t", 50, 9.00),   # frontier
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_brand string, p_type string, p_size int, p_retailprice double",
    ).select(
        "p_partkey", F.lit("n").alias("p_name"), "p_brand", "p_type",
        "p_size", "p_retailprice",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    got = [(r.p_partkey, r.price, r.size) for r in q_skyline_parts(spark, str(tmp_path)).collect()]

    # naive O(n^2) reference
    pts = [(k, p, s) for (k, _b, _t, s, p) in rows]
    def dominated(a):
        return any(
            (q[1] <= a[1] and q[2] >= a[2]) and (q[1] < a[1] or q[2] > a[2])
            for q in pts if q[0] != a[0]
        )
    expect = sorted(
        [(k, p, s) for (k, p, s) in pts if not dominated((k, p, s))],
        key=lambda x: (x[1], x[0]),
    )
    assert got == expect
    assert {k for k, _, _ in got} == {2, 3, 5, 7}

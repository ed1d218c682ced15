

def test_event_disorder_flags_only_out_of_order_arrivals(spark, tmp_path_factory):
    """In-order arrivals (event_id order == ts order) show zero
    lateness; a planted late arrival is counted with its true lag."""
    from etl_gov_spark.operators.timeseries import q_event_disorder

    tmp = str(tmp_path_factory.mktemp("disorder"))
    rows = [
        # user 1: strictly in order
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        # user 2: event 4 arrives 120s behind the high-water mark
        (3, "2024-01-01 10:10:00", 2, "view", 1.0, "{}"),
        (4, "2024-01-01 10:08:00", 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {r.event_type: r for r in q_event_disorder(spark, tmp).collect()}
    assert got["click"].n_late == 0 and got["click"].max_late_s == 0.0
    assert got["view"].n_late == 1 and got["view"].max_late_s == 120.0


def test_asof_nearest_picks_closest_side_with_tolerance(spark, tmp_path_factory):
    """Forward click closer than backward → forward wins; backward
    wins ties; clicks beyond ±10 min tolerance leave NULL."""
    from etl_gov_spark.operators.timeseries import q_asof_nearest

    tmp = str(tmp_path_factory.mktemp("asofnear"))
    rows = [
        # u1: click 8 min before, click 2 min after → forward wins
        (1, "2024-01-01 09:52:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "purchase", 9.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "click", 1.0, "{}"),
        # u2: clicks exactly 3 min both sides → backward tie-break
        (4, "2024-01-01 09:57:00", 2, "click", 1.0, "{}"),
        (5, "2024-01-01 10:00:00", 2, "purchase", 9.0, "{}"),
        (6, "2024-01-01 10:03:00", 2, "click", 1.0, "{}"),
        # u3: nearest click 11 min away → outside tolerance, NULL
        (7, "2024-01-01 09:49:00", 3, "click", 1.0, "{}"),
        (8, "2024-01-01 10:00:00", 3, "purchase", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {r.user_id: r for r in q_asof_nearest(spark, tmp).collect()}
    assert (got[1].nearest_click_id, got[1].direction, got[1].delta_s) == (3, "forward", 120.0)
    assert (got[2].nearest_click_id, got[2].direction) == (4, "backward")
    assert got[3].nearest_click_id is None and got[3].direction is None


def test_login_streaks_histogram_covers_all_users(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_login_streaks

    rows = q_login_streaks(spark, sf_dir).collect()
    assert rows
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert r.max_streak >= 1


def test_burst_detection_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_burst_detection

    rows = q_burst_detection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bursts < r.n_hours
        assert r.peak_to_mean >= 1.0
        assert r.mean_rate > 0


def test_interval_union_coverage_bounds(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_interval_union

    rows = q_interval_union(spark, sf_dir).collect()
    assert rows
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        # every span is at least one 5-min interval long
        assert r.avg_covered_min >= 5.0 * r.n_spans - 1e-6


def test_markov_model_beats_nothing_and_covers_states(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_markov_next_event

    rows = q_markov_next_event(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_test > 0
        assert r.predicted  # every trained state predicts something


def test_session_paths_top10_and_counts(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_session_paths, q_sessionize

    rows = sorted(q_session_paths(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert 0 < len(rows) <= 10
    prev = None
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 3
        if prev is not None:
            assert r.n_sessions <= prev
        prev = r.n_sessions
    n_sessions = q_sessionize(spark, sf_dir).count()
    assert sum(r.n_sessions for r in rows) <= n_sessions


def test_xcorr_bounds_and_lag_zero_present(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_lead_lag_xcorr

    rows = {r.lag: r for r in q_lead_lag_xcorr(spark, sf_dir).collect()}
    assert 0 in rows and len(rows) == 7
    for r in rows.values():
        assert r.xcorr is None or -1.0 <= r.xcorr <= 1.0
        assert r.n_hours > 0
    # shifted series overlap shrinks as |lag| grows
    assert rows[3].n_hours <= rows[0].n_hours
    assert rows[-3].n_hours <= rows[0].n_hours


def test_position_attribution_conserves_revenue(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_attribution_position

    rows = q_attribution_position(spark, sf_dir).collect()
    assert rows
    # credits per conversion sum to 1, so attributed revenue equals the
    # revenue of every purchase that HAS at least one preceding touch
    # within the same user stream (purchases with no touch get none);
    # bound: attributed <= total purchase revenue
    total = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    attributed = sum(r.rev_position for r in rows)
    assert 0 < attributed <= total * 1.0001


def test_rolling_zscore_counts_bounded(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_rolling_zscore_alerts

    rows = q_rolling_zscore_alerts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_alerts <= r.n_days_scored
        assert r.max_abs_z >= 0


def test_missing_hour_census_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_missing_hour_census

    rows = q_missing_hour_census(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_missing < r.n_expected
        assert r.longest_outage_hours <= r.n_missing


def test_fourier_fit_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_hourly_seasonality_fourier

    rows = q_hourly_seasonality_fourier(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.amplitude >= 0
        assert 0.0 <= r.peak_hour < 24.0
        assert 0.0 <= r.cycle_var_share <= 1.0 + 1e-6
        assert r.mean_level > 0


def test_lifecycle_states_partition_users(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_user_lifecycle_states

    rows = q_user_lifecycle_states(spark, sf_dir).collect()
    assert rows
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert {r.state for r in rows} <= {"new", "active", "at_risk", "churned"}


def test_growth_accounting_identity(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_growth_accounting

    rows = sorted(q_growth_accounting(spark, sf_dir).collect(), key=lambda r: r.wk)
    assert rows
    for r in rows:
        # the decomposition is a partition of actives
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    # first week: everyone is new
    assert rows[0].n_new == rows[0].n_active


def test_cohort_decay_halflife_positive(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_cohort_decay_fit

    r = q_cohort_decay_fit(spark, sf_dir).collect()[0]
    assert r.n_points == 7
    # synthetic users barely churn, so the slope may sit either side
    # of zero — assert the identity and bounds, not the sign
    assert (r.half_life_days > 0) == (r.decay_slope < 0)
    assert abs(abs(r.half_life_days * r.decay_slope) - 0.6931) < 0.01
    assert 0.0 <= r.r2 <= 1.0


def test_conversion_window_monotone(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_conversion_window_sensitivity

    r = q_conversion_window_sensitivity(spark, sf_dir).collect()[0]
    # wider window can only keep more conversions
    assert r.n_within_1h <= r.n_within_6h <= r.n_within_24h <= r.n_converted_ever
    assert r.cvr_1h <= r.cvr_6h <= r.cvr_24h
    assert r.n_converted_ever <= r.n_signup_users


def test_session_completeness_shares(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import (
        q_session_completeness,
        q_sessionize,
    )

    rows = q_session_completeness(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01
    n_sessions = q_sessionize(spark, sf_dir).count()
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 1 <= r.n_types <= 5
        assert r.avg_events >= r.n_types  # at least one event per type


def test_seasonal_naive_metrics(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_seasonal_naive_backtest

    rows = q_seasonal_naive_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mae >= 0 and r.mape >= 0
        assert abs(r.bias) <= r.mae + 1e-9
        assert r.n_days_scored > 0


def test_type_user_overlap_matrix(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_type_user_overlap

    rows = q_type_user_overlap(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert 0.0 <= r.jaccard <= 1.0


def test_max_drawdown_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_max_drawdown

    r = q_max_drawdown(spark, sf_dir).collect()[0]
    assert r.max_drawdown <= 0.01  # the deepest gap is at or below zero
    assert -1.0 <= r.drawdown_frac <= 1.0
    assert r.n_days > 30


def test_churn_hazard_risk_set_monotone(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_churn_hazard

    rows = sorted(q_churn_hazard(spark, sf_dir).collect(), key=lambda r: r.tenure_week)
    assert rows
    prev = None
    for r in rows:
        assert 0.0 <= r.hazard <= 1.0
        assert r.n_churned + r.n_censored <= r.n_at_risk
        if prev is not None:
            assert r.n_at_risk <= prev
        prev = r.n_at_risk


def test_chain_ladder_factors(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_chain_ladder

    rows = sorted(q_chain_ladder(spark, sf_dir).collect(), key=lambda r: r.dev)
    assert rows
    for r in rows:
        assert r.dev_factor >= 1.0  # cumulative counts only grow
        assert r.n_cohorts >= 1


def test_markov_absorption_monotone_in_probability(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import (
        q_markov_absorption,
        q_markov_next_event,
    )

    rows = {r.src: r for r in q_markov_absorption(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r.p_purchase_within_3 <= 1.0
    # three steps reach at least as far as one step: the 3-step
    # probability dominates any single transition into purchase
    assert all(r.p_purchase_within_3 > 0 for r in rows.values())


def test_mtbf_reliability_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_mtbf_reliability

    r = q_mtbf_reliability(spark, sf_dir).collect()[0]
    assert r.mtbf_hours > 0
    assert 0.0 < r.reliability_24h < r.reliability_1h < 1.0
    assert r.gap_cv > 0


def test_seasonal_diff_acf_bounds(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_seasonal_diff_acf

    r = q_seasonal_diff_acf(spark, sf_dir).collect()[0]
    for v in (r.acf1_raw, r.acf7_raw, r.acf1_after_weekly_diff):
        assert -1.0 <= v <= 1.0
    assert r.n_days > 30


def test_behavior_surprise_ranked(spark, sf_dir):
    import math

    from etl_gov_spark.operators.timeseries import q_behavior_surprise

    rows = sorted(q_behavior_surprise(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert rows
    cap = -math.log2(1e-3)
    prev = None
    for r in rows:
        assert 0.0 <= r.avg_surprise_bits <= cap + 1e-6
        assert r.n_transitions > 0
        if prev is not None:
            assert r.avg_surprise_bits <= prev + 1e-9
        prev = r.avg_surprise_bits


def test_burstiness_bands(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_burstiness_coefficient

    rows = q_burstiness_coefficient(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.avg_burstiness <= 1.0
        assert r.n_users > 0


def test_weekday_hour_profile_complete(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_weekday_hour_profile

    rows = q_weekday_hour_profile(spark, sf_dir).collect()
    # only OBSERVED cells appear; at this sf one 7x24 cell is empty
    assert 160 <= len(rows) <= 168
    assert abs(sum(r.share for r in rows) - 1.0) < 0.02


def test_croston_components_positive(spark, sf_dir):
    """z_hat/q_hat positive, gaps ≥ 1 week ⇒ q_hat ≥ ~1, and rate
    = z_hat/q_hat; ranks dense."""
    from etl_gov_spark.operators.analytics import q_croston_intermittent

    rows = q_croston_intermittent(spark, sf_dir).collect()
    assert rows and [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.z_hat > 0 and r.q_hat >= 0.99
        assert abs(r.rate_per_week - round(r.z_hat / r.q_hat, 4)) < 2e-3
        assert r.n_events >= 5


def test_risk_pooling_ratio_bounds(spark, sf_dir):
    """Pooling never hurts in σ terms: ratio ∈ (0, 1]; and with
    positively-correlated real demand it sits ABOVE the iid √n
    floor for most brands."""
    from etl_gov_spark.operators.analytics import q_risk_pooling

    rows = q_risk_pooling(spark, sf_dir).collect()
    assert len(rows) == 25
    above = 0
    for r in rows:
        assert 0.0 < r.pooling_ratio <= 1.0 + 1e-9
        assert 0.0 < r.iid_ratio <= 1.0
        above += r.pooling_ratio >= r.iid_ratio - 1e-9
    assert above >= len(rows) * 0.6


def test_peak_detection_prominence_gate(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_peak_detection

    rows = q_peak_detection(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    proms = [r.prominence for r in rows]
    assert all(p > 1.25 for p in proms)
    assert proms == sorted(proms, reverse=True)


def test_bollinger_census_bounded(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_bollinger_breakouts

    rows = q_bollinger_breakouts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_above_band + r.n_below_band <= r.n_days
        assert r.mean_bandwidth > 0


def test_rsi_bounded(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_rsi_indicator

    rows = q_rsi_indicator(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_rsi <= 100.0
        assert r.n_overbought + r.n_oversold <= r.n_days


def test_matrix_profile_finds_planted_motif_and_discord(spark, tmp_path):
    """q_matrix_profile_motifs: two exactly-repeated weeks must rank
    as the top motif pair (z-distance 0 at exact alignment), and the
    discord row must be a single, pairless, strictly-farthest
    entry."""
    import datetime
    import hashlib

    from etl_gov_spark.operators.timeseries import q_matrix_profile_motifs

    base = datetime.date(2024, 1, 1)
    week = [100.0, 220.0, 140.0, 310.0, 90.0, 260.0, 180.0]
    rows = []
    for i in range(60):
        # hash-based jitter: no affine structure between any two
        # 7-day windows (z-normalization treats affine-equivalent
        # windows as identical, so linear jitter would plant fake
        # zero-distance motifs)
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
        v = 150.0 + (h % 499) * 1.7
        if 10 <= i < 17:
            v = week[i - 10]  # planted week A
        if 40 <= i < 47:
            v = week[i - 40]  # planted week B (identical)
        rows.append((base + datetime.timedelta(days=i), v))
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = q_matrix_profile_motifs(spark, str(tmp_path)).collect()
    motifs = [r for r in out if r.kind == "motif"]
    discord = [r for r in out if r.kind == "discord"]
    assert motifs[0].rank == 1
    assert (motifs[0].day_a, motifs[0].day_b) == (
        base + datetime.timedelta(days=10),
        base + datetime.timedelta(days=40),
    )
    assert motifs[0].dist == 0.0
    # discord: exactly one row, no pair column, strictly farther
    # than the planted zero-distance motif (z-normalized distance is
    # SHAPE-based, so a location assertion would be testing the
    # jitter draw, not the operator)
    assert len(discord) == 1 and discord[0].day_b is None
    assert discord[0].rank == 1
    assert discord[0].dist > motifs[-1].dist > motifs[0].dist

"""Resampling-pack invariants: grid completeness, interpolation
bounds, EWMA smoothing behaviour (oracle equality is the driver's
gate; these are semantic checks at sf0.001)."""

from __future__ import annotations

from etl_gov_spark.operators import resample as RS


def test_gap_fill_grid_is_contiguous(spark, sf_dir):
    rows = RS.q_gap_fill(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for days in by_user.values():
        days.sort(key=lambda r: r.day)
        span = (days[-1].day - days[0].day).days + 1
        assert len(days) == span  # no holes, no dup days
        for r in days:
            assert (r.n_events == 0) == (r.is_filled == 1)
            assert r.day_value == 0.0 or r.n_events > 0


def test_interp_observed_pass_through_and_bounds(spark, sf_dir):
    rows = RS.q_interp_linear(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for days in by_user.values():
        days.sort(key=lambda r: r.day)
        observed = [r.value_interp for r in days if r.is_observed == 1]
        assert observed, "every user has at least one observed day"
        lo, hi = min(observed), max(observed)
        for r in days:
            assert r.value_interp is not None
            # linear interp never over/undershoots its neighbours
            assert lo - 1e-9 <= r.value_interp <= hi + 1e-9
            if r.is_observed:
                assert float(r.value_interp) == float(round(r.value_interp, 4))


def test_ewma_is_smoother_than_raw(spark, sf_dir):
    rows = RS.q_ewma_value(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        # first point: ewma == raw value (kernel has one term)
        assert abs(series[0].ewma - series[0].hourly_value) < 1e-3
        if len(series) < 10:
            continue
        raw = [r.hourly_value for r in series]
        sm = [r.ewma for r in series]
        tv = lambda xs: sum(abs(a - b) for a, b in zip(xs, xs[1:]))  # noqa: E731
        assert tv(sm) < tv(raw)  # smoothing reduces total variation


def test_timezone_rollup_preserves_totals(spark, sf_dir):
    """Shifting timezone re-buckets events but never loses any."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_timezone_rollup

    rows = q_timezone_rollup(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    total = ev.agg(F.sum("value")).first()[0]
    assert abs(sum(r.total_value for r in rows) - total) < 1.0
    assert {r.band for r in rows} <= {"business", "evening", "off_hours"}


def test_stratified_split_exact_proportions(spark, sf_dir):
    from etl_gov_spark.operators.corpus import corpus_split_stratified

    rows = corpus_split_stratified(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, {})[r.split] = r.n_docs
    for source, splits in per.items():
        n = sum(splits.values())
        assert splits.get("train", 0) == n * 12 // 16
        assert splits.get("train", 0) + splits.get("val", 0) == n * 14 // 16


def test_backlog_balances_to_open_minus_done(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.timeseries import q_order_backlog

    rows = sorted(q_order_backlog(spark, sf_dir).collect(), key=lambda r: r.month)
    n_orders = read_table(spark, sf_dir, "orders").count()
    n_done = (
        read_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert rows[-1].backlog == n_orders - n_done


def test_concurrency_sweep_is_conservative(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_concurrent_sessions, q_sessionize

    peaks = {r.day: r.peak_concurrent for r in q_concurrent_sessions(spark, sf_dir).collect()}
    # a day whose only endpoint is a session END samples live=0
    assert peaks and all(p >= 0 for p in peaks.values())
    assert max(peaks.values()) >= 1
    n_sessions = q_sessionize(spark, sf_dir).count()
    assert max(peaks.values()) <= n_sessions


def test_rolling_median_within_window_bounds(spark, sf_dir):
    from etl_gov_spark.operators.resample import q_rolling_median

    rows = sorted(q_rolling_median(spark, sf_dir).collect(), key=lambda r: r.day)
    revs = [r.revenue for r in rows]
    for i, r in enumerate(rows):
        window = revs[max(0, i - 6) : i + 1]
        assert min(window) - 1e-6 <= r.rolling_median_7d <= max(window) + 1e-6


def test_autocorrelation_in_valid_range(spark, sf_dir):
    from etl_gov_spark.operators.resample import q_autocorrelation

    r = q_autocorrelation(spark, sf_dir).first()
    for v in (r.acf_lag1, r.acf_lag7, r.acf_lag30):
        assert v is None or -1.0 <= v <= 1.0
    assert r.n_days > 30


def test_decomposition_variance_accounting(spark, sf_dir):
    from etl_gov_spark.operators.resample import q_seasonal_decompose

    r = q_seasonal_decompose(spark, sf_dir).first()
    assert r.n_days > 100
    # residual variance can't exceed total (the decomposition helps)
    assert 0 <= r.var_residual <= r.var_total
    assert 0.0 <= r.explained_share <= 1.0


def test_weekly_ohlc_invariants(spark, sf_dir):
    from etl_gov_spark.operators.resample import q_weekly_ohlc

    rows = q_weekly_ohlc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert 1 <= r.n_days <= 7

"""Count-min invariants: one-sided error, bound, exactness on a
dominated stream."""

from __future__ import annotations

from etl_gov_spark.io.sources import read_table
from etl_gov_spark.operators import sketches as SK


def test_countmin_overcounts_only_and_within_bound(spark, sf_dir):
    rows = SK.q_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    n = read_table(spark, sf_dir, "events").count()
    bound = 2.0 * n / SK.CM_WIDTH  # expected-error bound per row
    for r in rows:
        assert r.overcount >= 0  # CM never undercounts
        assert r.cm_estimate >= r.true_count
        # min over D rows beats the single-row bound comfortably
        assert r.overcount <= 4 * bound, (r.user_id, r.overcount, bound)


def test_countmin_exact_on_sparse_stream(spark, tmp_path_factory):
    """With #keys << width, collisions are unlikely and estimates
    are exact."""
    import datetime

    tmp = str(tmp_path_factory.mktemp("cm"))
    rows = []
    eid = 0
    for user, cnt in [(1, 50), (2, 30), (3, 20)]:
        for _ in range(cnt):
            rows.append((eid, datetime.datetime(2024, 1, 1), user, "e", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = {r.user_id: r for r in SK.q_countmin_heavy_hitters(spark, tmp).collect()}
    assert got[1].cm_estimate == got[1].true_count == 50
    assert got[2].overcount == 0 and got[3].overcount == 0


def test_hll_weekly_union_close_to_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table

    rows = SK.q_hll_daily_weekly(spark, sf_dir).collect()
    assert rows
    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"), "user_id"
    )
    exact = {
        r.week: r.n
        for r in ev.groupBy("week").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    # raw estimate recomputed here (the query now emits the audited
    # boolean instead of the engine-specific estimate)
    est = {
        r.week: r.est
        for r in ev.groupBy("week")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    for r in rows:
        assert r.est_in_bound, (r.week,)
        assert r.exact_weekly == exact[r.week]
        rel = abs(est[r.week] - exact[r.week]) / exact[r.week]
        assert rel < SK.HLL_REL_BOUND, (r.week, est[r.week], exact[r.week])


def test_event_transitions_probabilities_normalize(spark, sf_dir):
    from etl_gov_spark.operators.timeseries import q_event_transitions

    rows = q_event_transitions(spark, sf_dir).collect()
    per_src: dict[str, float] = {}
    for r in rows:
        assert r.n_transitions > 0 and 0 < r.p_transition <= 1
        per_src[r.prev_type] = per_src.get(r.prev_type, 0.0) + r.p_transition
    for src, total in per_src.items():
        assert abs(total - 1.0) < 1e-2, (src, total)


def test_bloom_audit_fpr_near_expected(spark, sf_dir):
    from etl_gov_spark.operators.sketches import q_bloom_membership_audit

    r = q_bloom_membership_audit(spark, sf_dir).collect()[0]
    assert r.n_bits_set <= 3 * r.n_members  # k hashes, minus collisions
    assert 0 <= r.n_false_pos <= r.n_probes
    # actual FPR should land in the right ballpark of (fill)^k
    assert abs(r.fpr_actual - r.fpr_expected) < max(0.02, 3 * r.fpr_expected)


def test_kmv_estimate_within_theory_bounds(spark, sf_dir):
    """KMV with k=64 has relative SE ~ 1/sqrt(k-2) ≈ 12.7%; assert
    the audited error stays within 4 SE, and exact fallback kicks in
    below k."""
    from etl_gov_spark.operators.sketches import _KMV_K, q_kmv_distinct_audit

    rows = q_kmv_distinct_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.k_kept < _KMV_K:
            assert r.kmv_estimate == float(r.exact_distinct)
            assert r.relative_error == 0.0
        else:
            assert abs(r.relative_error) < 4 / (_KMV_K - 2) ** 0.5


def test_histogram_quantile_sketch_error_bound(spark, sf_dir):
    """The equi-width sketch's estimate is the covering bucket's
    UPPER edge, so est ∈ [exact, exact + width] cannot be violated
    by more than one bucket width — the deterministic error bound
    the 128-bucket layout guarantees."""
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.sketches import (
        HIST_BUCKETS,
        q_histogram_quantile_sketch,
    )
    from pyspark.sql import functions as F2

    r = q_histogram_quantile_sketch(spark, sf_dir).collect()[0]
    b = (
        Catalog(spark, sf_dir)
        .orders.agg(
            F2.min("o_totalprice").alias("lo"), F2.max("o_totalprice").alias("hi")
        )
        .collect()[0]
    )
    width = (float(b.hi) - float(b.lo)) / HIST_BUCKETS
    for p in (50, 90, 99):
        est, exact = getattr(r, f"est_p{p}"), getattr(r, f"exact_p{p}")
        assert exact - 1e-6 <= est <= exact + width + 1e-6
        assert abs(getattr(r, f"rel_err_p{p}")) <= width / exact + 1e-6


def test_theta_setops_identities_and_error(spark, sf_dir):
    """q_theta_sketch_setops: per pair, the sketch algebra must obey
    its own identities (A∖B = A − A∩B, union = A + B − A∩B in
    retained-count space) and the estimates must sit within a loose
    KMV error envelope of the exact counts (3σ ≈ 3/√(k−2) for k=64
    → ±40%); exact-mode rows (θ=1, segment smaller than k) must
    match exactly."""
    from etl_gov_spark.operators.sketches import q_theta_sketch_setops

    rows = q_theta_sketch_setops(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.theta <= 1.0
        # A∖B identity holds in retained-COUNT space by construction
        # (n_anotb = n_a − n_inter before the /θ scale-up). In estimate
        # space each side is rounded to 4dp independently, so when θ<1
        # the two sides can legitimately differ by one rounding ULP
        # (1e-4) — tolerance sized accordingly.
        assert abs(r.anotb_est - (r.a_est - r.inter_est)) < 1.5e-4
        if r.theta == 1.0:
            assert r.inter_est == r.exact_inter
            assert r.union_est == r.exact_union
            assert r.anotb_est == r.exact_anotb
        else:
            for est, exact in (
                (r.union_est, r.exact_union),
                (r.inter_est, r.exact_inter),
            ):
                if exact >= 64:  # envelope only meaningful at sketch scale
                    assert abs(est - exact) / exact <= 0.40, (est, exact)

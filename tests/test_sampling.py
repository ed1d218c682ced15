"""Sampling-pack invariants: determinism, stratum bounds, and
weight sensitivity (oracle equality is the driver's gate)."""

from __future__ import annotations

from etl_gov_spark.operators import sampling as S


def test_reservoir_deterministic_and_bounded(spark, sf_dir):
    a = sorted(map(tuple, S.q_reservoir_per_group(spark, sf_dir).collect()))
    b = sorted(map(tuple, S.q_reservoir_per_group(spark, sf_dir).collect()))
    assert a == b  # replayable: same draw on any layout
    per = {}
    for prio, key, rank in a:
        per.setdefault(prio, []).append(rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= S.K_RESERVOIR


def test_reservoir_is_hash_ordered_not_key_ordered(spark, sf_dir):
    rows = S.q_reservoir_per_group(spark, sf_dir).collect()
    from etl_gov_spark.io.sources import read_table

    orders = read_table(spark, sf_dir, "orders")
    lowest = {
        r.o_orderpriority: r.mn
        for r in orders.groupBy("o_orderpriority").agg(
            __import__("pyspark.sql.functions", fromlist=["min"]).min("o_orderkey").alias("mn")
        ).collect()
    }
    # a uniform sample should not just be the smallest keys
    top1 = {r.o_orderpriority: r.o_orderkey for r in rows if r.sample_rank == 1}
    assert any(top1[p] != lowest[p] for p in top1)


def test_stratified_sample_proportions_and_determinism(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.analytics import q_stratified_sample, _STRATA_FRACS

    a = sorted(map(tuple, q_stratified_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_stratified_sample(spark, sf_dir).collect()))
    assert a == b  # md5 draw: layout- and rerun-independent
    totals = {
        r.o_orderstatus: r.n
        for r in read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for status, n_sampled, _avg in a:
        frac = _STRATA_FRACS[status]
        expect = totals[status] * frac
        # binomial draw: allow 5 sigma around the target fraction
        slack = 5 * (totals[status] * frac * (1 - frac)) ** 0.5 + 1
        assert abs(n_sampled - expect) <= slack


def test_weighted_sample_favours_heavy_orders(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from pyspark.sql import functions as F

    rows = S.q_weighted_sample(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.o_orderpriority, []).append(r.weight)
        assert 1 <= r.sample_rank <= S.K_WEIGHTED
    orders = read_table(spark, sf_dir, "orders")
    avg_all = orders.agg(F.avg("o_totalprice")).first()[0]
    sampled = [w for ws in per.values() for w in ws]
    avg_sampled = sum(sampled) / len(sampled)
    # value-weighted draws should skew above the population mean
    assert avg_sampled > avg_all


def test_balanced_downsample_equalizes_classes(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.sampling import q_balanced_downsample

    rows = q_balanced_downsample(spark, sf_dir).collect()
    assert rows
    n_min = min(r.n_before for r in rows)
    for r in rows:
        assert r.n_sampled == n_min  # every class cut to the minority count
        assert r.n_before >= n_min
    n_types = (
        read_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(rows) == n_types


def test_t_closeness_bounds(spark, sf_dir):
    """TVD is a metric on [0,1]; per-nation aggregates respect it
    and the over-threshold count is bounded by the group count."""
    from etl_gov_spark.operators.privacy import q_t_closeness_audit

    rows = q_t_closeness_audit(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r.avg_tvd <= r.max_tvd <= 1.0
        assert 0 <= r.groups_over_t <= r.n_groups


def test_systematic_sample_rate_and_means(spark, sf_dir):
    from etl_gov_spark.operators.sampling import (
        _SYSTEMATIC_K,
        q_systematic_sample,
    )

    rows = q_systematic_sample(spark, sf_dir).collect()
    assert rows
    total_s = sum(r.n_sample for r in rows)
    total_f = sum(r.n_frame for r in rows)
    # global rate is exactly ceil(N/k)/N
    assert total_s == -(-total_f // _SYSTEMATIC_K)
    for r in rows:
        # price-ordered systematic sampling tracks each stratum mean
        assert 0.5 < r.mean_ratio < 2.0


def test_small_cell_suppression_reference(spark, sf_dir):
    """Primary + one-pass complementary suppression agrees with an
    independent pandas replay of the rule, and a row with exactly
    one primary-suppressed cell always hides a second cell."""
    import math

    import pandas as pd

    from etl_gov_spark.operators.privacy import (
        _SUPPRESS_K,
        q_small_cell_suppression,
    )

    rows = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in q_small_cell_suppression(spark, sf_dir).collect()
    }
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cust["band"] = (cust["c_acctbal"] / 1000).apply(math.floor)
    cells = (
        cust.groupby(["c_nationkey", "c_mktsegment", "band"])
        .size()
        .reset_index(name="n")
    )
    for (nk, seg), grp in cells.groupby(["c_nationkey", "c_mktsegment"]):
        primary = grp[grp["n"] < _SUPPRESS_K]
        survivors = grp[grp["n"] >= _SUPPRESS_K].sort_values(["n", "band"])
        n_comp = 1 if len(primary) == 1 and len(survivors) else 0
        pub = survivors["n"].sum() - (
            survivors.iloc[0]["n"] if n_comp else 0
        )
        r = rows[(nk, seg)]
        assert r.n_cells == len(grp)
        assert r.n_primary == len(primary)
        assert r.n_complementary == n_comp
        assert r.published_total == pub
        # the disclosure rule itself: one hidden cell is never
        # published alone next to its row margin (a row whose ONLY
        # cell is suppressed has nothing to hide complementarily)
        if r.n_primary == 1 and r.n_cells > 1:
            assert r.n_complementary == 1


def test_dp_private_mean_mechanism(spark, sf_dir):
    """The published mean is the clamped true mean plus bounded-
    scale noise: sum noise has scale 10 000, so the mean shifts by
    at most a few times b/n; the release is deterministic."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.privacy import (
        _DP_CLAMP_HI,
        _DP_CLAMP_LO,
        q_dp_private_mean,
    )

    rows = {r.c_mktsegment: r for r in q_dp_private_mean(spark, sf_dir).collect()}
    cust = read_table(spark, sf_dir, "customer")
    true = {
        r["c_mktsegment"]: (r["s"], r["n"])
        for r in cust.groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.least(
                    F.greatest(F.col("c_acctbal"), F.lit(_DP_CLAMP_LO)),
                    F.lit(_DP_CLAMP_HI),
                )
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(true)
    for seg, r in rows.items():
        s, n = true[seg]
        # Laplace(b) with u from md5 is deterministic; |noise| is
        # b·ln(1/(2·min(u,1-u))) — loose envelope 40·b covers any u
        # the 48-bit draw can produce
        assert abs(r.noisy_sum - s) <= 40 * 2 * (_DP_CLAMP_HI - _DP_CLAMP_LO)
        assert abs(r.noisy_n - n) <= 40 * 2
        # noisy_sum/noisy_n in the row are themselves rounded for
        # publication; the mean was computed pre-rounding, and the
        # 4-dp rounding of n shifts the quotient by ~mean/n · 5e-5
        tol = abs(r.dp_mean) / max(r.noisy_n, 1.0) * 1e-4 + 1e-3
        assert abs(r.dp_mean - r.noisy_sum / max(r.noisy_n, 1.0)) < tol
    again = {r.c_mktsegment: r for r in q_dp_private_mean(spark, sf_dir).collect()}
    assert {k: v.dp_mean for k, v in again.items()} == {
        k: v.dp_mean for k, v in rows.items()
    }


def test_dp_quantile_mechanism(spark, sf_dir):
    """q_dp_quantile: every released value must be one of the 32
    public candidate edges, the true rank error of the release must
    be small at eps=1 on thousands of rows (the mechanism
    concentrates near the median: assert <= 0.25, far looser than
    observed), and the release must be deterministic (portable
    md5 Gumbel draws — identical across runs)."""
    from etl_gov_spark.operators.privacy import (
        DPQ_BINS,
        DPQ_LO,
        _DPQ_STEP,
        q_dp_quantile,
    )

    rows1 = {r.c_mktsegment: r for r in q_dp_quantile(spark, sf_dir).collect()}
    rows2 = {r.c_mktsegment: r for r in q_dp_quantile(spark, sf_dir).collect()}
    assert rows1.keys() == rows2.keys() and len(rows1) >= 2
    edges = {round(DPQ_LO + i * _DPQ_STEP, 4) for i in range(DPQ_BINS)}
    for seg, r in rows1.items():
        assert r.dp_median in edges, (seg, r.dp_median)
        assert 0.0 <= r.true_rank_err <= 0.25
        assert (r.dp_median, r.true_rank_err) == (
            rows2[seg].dp_median,
            rows2[seg].true_rank_err,
        )

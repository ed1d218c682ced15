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

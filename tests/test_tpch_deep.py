"""Deep relational pack invariants (sf0.001; oracle equality is the
driver's gate — these check semantics and determinism)."""

from __future__ import annotations

from etl_gov_spark.operators import tpch_deep as T


def test_q2_one_supplier_per_part(spark, sf_dir):
    rows = T.q2_min_cost_supplier(spark, sf_dir).collect()
    parts = [r.p_partkey for r in rows]
    assert len(parts) == len(set(parts))
    assert all(r.p_size < 10 for r in rows)
    assert all(r.unit_price > 0 for r in rows)


def test_q4_priorities_bounded(spark, sf_dir):
    rows = T.q4_order_priority(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    assert all(r.order_count > 0 for r in rows)


def test_q7_nation_pairs_only(spark, sf_dir):
    rows = T.q7_volume_shipping(spark, sf_dir).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")}


def test_q8_share_in_unit_interval(spark, sf_dir):
    rows = T.q8_market_share(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q11_threshold_holds(spark, sf_dir):
    rows = T.q11_important_inventory(spark, sf_dir).collect()
    total = sum(r.supply_value for r in rows)
    assert all(r.supply_value > 0 for r in rows)
    # each surviving part exceeds 0.1% of a total at least as large
    # as the survivors' own sum
    assert all(r.supply_value > total * 0.001 / len(rows) for r in rows) if rows else True


def test_q13_accounts_for_all_customers(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table

    rows = T.q13_customer_distribution(spark, sf_dir).collect()
    assert sum(r.custdist for r in rows) == read_table(spark, sf_dir, "customer").count()


def test_q15_max_selected(spark, sf_dir):
    rows = T.q15_top_supplier(spark, sf_dir).collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1


def test_q17_single_row(spark, sf_dir):
    rows = T.q17_small_qty_revenue(spark, sf_dir).collect()
    assert len(rows) == 1


def test_q21_multi_supplier_orders_only(spark, sf_dir):
    rows = T.q21_waiting_supplier(spark, sf_dir).collect()
    assert all(r.numwait >= 1 for r in rows)
    names = [r.s_name for r in rows]
    assert len(names) == len(set(names))

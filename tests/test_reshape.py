"""Reshape-pack invariants: unpivot completeness and gap-run
reconstruction correctness (oracle equality is the driver's gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gov_spark.io.sources import read_table
from etl_gov_spark.operators import reshape as RS


def test_unpivot_covers_every_metric_per_group(spark, sf_dir):
    rows = RS.q_unpivot_metrics(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.o_orderpriority, set()).add(r.metric)
    assert per
    for metrics in per.values():
        assert metrics == {"n_orders", "total_value", "avg_value", "max_value"}


def test_gaps_reconstruct_missing_keys_exactly(spark, sf_dir):
    gaps = RS.q_sequence_gaps(spark, sf_dir).collect()
    present = {
        r.k
        for r in read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .collect()
    }
    lo, hi = min(present), max(present)
    expected_missing = {k for k in range(lo, hi + 1) if k not in present}
    from_gaps = set()
    for g in gaps:
        assert g.gap_len == g.gap_end - g.gap_start + 1 >= 1
        run = set(range(g.gap_start, g.gap_end + 1))
        assert not (run & from_gaps), "gap runs must be disjoint"
        assert not (run & present), "gap runs contain no present keys"
        from_gaps |= run
    assert from_gaps == expected_missing

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

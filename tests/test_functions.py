"""Public functions facade: every builder composes into a user
pipeline and agrees with the operator-internal uses."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gov_spark import functions as EF
from etl_gov_spark.io.sources import Catalog


def test_tokens_and_shingles_compose(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    out = (
        docs.select("doc_id", EF.tokens("text").alias("toks"))
        .select("doc_id", EF.shingles(3).alias("sh"))
        .select("doc_id", F.size("sh").alias("n"))
        .collect()
    )
    assert all(r.n >= 1 for r in out)


def test_cosine_matches_manual(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]), ([1.0, 2.0, 2.0], [1.0, 2.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(F.round(EF.cosine("a", "b"), 6).alias("c")).collect()
    assert rows[0].c == 0.0 and rows[1].c == 1.0


def test_minhash_band_keys_rejects_uneven_split(spark):
    import pytest

    df = spark.createDataFrame([(1, "a", "b", "c")], "id long, h0 string, h1 string, h2 string")
    # 3 signature columns into 2 bands would silently drop h2
    with pytest.raises(ValueError, match="multiple of"):
        EF.minhash_band_keys(["h0", "h1", "h2"], 2)
    keys = df.select(
        F.explode(EF.minhash_band_keys(["h0", "h1", "h2"], 3)).alias("k")
    ).collect()
    assert [r.k for r in keys] == ["0:a", "1:b", "2:c"]


def test_uniform_draw_deterministic_and_spread(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders.select("o_orderkey")
    a = orders.select(EF.uniform_draw("o_orderkey").alias("u")).collect()
    b = orders.select(EF.uniform_draw("o_orderkey").alias("u")).collect()
    assert [r.u for r in a] == [r.u for r in b]
    us = [r.u for r in a]
    assert all(0 < u <= 1 for u in us)
    # crude uniformity: each decile holds 5-15% of draws
    for d in range(10):
        frac = sum(1 for u in us if d / 10 < u <= (d + 1) / 10) / len(us)
        assert 0.05 < frac < 0.15, (d, frac)
    # salt changes the stream
    c = orders.select(EF.uniform_draw("o_orderkey", salt="v2").alias("u")).collect()
    assert [r.u for r in c] != us


def test_zscore_null_on_zero_std(spark):
    df = spark.createDataFrame([(5.0, 5.0, 0.0), (7.0, 5.0, 2.0)], "v double, m double, s double")
    rows = df.select(EF.zscore("v", "m", "s").alias("z")).collect()
    assert rows[0].z is None and rows[1].z == 1.0


def test_ranged_global_rank_matches_naive_global_window(spark, sf_dir):
    """ranged_global_rank must reproduce the exact global rank, SQL
    ntile buckets, and long running sums of a naive single-partition
    Window.orderBy — while never planning one."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.ranks import ranged_global_rank

    orders = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice"
    ).withColumn("_cents", F.round(F.col("o_totalprice") * 100).cast("long"))
    order = [F.asc("o_totalprice"), F.asc("o_orderkey")]
    w = Window.orderBy(*order)
    naive = orders.select(
        "o_orderkey",
        F.row_number().over(w).alias("rk"),
        F.ntile(7).over(w).alias("b"),
        F.sum("_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run"),
    )
    got = ranged_global_rank(
        orders, order, rank_col="rk", ntiles={"b": 7},
        running_longs={"run": "_cents"},
    ).select("o_orderkey", "rk", "b", "run")
    want = {r.o_orderkey: (r.rk, r.b, r.run) for r in naive.collect()}
    have = {r.o_orderkey: (r.rk, r.b, r.run) for r in got.collect()}
    assert have == want

    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_ranged_global_rank_empty_and_fewer_rows_than_buckets(spark):
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.ranks import ranged_global_rank

    df = spark.createDataFrame([(3, 30), (1, 10), (2, 20)], "k int, v long")
    out = ranged_global_rank(
        df, [F.asc("k")], rank_col="rk", ntiles={"b": 10},
        running_longs={"run": "v"},
    ).orderBy("k").collect()
    # fewer rows than buckets: bucket == rank, running sum sequential
    assert [(r.rk, r.b, r.run) for r in out] == [(1, 1, 10), (2, 2, 30), (3, 3, 60)]

    empty = df.filter("k < 0")
    got = ranged_global_rank(
        empty, [F.asc("k")], rank_col="rk", ntiles={"b": 4},
        running_longs={"run": "v"},
    )
    assert got.count() == 0
    assert {"rk", "b", "run"} <= set(got.columns)


def test_ranged_lag_matches_naive_global_window(spark, sf_dir):
    """ranged_lag must reproduce lag(src) OVER (ORDER BY ...) exactly
    — boundary rows handed across slices, NULL only on the global
    first row — while never planning a SinglePartition window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.ranks import ranged_lag

    ev = Catalog(spark, sf_dir).events.select(
        F.unix_micros("ts").alias("us"), "event_id", "event_type"
    )
    order = [F.asc("us"), F.asc("event_id")]
    w = Window.orderBy(*order)
    naive = ev.select(
        "event_id",
        F.lag("us").over(w).alias("p_us"),
        F.lag("event_type").over(w).alias("p_ty"),
    )
    got = ranged_lag(
        ev, order, {"p_us": "us", "p_ty": "event_type"}, partitions=7
    ).select("event_id", "p_us", "p_ty")
    want = {r.event_id: (r.p_us, r.p_ty) for r in naive.collect()}
    have = {r.event_id: (r.p_us, r.p_ty) for r in got.collect()}
    assert have == want
    assert sum(v[0] is None for v in have.values()) == 1

    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_ranged_lag_empty_input(spark):
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.ranks import ranged_lag

    df = spark.createDataFrame([], "k int, v long")
    out = ranged_lag(df, [F.asc("k")], {"pv": "v"})
    assert out.count() == 0
    assert "pv" in out.columns


def test_ranged_running_max_matches_naive_global_window(spark):
    """running_max_longs must reproduce max(x) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING) exactly, including across range-slice
    boundaries (prefix-max ledger) and on a leading NULL-free
    monotone tail."""
    import random

    from pyspark.sql import functions as F

    from etl_gov_spark.operators.ranks import ranged_global_rank

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long").repartition(8)
    got = {
        r.id: r.hwm
        for r in ranged_global_rank(
            df,
            [F.asc("id")],
            rank_col=None,
            running_max_longs={"hwm": "x"},
            partitions=6,
        ).collect()
    }
    expect, cur = {}, -(2**63)
    for i, x in rows:
        cur = max(cur, x)
        expect[i] = cur
    assert got == expect


def test_watermark_lateness_census_invariants(spark, sf_dir):
    """Drop counts must be monotone non-increasing in the horizon;
    the 1800 s horizon (== the injected max delay) drops nothing —
    lateness is bounded by the max delay by construction; shares are
    consistent with counts."""
    from etl_gov_spark.operators.timeseries import (
        _LATE_HORIZONS_S,
        q_watermark_lateness_census,
    )

    rows = q_watermark_lateness_census(spark, sf_dir).collect()
    assert [r.horizon_s for r in rows] == list(_LATE_HORIZONS_S)
    drops = [r.n_dropped for r in rows]
    assert drops == sorted(drops, reverse=True)
    assert rows[0].n_dropped > 0  # horizon 0 drops every late event
    assert rows[-1].n_dropped == 0  # horizon == max injected delay
    for r in rows:
        assert r.max_late_s < 1800
        assert abs(r.drop_share - round(r.n_dropped / r.n_events, 4)) <= 1e-9

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

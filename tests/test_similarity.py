"""ANN semantics: LSH recall vs brute force on clustered vectors —
the property LSH is *for*, invisible on the near-random test corpus."""

from __future__ import annotations

import math
import random

import pytest

from etl_gov_spark.operators import similarity as S


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """200 vectors in 4 tight clusters (centroid + small noise),
    query ids on the stride so ann_* picks them up."""
    tmp = str(tmp_path_factory.mktemp("clustered"))
    rng = random.Random(7)
    dim = S.DIM
    centroids = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
    rows = []
    for vid in range(200):
        c = centroids[vid % 4]
        vec = [x + rng.gauss(0, 0.05) for x in c]
        rows.append((vid, vec, vid % 4))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    return tmp


def test_bruteforce_topk_shape_and_order(spark, clustered_dir):
    rows = S.ann_bruteforce_topk(spark, clustered_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == S.TOP_K
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        # nearest neighbours of a clustered query share its cluster
        top3 = [r.cand_id for r in sorted(rs, key=lambda r: r.rank)[:3]]
        assert all(c % 4 == q % 4 for c in top3)


def test_lsh_recall_on_clustered_data(spark, clustered_dir):
    bf = S.ann_bruteforce_topk(spark, clustered_dir).collect()
    lsh = S.ann_lsh_topk(spark, clustered_dir).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r.q_id, set()).add(r.cand_id)
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r.q_id, set()).add(r.cand_id)
    recalls = [
        len(bf_sets[q] & lsh_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8  # same-cluster vectors share sign buckets


def test_dot_product_matches_math(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    got = df.select(S._dot("a", "b").alias("d"), S._norm("a").alias("n")).collect()[0]
    assert got.d == 32.0
    assert math.isclose(got.n, math.sqrt(14.0))


def test_nprobe_sweep_monotone(spark, sf_dir):
    """The sweep's two axes must both be monotone in nprobe: more
    probed cells ⇒ at least as many candidates and at least as much
    recall (funnel top-k over a superset of candidates can only gain
    ground-truth hits at the tail... recall is measured against the
    fixed exact top-10, and candidate sets are nested, so measured
    recall is non-decreasing)."""
    from etl_gov_spark.operators.vectors import SWEEP_NPROBES, ann_ivf_nprobe_sweep

    rows = {r.nprobe: r for r in ann_ivf_nprobe_sweep(spark, sf_dir).collect()}
    assert set(rows) == set(SWEEP_NPROBES)
    prev = None
    for np_ in sorted(rows):
        r = rows[np_]
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.n_queries > 0
        if prev is not None:
            assert r.avg_candidates >= prev.avg_candidates - 1e-9
            assert r.recall_at_10 >= prev.recall_at_10 - 1e-9
        prev = r


def test_intrinsic_dim_recovers_planted_manifold(spark, tmp_path):
    """emb_intrinsic_dim: vectors on a 2-D quasi-random manifold
    (golden-ratio lattice) embedded in 64-d must estimate LID ~ 2 —
    nowhere near the ambient dimension. vec_ids are multiples of the
    anchor stride so every point is an anchor."""
    from etl_gov_spark.operators.similarity import (
        QUERY_STRIDE,
        emb_intrinsic_dim,
    )

    phi1, phi2 = 0.7548776662466927, 0.5698402909980532  # R2 sequence
    rows = []
    for i in range(900):
        x = (0.5 + i * phi1) % 1.0
        y = (0.5 + i * phi2) % 1.0
        v = [float(x), float(y)] + [0.0] * 62
        rows.append((i * QUERY_STRIDE, v, i % 4))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    r = emb_intrinsic_dim(spark, str(tmp_path)).collect()[0]
    assert r.n_anchors == 900
    assert r.k == 10
    assert r.n_degenerate == 0
    assert 1.5 <= r.lid_mean <= 2.6, r.lid_mean
    assert 1.5 <= r.lid_mackay <= 2.6, r.lid_mackay
    assert r.lid_min > 0 and r.lid_max >= r.lid_mean


def test_knn_graph_ring_is_perfectly_mutual(spark, tmp_path):
    """ann_knn_graph_stats: points evenly spaced on a circle give a
    kNN graph where every neighbor relation is mutual (reciprocity
    1.0), every k-occurrence equals k (skewness NULL — zero
    variance), and there are no antihubs."""
    import math

    from etl_gov_spark.operators.similarity import (
        QUERY_STRIDE,
        TOP_K,
        ann_knn_graph_stats,
    )

    n = 60
    rows = []
    for i in range(n):
        th = 2.0 * math.pi * i / n
        v = [math.cos(th), math.sin(th)] + [0.0] * 62
        rows.append((i * QUERY_STRIDE, v, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    r = ann_knn_graph_stats(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == n
    assert r.n_edges == n * TOP_K
    assert r.reciprocity == 1.0
    assert r.kocc_max == TOP_K
    assert r.n_antihubs == 0
    assert r.kocc_skewness is None


def test_jl_projection_preserves_distances_in_expectation(spark, tmp_path):
    """emb_jl_projection_audit: on a deterministic 64-d cloud the
    measured distortion must behave like the JL lemma says — mean
    ratio near 1, every ratio positive, and the sign matrix exactly
    reproducible from the documented md5-parity rule."""
    import hashlib

    from etl_gov_spark.operators.similarity import (
        QUERY_STRIDE,
        _jl_sign,
        emb_jl_projection_audit,
    )

    # the documented derivation IS the implementation
    h = hashlib.md5(b"3|7").hexdigest()
    assert _jl_sign(3, 7) == (1 if int(h[0], 16) % 2 == 0 else -1)

    rows = []
    for i in range(200):
        v = [
            (int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:4], 16) % 1000)
            / 500.0
            - 1.0
            for d in range(64)
        ]
        rows.append((i * QUERY_STRIDE, v, 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    r = emb_jl_projection_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 200 * 199 // 2
    assert (r.dim_in, r.dim_out) == (64, 16)
    assert 0.9 <= r.mean_ratio <= 1.1, r.mean_ratio
    assert r.min_ratio > 0
    assert r.max_ratio < 3.0
    assert r.outside_band_share < 0.25

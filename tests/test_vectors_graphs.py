"""Vector-ops + graph-clustering invariants (sf0.001)."""

from __future__ import annotations

import pytest

from etl_gov_spark.io.sources import Catalog
from etl_gov_spark.operators import graphs as G
from etl_gov_spark.operators import similarity as S
from etl_gov_spark.operators import vectors as V


def test_norm_stats_ordering(spark, sf_dir):
    rows = V.emb_norm_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_norm <= r.avg_norm <= r.max_norm
        assert r.n_vecs > 0


def test_centroid_norm_bounded_by_max_norm(spark, sf_dir):
    stats = {r.label: r for r in V.emb_norm_stats(spark, sf_dir).collect()}
    for r in V.emb_label_centroids(spark, sf_dir).collect():
        # Jensen: ||mean of vectors|| <= mean of ||vectors|| <= max
        assert r.centroid_norm <= stats[r.label].max_norm + 1e-6
        assert r.n_vecs == stats[r.label].n_vecs


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r.q_id, r.cand_id) for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf = {(r.q_id, r.cand_id) for r in V.ann_ivf_topk(spark, sf_dir).collect()}
    assert ivf  # produced results for every query
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_connected_components_fixpoint(spark, sf_dir):
    rows = G.dedup_clusters(spark, sf_dir).collect()
    # verify against a driver-side union-find on the same edges
    edges = [
        (r.doc_a, r.doc_b)
        for r in G._near_dup_edges(
            __import__(
                "etl_gov_spark.io.sources", fromlist=["Catalog"]
            ).Catalog(spark, sf_dir).documents
        ).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}
    got = {r.doc_id: r.component for r in rows}
    assert got == expected


def test_cluster_sizes_consistent(spark, sf_dir):
    rows = G.dedup_clusters(spark, sf_dir).collect()
    from collections import Counter

    sizes = Counter(r.component for r in rows)
    for r in rows:
        assert r.cluster_size == sizes[r.component] >= 2 or sizes[r.component] == 1


def test_triangle_count_on_known_clique(spark, tmp_path_factory):
    """Three mutually near-dup docs form one triangle (clustering
    coeff 1.0); a separate near-dup pair forms none."""
    tmp = str(tmp_path_factory.mktemp("tri"))
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    rows = [
        (0, base + " a", "en", "s", 10),
        (1, base + " b", "en", "s", 10),
        (2, base + " c", "en", "s", 10),
        (3, other + " x", "en", "s", 10),
        (4, other + " y", "en", "s", 10),
        (5, " ".join(f"q{i}" for i in range(30)), "en", "s", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in G.graph_triangle_count(spark, tmp).collect()}
    for d in (0, 1, 2):
        assert got[d].n_triangles == 1
        assert got[d].degree == 2
        assert got[d].clustering_coeff == 1.0
    for d in (3, 4):
        assert got[d].n_triangles == 0
        assert got[d].degree == 1
    assert 5 not in got  # isolated docs don't appear in the graph


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r.q_id, r.cand_id) for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    pq_rows = V.ann_pq_topk(spark, sf_dir).collect()
    pq = {(r.q_id, r.cand_id) for r in pq_rows}
    assert pq
    # every query answered with a full (or data-bounded) top-k
    per_q: dict[int, int] = {}
    for r in pq_rows:
        per_q[r.q_id] = max(per_q.get(r.q_id, 0), r.rank)
    exact_q = {q for q, _ in exact}
    assert set(per_q) == exact_q
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.5, f"PQ recall {recall:.2f} too low"


def test_pca_quality_on_flat_spectrum(spark, sf_dir):
    """The sf embeddings have a near-flat spectrum (l2/l1 ~ 0.93),
    where 8 power iterations cannot pin the exact eigenvector — so
    assert solution QUALITY: the Rayleigh quotient must reach >=85%
    of the true top eigenvalue, and the reported variance share must
    track the truth."""
    import numpy as np

    rows = V.emb_pca_top_component(spark, sf_dir).collect()
    vec = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-2  # unit loading
    share = rows[0].explained_var_share
    assert 0.0 < share <= 1.0

    X = np.stack(
        [
            r.v
            for r in Catalog(spark, sf_dir)
            .embeddings.selectExpr("CAST(embedding AS array<double>) AS v")
            .collect()
        ]
    )
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    w = np.linalg.eigvalsh(cov)
    rq = float(vec @ cov @ vec) / float(vec @ vec)
    assert rq >= 0.85 * w[-1], f"Rayleigh quotient {rq:.4f} vs l1 {w[-1]:.4f}"
    assert abs(share - w[-1] / w.sum()) < 0.05


def test_pca_recovers_planted_direction(spark, tmp_path_factory):
    """With a planted dominant component the power iteration must
    align with it almost exactly."""
    import numpy as np

    rng = np.random.default_rng(7)
    direction = rng.normal(size=64)
    direction /= np.linalg.norm(direction)
    scores = rng.normal(scale=5.0, size=500)  # dominant axis
    noise = rng.normal(scale=0.3, size=(500, 64))
    X = np.outer(scores, direction) + noise
    tmp = str(tmp_path_factory.mktemp("pca"))
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], 0) for i in range(500)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    rows = V.emb_pca_top_component(spark, tmp).collect()
    vec = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    cos = abs(float(vec @ direction))
    assert cos > 0.99, f"planted direction missed: cos={cos:.3f}"
    assert rows[0].explained_var_share > 0.5


def test_outlier_scores_flag_planted_corruption(spark, tmp_path_factory):
    """A corrupted vector (one dimension blown up) must rank #1."""
    import numpy as np

    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 64))
    X[7, 3] = 60.0  # corrupt one component
    tmp = str(tmp_path_factory.mktemp("emb_out"))
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], int(i % 3)) for i in range(300)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    rows = V.emb_outlier_scores(spark, tmp).collect()
    top = min(rows, key=lambda r: r.rank)
    assert top.vec_id == 7


def test_pagerank_matches_dense_reference(spark, sf_dir):
    import numpy as np

    from etl_gov_spark.io.sources import Catalog as Cat

    edges = [
        (r.doc_a, r.doc_b)
        for r in G._near_dup_edges(Cat(spark, sf_dir).documents).collect()
    ]
    got = {r.doc_id: r.pagerank_x1000 / 1000 for r in G.graph_pagerank(spark, sf_dir).collect()}
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in edges:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    P = A / A.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(G.PAGERANK_ITERS):
        r = (1 - G.PAGERANK_DAMPING) / n + G.PAGERANK_DAMPING * (P.T @ r)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-3, node
    assert abs(sum(got.values()) - 1.0) < 1e-2  # mass conserved


def test_quantize_int8_error_bounds_and_constant_dim(spark, tmp_path_factory):
    """Affine int8 error is bounded by scale/2 per element; a
    constant dimension (scale 0) contributes zero error; ranking is
    deterministic."""
    import numpy as np

    rng = np.random.default_rng(3)
    X = rng.normal(size=(300, 64))
    X[:, 7] = 2.5  # constant dim → scale 0
    tmp = str(tmp_path_factory.mktemp("quant"))
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], 0) for i in range(300)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    rows = V.emb_quantize_int8(spark, tmp).collect()
    assert len(rows) == 20
    assert [r.rank for r in rows] == list(range(1, 21))
    # X is float32 on disk: ranges per dim ~N(0,1) spread → scale ~ range/255
    Xf = X.astype(np.float32).astype(np.float64)
    scale = (Xf.max(axis=0) - Xf.min(axis=0)) / 255.0
    half = float(scale.max()) / 2
    assert all(r.max_abs_err <= half + 1e-9 for r in rows)
    assert all(r.mse >= 0 for r in rows)
    # mse ordering is non-increasing by construction
    mses = [r.mse for r in rows]
    assert mses == sorted(mses, reverse=True)


def test_centroid_drift_detects_planted_shift(spark, tmp_path_factory):
    """Second-half vectors shifted by +0.5 in every dim → centroid
    drift ≈ 0.5·√64 = 4.0 for the planted label; unshifted label
    stays near zero."""
    import numpy as np

    rng = np.random.default_rng(5)
    tmp = str(tmp_path_factory.mktemp("drift"))
    rows = []
    for i in range(400):
        v = rng.normal(size=64)
        label = i % 2
        if label == 1 and i > 200:  # planted drift in label 1's second half
            v = v + 0.5
        rows.append((i, [float(x) for x in v], label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    got = {r.label: r for r in V.emb_centroid_drift(spark, tmp).collect()}
    # sampling noise gives the unshifted label ~√(2·64/n) ≈ 0.9 drift;
    # the planted shift must stand clearly above that floor
    assert got[1].centroid_l2_drift > 3 * got[0].centroid_l2_drift
    assert got[1].centroid_l2_drift == pytest.approx(4.0, rel=0.25)


def test_hierarchy_rollup_depth_matches_log10(spark, sf_dir):
    """Pointer doubling must flatten the floor(c/10) tree to exact
    depths: max depth == digits(max custkey) - 1, every customer
    accounted for exactly once."""
    import math

    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.graphs import q_hierarchy_rollup

    rows = q_hierarchy_rollup(spark, sf_dir).collect()
    cust = Catalog(spark, sf_dir).customer
    mx, n = cust.agg(F.max("c_custkey"), F.count(F.lit(1))).collect()[0]
    assert max(r.depth for r in rows) == int(math.log10(mx))
    assert sum(r.n_customers for r in rows) == n


def test_dim_variance_prune_ranks_and_bounds(spark, sf_dir):
    from etl_gov_spark.operators.vectors import (
        _PRUNE_TOP_DIMS,
        emb_dim_variance_prune,
    )

    rows = sorted(
        emb_dim_variance_prune(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert len(rows) == _PRUNE_TOP_DIMS
    prev = None
    for r in rows:
        assert r.variance >= 0
        if prev is not None:
            assert r.variance <= prev + 1e-6  # non-increasing by rank
        prev = r.variance


def test_kcore_peel_monotone_shrinking(spark, sf_dir):
    from etl_gov_spark.operators.graphs import graph_kcore_peel

    rows = sorted(graph_kcore_peel(spark, sf_dir).collect(), key=lambda r: r.round)
    assert len(rows) == 3
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    # a 2-core retains only nodes with degree >= 2: edges >= nodes is not
    # guaranteed mid-peel, but the census must stay non-negative
    assert rows[-1].n_nodes >= 0 and rows[-1].n_edges >= 0


def test_hard_negatives_margin_and_labels(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_hard_negatives

    rows = emb_hard_negatives(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.a_id % 10 == 0
        assert r.hard_neg_id != r.a_id
        assert -1.0 <= r.neg_cos <= 1.0


def test_davies_bouldin_covers_labels_and_positive(spark, sf_dir):
    from etl_gov_spark.io.sources import read_table
    from etl_gov_spark.operators.vectors import emb_davies_bouldin

    rows = emb_davies_bouldin(spark, sf_dir).collect()
    n_labels = (
        read_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    assert len(rows) == n_labels
    for r in rows:
        assert r.scatter > 0
        assert r.worst_ratio > 0
        assert r.most_confusable != r.label


def test_recall_at_k_in_unit_interval(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_recall_at_k

    rows = emb_recall_at_k(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.n_anchors > 0


def test_mrr_bounds_and_consistency(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_mrr_eval

    rows = emb_mrr_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.mrr <= 1.0
        assert r.mean_first_rank >= 1.0
        # Jensen: avg(1/rank) >= 1/avg(rank)
        assert r.mrr >= 1.0 / r.mean_first_rank - 1e-4


def test_degree_powerlaw_fit_bounds(spark, sf_dir):
    from etl_gov_spark.operators.graphs import graph_degree_powerlaw

    r = graph_degree_powerlaw(spark, sf_dir).collect()[0]
    assert r.n_degree_levels >= 1
    assert r.max_degree >= 1
    assert r.n_nodes_total > 0
    assert r.r2 is None or 0.0 <= r.r2 <= 1.0


def test_modularity_bounds(spark, sf_dir):
    from etl_gov_spark.operators.graphs import graph_modularity

    r = graph_modularity(spark, sf_dir).collect()[0]
    assert -0.5 <= r.modularity <= 1.0  # Newman Q range
    assert r.n_communities >= 1
    assert r.n_edges > 0


def test_alignment_uniformity_ranges(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_alignment_uniformity

    rows = emb_alignment_uniformity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.alignment <= 4.0  # unit sphere: d2 in [0, 4]
        assert -8.0 <= r.uniformity <= 0.0  # log-mean-exp of exp(-2 d2)


def test_link_prediction_candidates_are_nonedges(spark, sf_dir):
    """Every predicted pair must have common neighbors but NO
    existing co-purchase edge, scores in (0, 1], ranks dense."""
    from etl_gov_spark.queries.catalog import all_queries

    qs = all_queries()
    rows = qs["graph_jaccard_link_prediction"](spark, sf_dir).collect()
    assert rows, "no candidates predicted"
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.part_a < r.part_b and r.n_common >= 1
        assert 0.0 < r.jaccard <= 1.0


def test_isotropy_identity_against_bruteforce(spark, sf_dir):
    """The ‖Σu‖² shortcut must equal the literal O(n²) average
    pairwise cosine (checked on the sf0.001 slice), and centering
    must not increase it."""
    import numpy as np

    from etl_gov_spark.operators.vectors import emb_isotropy

    r = emb_isotropy(spark, sf_dir).collect()[0]
    emb = np.array(
        [
            row.embedding
            for row in Catalog(spark, sf_dir).embeddings.select("embedding").collect()
        ],
        dtype=np.float64,
    )
    u = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    n = len(u)
    gram = u @ u.T
    brute = (gram.sum() - np.trace(gram)) / (n * (n - 1))
    assert abs(r.avg_pairwise_cos - brute) < 1e-3
    assert r.n == n and r.dim == emb.shape[1]
    assert r.centered_avg_cos <= r.avg_pairwise_cos + 1e-6


def test_simplified_silhouette_bounds(spark, sf_dir):
    """s ∈ [−1, 1] and member counts total the table. (No
    separation assertion: the synthetic labels are near-random in
    embedding space — mean silhouette ≈ 0 — which is itself the
    diagnosis the operator exists to deliver.)"""
    from etl_gov_spark.operators.vectors import emb_simplified_silhouette

    rows = emb_simplified_silhouette(spark, sf_dir).collect()
    total = Catalog(spark, sf_dir).embeddings.count()
    assert sum(r.n_members for r in rows) == total
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert 0.0 <= r.frac_negative <= 1.0


def test_assortativity_in_range(spark, sf_dir):
    from etl_gov_spark.operators.graphs import graph_assortativity

    r = graph_assortativity(spark, sf_dir).collect()[0]
    assert r.n_edges > 0 and r.n_nodes > 0
    assert -1.0 <= r.assortativity <= 1.0
    assert r.mean_edge_degree >= 1.0


def test_global_transitivity_in_range(spark, sf_dir):
    from etl_gov_spark.operators.graphs import graph_global_transitivity

    r = graph_global_transitivity(spark, sf_dir).collect()[0]
    assert 0.0 <= r.transitivity <= 1.0
    assert r.n_wedges >= r.n_triangles >= 0


def test_two_hop_reach_dominates_degree(spark, sf_dir):
    """Every node's 2-hop reach is at least its degree, so the
    reach-weighted node count must be >= the edge-endpoint count."""
    from etl_gov_spark.operators.graphs import graph_two_hop_reach

    rows = graph_two_hop_reach(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_reach >= 1 and r.max_reach >= r.min_reach
        assert 2 ** r.log2_bucket <= r.min_reach
        assert r.max_reach < 2 ** (r.log2_bucket + 1)


def test_centroid_cosine_histogram_partition(spark, sf_dir):
    """Histogram buckets partition each label's vectors; bucket
    bounds bracket the observed min/max cosines."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.vectors import emb_centroid_cosine_histogram

    rows = emb_centroid_cosine_histogram(spark, sf_dir).collect()
    assert rows
    per_label: dict[int, int] = {}
    for r in rows:
        per_label[r.label] = per_label.get(r.label, 0) + r.n_vecs
        assert -1.0 - 1e-6 <= r.cos_min <= r.cos_max <= 1.0 + 1e-6
        if r.cos_bucket < 9:
            assert r.cos_max < (r.cos_bucket + 1) / 10 + 1e-6
    total = (
        Catalog(spark, sf_dir).embeddings.agg(F.count(F.lit(1))).collect()[0][0]
    )
    assert sum(per_label.values()) == total


def test_effective_rank_bounds(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_effective_rank

    r = emb_effective_rank(spark, sf_dir).collect()[0]
    assert 1.0 <= r.effective_dims <= r.n_dims
    assert 0.0 < r.dim_utilization <= 1.0
    assert r.total_variance > 0


def test_cluster_size_powerlaw_accounts_all_clustered_docs(spark, sf_dir):
    from etl_gov_spark.operators.graphs import (
        dedup_cluster_size_powerlaw,
        dedup_clusters,
    )

    rows = dedup_cluster_size_powerlaw(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == dedup_clusters(spark, sf_dir).count()
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r.min_size >= max(2, 2 ** r.log2_size)
        assert r.max_size < 2 ** (r.log2_size + 1)


def test_label_confusion_matrix_complete_and_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.vectors import emb_label_confusion_centroids

    rows = emb_label_confusion_centroids(spark, sf_dir).collect()
    n_labels = (
        Catalog(spark, sf_dir).embeddings.select("label").distinct().count()
    )
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert -1.0 - 1e-6 <= r.centroid_cosine <= 1.0 + 1e-6


def test_dim_anova_guarded_and_bounded(spark, sf_dir):
    from etl_gov_spark.operators.vectors import emb_dim_anova_labels

    r = emb_dim_anova_labels(spark, sf_dir).collect()[0]
    assert 0.0 <= r.eta_squared <= 1.0
    assert r.f_stat >= 0.0
    assert r.dim_is_label_informative == (r.f_stat > 2.1)


def test_ivf_funnel_vs_exact_recall_sf01(spark):
    """The retrieval-eval IVF funnel's standing regression test, at
    the first SF where the funnel actually prunes (sf0.1: N=2000 →
    k=31 cells > EVAL_N_PROBE=8 probes; below ~1k vectors k floors
    at 8 and the funnel degenerates to the exact scan):

    - the funnel must score strictly fewer candidate pairs than the
      exact anchors × corpus scan (the whole point of the funnel);
    - funnel top-10 must overlap the exact top-10 well (>= 0.5);
    - the label-recall metric served from the funnel must not be
      worse than the exact path's (funnel candidates are cell-local,
      so same-cluster label mates are never the ones pruned).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.similarity import _dot, _norm, capped_anchors
    from etl_gov_spark.operators.vectors import (
        _HARDNEG_STRIDE,
        TOP_K,
        _ivf_eval_scored,
    )

    sf = "/root/testdata/sf0.1"
    w = Window.partitionBy("a_id").orderBy(F.desc("c"), F.asc("cand_id"))

    scored = _ivf_eval_scored(spark, sf, _HARDNEG_STRIDE)
    n_funnel_pairs = scored.count()
    funnel = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .collect()
    )

    emb = (
        Catalog(spark, sf)
        .embeddings.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("vn", _norm("v"))
    )
    q = capped_anchors(emb, _HARDNEG_STRIDE).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    pairs = F.broadcast(q).crossJoin(emb).filter(F.col("vec_id") != F.col("a_id"))
    cos6 = F.round(_dot("qv", "v") / (F.col("qn") * F.col("vn")), 6)
    exact = (
        pairs.select(
            "a_id",
            "a_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("c_label"),
            cos6.alias("c"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .collect()
    )

    n_anchors = len({r.a_id for r in exact})
    n_corpus = emb.count()
    assert n_funnel_pairs < n_anchors * (n_corpus - 1) * 0.5  # real pruning

    fset = {(r.a_id, r.cand_id) for r in funnel}
    eset = {(r.a_id, r.cand_id) for r in exact}
    assert len(fset & eset) / len(eset) >= 0.5

    def label_recall(rows):
        per = {}
        for r in rows:
            per.setdefault(r.a_id, []).append(r.c_label == r.a_label)
        return sum(sum(v) / len(v) for v in per.values()) / len(per)

    assert label_recall(funnel) >= label_recall(exact) - 1e-9


def test_semdedup_census_vs_driver_replay(spark, sf_dir):
    """dedup_semdedup_prune's per-cell census must equal a
    driver-side numpy replay of the same rule (same Lloyd cells,
    6-dp cosine, lower-id-representative prune) — the operator's
    distributed self-join is the only thing the replay doesn't
    share, so a disagreement localizes there."""
    import numpy as np

    from etl_gov_spark.io.sources import expand_parallelism
    from pyspark.sql import functions as F

    out = {r.cid: r for r in V.dedup_semdedup_prune(spark, sf_dir).collect()}
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    model = V._lloyd_model(emb, k=V._semdedup_k(emb))
    cells: dict = {}
    for r in V._assign(emb, model).collect():
        cells.setdefault(r.cid, []).append((r.vec_id, np.array(r.v)))

    assert set(out) == set(cells)
    total = 0
    for cid, members in cells.items():
        members.sort()
        pruned = set()
        for i, (ida, va) in enumerate(members):
            for idb, vb in members[i + 1 :]:
                cos6 = round(
                    float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb)), 6
                )
                if cos6 >= V.SEMDEDUP_TAU:
                    pruned.add(idb)
        r = out[cid]
        assert r.n_vecs == len(members)
        assert r.n_pruned == len(pruned)
        # the cell's lowest-id vector is always kept
        assert r.n_pruned <= r.n_vecs - 1
        total += r.n_vecs
    assert total == emb.count()


def test_assign_broadcast_path_equals_literal_path(spark, sf_dir):
    """_assign's two physical strategies (literal-model fold vs
    broadcast-join + hash-agg argmin, selected by MODEL_LIT_MAX)
    must be value-identical — same 6-dp d2 quantization, same
    (d2, cid) struct-min tie-break."""
    from pyspark.sql import functions as F

    emb = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    model = V._lloyd_model(emb)
    assert len(model) <= V.MODEL_LIT_MAX  # sf0.001 fits the literal path
    lit = {r.vec_id: r.cid for r in V._assign(emb, model).collect()}
    old = V.MODEL_LIT_MAX
    V.MODEL_LIT_MAX = 0  # force the broadcast-join path
    try:
        bj = {r.vec_id: r.cid for r in V._assign(emb, model).collect()}
    finally:
        V.MODEL_LIT_MAX = old
    assert lit == bj


def test_lloyd_seed_collect_matches_seed_ids_join(spark, sf_dir):
    """_lloyd_model's single-pass seed fetch (TakeOrdered carrying
    the vectors) must pick exactly the vectors the two-pass shape
    (_seed_ids orderBy+limit, then broadcast-join) picks — same
    (md5, vec_id) order, same k prefix, same vector payload."""
    from pyspark.sql import functions as F

    emb = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    vecs = emb.select("vec_id", "v")
    k = min(V.N_CENTROIDS_CAP, max(8, vecs.count() // 64))
    two_pass = {
        r.cid: tuple(r.cv)
        for r in vecs.join(F.broadcast(V._seed_ids(vecs, k)), "vec_id")
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .collect()
    }
    # seeds = the first k entries of the fitted model's trajectory
    # start: re-derive via the production path with zero iterations
    old = V.LLOYD_ITERS
    V.LLOYD_ITERS = 0
    try:
        single_pass = {cid: tuple(cv) for cid, cv in V._lloyd_model(emb)}
    finally:
        V.LLOYD_ITERS = old
    assert single_pass == two_pass


def test_semdedup_keep_representative_is_centroid_argmin(spark, sf_dir):
    """dedup_semdedup_keep: every duplicate group keeps exactly one
    member, purges the rest, and the keeper is the argmin of
    quantized d2-to-own-centroid (tie-break lowest vec_id) —
    recomputed here independently through the same Lloyd model."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.vectors import (
        _assign,
        _d2_to,
        _lloyd_model,
        _semdedup_k,
        dedup_semdedup_keep,
    )
    from etl_gov_spark.io.sources import expand_parallelism

    groups = dedup_semdedup_keep(spark, sf_dir).collect()
    assert groups
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    model = _lloyd_model(emb, k=_semdedup_k(emb))
    mdf = spark.createDataFrame(
        [(int(cid), [float(x) for x in cv]) for cid, cv in model],
        "cid long, cv array<double>",
    )
    d2 = {
        r.vec_id: (r.d2, r.vec_id)
        for r in _assign(emb, model)
        .join(F.broadcast(mdf), "cid")
        .select("vec_id", _d2_to("v", F.col("cv")).alias("d2"))
        .collect()
    }
    for g in groups:
        purged = [int(x) for x in g.purged_ids.split(",")] if g.purged_ids else []
        assert g.group_size >= 2
        assert len(purged) == g.group_size - 1
        assert g.keep_vec_id not in purged
        members = purged + [g.keep_vec_id]
        assert min(d2[m] for m in members) == d2[g.keep_vec_id], g


def test_pq_distortion_shape_and_bounds(spark, sf_dir):
    """emb_pq_distortion: one row per subspace, utilization within
    [1, codebook size], distortion non-negative with mean <= max,
    and (unit vectors, 8-dim subspaces) mean_d2 must sit well below
    the 2.0 that two orthogonal unit sub-vectors would give."""
    from etl_gov_spark.operators.vectors import PQ_M, emb_pq_distortion

    rows = emb_pq_distortion(spark, sf_dir).collect()
    assert [r.m for r in rows] == list(range(PQ_M))
    for r in rows:
        assert 1 <= r.codes_used
        assert 0.0 <= r.mean_d2 <= r.max_d2
        assert r.mean_d2 < 2.0
        assert r.n_vecs == rows[0].n_vecs


def test_semdedup_incremental_equals_frozen_oneshot_and_prunes_files(spark, sf_dir):
    """dedup_semdedup_incremental: the two-epoch census must equal a
    direct one-shot run under the SAME frozen history quantizer
    (pair completeness: old-old in epoch 1, anything touching a new
    vector in the probed cells of epoch 2); and the cid store probe
    must be metadata-only prunable (a single-cell probe key touches
    fewer files than the store holds)."""
    import os

    from pyspark.sql import functions as F

    from etl_gov_spark.io.cow import file_key_ranges, touched_files
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import Catalog, expand_parallelism
    from etl_gov_spark.operators.similarity import _dot, _norm
    from etl_gov_spark.operators.vectors import (
        SEMDEDUP_TAU,
        _assign,
        _lloyd_model,
        _semdedup_k,
        dedup_semdedup_incremental,
    )

    got = {
        r.cid: (r.n_vecs, r.n_pruned)
        for r in dedup_semdedup_incremental(spark, sf_dir).collect()
    }
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    hist = emb.filter(F.col("vec_id") % 3 != 0)
    model = _lloyd_model(hist, k=_semdedup_k(hist))
    cells = _assign(emb, model).localCheckpoint(eager=False)
    cn = cells.withColumn("_nrm", _norm("v"))
    a = cn.select("cid", F.col("vec_id").alias("ida"), F.col("v").alias("va"), F.col("_nrm").alias("na"))
    b = cn.select("cid", F.col("vec_id").alias("idb"), F.col("v").alias("vb"), F.col("_nrm").alias("nb"))
    cos6 = F.round(_dot("va", "vb") / (F.col("na") * F.col("nb")), 6)
    pruned = (
        a.join(b, "cid").filter(F.col("ida") < F.col("idb"))
        .filter(cos6 >= SEMDEDUP_TAU).select("cid", "idb").distinct()
        .groupBy("cid").agg(F.count(F.lit(1)).alias("np"))
    )
    direct = {
        r.cid: (r.n, r.np or 0)
        for r in cells.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
        .join(pruned, "cid", "left")
        .select("cid", "n", "np")
        .collect()
    }
    assert got == direct
    # metadata-only probe: one cid key must touch < all store files
    store = os.path.join(scratch_dir("cellstore-test"), "store")
    write_range_clustered(cells, store, ("cid",), num_files=16)
    ranges = file_key_ranges(store, "cid")
    one_cid = cells.select("cid").orderBy("cid").limit(1)
    touched = touched_files(spark, ranges, one_cid, "cid")
    n_files = len([f for f in os.listdir(store) if f.endswith(".parquet")])
    assert 0 < len(touched) < n_files


def test_matryoshka_recall_monotone_in_dim(spark, sf_dir):
    """emb_matryoshka_recall: recall must be within [0,1], weakly
    non-decreasing as the kept prefix widens (more dims cannot lose
    top-10 information in expectation at this scale — asserted
    with a small slack for rank ties), and every variant scores the
    same query count."""
    from etl_gov_spark.operators.vectors import MRL_RECALL_DIMS, emb_matryoshka_recall

    rows = sorted(
        emb_matryoshka_recall(spark, sf_dir).collect(), key=lambda r: r.dim
    )
    assert [r.dim for r in rows] == list(MRL_RECALL_DIMS)
    assert len({r.n_queries for r in rows}) == 1
    for r in rows:
        assert 0.0 <= r.mean_recall_at10 <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.mean_recall_at10 >= a.mean_recall_at10 - 0.05


def test_ann_ivf_incremental_equals_frozen_oneshot_and_prunes_files(spark, sf_dir):
    """ann_ivf_incremental: the served top-10 must equal a direct
    one-shot IVF serve under the SAME frozen history-trained
    quantizer (append-only postings change nothing the probe path
    can observe); and the probe path must be metadata-prunable (a
    single-cell probe key touches fewer posting files than the
    store holds)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_gov_spark.io.cow import file_key_ranges, touched_files
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import Catalog, expand_parallelism
    from etl_gov_spark.operators.similarity import _dot, _norm
    from etl_gov_spark.operators.vectors import (
        N_PROBE,
        QUERY_STRIDE,
        TOP_K,
        _assign,
        _cent_lit,
        _d2_to,
        _lloyd_model,
        ann_ivf_incremental,
    )

    got = {
        (r.q_id, r.rank): (r.cand_id, r.cosine)
        for r in ann_ivf_incremental(spark, sf_dir).collect()
    }

    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    hist = emb.filter(F.col("vec_id") % 3 != 0)
    model = _lloyd_model(hist)  # the same frozen quantizer
    cells = _assign(emb, model).localCheckpoint(eager=False)
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    probes = q.select(
        "q_id",
        "qv",
        F.explode(
            F.slice(
                F.array_sort(
                    F.transform(
                        _cent_lit(model),
                        lambda c: F.struct(
                            _d2_to("qv", c["cv"]).alias("d2"), c["cid"].alias("cid")
                        ),
                    )
                ),
                1,
                N_PROBE,
            )
        ).alias("_p"),
    ).select("q_id", "qv", F.col("_p.cid").alias("cid"))
    cand = (
        F.broadcast(probes.withColumn("_qnrm", _norm("qv")))
        .join(cells.withColumn("_nrm", _norm("v")), "cid")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    cos6 = F.round(_dot("qv", "v") / (F.col("_qnrm") * F.col("_nrm")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("cand_id"))
    direct = {
        (r.q_id, r.rank): (r.cand_id, r.cosine)
        for r in cand.select(
            "q_id", F.col("vec_id").alias("cand_id"), cos6.alias("_cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        # Same integer-path 4-dp rounding as the shipped readout:
        # F.round(_, 4) disagrees with round(x*1e4)/1e4 on half-tie
        # cosines (...x5 at 6 dp), which would fail this parity
        # spuriously AND stop covering the shipped path (ADVICE r12).
        .select(
            "q_id",
            "cand_id",
            (F.round(F.col("_cos") * 10000.0) / 10000.0).alias("cosine"),
            "rank",
        )
        .collect()
    }
    assert got == direct

    # metadata-only probe: one cid key must touch < all posting files
    store = os.path.join(scratch_dir("ivfstore-test"), "store")
    write_range_clustered(cells.select("vec_id", "v", "cid"), store, ("cid",), num_files=16)
    ranges = file_key_ranges(store, "cid")
    one_cid = cells.select("cid").orderBy("cid").limit(1)
    touched = touched_files(spark, ranges, one_cid, "cid")
    n_files = len([f for f in os.listdir(store) if f.endswith(".parquet")])
    assert 0 < len(touched) < n_files


def test_ivfpq_recall_and_rerank_parity(spark, sf_dir):
    """ann_ivfpq_topk: (a) the composed funnel keeps useful recall
    vs the exact brute-force top-k; (b) the exact re-rank contract —
    any (q, cand) pair the IVF-PQ serve shares with brute force
    carries the IDENTICAL 4-dp cosine, because the shortlist is
    re-scored on raw vectors, not ADC estimates."""
    exact_rows = S.ann_bruteforce_topk(spark, sf_dir).collect()
    exact = {(r.q_id, r.cand_id): r.cosine for r in exact_rows}
    got_rows = V.ann_ivfpq_topk(spark, sf_dir).collect()
    got = {(r.q_id, r.cand_id): r.cosine for r in got_rows}
    assert got
    # every query answered (the funnel may trim candidates, never queries)
    assert {q for q, _ in got} == {q for q, _ in exact}
    overlap = set(got) & set(exact)
    recall = len(overlap) / len(exact)
    assert recall >= 0.5, f"IVF-PQ recall {recall:.2f} too low"
    for key in overlap:
        # one 4-dp grid step of slack: brute force rounds the raw
        # cosine straight to 4 dp, the IVF family quantizes at 6 dp
        # first — an ADC estimate leaking through would be off by
        # orders of magnitude more
        assert abs(got[key] - exact[key]) <= 1e-4 + 1e-12, (
            f"re-rank cosine drift at {key}: {got[key]} vs {exact[key]}"
        )


def test_abtt_fixes_planted_anisotropic_cone(spark, tmp_path):
    """emb_abtt_isotropy_audit: a cloud with one dominant common
    direction (the classic anisotropic cone) must show avg pairwise
    cosine near 1 raw and near 0 after ABTT — i.e. the audit both
    detects the pathology and prices the fix. (Here the cone is the
    common MEAN, so the gain comes from the centering half of ABTT;
    the PC-removal half is exercised by the shared _fit_top_pc being
    oracle-replayed inside this very query.)"""
    from etl_gov_spark.operators.vectors import emb_abtt_isotropy_audit

    rows = []
    for i in range(300):
        v = [10.0] + [0.0] * 63
        v[1 + i % 63] += ((i * 37) % 100 - 50) / 100.0  # small noise
        rows.append((i, v, i % 4))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    r = emb_abtt_isotropy_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_raw == 300 and r.n_abtt == 300 and r.dim == 64
    assert r.avg_cos_raw > 0.95, r.avg_cos_raw
    assert abs(r.avg_cos_abtt) < 0.1, r.avg_cos_abtt
    assert r.isotropy_gain > 0.9


def test_ivfsq_recall_rerank_parity_and_code_range(spark, sf_dir):
    """ann_ivfsq_topk: the SQ8 serve honors the same funnel contract
    as IVF-PQ (useful recall, exact re-rank cosines) AND — the
    point of the layout — the scalar quantizer's shortlist is at
    least as good as PQ8's at the same probe/shortlist width, so
    the bake-off readout must rank ivfsq8 >= ivfpq8."""
    exact = {
        (r.q_id, r.cand_id): r.cosine
        for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    got = {
        (r.q_id, r.cand_id): r.cosine
        for r in V.ann_ivfsq_topk(spark, sf_dir).collect()
    }
    assert got
    assert {q for q, _ in got} == {q for q, _ in exact}
    overlap = set(got) & set(exact)
    assert len(overlap) / len(exact) >= 0.5
    for key in overlap:
        assert abs(got[key] - exact[key]) <= 1e-4 + 1e-12

    readout = {r.method: r for r in V.ann_quantizer_recall(spark, sf_dir).collect()}
    assert set(readout) == {"ivfpq8", "ivfsq8"}
    assert readout["ivfsq8"].recall_at_10 >= readout["ivfpq8"].recall_at_10
    assert readout["ivfsq8"].bytes_per_vec == 64
    assert readout["ivfpq8"].bytes_per_vec == 8
    for r in readout.values():
        assert 0.0 <= r.recall_at_10 <= 1.0 and r.truth_rows > 0

    # every emitted SQ8 code must fit one byte (the layout claim)
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.vectors import (
        EMB_DIM,
        _dbl_arr_lit,
        _norm,
        _sq_model_lists,
    )

    emb = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    unit = emb.withColumn("_n", _norm("v")).select(
        "vec_id", F.transform("v", lambda x: x / F.col("_n")).alias("v")
    )
    mins, scales = _sq_model_lists(unit)
    assert len(mins) == EMB_DIM == len(scales)
    mnlit, sclit = _dbl_arr_lit(mins), _dbl_arr_lit(scales)
    codes = unit.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(EMB_DIM)),
                lambda i: F.when(
                    F.element_at(sclit, i.cast("int")) == 0.0, F.lit(0)
                ).otherwise(
                    F.round(
                        (
                            F.element_at("v", i.cast("int"))
                            - F.element_at(mnlit, i.cast("int"))
                        )
                        / F.element_at(sclit, i.cast("int")),
                        0,
                    ).cast("int")
                ),
            )
        ).alias("code")
    )
    lo, hi = codes.agg(F.min("code"), F.max("code")).first()
    assert 0 <= lo and hi <= 255, (lo, hi)


def test_rrf_fusion_structure_and_recall(spark, sf_dir):
    """ann_rrf_fusion: fused ranks are contiguous, the RRF score is
    exactly 1/(60+sq_rank)+1/(60+pq_rank) over present lists, and
    fusion never loses recall vs the better individual serve (at the
    shared nprobe the two serves miss the SAME out-of-cell truth, so
    fusion == max, not >)."""
    truth = {
        (r.q_id, r.cand_id)
        for r in S.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    rows = V.ann_rrf_fusion(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
        expect = 0.0
        if r.sq_rank is not None:
            expect += 1.0 / (60 + r.sq_rank)
        if r.pq_rank is not None:
            expect += 1.0 / (60 + r.pq_rank)
        assert abs(r.rrf - expect) < 2e-4, r
        assert r.sq_rank is not None or r.pq_rank is not None
    for q, rs in per_q.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))

    fused = {(r.q_id, r.cand_id) for r in rows}
    sq = {(r.q_id, r.cand_id) for r in V.ann_ivfsq_topk(spark, sf_dir).collect()}
    pq = {(r.q_id, r.cand_id) for r in V.ann_ivfpq_topk(spark, sf_dir).collect()}
    r_f = len(fused & truth) / len(truth)
    r_s = len(sq & truth) / len(truth)
    r_p = len(pq & truth) / len(truth)
    assert r_f >= max(r_s, r_p) - 0.01, (r_f, r_s, r_p)


def test_dbscan_planted_blobs_border_and_noise(spark, tmp_path_factory):
    """emb_dbscan_clusters on planted geometry: an arc-spread blob
    whose deterministic LSH-blocked ε-graph yields 4 cores + 2
    border points (the arc ends land within ε of <3 members — the
    ε-graph IS the banding's deterministic output, which is the
    operator's stated definition), a second orthogonal blob (all
    cores, separate component), an isolated far pair whose members
    have deg 1 and no core neighbor (noise), and singletons (noise).
    The full partition must be recovered."""
    import math

    tmp = str(tmp_path_factory.mktemp("dbscan"))
    dim = 64

    def vec(theta_deg, ax1=0, ax2=1):
        v = [0.0] * dim
        t = math.radians(theta_deg)
        v[ax1], v[ax2] = math.cos(t), math.sin(t)
        return v

    rows = []
    for i, th in enumerate((0, 15, 30, 45, 60)):  # blob A arc
        rows.append((i, vec(th), 0))
    rows.append((5, vec(-40), 0))  # shoulder: ε-neighbors 0 and 1 only
    for i, th in enumerate((0, 15, 30, 45)):  # blob B, orthogonal plane
        rows.append((6 + i, vec(th, 2, 3), 1))
    rows.append((10, vec(0, 4, 5), 2))   # far pair: deg 1 each
    rows.append((11, vec(10, 4, 5), 2))
    rows.append((12, vec(0, 6, 7), 3))   # singletons
    rows.append((13, vec(0, 8, 9), 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    got = {r.component: r for r in G.emb_dbscan_clusters(spark, tmp).collect()}
    assert set(got) == {-1, 0, 6}
    # blob A: cores {0,1,2,3}; arc-end 4 (deg 1, core nbr 3) and
    # shoulder 5 (deg 2, core nbrs 0,1) attach as border
    assert got[0].n_core == 4 and got[0].n_border == 2 and got[0].size == 6
    assert got[6].n_core == 4 and got[6].n_border == 0 and got[6].size == 4
    # noise: far pair (no core neighbor) + 2 singletons
    assert got[-1].size == 4


def test_hybrid_rrf_fuses_both_legs(spark, sf_dir):
    """ann_hybrid_rrf: every fused row carries at least one source
    rank, the RRF score is exactly the sum of the reciprocal terms,
    per-query ranks are dense 1..k, and the query set is the
    intersection of the two legs' query sets."""
    got = V.ann_hybrid_rrf(spark, sf_dir).collect()
    assert got, "fusion produced no rows"
    per_q = {}
    for r in got:
        assert r.bm25_rank is not None or r.vec_rank is not None
        exp = (1.0 / (60 + r.bm25_rank) if r.bm25_rank else 0.0) + (
            1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0
        )
        assert abs(r.rrf - round(round(exp, 6) * 10000.0) / 10000.0) < 1e-9
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
    # shared-query restriction: every fused q_id has both legs
    sparse, dense, _ = V._hybrid_legs(spark, sf_dir)
    sq = {r.q_id for r in sparse.select("q_id").distinct().collect()}
    dq = {r.q_id for r in dense.select("q_id").distinct().collect()}
    assert set(per_q) <= (sq & dq)


def test_hybrid_recall_readout_shape(spark, sf_dir):
    """ann_hybrid_recall: four method rows (bm25, ivfsq8,
    hybrid_rrf, hybrid_rsf) over one shared truth,
    recall in [0,1], hits ≤ truth_rows, and the dense leg dominates
    the lexical leg on the semantic (cosine) ground truth."""
    rows = {r.method: r for r in V.ann_hybrid_recall(spark, sf_dir).collect()}
    assert set(rows) == {"bm25", "ivfsq8", "hybrid_rrf", "hybrid_rsf"}
    truth_rows = {r.truth_rows for r in rows.values()}
    assert len(truth_rows) == 1  # same truth for every leg
    for r in rows.values():
        assert 0 <= r.hits <= r.truth_rows
        assert 0.0 <= r.recall_at_10 <= 1.0
    assert rows["ivfsq8"].recall_at_10 > rows["bm25"].recall_at_10


def test_hybrid_rsf_normalization_and_ranks(spark, sf_dir):
    """ann_hybrid_rsf: normalized scores live in [0,1], the fused
    score is exactly the equal-weight combination (missing leg = 0),
    per-query ranks are dense 1..k, and within every query each
    leg's max-normalized candidate scores 1.0 somewhere."""
    got = V.ann_hybrid_rsf(spark, sf_dir).collect()
    assert got
    per_q = {}
    for r in got:
        for v in (r.bm25_norm, r.vec_norm):
            assert v is None or -1e-9 <= v <= 1.0 + 1e-9
        import math

        exp = round((r.bm25_norm or 0.0) + (r.vec_norm or 0.0), 6) / 2.0
        # HALF_UP like Spark/DuckDB round(), not Python banker's
        assert abs(r.rsf - math.floor(exp * 10000.0 + 0.5) / 10000.0) < 1e-9
        per_q.setdefault(r.q_id, []).append(r)
    for q, rows in per_q.items():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        # fused order is non-increasing in rsf
        rows.sort(key=lambda r: r.rank)
        assert all(a.rsf >= b.rsf for a, b in zip(rows, rows[1:]))


def test_hybrid_weight_sweep_endpoints(spark, sf_dir):
    """ann_hybrid_weight_sweep: five λ rows over one truth, recalls
    in [0,1], and the dense endpoint dominates the lexical endpoint
    on the cosine ground truth. Endpoints are NOT asserted equal to
    the pure legs: the sweep ranks over the UNION candidate pool, so
    each leg's min-max-floored rank-10 (norm 0) ties with the other
    leg's absent candidates and cand_id tie-breaking can admit them
    — a documented property of fusion over a shared pool."""
    sweep = {r.lam: r for r in V.ann_hybrid_weight_sweep(spark, sf_dir).collect()}
    assert set(sweep) == {0.0, 0.25, 0.5, 0.75, 1.0}
    assert len({r.truth_rows for r in sweep.values()}) == 1
    for r in sweep.values():
        assert 0.0 <= r.recall_at_10 <= 1.0 and r.hits <= r.truth_rows
    recall = {r.method: r.recall_at_10 for r in V.ann_hybrid_recall(spark, sf_dir).collect()}
    # dense endpoint lands in the dense leg's neighborhood (union-pool
    # zero-score ties can only perturb the tail) and dominates lexical
    assert abs(sweep[1.0].recall_at_10 - recall["ivfsq8"]) <= 0.1
    assert sweep[1.0].recall_at_10 >= sweep[0.0].recall_at_10
    assert sweep[1.0].recall_at_10 > recall["bm25"]

"""Similarity search over embeddings (SURVEY.md §2.D).

Approximate-nearest-neighbor over an ``array<float>`` column:

- ``ann_bruteforce_topk``: exact cosine top-k — the correctness
  baseline and the right answer when the query set is small (it is
  a broadcast join: |Q| × N scored pairs, embarrassingly parallel,
  no shuffle until the tiny per-query top-k).
- ``ann_lsh_topk``: random-hyperplane sign LSH. Hyperplane
  directions are derived from xxhash64 (deterministic, no RNG
  state), so the plan is reproducible across runs/executors.
  Candidates = vectors sharing the query's bucket; at 100 TB the
  bucket join replaces the |Q| × N scan with |Q| × (N / 2^bits).

Dot products are codegen ``aggregate(zip_with(...))`` folds in
double precision — no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog, expand_parallelism

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

TOP_K = 10
QUERY_STRIDE = 50  # vec_id % stride == 0 → query set
N_PLANES = 8
DIM = 64
ANCHOR_CAP = 2000  # hard bound on any broadcast anchor set


def capped_anchors(emb: DataFrame, stride: int, cap: int = ANCHOR_CAP) -> DataFrame:
    """Stride-sampled anchor set, hard-capped at ``cap`` rows.

    A bare ``vec_id % stride == 0`` anchor set grows as N/stride, so
    the broadcast side of every retrieval-eval query would grow
    linearly with the corpus — the scale seam the round-8 verdict
    flagged. The cap is a deterministic md5 draw: order the stride
    survivors by ``md5(vec_id)`` (a corpus-independent uniform
    shuffle identical in Spark and DuckDB) and keep the first
    ``cap``. Plans as TakeOrderedAndProject — each partition keeps
    ``cap`` rows, the driver merges cap·P — so the broadcast is
    O(cap) = CONSTANT in N. Below the cap (every test SF) the draw
    keeps everything and results are unchanged.
    """
    return (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(cap)
    )


def anchor_subquery(stride: int, cap: int = ANCHOR_CAP) -> str:
    """DuckDB mirror of ``capped_anchors`` over the embeddings view
    (same md5 draw, same cap) for use as an oracle FROM clause."""
    return (
        f"(SELECT * FROM embeddings WHERE vec_id % {stride} = 0 "
        f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {cap})"
    )


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the stride-sampled query set.

    The query side is broadcast (tiny); every candidate partition
    scores locally; row_number per query keeps k rows. Deterministic
    tie-break on candidate vec_id.
    """
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("vn", _norm("v"))
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("vn").alias("qn")
    )
    pairs = F.broadcast(q).crossJoin(emb).filter(F.col("vec_id") != F.col("q_id"))
    # norms precomputed per side: the cross join pays one dot per
    # pair, not dot + two norm folds
    cos = _dot("qv", "v") / (F.col("qn") * F.col("vn"))
    scored = pairs.select("q_id", F.col("vec_id").alias("cand_id"), cos.alias("_cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "cand_id", _R4(F.col("_cos"), "cosine"), "rank")
    )


ANN_BRUTEFORCE_SQL = f"""
SELECT q_id, cand_id, round(cos, 4) AS cosine, rank
FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
         CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id ASC) AS INTEGER) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
  WHERE q.vec_id % {QUERY_STRIDE} = 0
)
WHERE rank <= {TOP_K}
"""


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes derived from md5 at plan-build
    time and embedded as literals — stateless (any run/executor
    rebuilds the identical plan), nothing broadcast or stored."""
    import hashlib

    planes = []
    for k in range(n_planes):
        digest = b""
        while len(digest) < dim:
            digest += hashlib.md5(f"plane-{k}-{len(digest)}".encode()).digest()
        planes.append([1.0 if byte % 2 == 0 else -1.0 for byte in digest[:dim]])
    return planes


def _plane_sign_bits(v: str | Column) -> Column:
    """Sign-LSH bucket id as a bit-string: char k = sign of
    dot(v, H_k). String keys hash-partition evenly in the bucket
    equi-join. The dot is quantized to 6 dp before the sign test so
    Spark and the DuckDB oracle never disagree at an FP boundary."""
    bits = [
        F.when(
            F.round(_dot(v, F.array(*[F.lit(x) for x in plane])), 6) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in _hyperplanes()
    ]
    return F.concat(*bits)


def _probe_buckets(bucket: str | Column) -> Column:
    """Multi-probe set: the query's own bucket plus every bucket at
    Hamming distance 1 (one sign bit flipped). Vectors near a
    hyperplane land on either side; probing adjacent buckets
    recovers them without adding tables or planes."""
    b = F.col(bucket) if isinstance(bucket, str) else bucket
    probes = [b]
    for k in range(N_PLANES):
        flipped = F.when(F.substring(b, k + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        probes.append(
            F.concat(F.substring(b, 1, k), flipped, F.substring(b, k + 2, N_PLANES - k - 1))
        )
    return F.array(*probes)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-10 with Hamming-1 multi-probe.

    Equi-join on bucket id — with 2^8 buckets the candidate set per
    query is ~9·N/256; tune planes/probes as N grows. The bucketing
    is a pure function of the vector (md5-derived ±1 hyperplanes,
    quantized sign), so the DuckDB oracle replays the identical
    buckets/probes and the approximate algorithm is exactly
    oracle-able; recall vs brute force is additionally asserted in
    tests.
    """
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", _plane_sign_bits("v"))
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(_probe_buckets("bucket")).alias("bucket"),
    )
    pairs = (
        F.broadcast(q)
        .join(emb, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    cos = _dot("qv", "v") / (_norm("qv") * _norm("v"))
    scored = pairs.select("q_id", F.col("vec_id").alias("cand_id"), cos.alias("_cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "cand_id", _R4(F.col("_cos"), "cosine"), "rank")
    )


def _sql_bucket_expr() -> str:
    """DuckDB twin of _plane_sign_bits over the same plane literals
    and the same quantized sign test (column ``v`` must be
    DOUBLE[])."""
    bits = []
    for plane in _hyperplanes():
        lit = "[" + ",".join(str(x) for x in plane) + "]"
        bits.append(
            f"(CASE WHEN round(list_dot_product(v, {lit}), 6) >= 0 THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


ANN_LSH_SQL = f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), b AS (
  SELECT vec_id, v, {_sql_bucket_expr()} AS bucket FROM vecs
), q AS (
  SELECT vec_id AS q_id,
         unnest([bucket] || list_transform(generate_series(0, {N_PLANES - 1}),
                k -> substr(bucket, 1, k)
                     || (CASE WHEN substr(bucket, k + 1, 1) = '1' THEN '0' ELSE '1' END)
                     || substr(bucket, k + 2, {N_PLANES} - k - 1))) AS bucket
  FROM b WHERE vec_id % {QUERY_STRIDE} = 0
), cand AS (
  SELECT DISTINCT q.q_id, c.vec_id AS cand_id
  FROM q JOIN b c USING (bucket)
  WHERE c.vec_id <> q.q_id
), scored AS (
  SELECT q_id, cand_id, list_cosine_similarity(qa.v, ca.v) AS cos
  FROM cand
  JOIN vecs qa ON qa.vec_id = cand.q_id
  JOIN vecs ca ON ca.vec_id = cand.cand_id
)
SELECT q_id, cand_id, round(cos, 4) AS cosine, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
           ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


QUERIES: dict[str, tuple] = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
}


def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label classification over the embedding space — the
    embedding-quality gate a training pipeline runs on every new
    encoder batch: hold out the stride-sampled vectors, predict
    each one's label by majority vote of its 10 nearest TRAIN
    neighbors (cosine), and report per-label accuracy. A space
    where neighbors don't share labels is a space not worth
    indexing.

    Same broadcast-query / partition-local-scoring shape as
    ann_bruteforce_topk, but with a real train/test split
    (candidates exclude every held-out vector). Cosines are
    quantized to 6 dp BEFORE ranking and the vote tie-breaks on the
    smallest label, so prediction is a deterministic function of
    the corpus in both engines. The held-out query set is
    ``capped_anchors`` — at most ANCHOR_CAP broadcast rows however
    large the corpus grows.
    """
    emb = (
        expand_parallelism(Catalog(spark, sf_dir).embeddings)
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("vn", _norm("v"))
    )
    q = capped_anchors(emb, QUERY_STRIDE).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("vn").alias("qn"),
    )
    cand = emb.filter(F.col("vec_id") % QUERY_STRIDE != 0)
    cos6 = F.round(_dot("qv", "v") / (F.col("qn") * F.col("vn")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    top = (
        F.broadcast(q)
        .crossJoin(cand)
        .select("q_id", "true_label", "vec_id", "label", cos6.alias("_cos"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= TOP_K)
    )
    pred = (
        top.groupBy("q_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("q_id", "true_label")
        .agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
            ).alias("b")
        )
        .select("q_id", "true_label", F.col("b.l").alias("pred_label"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).alias("n_correct"),
        F.round(
            F.avg(
                F.when(F.col("pred_label") == F.col("true_label"), 1.0).otherwise(0.0)
            ),
            4,
        ).alias("accuracy"),
    )


EMB_KNN_CLASSIFY_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), top AS (
  SELECT q_id, true_label, label, r FROM (
    SELECT q.vec_id AS q_id, q.label AS true_label, c.vec_id, c.label,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
                        c.vec_id ASC) AS INTEGER) AS r
    FROM (SELECT vec_id, label, v FROM emb
          WHERE vec_id % {QUERY_STRIDE} = 0
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {ANCHOR_CAP}) q
    JOIN emb c ON c.vec_id % {QUERY_STRIDE} != 0
  ) WHERE r <= {TOP_K}
), pred AS (
  SELECT q_id, true_label, label AS pred_label FROM (
    SELECT q_id, true_label, label, count(*) AS c,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY count(*) DESC, label ASC) AS rn
    FROM top GROUP BY q_id, true_label, label
  ) WHERE rn = 1
)
SELECT true_label AS label,
       count(*) AS n_queries,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(avg(CASE WHEN pred_label = true_label THEN 1.0 ELSE 0.0 END), 4)
         AS accuracy
FROM pred GROUP BY true_label
"""

QUERIES["emb_knn_classify"] = (emb_knn_classify, EMB_KNN_CLASSIFY_SQL)


LID_K = 10  # neighbors per anchor for the Levina-Bickel MLE


def emb_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local intrinsic dimensionality of the embedding space —
    the Levina-Bickel (NeurIPS 2004) maximum-likelihood estimator
    from nearest-neighbor distances, with the MacKay-Ghahramani
    inverse-averaged corpus estimate. LID is the capacity number
    behind every index decision here: IVF cell counts, PQ codebook
    sizes and LSH plane counts all assume the data lives on a
    low-dimensional manifold inside the 64-d ambient space; this
    query measures that dimension instead of assuming it.

    Per anchor x with NN distances d_1 <= ... <= d_K (euclidean,
    zero-distance exact duplicates excluded):
    1/lid(x) = (1/(K-1)) * [ (K-1)*ln d_K - Σ_{j<K} ln d_j ] —
    the sum-of-logs form, one log per neighbor, no per-term ratio.

    Determinism: distances are quantized to the 1e-6 grid with
    integer-path rounding (round(d*1e6)/1e6 — identical in both
    engines, no 6-dp half-tie seam) BEFORE ranking and before the
    log, so ranks, ties and values are a pure function of the
    corpus. Anchors whose K-NN ring is flat (d_j == d_K for all j,
    1/lid = 0) publish NULL lid and are counted, not averaged.

    Scale: the anchor set is ``capped_anchors`` — O(ANCHOR_CAP)
    broadcast rows at any corpus size — and scoring is the same
    partition-local broadcast-join shape as ann_bruteforce_topk
    (|A| x N, embarrassingly parallel, per-query top-K via a
    bounded window). No new shuffle shape at 100 TB.
    """
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = capped_anchors(emb, QUERY_STRIDE).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d6 = F.round(dist * 1000000.0) / 1000000.0
    w = Window.partitionBy("q_id").orderBy(F.asc("_d"), F.asc("vec_id"))
    knn = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", d6.alias("_d"))
        .filter(F.col("_d") > 0)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= LID_K)
    )
    per = (
        knn.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("kn"),
            F.max(F.when(F.col("_r") == LID_K, F.log("_d"))).alias("ldk"),
            F.sum(F.when(F.col("_r") < LID_K, F.log("_d"))).alias("slog"),
        )
        .filter(F.col("kn") == LID_K)
        .select(
            "q_id",
            (
                ((LID_K - 1) * F.col("ldk") - F.col("slog")) / (LID_K - 1)
            ).alias("inv"),
        )
        .select(
            "q_id",
            "inv",
            F.when(
                F.col("inv") > 0,
                F.round(1.0 / F.col("inv") * 1000000.0) / 1000000.0,
            ).alias("lid"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.lit(LID_K).alias("k"),
        F.sum(F.when(F.col("lid").isNull(), 1).otherwise(0)).alias("n_degenerate"),
        (F.round(F.avg("lid") * 10000.0) / 10000.0).alias("lid_mean"),
        F.when(
            F.avg("inv") > 0,
            F.round(1.0 / F.avg("inv") * 10000.0) / 10000.0,
        ).alias("lid_mackay"),
        (F.round(F.min("lid") * 10000.0) / 10000.0).alias("lid_min"),
        (F.round(F.max("lid") * 10000.0) / 10000.0).alias("lid_max"),
    )


EMB_INTRINSIC_DIM_SQL = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), anchors AS (
  SELECT vec_id AS q_id, v AS qv FROM emb
  WHERE vec_id % {QUERY_STRIDE} = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ANCHOR_CAP}
), scored AS (
  SELECT a.q_id, c.vec_id,
         round(sqrt(list_sum(list_transform(generate_series(1, {DIM}),
               i -> (a.qv[i] - c.v[i]) * (a.qv[i] - c.v[i])))) * 1000000.0)
           / 1000000.0 AS d
  FROM anchors a JOIN emb c ON c.vec_id <> a.q_id
), knn AS (
  SELECT q_id, d, r FROM (
    SELECT q_id, d,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY d ASC, vec_id ASC) AS r
    FROM scored WHERE d > 0
  ) WHERE r <= {LID_K}
), per AS (
  SELECT q_id, inv,
         CASE WHEN inv > 0
              THEN round(1.0 / inv * 1000000.0) / 1000000.0 END AS lid
  FROM (
    SELECT q_id,
           (({LID_K} - 1) * max(CASE WHEN r = {LID_K} THEN ln(d) END)
            - sum(CASE WHEN r < {LID_K} THEN ln(d) END)) / ({LID_K} - 1) AS inv
    FROM knn GROUP BY q_id HAVING count(*) = {LID_K}
  )
)
SELECT count(*) AS n_anchors,
       {LID_K} AS k,
       CAST(sum(CASE WHEN lid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degenerate,
       round(avg(lid) * 10000.0) / 10000.0 AS lid_mean,
       CASE WHEN avg(inv) > 0
            THEN round(1.0 / avg(inv) * 10000.0) / 10000.0 END AS lid_mackay,
       round(min(lid) * 10000.0) / 10000.0 AS lid_min,
       round(max(lid) * 10000.0) / 10000.0 AS lid_max
FROM per
"""

QUERIES["emb_intrinsic_dim"] = (emb_intrinsic_dim, EMB_INTRINSIC_DIM_SQL)


def ann_knn_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural health of the cosine kNN graph — hubness and
    reciprocity, the two pathologies (Radovanovic et al., JMLR 2010)
    that silently break ANN serving in high dimensions: a few "hub"
    vectors appear in everyone's neighbor lists (their k-occurrence
    distribution grows a heavy right tail) while "antihubs" vanish
    from all of them, and neighbor relations stop being mutual. Both
    directly predict IVF/LSH recall loss, so this is the go/no-go
    audit before trusting any index built on the space.

    Graph: directed k=TOP_K cosine kNN over the ``capped_anchors``
    set (anchor-to-anchor, |A|^2 <= ANCHOR_CAP^2 scored pairs — a
    CONSTANT bound at any corpus size; the sampled graph's hubness
    is the standard estimator for the full graph's). Readouts:
    k-occurrence max / antihub count / skewness (exact integer power
    sums, one float division at the end — no float-sum order seam),
    and edge reciprocity via a reversed-pair self-join.
    """
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = capped_anchors(emb, QUERY_STRIDE).withColumn("vn", _norm("v"))
    q = a.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("vn").alias("qn")
    )
    cos6 = F.round(_dot("qv", "v") / (F.col("qn") * F.col("vn")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    edges = (
        F.broadcast(q)
        .crossJoin(a)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos6.alias("_cos"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("cand_id"))
    )
    kocc = (
        a.select(F.col("vec_id").alias("node"))
        .join(
            edges.groupBy("cand_id").agg(F.count(F.lit(1)).alias("nk")),
            F.col("node") == F.col("cand_id"),
            "left",
        )
        .select("node", F.coalesce(F.col("nk"), F.lit(0)).alias("nk"))
    )
    moments = kocc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nk").alias("s1"),
        F.sum(F.col("nk") * F.col("nk")).alias("s2"),
        F.sum(F.col("nk") * F.col("nk") * F.col("nk")).alias("s3"),
        F.max("nk").alias("kocc_max"),
        F.sum(F.when(F.col("nk") == 0, 1).otherwise(0)).alias("n_antihubs"),
    )
    rev = edges.select(
        F.col("q_id").alias("cand_id"), F.col("cand_id").alias("q_id")
    )
    recip = edges.join(rev, ["q_id", "cand_id"]).agg(
        F.count(F.lit(1)).alias("n_mutual")
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    m = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - m * m
    skew = (
        F.col("s3").cast("double") / F.col("n")
        - 3.0 * m * (F.col("s2").cast("double") / F.col("n"))
        + 2.0 * m * m * m
    ) / F.pow(var, 1.5)
    return (
        moments.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(recip))
        .select(
            F.col("n").alias("n_nodes"),
            "n_edges",
            (F.round(F.col("n_mutual").cast("double") / F.col("n_edges") * 10000.0)
             / 10000.0).alias("reciprocity"),
            F.col("kocc_max").cast("int").alias("kocc_max"),
            F.col("n_antihubs").cast("long").alias("n_antihubs"),
            F.when(var > 0, F.round(skew * 10000.0) / 10000.0).alias(
                "kocc_skewness"
            ),
        )
    )


ANN_KNN_GRAPH_SQL = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), anchors AS (
  SELECT vec_id, v FROM emb
  WHERE vec_id % {QUERY_STRIDE} = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ANCHOR_CAP}
), edges AS (
  SELECT q_id, cand_id FROM (
    SELECT a.vec_id AS q_id, c.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_cosine_similarity(a.v, c.v), 6) DESC,
                      c.vec_id ASC) AS r
    FROM anchors a JOIN anchors c ON c.vec_id <> a.vec_id
  ) WHERE r <= {TOP_K}
), kocc AS (
  SELECT a.vec_id AS node, coalesce(e.nk, 0) AS nk
  FROM anchors a
  LEFT JOIN (SELECT cand_id, count(*) AS nk FROM edges GROUP BY cand_id) e
    ON a.vec_id = e.cand_id
), moments AS (
  SELECT count(*) AS n,
         sum(nk) AS s1, sum(nk * nk) AS s2, sum(nk * nk * nk) AS s3,
         max(nk) AS kocc_max,
         sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END) AS n_antihubs
  FROM kocc
), recip AS (
  SELECT count(*) AS n_mutual
  FROM edges e JOIN edges r ON e.q_id = r.cand_id AND e.cand_id = r.q_id
), ecount AS (
  SELECT count(*) AS n_edges FROM edges
)
SELECT CAST(n AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       round(CAST(n_mutual AS DOUBLE) / n_edges * 10000.0) / 10000.0
         AS reciprocity,
       CAST(kocc_max AS INTEGER) AS kocc_max,
       CAST(n_antihubs AS BIGINT) AS n_antihubs,
       CASE WHEN CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) > 0
            THEN round((CAST(s3 AS DOUBLE) / n
                        - 3.0 * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s2 AS DOUBLE) / n)
                        + 2.0 * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n))
                       / pow(CAST(s2 AS DOUBLE) / n
                             - (CAST(s1 AS DOUBLE) / n)
                                   * (CAST(s1 AS DOUBLE) / n), 1.5)
                       * 10000.0) / 10000.0
       END AS kocc_skewness
FROM moments, recip, ecount
"""

QUERIES["ann_knn_graph_stats"] = (ann_knn_graph_stats, ANN_KNN_GRAPH_SQL)


JL_DIM_OUT = 16  # Johnson-Lindenstrauss target dimensionality


def _jl_sign(i: int, j: int) -> int:
    """±1 from md5 hex parity — the same expression the oracle
    computes in SQL, so the projection matrix is a shared constant,
    not shipped state."""
    import hashlib

    h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def emb_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random-projection audit: project 64-d
    embeddings to 16-d with a deterministic ±1 sign matrix (Achlioptas
    2003 — database-friendly random projections) and MEASURE the
    pairwise squared-distance distortion on the capped anchor set
    instead of trusting the lemma: mean/min/max of
    ‖y_a−y_b‖²/‖x_a−x_b‖² and the share of pairs outside the ±50%
    band. This is the go/no-go check before swapping a 4× narrower
    sketch into a distance-based stage (dedup blocking, coarse ANN).

    Determinism: the sign matrix is md5-parity per (dim, plane) —
    a pure shared constant both engines derive independently; both
    squared distances are integer-path quantized on the 1e-6 grid
    before the ratio, so every ratio is a pure function of the
    corpus. Projection runs relationally (explode × broadcast R ×
    re-aggregate) over ONLY the ≤ANCHOR_CAP anchors; the pair
    audit is cap²-bounded at any corpus size.
    """
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = capped_anchors(emb, QUERY_STRIDE)
    rrows = [
        (i, j, float(_jl_sign(i, j)))
        for i in range(DIM)
        for j in range(JL_DIM_OUT)
    ]
    R = spark.createDataFrame(rrows, "i int, j int, s double")
    proj = (
        a.select("vec_id", F.posexplode("v").alias("i", "x"))
        .join(F.broadcast(R), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("yj"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "yj"))),
                lambda st: st["yj"] / F.lit(float(JL_DIM_OUT) ** 0.5),
            ).alias("y")
        )
    )
    both = a.join(proj, "vec_id").select("vec_id", "v", "y")
    l = both.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"), F.col("y").alias("ya")
    )
    r = both.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"), F.col("y").alias("yb")
    )
    d2 = lambda p, q: F.aggregate(  # noqa: E731
        F.zip_with(p, q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q6 = lambda c: F.round(c * 1000000.0) / 1000000.0  # noqa: E731
    pairs = (
        F.broadcast(l)
        .crossJoin(r)
        .filter(F.col("ida") < F.col("idb"))
        .select(
            q6(d2("va", "vb")).alias("xq"),
            q6(d2("ya", "yb")).alias("yq"),
        )
        .filter(F.col("xq") > 0)
        .select((F.col("yq") / F.col("xq")).alias("ratio"))
    )
    return pairs.agg(
        F.lit(DIM).alias("dim_in"),
        F.lit(JL_DIM_OUT).alias("dim_out"),
        F.count(F.lit(1)).alias("n_pairs"),
        (F.round(F.avg("ratio") * 10000.0) / 10000.0).alias("mean_ratio"),
        (F.round(F.min("ratio") * 10000.0) / 10000.0).alias("min_ratio"),
        (F.round(F.max("ratio") * 10000.0) / 10000.0).alias("max_ratio"),
        (
            F.round(
                F.avg(
                    F.when(F.abs(F.col("ratio") - 1.0) > 0.5, 1.0).otherwise(0.0)
                )
                * 10000.0
            )
            / 10000.0
        ).alias("outside_band_share"),
    )


EMB_JL_SQL = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), anchors AS (
  SELECT vec_id, v FROM emb
  WHERE vec_id % {QUERY_STRIDE} = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ANCHOR_CAP}
), R AS (
  SELECT i, j,
         CASE WHEN CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(0, {DIM - 1}) t1(i),
       generate_series(0, {JL_DIM_OUT - 1}) t2(j)
), flat AS (
  SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x
  FROM anchors
), proj AS (
  SELECT vec_id,
         list_transform(
           list_sort(list(struct_pack(j := j, yj := yj))),
           st -> st.yj / sqrt({JL_DIM_OUT}.0)) AS y
  FROM (
    SELECT f.vec_id, r.j, sum(f.x * r.s) AS yj
    FROM flat f JOIN R r USING (i) GROUP BY f.vec_id, r.j
  ) GROUP BY vec_id
), av AS (
  SELECT a.vec_id, a.v, p.y FROM anchors a JOIN proj p USING (vec_id)
), pairs AS (
  SELECT round(list_sum(list_transform(generate_series(1, {DIM}),
               k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k]))) * 1000000.0)
           / 1000000.0 AS xq,
         round(list_sum(list_transform(generate_series(1, {JL_DIM_OUT}),
               k -> (a.y[k] - b.y[k]) * (a.y[k] - b.y[k]))) * 1000000.0)
           / 1000000.0 AS yq
  FROM av a JOIN av b ON a.vec_id < b.vec_id
)
SELECT {DIM} AS dim_in,
       {JL_DIM_OUT} AS dim_out,
       count(*) AS n_pairs,
       round(avg(yq / xq) * 10000.0) / 10000.0 AS mean_ratio,
       round(min(yq / xq) * 10000.0) / 10000.0 AS min_ratio,
       round(max(yq / xq) * 10000.0) / 10000.0 AS max_ratio,
       round(avg(CASE WHEN abs(yq / xq - 1.0) > 0.5 THEN 1.0 ELSE 0.0 END)
             * 10000.0) / 10000.0 AS outside_band_share
FROM pairs WHERE xq > 0
"""

QUERIES["emb_jl_projection_audit"] = (emb_jl_projection_audit, EMB_JL_SQL)

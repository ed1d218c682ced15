"""Deduplication operators (SURVEY.md §2.C) over ``documents`` /
``embeddings``.

The LLM-corpus dedup ladder, each rung Spark-first:

- exact:       md5 groupBy — one shuffle on the hash key
- minhash+LSH: shingle → k minhashes → band keys → bucket-local
  pair expansion. Turns O(n²) candidate generation into per-bucket
  work; hash keys partition evenly at any scale.
- n-gram Jaccard: exact verify stage over an inverted shingle
  index, blocked (here: by source) so pair count stays bucket-local
- simhash:     64-bit signature + 16-bit-chunk banding (Hamming ≤ t
  ⇒ some chunk equal when t < chunks) — pigeonhole blocking
- embedding:   cosine near-dup; exact pair mode here (oracle-able),
  LSH-bucketed mode in operators/similarity.py for the scale path

MinHash portability: hash_j(shingle) = 8-hex-char chunk j%4 of
md5(j//4 || '|' || shingle), min taken lexicographically — identical
strings in Spark and DuckDB, which is what makes an *approximate*
algorithm exactly oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_gov_spark.io.sources import Catalog, expand_parallelism
from etl_gov_spark.operators.text import MAX_SHINGLE_DF, tokens_col

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

N_HASHES = 8
N_BANDS = 4  # 2 hashes per band
SHINGLE_K = 3


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content
    hash with the kept (minimum) doc_id and the duplicate count.
    Pure hash-key groupBy: map-side combine, no skew (md5 keys)."""
    docs = Catalog(spark, sf_dir).documents
    norm = F.concat_ws(" ", tokens_col())
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )


DEDUP_EXACT_SQL = r"""
SELECT md5(array_to_string(string_split_regex(trim(text), '\s+'), ' ')) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS group_size,
       count(*) - 1 AS n_dups
FROM documents
GROUP BY 1
"""


def shingles_col(k: int = SHINGLE_K, toks: Column | str = "toks") -> Column:
    """Word k-gram shingles from a MATERIALIZED token-array column
    (codegen, no UDF).

    ``toks`` must be a real column, not an inline ``split()``
    expression: expressions referenced inside a higher-order-
    function lambda are not common-subexpression-eliminated, so an
    inline split would re-tokenize the document once per shingle
    (~6× slower measured). Callers project ``tokens_col()`` into a
    column first (see shingled_docs).
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )




def shingled_docs(docs: DataFrame, *keep: str, distinct: bool = False) -> DataFrame:
    """Project docs to (*keep, sh): tokenize in one projection,
    shingle from the materialized token array in the next (input
    widened to cluster parallelism first — see expand_parallelism)."""
    sh = shingles_col()
    if distinct:
        sh = F.array_distinct(sh)
    return expand_parallelism(docs).select(*keep, tokens_col().alias("toks")).select(
        *keep, sh.alias("sh")
    )


_SQL_SHINGLES = (
    r"list_transform(generate_series(1, greatest(len(toks) - 2, 1)),"
    r" i -> array_to_string(toks[i:i+2], ' '))"
)


# 8 hash functions from 2 md5 digests: h_j = 8-hex-char chunk j%4 of
# md5(j//4 || '|' || shingle). 32-bit minhash values — 4× fewer md5
# evaluations than one digest per hash function, and the min/compare
# runs on 8-char strings instead of 32.
_SQL_SIG = (
    "list_transform(generate_series(0, 7), j -> list_aggregate("
    f"list_transform({_SQL_SHINGLES},"
    " s -> substr(md5(CAST(j // 4 AS VARCHAR) || '|' || s), 1 + (j % 4) * 8, 8)),"
    " 'min'))"
)


JACCARD_T = 0.1
# Shared oracle fragment: the Jaccard≥t near-dup edge list, derived
# through the SAME inverted shingle index + MAX_SHINGLE_DF hot-shingle
# ceiling as _near_dup_edges, so the approximate-but-deterministic
# edge set matches the Spark plan exactly under any data. Over-cap
# shingles are star-routed (hub = min doc): only hub-vs-member rows
# count toward the intersection — mirroring bounded_buckets
# route="star" — so a giant boilerplate cluster keeps its hub edges
# (and hence its canonical-doc mapping) instead of vanishing, while
# every candidate pair is still verified by true Jaccard.
_SQL_EDGE_PAIRS = rf"""sh AS (
  SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), idx AS (
  SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh
), dfs AS (
  SELECT s, count(*) AS df, min(doc_id) AS hub FROM idx GROUP BY s
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n AS n_a, b.n AS n_b, count(*) AS n_inter
  FROM idx a JOIN idx b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN dfs d ON d.s = a.s
  WHERE d.df >= 2 AND (d.df <= {MAX_SHINGLE_DF} OR a.doc_id = d.hub)
  GROUP BY 1, 2, 3, 4
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  WHERE n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= {JACCARD_T}
)"""


def minhash_signature_flat(docs: DataFrame) -> DataFrame:
    """Signatures via explode + hash-aggregate instead of nested
    array transforms: (doc, shingle) rows get 8 flat hash columns,
    map-side-combined min per doc. Flat rows stay in codegen (no
    per-row array boxing) and the shuffle carries only pre-combined
    per-partition minima. No distinct pass — min over the shingle
    multiset equals min over the set. Each shingle pays 2 md5
    evaluations, sliced into 4 32-bit chunks each (see _SQL_SIG —
    the identical strings on the DuckDB side).
    """
    sh = shingled_docs(docs, "doc_id").select("doc_id", F.explode("sh").alias("s"))
    digests = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{d}|"), F.col("s"))).alias(f"d{d}")
            for d in range(N_HASHES // 4)
        ],
    )
    hashed = digests.select(
        "doc_id",
        *[
            F.substring(F.col(f"d{j // 4}"), 1 + (j % 4) * 8, 8).alias(f"h{j}")
            for j in range(N_HASHES)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{j}").alias(f"h{j}") for j in range(N_HASHES)]
    )


def pair_structs(ds: Column, max_items: int | None = None) -> Column:
    """All (a, b) pairs with list-position i < j from a sorted
    struct array — bucket-local pair expansion. Replaces the
    bucket self-join: the bucket contents are computed ONCE
    (collect_list) instead of twice (join re-evaluates the whole
    upstream pipeline per side), and pair generation stays inside
    codegen. Buckets must be small (LSH bands / shingle df) — cap
    df upstream at scale; a hot bucket means the key carries no
    dedup signal anyway.

    ``max_items`` bounds the expansion for callers whose bucket size
    is data-driven (order baskets): only the first ``max_items``
    elements of the (sorted, hence deterministic) array expand, so
    one hot basket contributes at most C(max_items, 2) pairs instead
    of going quadratic. Callers with an oracle must mirror the cap
    (rank-filter per group on the same sort key)."""
    if max_items is not None:
        ds = F.slice(ds, 1, max_items)
    return F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


# Hot-bucket ceilings: one boilerplate band signature or one
# stop-word-grade shingle would otherwise expand C(bucket, 2) pairs —
# quadratic in the hot key at 100×. Buckets above the ceiling take one
# of two routes, and every DuckDB oracle mirrors the same rule so the
# approximate-but-deterministic result stays exactly comparable:
#   route="star"  (LSH band buckets): bucket membership itself means
#     "likely duplicate", and the hottest buckets are exactly the
#     boilerplate clusters a 100 TB dedup run MUST catch — so over-cap
#     buckets emit hub-and-spoke pairs (every member vs the bucket's
#     min element): O(bucket) pairs, connectivity (and therefore the
#     cluster's canonical-doc mapping) preserved.
#   route="drop"  (inverted shingle-df indexes): a hot shingle is a
#     stop-word — it carries no signal, and its pairs would pollute
#     the intersection counts — so the bucket is dropped entirely.
# Measured at sf0.1: band buckets ≤ 54, per-source shingle df ≤ 6,
# global df ≤ 25 — the ceilings bite nothing at test scale; they exist
# for the 1000-executor case.
MAX_BAND_BUCKET = 256  # LSH band buckets (minhash bands, sign-LSH)
# MAX_SHINGLE_DF (inverted shingle index df ceiling) is defined in
# operators/text.py and re-exported here for corpus.py / graphs.py.

# op name -> Observation carrying (hot_buckets, max_bucket) for the
# most recent plan built by that operator; readable after any action.
HOT_BUCKET_OBS: dict[str, Observation] = {}


def bounded_buckets(
    buckets: DataFrame, arr: str, cap: int, op: str, route: str = "drop"
) -> DataFrame:
    """Apply a hot-bucket ceiling, recording how many buckets were
    over it (and the max bucket seen) via ``observe()`` — the metrics
    materialize with the first action on the returned plan, so the
    count is logged without an extra job.

    ``route="drop"``: over-cap buckets are removed (oracles mirror
    with ``HAVING count(*) <= cap`` on the bucket key).
    ``route="star"``: over-cap buckets are rewritten into hub-spoke
    sub-buckets ``[arr[0], arr[i]]`` — downstream ``pair_structs``
    expansion then yields exactly the bucket-min-vs-member pairs,
    linear in bucket size (oracles mirror with a hot-bucket hub
    union). Single pass: under-cap rows flow through unchanged via
    the same generator, no union-of-filters re-deriving the upstream
    aggregation twice."""
    obs = Observation(f"{op}_hot_buckets")
    HOT_BUCKET_OBS[op] = obs
    observed = buckets.observe(
        obs,
        F.sum((F.size(arr) > cap).cast("long")).alias("hot_buckets"),
        F.max(F.size(arr)).alias("max_bucket"),
    )
    if route == "drop":
        return observed.filter(F.size(arr) <= cap)
    if route != "star":
        raise ValueError(f"unknown hot-bucket route: {route!r}")
    a = F.col(arr)
    sub_buckets = F.when(
        F.size(a) <= cap, F.array(a)  # one sub-bucket: the bucket itself
    ).otherwise(
        F.transform(
            F.slice(a, 2, F.size(a) - 1),
            lambda x: F.array(F.element_at(a, 1), x),
        )
    )
    return observed.withColumn(arr, F.explode(sub_buckets))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding: docs sharing ≥1 of 4 band keys become
    candidate pairs, scored by signature agreement.

    Scale: signature build is explode + map-side-combined min (see
    minhash_signature_flat) and runs exactly once — band buckets
    are collect_list'd and pairs expand bucket-locally
    (pair_structs), so there is one shuffle on band_key and no
    self-join re-evaluating the signature pipeline. Band keys are
    band-index-prefixed h_2b||h_2b+1 (the prefix stops cross-band
    bucket collisions).
    """
    sig = minhash_signature_flat(
        Catalog(spark, sf_dir).documents.select("doc_id", "text")
    )
    band_cols = [
        F.concat(F.lit(f"{b}:"), F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    banded = sig.select(
        F.struct(
            "doc_id", F.array(*[F.col(f"h{j}") for j in range(N_HASHES)]).alias("sig")
        ).alias("dn"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    )
    buckets = bounded_buckets(
        banded.groupBy("band_key")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_BAND_BUCKET,
        "dedup_minhash_lsh",
        route="star",
    )
    pairs = buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p")).select(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.b.doc_id").alias("doc_b"),
        F.col("p.a.sig").alias("sig_a"),
        F.col("p.b.sig").alias("sig_b"),
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_bands"),
            F.first(agree).alias("_agree"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            _R4(F.col("_agree") / F.lit(N_HASHES), "sig_agreement"),
        )
    )


DEDUP_MINHASH_SQL = rf"""
WITH sigs AS (
  SELECT doc_id, {_SQL_SIG} AS sig
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), banded AS (
  SELECT doc_id, sig, unnest(list_transform(generate_series(0, 3),
         b -> CAST(b AS VARCHAR) || ':' || sig[b*2+1] || sig[b*2+2])) AS band_key
  FROM sigs
), keep AS (  -- hot-bucket ceiling, mirrors MAX_BAND_BUCKET
  SELECT band_key FROM banded GROUP BY band_key HAVING count(*) <= {MAX_BAND_BUCKET}
), hot AS (  -- star route: over-cap buckets pair hub (min doc) vs members
  SELECT band_key, min(doc_id) AS hub
  FROM banded GROUP BY band_key HAVING count(*) > {MAX_BAND_BUCKET}
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b USING (band_key)
  WHERE a.doc_id < b.doc_id AND band_key IN (SELECT band_key FROM keep)
  UNION ALL
  SELECT h.hub AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM hot h
  JOIN banded a ON a.band_key = h.band_key AND a.doc_id = h.hub
  JOIN banded b ON b.band_key = h.band_key AND b.doc_id <> h.hub
)
SELECT doc_a, doc_b,
       count(*) AS n_shared_bands,
       round(list_sum(list_transform(generate_series(1, 8),
             j -> CASE WHEN sig_a[j] = sig_b[j] THEN 1 ELSE 0 END)) / 8.0, 4) AS sig_agreement
FROM cand
GROUP BY doc_a, doc_b, sig_a, sig_b
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard via an inverted shingle index:
    top-5 most-overlapping pairs per source (only pairs sharing ≥1
    shingle are considered; deterministic tie-break).

    Scale: instead of joining full shingle ARRAYS per pair (huge
    shuffle rows, quadratic in block size), explode to an inverted
    index of (source, shingle) → (doc, set size) and count
    co-occurrences: |A∩B| = co-occurrence count, |A∪B| = |A| + |B|
    − |A∩B|. One shuffle on the shingle key, pairs expanded
    bucket-locally (pair_structs) so the shingle pipeline runs once
    (a self-join would re-evaluate it per side); pair count is
    Σ df² per shingle within a source block, not block². This is
    the standard web-scale near-dup verify stage.
    """
    docs = shingled_docs(
        Catalog(spark, sf_dir).documents, "doc_id", "source", distinct=True
    )
    index = docs.select(
        "source",
        F.struct("doc_id", F.size("sh").alias("n")).alias("dn"),
        F.explode("sh").alias("s"),
    )
    buckets = bounded_buckets(
        index.groupBy("source", "s")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_ngram_jaccard",
    )
    inter = (
        buckets.select("source", F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            "source",
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    pairs = inter.select(
        "source",
        "doc_a",
        "doc_b",
        (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("_j"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("_j"), F.asc("doc_a"), F.asc("doc_b")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "doc_a", "doc_b", _R4(F.col("_j"), "jaccard"), "rank")
    )


DEDUP_JACCARD_SQL = rf"""
WITH sh AS (
  SELECT doc_id, source, list_distinct({_SQL_SHINGLES}) AS sh
  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), idx AS (  -- inverted index; mirrors the Spark plan so the
             -- MAX_SHINGLE_DF hot-shingle ceiling applies identically
  SELECT doc_id, source, len(sh) AS n, unnest(sh) AS s FROM sh
), keep AS (
  SELECT source, s FROM idx GROUP BY source, s
  HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
), inter AS (
  SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n AS n_a, b.n AS n_b, count(*) AS n_inter
  FROM idx a JOIN idx b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
  JOIN keep k ON k.source = a.source AND k.s = a.s
  GROUP BY 1, 2, 3, 4, 5
), pairs AS (
  SELECT source, doc_a, doc_b,
         n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) AS j
  FROM inter
)
SELECT source, doc_a, doc_b, round(j, 4) AS jaccard, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY j DESC, doc_a ASC, doc_b ASC) AS INTEGER) AS rank
  FROM pairs
)
WHERE rank <= 5
"""

SIMHASH_HAMMING_T = 8
SIMHASH_BITS = 60  # 15 hex chars of md5 — portable to the oracle
SIMHASH_CHUNKS = 4  # 4 × 15-bit pigeonhole blocking


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs.

    Build: majority-vote each of the 60 bits over the doc's term
    hashes, OR the winning bits into a long. Blocking: pigeonhole
    on 4×15-bit chunks; candidates are verified with
    bit_count(xor). Everything is JVM built-ins.

    Term hash = first 15 md5 hex chars (60 bits), not xxhash64: a
    pure function both engines compute identically, which makes the
    sketch exactly oracle-able (same trick as dedup_minhash_lsh);
    recall on planted dups is additionally asserted in tests.

    Two plan-shape choices that matter at 100 TB:

    - LANE-PACKED votes: the 60 per-bit set-counts ride in 15 sum
      columns of 4×16-bit lanes (a lane overflows only past 65k
      occurrences of one term in one doc). bit b is set iff
      2·S1_b > T (T = doc token count) — algebraically identical
      to the ±1 majority vote, and to the oracle's ±tf sums, but
      the aggregate is 16 longs wide instead of 60, map-side
      combined before the one shuffle on doc_id.
    - FIRST-MATCH-CHUNK dedup: a pair colliding on several chunks
      is emitted only from its lowest matching chunk (earlier-chunk
      inequality is recomputed from the two sketches in the join
      filter), so no trailing ``distinct()`` shuffle is needed.

    No input repartition: the per-split map work (md5 + pack) is
    ~50 ms per 128 MB split, so ``expand_parallelism``'s widen
    shuffle costs more than it buys here — at real scale the scan
    arrives pre-split.
    """
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("w")).withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    )
    lanes = [
        F.expr(
            " + ".join(f"(((h >> {4 * g + i}) & 1) << {16 * i})" for i in range(4))
        ).alias(f"p{g}")
        for g in range(SIMHASH_BITS // 4)
    ]
    agg = toks.select("doc_id", *lanes).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("T"),
        *[F.sum(f"p{g}").alias(f"p{g}") for g in range(SIMHASH_BITS // 4)],
    )
    # r16: the 60-bit OR is ONE F.expr string — the previous
    # when/otherwise fold was ~5 py4j round-trips per bit of driver
    # time per plan build; the SQL is the identical expression.
    sim = agg.select(
        "doc_id",
        F.expr(
            "CAST(0 AS BIGINT) + "
            + " + ".join(
                f"(CASE WHEN 2 * ((p{b // 4} >> {16 * (b % 4)}) & 65535) > T"
                f" THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
                for b in range(SIMHASH_BITS)
            )
        ).alias("simhash"),
    )
    chunked = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_CHUNKS - 1))).alias("chunk"),
    ).withColumn("chunk_val", F.expr("shiftright(simhash, chunk * 15) & 32767"))
    a = chunked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "chunk_val"
    )
    b = chunked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "chunk_val"
    )
    first_match = " AND ".join(
        f"(chunk <= {c} OR (shiftright(sh_a, {15 * c}) & 32767)"
        f" != (shiftright(sh_b, {15 * c}) & 32767))"
        for c in range(SIMHASH_CHUNKS - 1)
    )
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.expr(first_match))
        .select("doc_a", "doc_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_T)
    )


DEDUP_SIMHASH_SQL = rf"""
WITH tf AS (
  SELECT doc_id, w, count(*) AS cnt,
         CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
  GROUP BY doc_id, w
), bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN cnt ELSE -cnt END) AS v
  FROM tf CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) b
  GROUP BY doc_id, b.bit
), sim AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS simhash
  FROM bits GROUP BY doc_id
), chunked AS (
  SELECT doc_id, simhash, c.chunk, (simhash >> (c.chunk * 15)) & 32767 AS chunk_val
  FROM sim CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_CHUNKS - 1})) AS chunk) c
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_T}
""" + "".join(
    f"  AND (a.chunk <= {c} OR ((a.simhash >> {15 * c}) & 32767)"
    f" != ((b.simhash >> {15 * c}) & 32767))\n"
    for c in range(SIMHASH_CHUNKS - 1)
)


EMB_DUP_THRESHOLD = 0.35
EMB_BANDS = 16
# Verify-join build-side ceiling: broadcast the materialized vector
# table while its MEASURED row count stays under this (≈300 MB of
# (id, 64-double vector, norm) rows against the 8 GB driver);
# beyond it the verify joins take the shuffled-hash path. See
# dedup_embedding for the measured rationale.
EMB_BROADCAST_MAX_VECS = 500_000
EMB_PLANES_PER_BAND = 8
EMB_DIM = 64


def _emb_planes() -> list[list[float]]:
    """EMB_BANDS × EMB_PLANES_PER_BAND deterministic ±1 hyperplanes
    (md5-derived, same generator as operators/similarity.py) —
    band k owns planes [k·b, (k+1)·b)."""
    from etl_gov_spark.operators.similarity import _hyperplanes

    return _hyperplanes(EMB_BANDS * EMB_PLANES_PER_BAND, EMB_DIM)


def _emb_band_patterns(v: str | Column) -> Column:
    """Per-band sign patterns: element k is the b sign bits of
    dot(v, plane) for band k's planes. The dot is quantized to 6 dp
    before the sign test so Spark and DuckDB never disagree at an FP
    boundary. Split out from the mask expansion so each plane dot is
    evaluated ONCE per vector — the fused expression re-evaluated
    every band's 8 HOF dot-folds under each of its 8 masks (1024
    folds/vector instead of 64; no CSE across higher-order
    functions), a measured 8× slowdown of the banding stage."""
    # NOTE r16: "flattening" these dots into element_at chains was
    # measured SLOWER (here 4×, and 1.7× for the single verify-join
    # dot): the giant projection blows past codegen method limits,
    # the stage falls back to the interpreted evaluator, and a
    # many-node interpreted tree loses to the interpreted fold's
    # single array traversal. HOF folds stay.
    # r16 OPTIMIZATION (guide §2.3, narrower types): patterns are
    # 8-bit INTEGERS (bit j = sign of plane k·b+j), not 8-char
    # strings. The bucket partition of vectors is identical under
    # this bijective re-encoding — same buckets ⇒ same candidate
    # pairs ⇒ same verified result — while the checkpointed pattern
    # payload shrinks ~12× (16 ints vs 16 strings) and the mask-key
    # expansion becomes two integer ops instead of concat+substring.
    col = F.col(v) if isinstance(v, str) else v
    planes = _emb_planes()
    b = EMB_PLANES_PER_BAND
    pats = []
    for k in range(EMB_BANDS):
        bits = [
            F.when(
                F.round(
                    F.aggregate(
                        F.zip_with(col, F.array(*[F.lit(x) for x in plane]), lambda p, q: p * q),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                )
                >= 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j, plane in enumerate(planes[k * b : (k + 1) * b])
        ]
        pat = bits[0]
        for bit in bits[1:]:
            pat = pat + bit
        pats.append(pat.cast("int"))
    return F.array(*pats)


def _emb_mask_keys(pats: str | Column) -> Column:
    """Masked sign-LSH blocking keys from precomputed band patterns:
    per band, each bit position masked in turn — two vectors share a
    key iff some band's sign patterns differ in ≤1 bit (multi-probe
    recall without a second table).

    r16: keys are INTS — ((band·b + i) << 8) | (pattern with bit i
    cleared) — not `"k:i:"`-prefixed masked strings. Same key-sharing
    relation (equal on all bits except possibly i, within band k), so
    the candidate set is unchanged; the banding explode + groupBy now
    shuffles a 4-byte int per key instead of a ~12-byte string, and
    key construction is bitwiseAND + add instead of concat+substring
    (guide §2.3: shuffle fewer bytes; measured: the banding stage
    drops ~2× at sf0.1)."""
    # r17 OPTIMIZATION (guide §1.1 — know where the time goes: this
    # was pure DRIVER time; same fix family as _recompute/_cent_lit):
    # the 128 masked keys used to be built as 128×3 py4j Column calls
    # — 0.58 s of driver round-trips per plan build, the largest
    # single gap in emb_dbscan's job timeline. ONE F.expr string
    # builds the identical expression tree JVM-side in ~1 ms.
    if not isinstance(pats, str):
        return _emb_mask_keys_cols(pats)
    b = EMB_PLANES_PER_BAND
    terms = []
    for k in range(EMB_BANDS):
        for i in range(b):
            mask = (1 << b) - 1 - (1 << i)
            terms.append(
                f"(element_at({pats}, {k + 1}) & {mask}) + {(k * b + i) << 8}"
            )
    return F.expr("array(" + ",".join(terms) + ")")


def _emb_mask_keys_cols(col: Column) -> Column:
    """Column-input variant of ``_emb_mask_keys`` (used only by the
    fused ``_emb_band_keys`` compatibility path, where the input is a
    derived expression, not a named column)."""
    b = EMB_PLANES_PER_BAND
    keys = []
    for k in range(EMB_BANDS):
        pat = F.element_at(col, k + 1)
        for i in range(b):
            keys.append(
                pat.bitwiseAND(F.lit((1 << b) - 1 - (1 << i)))
                + F.lit((k * b + i) << 8)
            )
    return F.array(*keys)


def _emb_band_keys(v: str | Column) -> Column:
    """Masked sign-LSH blocking keys straight from the vector —
    the fused composition, kept for API compatibility; hot paths
    materialize ``_emb_band_patterns`` first (see dedup_embedding)."""
    return _emb_mask_keys(_emb_band_patterns(v))


def _sign_tie_threshold() -> float:
    """Smallest double strictly greater than decimal -0.0000005.

    ``round(x, 6) >= 0`` (Spark HALF_UP BigDecimal semantics, and the
    DuckDB twin) is exactly ``x > -0.0000005`` as a DECIMAL
    comparison: -5e-7 has a factor 5⁶ in its reduced denominator, so
    no binary double ever equals the tie point and the half-up branch
    is unreachable. That makes the quantized sign test equal to one
    plain double comparison ``x >= T`` with T chosen on the correct
    side of the decimal tie — bit-for-bit the same bit pattern the
    fold + round path produces, at zero per-row rounding cost."""
    import math
    from decimal import Decimal

    t = -5e-7
    return t if Decimal(t) > Decimal("-0.0000005") else math.nextafter(t, 0.0)


_SIGN_TIE_T = _sign_tie_threshold()


def _with_patterns_and_norm(emb: DataFrame) -> DataFrame:
    """(vec_id, v) → (vec_id, v, n, pats): the per-vector norm and
    the 16 per-band sign-pattern ints, computed in ONE
    ``mapInArrow`` pass with NumPy instead of 128 interpreted
    higher-order-function folds per row (guide §4.2: Spark
    distributes, vectorized native code computes).

    Bit-exactness contract (what keeps the oracle replay identical):
    the plane dots and the squared norm accumulate dimension-by-
    dimension in index order — one elementwise multiply then one
    elementwise add per dimension, vectorized ACROSS rows — which is
    IEEE-identical to the sequential ``aggregate(zip_with(...))``
    fold it replaces (same ops, same order, float64 throughout; no
    FMA, no pairwise summation). The quantized sign test uses the
    exact tie-free threshold from ``_sign_tie_threshold``. Measured
    8.0 s → 0.4 s for the pattern stage at sf0.1 (2 000 × 128 dots);
    at scale the pass stays row-linear and ships only (vec_id, v).
    """
    import pyarrow as pa

    n_planes = EMB_BANDS * EMB_PLANES_PER_BAND
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.DoubleType()),
            T.StructField("pats", T.ArrayType(T.IntegerType())),
        ]
    )

    def compute(batches):
        import numpy as np

        S = np.array(_emb_planes(), dtype=np.float64).T  # (EMB_DIM, n_planes)
        thr = _SIGN_TIE_T
        b = EMB_PLANES_PER_BAND
        for batch in batches:
            vec_id = batch.column(0)
            v = batch.column(1)
            rows = batch.num_rows
            if rows == 0:
                continue
            offs = np.asarray(v.offsets)
            widths = np.diff(offs)
            assert v.null_count == 0 and (widths == EMB_DIM).all(), (
                "embedding column must be dense EMB_DIM-wide"
            )
            V = np.asarray(v.values, dtype=np.float64)[
                offs[0] : offs[-1]
            ].reshape(rows, EMB_DIM)
            acc = np.zeros((rows, n_planes))
            nrm = np.zeros(rows)
            for d in range(EMB_DIM):
                col = V[:, d]
                acc += col[:, None] * S[d]
                nrm += col * col
            nrm = np.sqrt(nrm)
            bits = acc >= thr
            # r16: 8-bit integer patterns (bit j = sign of band plane
            # j), matching _emb_band_patterns' int encoding — the
            # mask-key expansion downstream is pure integer algebra.
            weights = (1 << np.arange(b)).astype(np.int32)
            pat_vals = pa.array(
                (bits.reshape(rows * EMB_BANDS, b) @ weights).astype(np.int32)
            )
            pats = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (rows + 1) * EMB_BANDS, EMB_BANDS),
                    type=pa.int32(),
                ),
                pat_vals,
            )
            yield pa.RecordBatch.from_arrays(
                [vec_id, v, pa.array(nrm, type=pa.float64()), pats],
                ["vec_id", "v", "n", "pats"],
            )

    return emb.select("vec_id", "v").mapInArrow(compute, out_schema)


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, sign-LSH blocked: candidates
    are pairs whose sign patterns agree on ≥1 band up to one flipped
    bit; candidates are then verified with the exact cosine and kept
    at ≥ EMB_DUP_THRESHOLD.

    Scale: candidate generation is a band-key groupBy with
    bucket-local pair expansion (pair_structs) carrying vec_ids
    only, then two hash joins on vec_id fetch the vectors for the
    exact verify — no all-pairs crossJoin anywhere. The blocking is
    a pure function of the vector (md5-derived ±1 hyperplanes,
    quantized sign), so the DuckDB oracle replays the identical
    candidate set and the approximate algorithm is exactly
    oracle-able — same trick as dedup_minhash_lsh. Recall at the
    registered threshold is asserted against the exact pair set in
    tests; at a production near-dup threshold (≥0.9) the same
    banding is near-exhaustive (miss prob (1−p_band)^16 with
    p_band = P(≤1 of 8 sign flips) ≈ 0.7).
    """
    emb = _with_patterns_and_norm(
        expand_parallelism(Catalog(spark, sf_dir).embeddings).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    ).localCheckpoint(eager=True)
    # ^ one narrow row per vector (id, v, norm, 16 pattern ints):
    # materializing forces each plane dot to evaluate exactly once —
    # Catalyst's projection collapse would otherwise inline the
    # pattern into all 8 masks per band and re-run every HOF dot
    # fold per mask — and lets the verify joins reuse the same scan.
    # r16: the dots themselves moved from interpreted HOF folds to
    # the bit-exact NumPy pass in _with_patterns_and_norm (measured
    # 8.0 → 0.4 s for this stage at sf0.1; values unchanged).
    banded = emb.select("vec_id", F.explode(_emb_mask_keys("pats")).alias("bk"))
    buckets = bounded_buckets(
        banded.groupBy("bk")
        .agg(F.array_sort(F.collect_set("vec_id")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_BAND_BUCKET,
        "dedup_embedding",
        route="star",
    )
    # r16 OPTIMIZATION (guide §2.4): the candidate set is only
    # materialized on the SHUFFLE-JOIN path below (see the strategy
    # comment there — the eager checkpoint exists to hand the
    # planner exact stats so it never broadcasts the fat candidate
    # side). The broadcast regime streams `cand` straight into
    # mapInArrow — no join, no planner decision — so checkpointing
    # there paid a full materialize+re-read of the banding pipeline
    # for nothing: banding → distinct → verify now run as ONE job
    # (measured dedup_embedding 3.9 → 2.9 s at sf0.1).
    cand = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .select(F.col("p.a").alias("vec_a"), F.col("p.b").alias("vec_b"))
        .distinct()
    )
    # The pair dot stays an aggregate(zip_with(...)) fold — measured
    # r16 NOTE: "flattening" it into 128 element_at terms looked like
    # a codegen win but measured 1.7× SLOWER at the 80M-pair 10×
    # rung: the merged project+filter tree blows past the codegen
    # method limit, the whole stage falls back to the interpreted
    # evaluator, and a 500-node interpreted tree loses to the
    # interpreted fold's single array traversal. The fold is the
    # right per-pair shape; the pair MASS is what the LSH bucket
    # caps control.
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # Verify-join strategy from MEASURED cardinality (r16): neither
    # static choice survives both regimes. Broadcasting the vector
    # sides is optimal while they fit (map-only; the candidate mass
    # streams — candidates outnumber vectors whenever duplication is
    # dense, 80M pairs from 20k vectors at the 10× clone rung) but
    # OOMs once the corpus outgrows the driver; forcing shuffle_hash
    # is safe but re-shuffles the candidate×vector payload twice
    # (measured 196 s vs 135 s at that same rung). And the planner
    # can't be left to decide: localCheckpoint carries the child
    # plan's ESTIMATE, not measured size, and it chose to broadcast
    # the multi-GB candidate set (8 GB broadcast OOM). emb is already
    # materialized, so its EXACT count is one cheap job — broadcast
    # the vector sides while they're genuinely small, shuffle-hash
    # (which also forbids the cand broadcast) beyond that. At 100 TB
    # the vector table is fact-grain and always takes the shuffled
    # path; LSH bucket caps keep the pair mass linear either way.
    if emb.count() <= EMB_BROADCAST_MAX_VECS:
        # r16 OPTIMIZATION (guide §8: decide with small rows, move
        # big rows once): in the broadcast regime the vector table is
        # driver-scale BY DEFINITION, so instead of broadcasting it
        # twice as a JVM build side and folding the 64-dim dot per
        # candidate in the interpreted evaluator, broadcast the
        # (ids, vectors, norms) matrix ONCE to the Python workers and
        # stream only the 16-byte id pairs through mapInArrow — the
        # per-pair dot becomes a vectorized NumPy gather+accumulate.
        # Bit-exactness: the dot accumulates dimension-by-dimension
        # in index order (one mul + one add per dim, float64, no FMA)
        # — IEEE-identical to the aggregate(zip_with) fold; the ≥τ
        # filter has no representable tie (0.35 is not dyadic); and
        # the 4-dp readout floor(y+0.5) equals BigDecimal HALF_UP for
        # the positive, |y| < 2^51 values that survive the filter
        # (y+0.5 is exact there). Measured: verify stage ~2.5 → 0.6 s
        # at sf0.1 (882k pairs from 2 000 vectors).
        import numpy as np
        import pyarrow as pa

        rows = emb.select("vec_id", "v", "n").collect()
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        vmat = np.array([rows[i].v for i in order], dtype=np.float64)
        nrm = np.array([rows[i].n for i in order], dtype=np.float64)
        bc = spark.sparkContext.broadcast((ids_sorted, vmat, nrm))

        def pair_cos(batches):
            ids_s, V, N = bc.value
            dim = V.shape[1]
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                va_id = np.asarray(batch.column(0), dtype=np.int64)
                vb_id = np.asarray(batch.column(1), dtype=np.int64)
                ia = np.searchsorted(ids_s, va_id)
                ib = np.searchsorted(ids_s, vb_id)
                A, B = V[ia], V[ib]
                acc = np.zeros(len(ia))
                for d in range(dim):
                    acc += A[:, d] * B[:, d]
                cos = acc / (N[ia] * N[ib])
                keep = cos >= EMB_DUP_THRESHOLD
                cos_k = np.floor(cos[keep] * 10000.0 + 0.5) / 10000.0
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(va_id[keep], type=pa.int64()),
                        pa.array(vb_id[keep], type=pa.int64()),
                        pa.array(cos_k, type=pa.float64()),
                    ],
                    ["vec_a", "vec_b", "cosine"],
                )

        return cand.mapInArrow(
            pair_cos,
            T.StructType(
                [
                    T.StructField("vec_a", T.LongType()),
                    T.StructField("vec_b", T.LongType()),
                    T.StructField("cosine", T.DoubleType()),
                ]
            ),
        )
    # Beyond the broadcast ceiling the vector table is fact-grain:
    # keep the scale-safe shuffled-hash joins + JVM fold (shipping
    # the pair×vector payload through Python would move every byte
    # across the boundary twice for no algorithmic gain).
    # Materialize the candidate set before the verify joins: it is
    # BOUNDED by the banding design (≤ |buckets|·cap² id pairs, two
    # longs each), and without the checkpoint Spark's planner saw an
    # unknown-size subplan and chose to BROADCAST the fat candidate
    # side — serializing the whole LSH pipeline through the
    # single-threaded broadcast-relation build (26 s warm where the
    # parallel pipeline is ~12 s). With known stats the verify
    # never picks the candidate side as a build relation.
    cand = cand.localCheckpoint(eager=True)
    a, b = a.hint("shuffle_hash"), b.hint("shuffle_hash")
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", (dot / (F.col("na") * F.col("nb"))).alias("_cos"))
        .filter(F.col("_cos") >= EMB_DUP_THRESHOLD)
        .select("vec_a", "vec_b", _R4(F.col("_cos"), "cosine"))
    )


def _emb_sql_band_keys() -> str:
    """DuckDB twin of _emb_band_keys: one masked-key list literal
    expression over the same plane literals and the same quantized
    sign test."""
    b = EMB_PLANES_PER_BAND
    planes = _emb_planes()
    band_pats = []
    for k in range(EMB_BANDS):
        bits = []
        for plane in planes[k * b : (k + 1) * b]:
            lit = "[" + ",".join(str(x) for x in plane) + "]"
            bits.append(
                f"(CASE WHEN round(list_dot_product(v, {lit}), 6) >= 0 THEN '1' ELSE '0' END)"
            )
        band_pats.append(" || ".join(bits))
    masks = []
    for k, pat in enumerate(band_pats):
        for i in range(b):
            masks.append(
                f"'{k}:{i}:' || substr({pat}, 1, {i}) || '_' || substr({pat}, {i + 2}, {b - i - 1})"
            )
    return "[" + ", ".join(masks) + "]"


DEDUP_EMBEDDING_SQL = f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), banded AS (
  SELECT vec_id, unnest({_emb_sql_band_keys()}) AS bk FROM vecs
), bd AS (
  SELECT DISTINCT vec_id, bk FROM banded
), keep AS (  -- MAX_BAND_BUCKET hot-bucket ceiling, mirrored
  SELECT bk FROM bd GROUP BY bk HAVING count(*) <= {MAX_BAND_BUCKET}
), hot AS (  -- star route: over-cap buckets pair hub (min vec) vs members
  SELECT bk, min(vec_id) AS hub FROM bd GROUP BY bk HAVING count(*) > {MAX_BAND_BUCKET}
), cand AS (
  SELECT DISTINCT vec_a, vec_b FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bd a JOIN bd b USING (bk)
    WHERE a.vec_id < b.vec_id AND bk IN (SELECT bk FROM keep)
    UNION ALL
    SELECT h.hub AS vec_a, b.vec_id AS vec_b
    FROM hot h JOIN bd b ON b.bk = h.bk AND b.vec_id <> h.hub
  )
)
SELECT vec_a, vec_b,
       round(list_cosine_similarity(va.v, vb.v), 4) AS cosine
FROM cand
JOIN vecs va ON va.vec_id = vec_a
JOIN vecs vb ON vb.vec_id = vec_b
WHERE list_cosine_similarity(va.v, vb.v) >= {EMB_DUP_THRESHOLD}
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs: |A∩B| / min(|A|,|B|)
    — catches sub-document duplication (one doc embedded in a
    bigger one) that symmetric Jaccard dilutes away. Same inverted-
    index + bucket-local pair expansion as ngram Jaccard (one
    shuffle on the shingle key, Σ df² pair work), reported top-5
    per source by containment."""
    docs = shingled_docs(
        Catalog(spark, sf_dir).documents, "doc_id", "source", distinct=True
    )
    index = docs.select(
        "source",
        F.struct("doc_id", F.size("sh").alias("n")).alias("dn"),
        F.explode("sh").alias("s"),
    )
    buckets = bounded_buckets(
        index.groupBy("source", "s")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_containment",
    )
    inter = (
        buckets.select("source", F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            "source",
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    pairs = inter.select(
        "source",
        "doc_a",
        "doc_b",
        (F.col("n_inter") / F.least("n_a", "n_b")).alias("_c"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("_c"), F.asc("doc_a"), F.asc("doc_b")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "doc_a", "doc_b", _R4(F.col("_c"), "containment"), "rank")
    )


DEDUP_CONTAINMENT_SQL = rf"""
WITH sh AS (
  SELECT doc_id, source, list_distinct({{shingles}}) AS sh
  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), idx AS (
  SELECT doc_id, source, len(sh) AS n, unnest(sh) AS s FROM sh
), keep AS (  -- MAX_SHINGLE_DF hot-shingle ceiling, mirrored
  SELECT source, s FROM idx GROUP BY source, s
  HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
), inter AS (
  SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n AS n_a, b.n AS n_b, count(*) AS n_inter
  FROM idx a JOIN idx b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
  JOIN keep k ON k.source = a.source AND k.s = a.s
  GROUP BY 1, 2, 3, 4, 5
), pairs AS (
  SELECT source, doc_a, doc_b,
         n_inter / CAST(least(n_a, n_b) AS DOUBLE) AS c
  FROM inter
)
SELECT source, doc_a, doc_b, round(c, 4) AS containment, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY c DESC, doc_a ASC, doc_b ASC) AS INTEGER) AS rank
  FROM pairs
)
WHERE rank <= 5
""".replace("{shingles}", _SQL_SHINGLES)


QUERIES: dict[str, tuple] = {
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_embedding": (dedup_embedding, DEDUP_EMBEDDING_SQL),
}


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the minhash approximation itself: for
    every candidate pair the LSH pipeline emits, compare the
    8-hash signature agreement (the ESTIMATE the dedup decision
    runs on) against the exact shingle Jaccard, grouped by
    agreement level — n_pairs, mean true Jaccard, mean absolute
    error. This is how you justify N_HASHES/N_BANDS to an auditor:
    E[agreement] = true Jaccard, and this table shows the bias and
    spread the 8-hash estimator actually delivers on this corpus.

    Cost tracks the LSH output (bounded by the banding + hot-bucket
    ceilings), never corpus² — exact Jaccard is only computed for
    pairs the pipeline already surfaced.
    """
    cand = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "sig_agreement")
    sh = shingled_docs(
        Catalog(spark, sf_dir).documents.select("doc_id", "text"),
        "doc_id",
        distinct=True,
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("sig_agreement", F.round(jac, 6).alias("jac"))
    )
    return scored.groupBy("sig_agreement").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        _R4(F.avg("jac"), "avg_true_jaccard"),
        _R4(F.avg(F.abs(F.col("sig_agreement") - F.col("jac"))), "mae"),
    )


DEDUP_MINHASH_CALIBRATION_SQL = rf"""
WITH cand AS ({DEDUP_MINHASH_SQL}),
sh AS (
  SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS sh
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
), scored AS (
  SELECT c.sig_agreement,
         round(len(list_intersect(a.sh, b.sh))
               / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 6) AS jac
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
)
SELECT sig_agreement, count(*) AS n_pairs,
       round(avg(jac), 4) AS avg_true_jaccard,
       round(avg(abs(sig_agreement - jac)), 4) AS mae
FROM scored GROUP BY sig_agreement
"""

QUERIES["dedup_minhash_calibration"] = (
    dedup_minhash_calibration,
    DEDUP_MINHASH_CALIBRATION_SQL,
)


_SWEEP_THRESHOLDS = (0.1, 0.2, 0.3, 0.5)


def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold tuning: how many verified near-dup pairs
    survive each candidate Jaccard cutoff — one pass over the SAME
    inverted-index candidate set the production dedup uses, with
    the cutoffs as conditional counts, so the sweep costs one run,
    not |thresholds| runs.

    The number that matters is the marginal drop between cutoffs:
    a cliff means a natural similarity gap (pick the cutoff there);
    a smooth slide means the corpus has no clean dup boundary.
    """
    from etl_gov_spark.operators.graphs import JACCARD_T  # noqa: F401

    docs = Catalog(spark, sf_dir).documents
    sh = shingled_docs(docs, "doc_id", distinct=True)
    index = sh.select(
        F.struct("doc_id", F.size("sh").alias("n")).alias("dn"),
        F.explode("sh").alias("s"),
    )
    buckets = bounded_buckets(
        index.groupBy("s")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "threshold_sweep",
        route="star",
    )
    pairs = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("a"),
            F.col("p.a.n").alias("na"),
            F.col("p.b.doc_id").alias("b"),
            F.col("p.b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("ni"))
        .select(
            (
                F.col("ni")
                / (F.col("na") + F.col("nb") - F.col("ni"))
            ).alias("j")
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_candidates")]
    for t in _SWEEP_THRESHOLDS:
        tag = str(t).replace(".", "")
        aggs.append(
            F.sum((F.col("j") >= t).cast("long")).alias(f"pairs_ge_{tag}")
        )
    return pairs.agg(*aggs)


def _threshold_sweep_sql() -> str:
    head = _SQL_EDGE_PAIRS.split("), pairs AS (")[0] + ")"
    cols = ", ".join(
        f"CAST(sum(CASE WHEN n_inter / CAST(n_a + n_b - n_inter AS DOUBLE)"
        f" >= {t} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS pairs_ge_{str(t).replace('.', '')}"
        for t in _SWEEP_THRESHOLDS
    )
    return f"""
WITH {head}
SELECT count(*) AS n_candidates, {cols}
FROM inter
"""


QUERIES["dedup_threshold_sensitivity"] = (
    dedup_threshold_sensitivity,
    _threshold_sweep_sql(),
)


def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding RECALL audit, the missing half of
    ``dedup_minhash_calibration`` (which only sees pairs the LSH
    DID emit): against the exact inverted-index Jaccard pairs (the
    same df-capped machinery the near-dup edge builder runs — the
    ground truth), what fraction of truly-similar pairs does the
    4-band/2-hash signature banding surface as candidates, reported
    per similarity band? This is the empirical S-curve: recall must
    climb toward 1 as true Jaccard rises, and a future change to
    N_BANDS/N_HASHES/shingling shows up here as a dropped band
    before it silently under-deduplicates a corpus.

    Truth pairs come from one bucket-local pair expansion (Σ df²
    per shingle, star-routed over the cap); LSH candidates are the
    banding pipeline's own output; the comparison is one join on
    the pair key. Nothing is corpus².
    """
    sh = shingled_docs(
        Catalog(spark, sf_dir).documents.select("doc_id", "text"),
        "doc_id",
        distinct=True,
    )
    index = sh.select(
        F.struct("doc_id", F.size("sh").alias("n")).alias("dn"),
        F.explode("sh").alias("s"),
    )
    buckets = bounded_buckets(
        index.groupBy("s")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_lsh_recall",
        route="star",
    )
    inter = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    truth = inter.select(
        "doc_a",
        "doc_b",
        F.when(jac >= 0.7, "0.7-1.0")
        .when(jac >= 0.5, "0.5-0.7")
        .when(jac >= 0.3, "0.3-0.5")
        .alias("band"),
    ).filter(F.col("band").isNotNull())
    cands = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("_hit")
    )
    return (
        truth.join(cands, ["doc_a", "doc_b"], "left")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum(F.coalesce("_hit", F.lit(0)))
            .cast("bigint")
            .alias("n_captured"),
            F.round(
                F.sum(F.coalesce("_hit", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("recall"),
        )
        .orderBy("band")
    )


# SQL: truth = the shared edge-pair inverted index kept up to the
# `inter` stage (same split trick as _threshold_sweep_sql); LSH
# candidates = the minhash oracle's own CTE chain up to `cand`.
_LSH_CAND_HEAD = DEDUP_MINHASH_SQL.split("\nSELECT doc_a, doc_b,")[0].strip()
_TRUTH_HEAD = _SQL_EDGE_PAIRS.split("), pairs AS (")[0] + ")"

DEDUP_LSH_RECALL_SQL = rf"""
{_LSH_CAND_HEAD}, {_TRUTH_HEAD}, truth AS (
  SELECT doc_a, doc_b,
         CASE WHEN n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.7 THEN '0.7-1.0'
              WHEN n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.5 THEN '0.5-0.7'
              WHEN n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.3 THEN '0.3-0.5'
         END AS band
  FROM inter
  WHERE n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.3
), cands AS (
  SELECT DISTINCT doc_a, doc_b FROM cand
)
SELECT t.band, CAST(count(*) AS BIGINT) AS n_true_pairs,
       CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_captured,
       round(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS recall
FROM truth t LEFT JOIN cands c USING (doc_a, doc_b)
GROUP BY t.band ORDER BY t.band
"""

QUERIES["dedup_lsh_recall"] = (dedup_lsh_recall, DEDUP_LSH_RECALL_SQL)


def dedup_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding PRECISION audit, closing the loop that
    ``dedup_lsh_recall`` opened: of the candidate pairs the banding
    DID emit, how many are truly similar (exact inverted-index
    Jaccard), bucketed by signature agreement? High-agreement
    candidates should be overwhelmingly true (else the signatures
    are broken); the low-agreement bucket quantifies the wasted
    verify work — the cost knob N_BANDS trades against recall.
    Together the two audits are the empirical precision/recall
    curve of the approximation layer.

    Candidates come from the banding pipeline; each is verified
    with exact Jaccard through the same shingle contraction used
    corpus-wide (cost bounded by the candidate count, never n²).
    """
    cand = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", "sig_agreement"
    )
    sh = shingled_docs(
        Catalog(spark, sf_dir).documents.select("doc_id", "text"),
        "doc_id",
        distinct=True,
    )
    index = sh.select(
        F.struct("doc_id", F.size("sh").alias("n")).alias("dn"),
        F.explode("sh").alias("s"),
    )
    buckets = bounded_buckets(
        index.groupBy("s")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_lsh_precision",
        route="star",
    )
    inter = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = (
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )
    truth = inter.select("doc_a", "doc_b", jac.alias("j"))
    agree_band = (
        F.when(F.col("sig_agreement") >= 0.75, "agree_hi")
        .when(F.col("sig_agreement") >= 0.375, "agree_mid")
        .otherwise("agree_lo")
    )
    return (
        cand.join(truth, ["doc_a", "doc_b"], "left")
        .select(
            agree_band.alias("band"),
            F.coalesce("j", F.lit(0.0)).alias("j"),  # no shared shingle
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("j") >= 0.3).cast("long")).alias("n_true"),
            F.round(
                F.sum((F.col("j") >= 0.3).cast("double")) / F.count(F.lit(1)),
                4,
            ).alias("precision"),
            F.round(F.avg("j"), 4).alias("mean_jaccard"),
        )
        .orderBy("band")
    )


DEDUP_LSH_PRECISION_SQL = rf"""
{_LSH_CAND_HEAD}, cands AS (
  SELECT doc_a, doc_b,
         list_sum(list_transform(generate_series(1, 8),
             j -> CASE WHEN sig_a[j] = sig_b[j] THEN 1 ELSE 0 END)) / 8.0
           AS sig_agreement
  FROM cand GROUP BY doc_a, doc_b, sig_a, sig_b
), {_TRUTH_HEAD}, truth AS (
  SELECT doc_a, doc_b,
         n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) AS j
  FROM inter
)
SELECT CASE WHEN c.sig_agreement >= 0.75 THEN 'agree_hi'
            WHEN c.sig_agreement >= 0.375 THEN 'agree_mid'
            ELSE 'agree_lo' END AS band,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN coalesce(t.j, 0.0) >= 0.3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true,
       round(sum(CASE WHEN coalesce(t.j, 0.0) >= 0.3 THEN 1.0 ELSE 0.0 END)
             / count(*), 4) AS precision,
       round(avg(coalesce(t.j, 0.0)), 4) AS mean_jaccard
FROM cands c LEFT JOIN truth t USING (doc_a, doc_b)
GROUP BY 1 ORDER BY 1
"""

QUERIES["dedup_lsh_precision"] = (dedup_lsh_precision, DEDUP_LSH_PRECISION_SQL)


def _banded_fingerprints(docs: DataFrame) -> DataFrame:
    """(band_key, doc_id, sig) rows — the fingerprint-store layout:
    one row per (doc × band), sig carried for agreement scoring.
    Exactly dedup_minhash_lsh's banding, factored so the incremental
    path fingerprints a batch with the identical function."""
    sig = minhash_signature_flat(docs)
    band_cols = [
        F.concat(
            F.lit(f"{b}:"), F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")
        ).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{j}") for j in range(N_HASHES)]).alias("sig"),
        F.explode(F.array(*band_cols)).alias("band_key"),
    ).select("band_key", "doc_id", "sig")


def _band_key_envelope_aggs() -> list:
    """PER-BAND min/max aggregates of ``band_key`` — observed on a
    fingerprint materialization job (guide §1.5) so store-file pruning
    needs no probe job of its own. Per-band (not global) envelopes
    because every batch holds keys in every band: a global [min, max]
    would span the whole keyspace, while each band's interval stays as
    narrow as that band's actual hash spread. Consumed by
    io/cow.envelope_touched_files."""
    aggs = []
    for b in range(N_BANDS):
        pred = F.col("band_key").startswith(f"{b}:")
        aggs.append(F.min(F.when(pred, F.col("band_key"))).alias(f"mn{b}"))
        aggs.append(F.max(F.when(pred, F.col("band_key"))).alias(f"mx{b}"))
    return aggs


def _band_pair_ledger(fps: DataFrame, op: str, require_new: bool) -> DataFrame:
    """Bucket-local pair expansion over banded fingerprints →
    (doc_a, doc_b, n_shared_bands, sig_agreement). With
    ``require_new`` only pairs touching at least one ``is_new`` row
    survive (the incremental pass: old×old pairs were ledgered when
    the old batch was ingested) and old-only buckets are skipped
    before any expansion."""
    dn = F.struct("doc_id", "sig", *(["is_new"] if require_new else [])).alias("dn")
    buckets = fps.select(dn, "band_key").groupBy("band_key").agg(
        F.array_sort(F.collect_list("dn")).alias("ds")
    ).filter(F.size("ds") > 1)
    if require_new:
        buckets = buckets.filter(
            F.exists("ds", lambda x: x["is_new"])
        )
    buckets = bounded_buckets(buckets, "ds", MAX_BAND_BUCKET, op, route="star")
    pairs = buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
    if require_new:
        pairs = pairs.filter(F.col("p.a.is_new") | F.col("p.b.is_new"))
    pairs = pairs.select(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.b.doc_id").alias("doc_b"),
        F.col("p.a.sig").alias("sig_a"),
        F.col("p.b.sig").alias("sig_b"),
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_bands"),
            F.first(agree).alias("_agree"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            _R4(F.col("_agree") / F.lit(N_HASHES), "sig_agreement"),
        )
    )


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-batch MinHash/LSH dedup against a PERSISTED
    fingerprint store — the operator a 100 TB ingest pipeline runs
    nightly instead of re-deduping the whole corpus:

    epoch 1 (historical, doc_id % 3 != 0): fingerprints are banded
      (_banded_fingerprints), written RANGE-CLUSTERED on band_key
      (io/sinks.write_range_clustered → each store file covers a
      disjoint key range), and the epoch's internal dup pairs are
      ledgered.
    epoch 2 (tonight's batch, doc_id % 3 == 0): the new batch's band
      keys PROBE the store through parquet footer stats
      (io/cow.file_key_ranges × the batch's observed band_key
      envelope — metadata-only: only
      files whose key range intersects the batch's range are opened,
      and the exact leftsemi key probe drops rows from range-only
      false positives; a
      narrow batch against a wide store reads a handful of files,
      asserted in tests), new pairs (new×old ∪ new×new) are
      ledgered, and the batch's fingerprints are appended to the
      store (explicit-path reads make the append safe before the
      ledger materializes).

    The store keeps EVERY ingested fingerprint — that is what makes
    incremental ≡ full for any number of epochs (pruning dup docs
    from the store is a keep-policy choice that belongs downstream,
    see dedup_keep_policy, and would miss transitive dups). Oracle =
    the full-corpus DEDUP_MINHASH_SQL verbatim: ledger(epoch1) ∪
    ledger(epoch2) must equal one-shot dedup_minhash_lsh exactly
    (guaranteed whenever band buckets stay under MAX_BAND_BUCKET —
    the star reroute sees per-epoch bucket sizes; measured max at
    sf0.1 is 54).
    """
    import os

    from etl_gov_spark.io.cow import envelope_touched_files, file_key_ranges
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)

    store = os.path.join(scratch_dir("fpstore"), "store")
    # r16 OPTIMIZATION (guide §2.4): fp1 feeds BOTH the clustered
    # store write and the epoch-1 ledger; without the checkpoint the
    # ledger job re-ran the whole historical minhash pipeline. The
    # store write materializes the (bounded: one row per banded
    # fingerprint) checkpoint, the ledger reuses it.
    fp1 = _banded_fingerprints(hist).localCheckpoint(eager=False)
    # r16 OPTIMIZATION (guide §2.6): tonight's batch fingerprinting
    # is independent of the historical store write — overlap the two
    # jobs (the store write materializes the lazy fp1 checkpoint;
    # fp2's eager checkpoint runs on the idle cores of its tail).
    from concurrent.futures import ThreadPoolExecutor

    # r17 OPTIMIZATION (guide §1.5 observe / §2.4; same fold as
    # stream_dedup_gate): the store-probe job below used to be its
    # own Spark job (fp2 keys × broadcast ranges + distinct +
    # collect). The batch's band_key envelope is OBSERVED on fp2's
    # checkpoint job and files are pruned driver-side against the
    # same footer stats; the exact leftsemi key probe drops any rows
    # a range-only false positive contributes, so the ledger is
    # bit-identical. One sequential job removed.
    from pyspark.sql import Observation

    obs = Observation()

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_store = pool.submit(
            write_range_clustered, fp1, store, ("band_key",), num_files=16
        )
        f_fp2 = pool.submit(
            lambda: _banded_fingerprints(new)
            .observe(obs, *_band_key_envelope_aggs())
            .localCheckpoint(eager=True)
        )
        f_store.result()
        fp2 = f_fp2.result()
    ledger1 = _band_pair_ledger(
        fp1.withColumn("is_new", F.lit(False)),
        "dedup_incremental_epoch1",
        require_new=False,
    )

    ranges = file_key_ranges(store, "band_key")
    m = obs.get
    touched = envelope_touched_files(
        ranges, [(m[f"mn{b}"], m[f"mx{b}"]) for b in range(N_BANDS)]
    )
    if touched:
        base = (
            spark.read.parquet(*touched)  # explicit paths: append-safe
            .join(
                F.broadcast(fp2.select("band_key").distinct()),
                "band_key",
                "leftsemi",
            )
            .withColumn("is_new", F.lit(False))
        )
        probe = base.unionByName(fp2.withColumn("is_new", F.lit(True)))
    else:
        probe = fp2.withColumn("is_new", F.lit(True))
    ledger2 = _band_pair_ledger(probe, "dedup_incremental_epoch2", require_new=True)

    # append tonight's fingerprints: the store now holds the full
    # corpus history, range-clustered per write generation
    write_range_clustered(fp2, store, ("band_key",), num_files=4, mode="append")
    return ledger1.unionByName(ledger2)


QUERIES["dedup_incremental_minhash"] = (dedup_incremental_minhash, DEDUP_MINHASH_SQL)


# ---------------------------------------------------------------------------
# Exact substring-duplication census (round 11; Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

SUBSTR_K = 8  # base token k-gram; runs shorter than this are invisible


def dedup_substring_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplication census (the
    "Deduplicating Training Data Makes Language Models Better"
    suffix-array shape, Lee et al. 2022, re-expressed relationally):
    per cross-doc pair, the LONGEST exactly-duplicated token run,
    found by sorted k-gram extension — a shared run of L tokens is a
    chain of L−K+1 shared K-grams on one (doc_a,doc_b) alignment
    diagonal, so longest = K + max chain − 1. Feeds
    ``dedup_keep_policy`` an executable purge column (keep-min-id).

    Scale: positional K-grams hash to md5 keys (narrow rows), the
    inverted index is df-capped at MAX_SHINGLE_DF occurrences (an
    over-cap gram is boilerplate carrying no pair signal — the
    standard guard, same ceiling as every shingle op here), and
    pairs expand BUCKET-locally via pair_structs — Σ df² per gram,
    never corpus². Chain detection is the islands trick on a window
    PARTITIONED by (pair, diagonal) — bucket-local state, no global
    sort anywhere. A 100 TB corpus shards on the uniform gram key.
    """
    toks = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("doc_id", tokens_col().alias("toks"))
        .filter(F.size("toks") >= SUBSTR_K)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - SUBSTR_K + 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.array_join(F.slice("toks", i, SUBSTR_K), " ")
                    ).alias("g"),
                ),
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    buckets = bounded_buckets(
        grams.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "pos"))).alias("ds"))
        .filter(F.size("ds") > 1),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_substring_census",
    )
    m = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .filter(F.col("p.a.doc_id") < F.col("p.b.doc_id"))
        .select(
            F.col("p.a.doc_id").alias("da"),
            F.col("p.b.doc_id").alias("db"),
            F.col("p.a.pos").alias("pa"),
            F.col("p.b.pos").alias("pb"),
        )
    )
    w = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy("pa")
    runs = m.select(
        "da",
        "db",
        (F.col("pa") - F.col("pb")).alias("diag"),
        "pa",
        (F.col("pa") - F.row_number().over(w)).alias("isl"),
    )
    islands = runs.groupBy("da", "db", "diag", "isl").agg(
        F.count(F.lit(1)).alias("chain")
    )
    return (
        islands.groupBy("da", "db")
        .agg(
            (F.max("chain") + SUBSTR_K - 1).cast("int").alias("longest_run_tokens"),
            F.countDistinct("diag").cast("int").alias("n_diagonals"),
            F.count(F.lit(1)).cast("int").alias("n_islands"),
            F.sum("chain").alias("n_shared_grams"),
        )
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "longest_run_tokens",
            "n_diagonals",
            "n_islands",
            "n_shared_grams",
            F.col("db").alias("purge_candidate"),  # keep-min-id policy
        )
        .orderBy(F.desc("longest_run_tokens"), "doc_a", "doc_b")
    )


DEDUP_SUBSTRING_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
), grams0 AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {SUBSTR_K} + 1),
                        i -> struct_pack(pos := i,
                                         g := md5(array_to_string(toks[i:i+{SUBSTR_K - 1}], ' ')))) AS gl
  FROM toks WHERE len(toks) >= {SUBSTR_K}
), grams AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (SELECT doc_id, unnest(gl) AS u FROM grams0)
), keep AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
), m AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b USING (g) JOIN keep USING (g)
  WHERE a.doc_id < b.doc_id
), runs AS (
  SELECT da, db, pa - pb AS diag, pa,
         pa - row_number() OVER (PARTITION BY da, db, pa - pb ORDER BY pa) AS isl
  FROM m
), islands AS (
  SELECT da, db, diag, isl, count(*) AS chain FROM runs GROUP BY 1, 2, 3, 4
)
SELECT da AS doc_a, db AS doc_b,
       CAST(max(chain) + {SUBSTR_K} - 1 AS INTEGER) AS longest_run_tokens,
       CAST(count(DISTINCT diag) AS INTEGER) AS n_diagonals,
       CAST(count(*) AS INTEGER) AS n_islands,
       CAST(sum(chain) AS BIGINT) AS n_shared_grams,
       db AS purge_candidate
FROM islands
GROUP BY da, db
ORDER BY longest_run_tokens DESC, doc_a, doc_b
"""

QUERIES["dedup_substring_census"] = (dedup_substring_census, DEDUP_SUBSTRING_SQL)


def dedup_substring_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source substring-duplication exposure — the rollup that
    prices what ``dedup_substring_census`` found (the Lee et al.
    2022 "how much of each source is exactly duplicated" savings
    number): per document, the LONGEST token run it shares with any
    other document (either side of the pair), rolled up per source
    to exposed-doc share, exposed token mass, and run-length stats.

    Same df-capped positional-gram machinery as the census (one
    shared shape — Σ df² bucket-local, never corpus²); the rollup
    adds one per-doc max + one bounded per-source aggregate.
    """
    toks = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("doc_id", "source", tokens_col().alias("toks"))
        .select("doc_id", "source", F.size("toks").alias("n_toks"), "toks")
    )
    grams = toks.filter(F.size("toks") >= SUBSTR_K).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - SUBSTR_K + 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.array_join(F.slice("toks", i, SUBSTR_K), " ")
                    ).alias("g"),
                ),
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    buckets = bounded_buckets(
        grams.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "pos"))).alias("ds")),
        "ds",
        MAX_SHINGLE_DF,
        "dedup_substring_exposure",
    ).filter(F.size("ds") > 1)
    m = (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .filter(F.col("p.a.doc_id") < F.col("p.b.doc_id"))
        .select(
            F.col("p.a.doc_id").alias("da"),
            F.col("p.b.doc_id").alias("db"),
            F.col("p.a.pos").alias("pa"),
            F.col("p.b.pos").alias("pb"),
        )
    )
    w = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy("pa")
    islands = (
        m.select(
            "da",
            "db",
            (F.col("pa") - F.col("pb")).alias("diag"),
            "pa",
            (F.col("pa") - F.row_number().over(w)).alias("isl"),
        )
        .groupBy("da", "db", "diag", "isl")
        .agg((F.count(F.lit(1)) + SUBSTR_K - 1).alias("run"))
    )
    per_doc = (
        islands.select(F.col("da").alias("doc_id"), "run")
        .unionByName(islands.select(F.col("db").alias("doc_id"), "run"))
        .groupBy("doc_id")
        .agg(F.max("run").alias("max_run"))
    )
    joined = toks.select("doc_id", "source", "n_toks").join(
        per_doc, "doc_id", "left"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("max_run").isNotNull()).cast("long")).alias("n_exposed"),
            F.max("max_run").alias("max_run_tokens"),
            _R4(F.avg("max_run"), "mean_exposed_run"),
            F.sum(
                F.when(F.col("max_run").isNotNull(), F.col("n_toks"))
            ).alias("_exp_toks"),
            F.sum("n_toks").alias("_toks"),
        )
        .select(
            "source",
            "n_docs",
            "n_exposed",
            _R4(F.col("n_exposed") / F.col("n_docs"), "exposed_share"),
            "max_run_tokens",
            "mean_exposed_run",
            F.coalesce(F.col("_exp_toks"), F.lit(0)).alias("exposed_tokens"),
            _R4(
                F.coalesce(F.col("_exp_toks"), F.lit(0)) / F.col("_toks"),
                "exposed_token_share",
            ),
        )
        .orderBy("source")
    )


DEDUP_SUBSTRING_EXPOSURE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks FROM documents
), grams0 AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {SUBSTR_K} + 1),
                        i -> struct_pack(pos := i,
                                         g := md5(array_to_string(toks[i:i+{SUBSTR_K - 1}], ' ')))) AS gl
  FROM toks WHERE len(toks) >= {SUBSTR_K}
), grams AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (SELECT doc_id, unnest(gl) AS u FROM grams0)
), keep AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
), m AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b USING (g) JOIN keep USING (g)
  WHERE a.doc_id < b.doc_id
), islands AS (
  SELECT da, db, count(*) + {SUBSTR_K} - 1 AS run
  FROM (
    SELECT da, db, pa - pb AS diag, pa,
           pa - row_number() OVER (PARTITION BY da, db, pa - pb ORDER BY pa) AS isl
    FROM m
  )
  GROUP BY da, db, diag, isl
), per_doc AS (
  SELECT doc_id, max(run) AS max_run
  FROM (SELECT da AS doc_id, run FROM islands
        UNION ALL SELECT db AS doc_id, run FROM islands)
  GROUP BY doc_id
), joined AS (
  SELECT t.doc_id, t.source, len(t.toks) AS n_toks, p.max_run
  FROM toks t LEFT JOIN per_doc p USING (doc_id)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN max_run IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exposed,
       round(sum(CASE WHEN max_run IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS exposed_share,
       max(max_run) AS max_run_tokens,
       round(avg(max_run), 4) AS mean_exposed_run,
       CAST(coalesce(sum(CASE WHEN max_run IS NOT NULL THEN n_toks END), 0) AS BIGINT)
         AS exposed_tokens,
       round(coalesce(sum(CASE WHEN max_run IS NOT NULL THEN n_toks END), 0)
             / CAST(sum(n_toks) AS DOUBLE), 4) AS exposed_token_share
FROM joined
GROUP BY source
ORDER BY source
"""

QUERIES["dedup_substring_exposure"] = (
    dedup_substring_exposure,
    DEDUP_SUBSTRING_EXPOSURE_SQL,
)


BOUNDARY_DF_CAP = 64  # boilerplate head/tail guard (df-capped keys)


def _boundary_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, hk, tk): md5 of the first / last SUBSTR_K tokens.
    Docs shorter than SUBSTR_K use their full token span on both
    ends (exact short-doc containment, same convention as the
    13-gram screen)."""
    k = SUBSTR_K
    head = F.md5(F.array_join(F.slice("toks", 1, k), " "))
    tail = F.md5(
        F.array_join(
            F.slice("toks", F.greatest(F.size("toks") - k + 1, F.lit(1)), k), " "
        )
    )
    return docs.select("doc_id", head.alias("hk"), tail.alias("tk"))


def boundary_overlap_pairs(docs: DataFrame) -> DataFrame:
    """Crawl-shard boundary-duplication pairs: doc A's last
    SUBSTR_K tokens equal doc B's first SUBSTR_K tokens — the
    signature of re-chunked or overlapping-shard extraction (one
    source document split at different offsets across two shards),
    which whole-doc hashing (``dedup_exact``) and random-position
    n-grams (``dedup_substring_census``) both under-report because
    the overlap is pinned to document BOUNDARIES.

    Scale: each doc contributes exactly ONE prefix key and ONE
    suffix key (md5, fixed 32-char width), so the join is linear in
    the corpus with uniform keys; boilerplate heads/tails are
    df-capped at BOUNDARY_DF_CAP on BOTH sides before the join —
    the same stop-boilerplate rule as the inverted shingle indexes
    (MAX_SHINGLE_DF). Exercised directly by
    tests/test_round12_ops.py on a constructed overlapping corpus.
    """
    keyed = _boundary_keys(docs)
    hdf = keyed.groupBy("hk").agg(F.count(F.lit(1)).alias("hdf")).filter(
        F.col("hdf") <= BOUNDARY_DF_CAP
    )
    tdf = keyed.groupBy("tk").agg(F.count(F.lit(1)).alias("tdf")).filter(
        F.col("tdf") <= BOUNDARY_DF_CAP
    )
    heads = keyed.join(hdf, "hk").select("doc_id", "hk")
    tails = keyed.join(tdf, "tk").select("doc_id", "tk")
    return (
        tails.alias("a")
        .join(heads.alias("b"), F.col("a.tk") == F.col("b.hk"))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.tk").alias("boundary_md5"),
        )
    )


def dedup_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-duplication CENSUS over the corpus: the pair sweep
    of ``boundary_overlap_pairs`` plus the key-space health numbers
    a shard audit needs even when (as in a healthy corpus) zero
    pairs exist — distinct head/tail keys, docs sharing a head or
    tail with another doc, hot (df-capped) keys, and the boundary
    pair count. A census readout keeps the oracle meaningful on
    clean corpora; the pair machinery itself is pinned by a
    constructed-overlap pytest.
    """
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", tokens_col().alias("toks")
    )
    keyed = _boundary_keys(docs).localCheckpoint(eager=False)
    hstats = keyed.groupBy("hk").agg(F.count(F.lit(1)).alias("df"))
    tstats = keyed.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    h = hstats.agg(
        F.count(F.lit(1)).alias("n_heads"),
        F.sum(F.when(F.col("df") > 1, F.col("df")).otherwise(0)).alias(
            "n_docs_sharing_head"
        ),
        F.sum((F.col("df") > BOUNDARY_DF_CAP).cast("long")).alias("n_hot_heads"),
    )
    t = tstats.agg(
        F.count(F.lit(1)).alias("n_tails"),
        F.sum(F.when(F.col("df") > 1, F.col("df")).otherwise(0)).alias(
            "n_docs_sharing_tail"
        ),
        F.sum((F.col("df") > BOUNDARY_DF_CAP).cast("long")).alias("n_hot_tails"),
    )
    pairs = boundary_overlap_pairs(docs).agg(
        F.count(F.lit(1)).alias("n_boundary_pairs")
    )
    n = keyed.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n.crossJoin(F.broadcast(h))
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(pairs))
        .select(
            "n_docs",
            "n_heads",
            "n_tails",
            "n_docs_sharing_head",
            "n_docs_sharing_tail",
            "n_hot_heads",
            "n_hot_tails",
            "n_boundary_pairs",
        )
    )


DEDUP_BOUNDARY_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), keyed AS (
  SELECT doc_id,
         md5(array_to_string(toks[1:{SUBSTR_K}], ' ')) AS hk,
         md5(array_to_string(toks[greatest(len(toks) - {SUBSTR_K} + 1, 1):
                                  greatest(len(toks) - {SUBSTR_K} + 1, 1) + {SUBSTR_K - 1}], ' ')) AS tk
  FROM toks
), hstats AS (
  SELECT hk, count(*) AS df FROM keyed GROUP BY hk
), tstats AS (
  SELECT tk, count(*) AS df FROM keyed GROUP BY tk
), pairs AS (
  SELECT count(*) AS n_boundary_pairs
  FROM keyed a JOIN keyed b ON a.tk = b.hk AND a.doc_id != b.doc_id
  WHERE a.tk IN (SELECT tk FROM tstats WHERE df <= {BOUNDARY_DF_CAP})
    AND b.hk IN (SELECT hk FROM hstats WHERE df <= {BOUNDARY_DF_CAP})
)
SELECT (SELECT count(*) FROM keyed) AS n_docs,
       (SELECT count(*) FROM hstats) AS n_heads,
       (SELECT count(*) FROM tstats) AS n_tails,
       (SELECT CAST(coalesce(sum(CASE WHEN df > 1 THEN df ELSE 0 END), 0) AS BIGINT)
        FROM hstats) AS n_docs_sharing_head,
       (SELECT CAST(coalesce(sum(CASE WHEN df > 1 THEN df ELSE 0 END), 0) AS BIGINT)
        FROM tstats) AS n_docs_sharing_tail,
       (SELECT CAST(coalesce(sum(CASE WHEN df > {BOUNDARY_DF_CAP} THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM hstats) AS n_hot_heads,
       (SELECT CAST(coalesce(sum(CASE WHEN df > {BOUNDARY_DF_CAP} THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM tstats) AS n_hot_tails,
       (SELECT CAST(n_boundary_pairs AS BIGINT) FROM pairs) AS n_boundary_pairs
"""

QUERIES["dedup_boundary_overlap"] = (dedup_boundary_overlap, DEDUP_BOUNDARY_SQL)


# Minimum duplicated-run length (in whitespace tokens) that triggers
# excision — Lee et al. 2022 remove runs of >= 50 BPE tokens; 25
# whitespace tokens is the same ballpark on this corpus's token mix.
SUBSTR_EXCISE_MIN_RUN = 25


def dedup_substring_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXCISION transform behind ``dedup_substring_census``: the
    Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" rewrite step — every duplicated token run of
    >= SUBSTR_EXCISE_MIN_RUN tokens is removed from every occurrence
    EXCEPT the canonical first one (min (doc_id, pos) over the run's
    k-grams), covering both cross-doc and within-doc repetition with
    one rule. Emits one row per rewritten doc with the span ledger
    and an md5 of the kept token sequence, so the transform is
    verifiable by value, not just by counts.

    Scale: unlike the pair census there is NO pair expansion at all —
    the plan is gram → (min-occurrence, df) groupBy on the uniform
    md5 gram key, one shuffle join back to occurrences, and per-doc
    windows (island merge + interval union) whose state is bounded by
    doc length. The token rewrite itself is pure array functions
    (filter/transform over the spans array) — JVM-side, zero
    explode of the token stream. A 100 TB corpus shards on the gram
    key; per-doc work never leaves its partition.
    """
    toks = (
        expand_parallelism(Catalog(spark, sf_dir).documents)
        .select("doc_id", tokens_col().alias("toks"))
        .filter(F.size("toks") >= SUBSTR_K)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - SUBSTR_K + 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.array_join(F.slice("toks", i, SUBSTR_K), " ")
                    ).alias("g"),
                ),
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    # Canonical occurrence per gram: lexicographic min over
    # (doc_id, pos) — deterministic in both engines. df counts
    # OCCURRENCES (not docs) so within-doc repeats shadow too.
    canon = grams.groupBy("g").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"),
        F.count(F.lit(1)).alias("df"),
    )
    # Both join sides scale with the corpus (canon has ~one row per
    # DISTINCT gram — near-zero reduction on real text, which defeats
    # the post-aggregate size estimate and tempts AQE into a driver-
    # killing broadcast; measured at the 100x ladder rung). Pin the
    # sort-merge join: md5 keys sort/shuffle uniformly at any scale.
    shadowed = (
        grams.join(canon.hint("merge"), "g")
        .filter(
            (F.col("df") >= 2)
            & (
                (F.col("doc_id") > F.col("first.doc_id"))
                | (
                    (F.col("doc_id") == F.col("first.doc_id"))
                    & (F.col("pos") > F.col("first.pos"))
                )
            )
        )
        .select("doc_id", "pos")
    )
    # Islands of consecutive shadowed gram positions -> token spans
    # [s, e]; a chain of c grams covers c + K - 1 tokens.
    wnum = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        shadowed.withColumn("isl", F.col("pos") - F.row_number().over(wnum))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + SUBSTR_K - 1).alias("e"),
        )
        .filter(F.col("e") - F.col("s") + 1 >= SUBSTR_EXCISE_MIN_RUN)
    )
    # Interval union per doc (overlap OR adjacency merges): classic
    # sweep — running max of prior ends, new group when disjoint.
    ws = Window.partitionBy("doc_id").orderBy("s", "e")
    merged = (
        islands.withColumn(
            "pme",
            F.max("e").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "ng",
            F.when(
                F.col("pme").isNull() | (F.col("s") > F.col("pme") + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "gid",
            F.sum("ng").over(ws.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "gid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    spans = merged.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("spans")
    )
    kept_idx = F.filter(
        F.sequence(F.lit(1), F.size("toks")),
        lambda i: ~F.exists(
            F.col("spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
        ),
    )
    return (
        toks.join(spans, "doc_id")
        .withColumn("kept_idx", kept_idx)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size("spans").alias("n_spans"),
            (F.size("toks") - F.size("kept_idx")).alias("excised_tokens"),
            F.size("kept_idx").alias("kept_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.col("kept_idx"),
                        lambda i: F.element_at(F.col("toks"), i),
                    ),
                    " ",
                )
            ).alias("kept_hash"),
        )
        .orderBy(F.desc("excised_tokens"), "doc_id")
    )


DEDUP_SUBSTRING_EXCISE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
  WHERE len(string_split_regex(trim(text), '\s+')) >= {SUBSTR_K}
), grams AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - {SUBSTR_K} + 1),
                  i -> struct_pack(pos := i,
                                   g := md5(array_to_string(toks[i:i+{SUBSTR_K - 1}], ' '))))) AS u
    FROM toks)
), canon AS (
  SELECT g, min(struct_pack(doc_id := doc_id, pos := pos)) AS first, count(*) AS df
  FROM grams GROUP BY g
), shadowed AS (
  SELECT gr.doc_id, gr.pos FROM grams gr JOIN canon c USING (g)
  WHERE c.df >= 2 AND (gr.doc_id > c.first.doc_id
                       OR (gr.doc_id = c.first.doc_id AND gr.pos > c.first.pos))
), numbered AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM shadowed
), islands AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {SUBSTR_K} - 1 AS e
  FROM numbered GROUP BY doc_id, isl
  HAVING max(pos) + {SUBSTR_K} - 1 - min(pos) + 1 >= {SUBSTR_EXCISE_MIN_RUN}
), swept AS (
  SELECT doc_id, s, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM islands
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END AS ng
  FROM swept
), grouped AS (
  SELECT doc_id, s, e,
         sum(ng) OVER (PARTITION BY doc_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS gid
  FROM flagged
), merged AS (
  SELECT doc_id, min(s) AS s, max(e) AS e FROM grouped GROUP BY doc_id, gid
), spans AS (
  SELECT doc_id, list_sort(list(struct_pack(s := s, e := e))) AS spans
  FROM merged GROUP BY doc_id
), kept AS (
  SELECT t.doc_id, t.toks, sp.spans,
         list_filter(generate_series(1, len(t.toks)),
                     i -> len(list_filter(sp.spans,
                                          x -> i >= x.s AND i <= x.e)) = 0) AS kept_idx
  FROM toks t JOIN spans sp USING (doc_id)
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(spans) AS INTEGER) AS n_spans,
       CAST(len(toks) - len(kept_idx) AS INTEGER) AS excised_tokens,
       CAST(len(kept_idx) AS INTEGER) AS kept_tokens,
       md5(coalesce(array_to_string(list_transform(kept_idx, i -> toks[i]), ' '),
                    '')) AS kept_hash
FROM kept
ORDER BY excised_tokens DESC, doc_id
"""

QUERIES["dedup_substring_excise"] = (
    dedup_substring_excise,
    DEDUP_SUBSTRING_EXCISE_SQL,
)


# ---------------------------------------------------------------------------
# URL canonicalization dedup (§C — crawl-identity dedup; round 16)
# ---------------------------------------------------------------------------

# query-param prefixes stripped by canonicalization (the standard
# tracking set every crawl canonicalizer drops)
_URL_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def synth_capture_url(doc_id) -> Column:
    """Deterministic messy capture URL for a document — the crawl
    identity a real pipeline reads from WARC-Target-URI, synthesized
    here from doc_id alone (pure string algebra, so the DuckDB twin
    replays it exactly). Every 3 consecutive doc_ids render the SAME
    logical page three different ways — uppercase scheme/host,
    ``www.`` prefix, explicit default port, trailing slash, shuffled
    query order, tracking params, fragment — the exact noise classes
    URL canonicalization exists to collapse (multiple feeds capturing
    one public URL). The page id is deliberately source-independent:
    cross-feed duplication is the real-world case."""
    d = doc_id if not isinstance(doc_id, str) else F.col(doc_id)
    pg = (d - d % 3).cast("string")
    h = ((d - d % 3) % 7).cast("string")
    https = (d - d % 3) % 2 == 0
    scheme = F.when(https, F.lit("https")).otherwise(F.lit("http"))
    dport = F.when(https, F.lit(":443")).otherwise(F.lit(":80"))
    ds = d.cast("string")
    v = d % 3
    return (
        F.when(
            v == 0,
            F.concat(
                scheme, F.lit("://www.example"), h, F.lit(".com"), dport,
                F.lit("/page/"), pg, F.lit("?id="), pg,
                F.lit("&utm_source=feed#s"), ds,
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.upper(scheme), F.lit("://EXAMPLE"), h,
                F.lit(".COM/page/"), pg, F.lit("/?ref=a&id="), pg,
            ),
        )
        .otherwise(
            F.concat(
                scheme, F.lit("://example"), h, F.lit(".com"), dport,
                F.lit("/page/"), pg, F.lit("?fbclid=x"), ds,
                F.lit("&id="), pg,
            )
        )
    )


def canonical_url(u: Column) -> Column:
    """Rule-based URL canonicalization, all JVM-side string builtins
    (no UDF): lowercase scheme+host, strip ``www.``, strip default
    ports (http:80 / https:443, others kept), strip the fragment,
    strip a trailing path slash, drop tracking params
    (``utm_*``/``fbclid``/``gclid``/``ref``), and sort the surviving
    query keys. Generic over any http(s) URL with an authority and a
    path — nothing here knows the synthesis above."""
    nofrag = F.substring_index(u, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring_index(nofrag, "://", -1)
    auth = F.lower(F.substring_index(rest, "/", 1))
    pathq = F.substr(rest, F.length(auth) + F.lit(1))
    hostname = F.substring_index(auth, ":", 1)
    port = F.when(auth.contains(":"), F.substring_index(auth, ":", -1)).otherwise(
        F.lit("")
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    host = F.when(
        hostname.startswith("www."), F.substr(hostname, F.lit(5))
    ).otherwise(hostname)
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        pathq.contains("?"), F.substring_index(pathq, "?", -1)
    ).otherwise(F.lit(""))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substr(path, F.lit(1), F.length(path) - F.lit(1)),
    ).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda p: ~(
            p.startswith("utm_")
            | p.startswith("fbclid=")
            | p.startswith("gclid=")
            | p.startswith("ref=")
        ),
    )
    qs = F.when(query == "", F.lit("")).otherwise(
        F.array_join(F.array_sort(params), "&")
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup census — the FIRST dedup stage of
    every real crawl pipeline, run before any content hashing:
    canonicalize each capture URL, group by canonical form, keep the
    first capture (min doc_id), and report the per-source funnel
    (docs, distinct canonical URLs, kept, purged, purge rate).

    Scale: canonicalization is per-row codegen string algebra (no
    UDF, no shuffle); the keep-first is ONE map-side-combinable
    aggregate on the canonical key + one equi-join back — the
    identical shape at 100 TB, where URL dedup typically removes
    >50% of raw captures before the expensive content stages run.
    ``pipeline_crawl_prep`` wires the same keep-first in as stage
    02 of the ingest funnel.
    """
    docs = expand_parallelism(Catalog(spark, sf_dir).documents).select(
        "doc_id", "source", synth_capture_url(F.col("doc_id")).alias("url")
    )
    curls = docs.select("doc_id", "source", canonical_url(F.col("url")).alias("curl"))
    # r16 OPTIMIZATION: keep-first via a window min over the canonical
    # key instead of groupBy + join back. The old shape scanned and
    # canonicalized the corpus TWICE (one branch per join side — the
    # string algebra is the per-row cost here) and paid an aggregate
    # exchange plus a join; the window pays ONE scan, one exchange on
    # curl, and computes the identical is_keep flag (min doc_id per
    # canonical group). Per-URL capture counts are bounded (a hot URL
    # has thousands of captures, not billions), so the window
    # partition never concentrates meaningful skew.
    w_curl = Window.partitionBy("curl")
    flagged = curls.withColumn(
        "is_keep",
        (F.col("doc_id") == F.min("doc_id").over(w_curl)).cast("long"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("curl").alias("n_unique_urls"),
            F.sum("is_keep").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("is_keep")).alias("n_purged"),
            (
                F.round(
                    10000.0
                    * (F.count(F.lit(1)) - F.sum("is_keep"))
                    / F.count(F.lit(1))
                )
                / 10000.0
            ).alias("purge_rate"),
        )
        .orderBy("source")
    )


# DuckDB twins: the same synthesis and the same rules, step by step.
_SQL_SYNTH_URL = """
  CASE doc_id % 3
    WHEN 0 THEN sch || '://www.example' || h || '.com' || dport
                || '/page/' || pg || '?id=' || pg || '&utm_source=feed#s'
                || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN upper(sch) || '://EXAMPLE' || h || '.COM/page/' || pg
                || '/?ref=a&id=' || pg
    ELSE sch || '://example' || h || '.com' || dport || '/page/' || pg
         || '?fbclid=x' || CAST(doc_id AS VARCHAR) || '&id=' || pg
  END
"""

_SQL_URL_BASE = f"""u00 AS (
  SELECT doc_id, source, n_chars,
         CAST(doc_id - doc_id % 3 AS VARCHAR) AS pg,
         CAST((doc_id - doc_id % 3) % 7 AS VARCHAR) AS h,
         CASE WHEN (doc_id - doc_id % 3) % 2 = 0 THEN 'https' ELSE 'http' END AS sch,
         CASE WHEN (doc_id - doc_id % 3) % 2 = 0 THEN ':443' ELSE ':80' END AS dport
  FROM documents
), u0 AS (
  SELECT doc_id, source, n_chars, {_SQL_SYNTH_URL} AS url FROM u00
), u1 AS (
  SELECT *, split_part(url, '#', 1) AS nofrag FROM u0
), u2 AS (
  SELECT *, lower(split_part(nofrag, '://', 1)) AS scheme,
         substr(nofrag, length(split_part(nofrag, '://', 1)) + 4) AS rest
  FROM u1
), u3 AS (
  SELECT *, lower(split_part(rest, '/', 1)) AS auth,
         substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
  FROM u2
), u4 AS (
  SELECT *, split_part(auth, ':', 1) AS hostname,
         CASE WHEN contains(auth, ':') THEN split_part(auth, ':', 2)
              ELSE '' END AS port
  FROM u3
), u5 AS (
  SELECT *,
         CASE WHEN starts_with(hostname, 'www.') THEN substr(hostname, 5)
              ELSE hostname END AS host,
         split_part(pathq, '?', 1) AS path,
         CASE WHEN contains(pathq, '?') THEN split_part(pathq, '?', 2)
              ELSE '' END AS query
  FROM u4
), u6 AS (
  SELECT *,
         CASE WHEN length(path) > 1 AND ends_with(path, '/')
              THEN substr(path, 1, length(path) - 1) ELSE path END AS path2,
         CASE WHEN query = '' THEN ''
              ELSE array_to_string(list_sort(list_filter(
                     string_split(query, '&'),
                     p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'fbclid=')
                               OR starts_with(p, 'gclid=') OR starts_with(p, 'ref=')))),
                   '&') END AS qs
  FROM u5
), curls AS (
  SELECT doc_id, source, n_chars, hostname,
         scheme || '://' || host
         || CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                          OR (scheme = 'https' AND port = '443'))
                 THEN ':' || port ELSE '' END
         || path2
         || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS curl
  FROM u6
)"""

DEDUP_URL_CANONICAL_SQL = f"""
WITH {_SQL_URL_BASE}, keep AS (
  SELECT curl, min(doc_id) AS keep_id FROM curls GROUP BY curl
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT curl) AS n_unique_urls,
       CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN doc_id = keep_id THEN 0 ELSE 1 END) AS BIGINT) AS n_purged,
       round(10000.0 * sum(CASE WHEN doc_id = keep_id THEN 0 ELSE 1 END)
             / count(*)) / 10000.0 AS purge_rate
FROM curls JOIN keep USING (curl)
GROUP BY source
ORDER BY source
"""

QUERIES["dedup_url_canonical"] = (dedup_url_canonical, DEDUP_URL_CANONICAL_SQL)


def raw_hostname(u: Column) -> Column:
    """Lowercased hostname of a capture URL (port stripped, ``www.``
    KEPT — host censuses count what the crawler actually hit)."""
    auth = F.lower(
        F.substring_index(
            F.substring_index(F.substring_index(u, "#", 1), "://", -1), "/", 1
        )
    )
    return F.substring_index(auth, ":", 1)

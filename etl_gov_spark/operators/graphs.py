"""Graph clustering for dedup (SURVEY.md §2.C extension):
connected components over the near-duplicate pair graph.

The missing last step of every dedup pipeline: pairs → clusters →
one canonical doc per cluster. Spark-first as min-label propagation
WITH POINTER DOUBLING (each round: one distributed join+aggregate
for the neighbor min, one label self-join for the jump — the
pointer-doubling member of the large-star/small-star MapReduce CC
family, Kiveris et al. 2014). Convergence takes O(log diameter)
rounds; a hard cap guards pathological chains.

Oracles: dedup_clusters keeps the DuckDB recursive CTE
(min-reachable-id — an exact, engine-independent definition of the
same components); emb_dbscan_clusters uses the unrolled
fixed-round replay (_cc_replay_sql) that stays linear under sf1
clone replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog, expand_parallelism
from etl_gov_spark.operators.dedup import (
    _SQL_EDGE_PAIRS,
    _SQL_SHINGLES,
    JACCARD_T,
    MAX_SHINGLE_DF,
    SHINGLE_K,
    bounded_buckets,
    pair_structs,
    shingled_docs,
)

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

MAX_ROUNDS = 30  # LS/SS halves path diameter per round: covers ~2^30; typical graphs converge in <=7 (early break)
# Edge-count ceiling for the driver-side union-find regime of
# connected_components (r17): below this the label computation is a
# bounded driver fold over the already-checkpointed edge list (≤100k
# edges × 16 B ≈ 1.6 MB collected) instead of 4-6 sequential LS/SS
# rounds of distributed stage latency; above it the large-star/
# small-star loop runs unchanged. Same stance as
# dedup.EMB_BROADCAST_MAX_VECS: the guard bounds driver memory by
# definition and the at-scale path is untouched.
CC_DRIVER_MAX_EDGES = 100_000

# rounds the most recent connected_components call took (incl. the
# final no-change round) and whether it actually reached the
# fixpoint within MAX_ROUNDS — read by the stress ladders to log
# per-rung round counts; diagnostics only, never consumed by query
# logic.
LAST_CC_ROUNDS = 0
LAST_CC_CONVERGED = False



def _near_dup_edges(docs: DataFrame) -> DataFrame:
    """Jaccard ≥ t pairs corpus-wide via the inverted shingle
    index (co-occurrence counts — linear in Σ df² per shingle, so
    cost tracks true overlap, not corpus²). Over-cap shingles are
    star-routed, not dropped: at 100 TB the hottest shingle buckets
    are exactly the boilerplate clusters worth deduping, so each
    contributes hub-vs-member candidate rows (linear) and the
    Jaccard verify step still gates every emitted edge — a common
    stop-shingle can't falsely merge unrelated docs."""
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
        "near_dup_edges",
        route="star",
    )
    return (
        buckets.select(F.explode(pair_structs(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.a.n").alias("n_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= JACCARD_T
        )
        .select("doc_a", "doc_b")
    )


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — the algorithm the round-15 review asked for by name).

    Each round rewrites the EDGE set itself:
      - large-star(u): every neighbor v > u re-attaches to
        m(u) = min(N(u) ∪ {u});
      - small-star(u): every down-neighbor re-attaches to
        m(u) = min(N⁻(u)), and u hooks onto m(u).
    Both steps preserve connectivity exactly, edges migrate toward
    component minima, and the set converges to a STAR FOREST rooted
    at each component's min id in O(log² n) rounds worst-case
    (typically ≤6) — unlike label-only propagation + pointer
    jumping, which round-16 measured stalling on plateau-merge
    chains at the 30× clone-replica stress rung (label jumps
    compress chains, but flattened REGIONS still merged one
    edge-hop per round and bounced off the round cap).

    At the fixpoint both steps are identity transforms, so running
    extra rounds is a no-op — which is what makes the unrolled
    fixed-round oracle replay (_cc_replay_sql) safe: Spark's early
    break at convergence cannot diverge from the oracle's full
    unroll. Output: (node, component=min node id), node set taken
    from the input edges (self-loop-only nodes keep themselves).

    Scale shape per round: two grouped min-aggregates + two joins +
    two distincts over a SHRINKING edge set — all linear shuffles on
    uniform keys; nothing is collected. Edge lineage is truncated
    with ``localCheckpoint`` every round (each round references its
    edge set four times — an untruncated plan grows 4× per round).
    """
    # r16 OPTIMIZATION: materialize the INPUT edge pipeline exactly
    # once. `nodes` and `e` each used to carry their own lazy
    # checkpoint of the full upstream pipeline, so an expensive edge
    # build (the minhash inverted index behind dedup_clusters, the
    # LSH ε-graph behind emb_dbscan_clusters) ran TWICE — once when
    # e.count() materialized `e`, once when the final label join
    # materialized `nodes`. One eager checkpoint of the raw pairs
    # (bounded: one row per edge) feeds both derivations; the
    # dedup_clusters wall dropped 5.8 → 4.6 s at sf0.1 and at scale
    # the saving is a full pass over the pair-generation DAG.
    raw = edges.select("doc_a", "doc_b").localCheckpoint(eager=True)
    # r17 OPTIMIZATION (guide §1.2 — the distributed algorithm is the
    # first lever, and for a SMALL edge set the best distributed
    # algorithm is none at all; VERDICT r16 item 3): below
    # CC_DRIVER_MAX_EDGES the component labels are computed with a
    # driver-side union-find over the already-materialized edge list
    # — the same bounded-regime split dedup_embedding's verify join
    # uses (EMB_BROADCAST_MAX_VECS). Rationale: at sf0.1 every CC
    # consumer's edge set is 10²-10⁴ rows, yet the LS/SS loop costs
    # 4-6 sequential rounds × (3 exchanges + a count job) of almost
    # pure stage latency — the 8-core scaling block showed these
    # queries are latency-bound, not compute-bound. The collect is
    # bounded by the cap (≤100k×16 B), the labels are EXACTLY the
    # min-member-id components the LS/SS fixpoint produces (union by
    # min root + path compression), and the distributed path is
    # untouched above the cap — the 100 TB regime and the clone-rung
    # stress ladders still run large-star/small-star. The regime
    # check is one count job over the checkpointed blocks (~ms).
    global LAST_CC_ROUNDS, LAST_CC_CONVERGED
    if raw.count() <= CC_DRIVER_MAX_EDGES:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        rows = raw.collect()
        nodes_set = set()
        for r in rows:
            a, b = r[0], r[1]
            nodes_set.add(a)
            nodes_set.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # min root wins → root IS the component min
        out = [(n, find(n)) for n in sorted(nodes_set)]
        LAST_CC_ROUNDS = 1
        LAST_CC_CONVERGED = True
        return (
            edges.sparkSession.createDataFrame(
                out, "node long, component long"
            ).localCheckpoint()
        )
    nodes = (
        raw.select(F.col("doc_a").alias("node"))
        .union(raw.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    # canonical directed form (hi, lo), self-loops dropped
    e = (
        raw.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    LAST_CC_ROUNDS = 0
    LAST_CC_CONVERGED = False
    # r16 OPTIMIZATION: one round = THREE exchanges, down from ~6.
    # Each star phase starts with an explicit repartition on its
    # grouping key; every aggregate/join inside the phase then needs
    # only ClusteredDistribution on a superset of that key, which the
    # repartition already satisfies — Catalyst inserts no further
    # Exchange (partitioning-subset colocation). The large-star
    # dedup ALSO rides the hi-repartition (distinct on (hi, lo) is
    # clustered by hi), so the per-round shuffle writes are exactly:
    # sym-by-u, ls-by-hi, new_e-distinct. Joins stay AQE-skew-
    # splittable equi-joins (star roots are the documented hot keys;
    # a window min here would concentrate whole components on one
    # task with no skew handling, so windows are deliberately NOT
    # used). The per-round edge count is carried forward instead of
    # re-counting the already-materialized previous edge set.
    # r16: the baseline count is a SENTINEL, not a job — the initial
    # e.count() existed only so round 1 could compare counts, and an
    # already-converged input (the only case the comparison could
    # fire on) just runs one identity round and detects at round 2.
    # One full job saved per CC call.
    e_count = -1
    for round_idx in range(max_rounds):
        # large-star: per node u over SYMMETRIZED neighbors,
        # m = min(N(u) ∪ {u}); every neighbor v > u re-attaches to m.
        sym = (
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
            .union(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
            .repartition("u")
        )
        m_ls = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )
        # dedup of the large-star output is deferred to the hi
        # repartition below (set semantics are unchanged: the
        # small-star min and the emitted edge SET are duplicate-
        # insensitive, and dropDuplicates runs exchange-free once
        # the rows are clustered by hi).
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_ls, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .repartition("hi")
            .dropDuplicates(["hi", "lo"])
        )
        # small-star: per node u over down-neighbors N⁻(u) (all
        # < u in the directed form), m = min; re-attach N⁻ \ {m}
        # and hook u itself onto m. Both the min-aggregate and the
        # join are clustered by hi — no exchange, and the two reads
        # of ls share one shuffle (ReusedExchange).
        m_ss = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        new_e = (
            ls.join(m_ss, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(m_ss.select("hi", F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_count = new_e.count()
        same_count = new_count == e_count
        changed = (
            0
            if same_count
            and new_e.exceptAll(e).limit(1).count() == 0
            else 1
        )
        e = new_e
        e_count = new_count
        LAST_CC_ROUNDS = round_idx + 1
        LAST_CC_CONVERGED = changed == 0
        if changed == 0:
            break
    # star forest -> labels; roots and isolated nodes keep themselves.
    # min(lo) per hi is the converged parent (and keeps the replay
    # deterministic even if the cap were ever hit mid-convergence).
    parents = e.groupBy("hi").agg(F.min("lo").alias("component"))
    return (
        nodes.join(parents, nodes.node == parents.hi, "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
        .localCheckpoint()
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: Jaccard≥0.1 pair graph → connected
    components → (doc_id, component, cluster_size). Singleton docs
    (no near-dup) are excluded — downstream keeps one doc per
    component and all singletons."""
    docs = Catalog(spark, sf_dir).documents
    comp = connected_components(_near_dup_edges(docs))
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "component", "cluster_size")
    )


DEDUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE {_SQL_EDGE_PAIRS}, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
), comp AS (
  SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
)
SELECT doc_id, component, count(*) OVER (PARTITION BY component) AS cluster_size
FROM comp
"""


QUERIES: dict[str, tuple] = {
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
}


def dedup_keep_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution: pick the canonical doc per near-dup
    cluster (keep-longest, tie-break lowest doc_id) and list the
    purged ids — the action step that turns detection into an
    actual deduplicated corpus.

    Scale: one join (clusters ⋈ doc lengths) + one grouped
    aggregate; canonical selection is max-by-struct (no window
    sort), purge lists are per-cluster arrays (clusters are small
    by construction — a giant cluster means a template, handled
    upstream by df caps).
    """
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    comp = dedup_clusters(spark, sf_dir).select("doc_id", "component")
    g = (
        comp.join(docs, "doc_id")
        .groupBy("component")
        .agg(
            F.max(
                F.struct(
                    "n_chars",
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("k"),
            F.count(F.lit(1)).alias("cluster_size"),
            F.array_sort(F.collect_list("doc_id")).alias("ids"),
        )
    )
    return g.select(
        "component",
        F.col("k.d").alias("keep_doc_id"),
        "cluster_size",
        F.array_join(
            F.filter("ids", lambda d: d != F.col("k.d")), ","
        ).alias("purged_ids"),
    )


DEDUP_KEEP_POLICY_SQL = rf"""
WITH RECURSIVE {_SQL_EDGE_PAIRS}, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
), comp AS (
  SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
), ranked AS (
  SELECT c.component, c.doc_id,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
), g AS (
  SELECT component,
         max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
         count(*) AS cluster_size,
         list_sort(list(doc_id)) AS ids
  FROM ranked GROUP BY component
)
SELECT component, keep_doc_id, cluster_size,
       array_to_string(list_filter(ids, x -> x <> keep_doc_id), ',') AS purged_ids
FROM g
"""

QUERIES["dedup_keep_policy"] = (dedup_keep_policy, DEDUP_KEEP_POLICY_SQL)


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node graph metrics over the near-dup pair graph: degree,
    triangle count, and local clustering coefficient — the
    neighborhood-density signals that tell template families (dense,
    clustered) apart from chance overlaps (isolated edges).

    Spark-first triangle counting = wedge join + closure semi-join:
    e1(a,b) ⋈ e2(b,c) builds each a<b<c wedge once, and a semi-join
    against the canonical edge set keeps closed wedges. Two hash
    joins on node keys — the MapReduce node-iterator algorithm; at
    scale, order wedge construction by degree (or cap hot nodes
    upstream, as the dedup edge builder already caps shingle df) so
    wedge count stays Σ deg² bounded.
    """
    docs = Catalog(spark, sf_dir).documents
    edges = _near_dup_edges(docs).cache()
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(
        edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    per_node_tri = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .union(edges.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(per_node_tri, "doc_id", "left")
        .select(
            "doc_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            _R4(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                "clustering_coeff",
            ),
        )
    )


GRAPH_TRIANGLE_SQL = rf"""
WITH {_SQL_EDGE_PAIRS}, tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e1.doc_b = e2.doc_a
  WHERE EXISTS (SELECT 1 FROM pairs e3
                WHERE e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
), per_tri AS (
  SELECT n AS doc_id, count(*) AS n_triangles
  FROM (SELECT unnest([a, b, c]) AS n FROM tri) GROUP BY n
), deg AS (
  SELECT doc_id, count(*) AS degree
  FROM (SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs)
  GROUP BY doc_id
)
SELECT d.doc_id, d.degree,
       coalesce(t.n_triangles, 0) AS n_triangles,
       round(CASE WHEN d.degree >= 2
                  THEN 2.0 * coalesce(t.n_triangles, 0) / (d.degree * (d.degree - 1))
                  ELSE 0.0 END, 4) AS clustering_coeff
FROM deg d LEFT JOIN per_tri t USING (doc_id)
"""

QUERIES["graph_triangle_count"] = (graph_triangle_count, GRAPH_TRIANGLE_SQL)


PAGERANK_ITERS = 12
PAGERANK_DAMPING = 0.85


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Distributed PageRank over an undirected edge list (doc_a,
    doc_b): each iteration is one join + one aggregate (rank mass
    flows along edges, damped), the standard Pregel-style layout
    with lineage checkpointed every 5 rounds. Dangling nodes don't
    occur (symmetrized edges ⇒ every node has degree ≥ 1).

    Ranks are quantized to 6 dp at the END of every iteration: the
    per-edge contributions (rank/deg) are then IEEE-identical on any
    engine, so the only cross-engine drift is aggregation order —
    ~1e-16, absorbed by the 6-dp round. That makes the full fixed-
    iteration run exactly replayable (the DuckDB oracle unrolls the
    same 12 updates), same scheme as the IVF/PQ Lloyd replay.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym = sym.cache()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg").cache()
    n_total = nodes.count()
    # degree is loop-invariant: join it onto the edge list ONCE and
    # cache (src, dst, deg) — each iteration then pays one join
    # (ranks) instead of two, dropping 12 joins from the run
    sym_deg = (
        sym.join(nodes.select(F.col("node").alias("_n"), "deg"), sym.src == F.col("_n"))
        .select("src", "dst", "deg")
        .cache()
    )
    ranks = nodes.select("node", F.lit(1.0 / n_total).alias("rank"))
    for i in range(iters):
        if i and i % 5 == 0:
            ranks = ranks.localCheckpoint()
        contrib = (
            sym_deg.join(ranks, sym_deg.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # r16 OPTIMIZATION: no per-iteration join back onto `nodes`.
        # The edge list is symmetrized, so every node has degree ≥ 1
        # and therefore appears as dst of at least one edge — contrib
        # already contains EXACTLY the node set, and the old
        # left-join + coalesce(in_mass, 0) was an identity transform
        # (the coalesce branch was unreachable). Same rows, one join
        # and one exchange fewer per iteration (12 joins dropped at
        # PAGERANK_ITERS=12); the oracle's LEFT JOIN form is
        # row-identical for the same reason.
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.round(
                F.lit((1.0 - PAGERANK_DAMPING) / n_total)
                + PAGERANK_DAMPING * F.col("in_mass"),
                6,
            ).alias("rank"),
        )
    return ranks


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup document graph (rows-only:
    iterative FP; alignment with a dense reference solve is
    asserted in tests). High-rank docs sit at the center of
    template families — the triage order for manual dedup review."""
    docs = Catalog(spark, sf_dir).documents
    edges = _near_dup_edges(docs)
    pr = pagerank(edges)
    return pr.select(
        F.col("node").alias("doc_id"), _R4(F.col("rank") * 1000, "pagerank_x1000")
    )


def _pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    """Unroll the fixed-iteration 6-dp-quantized PageRank as CTEs
    (one mass + one rank CTE per iteration) — the same quantized-
    replay scheme as the IVF/PQ Lloyd oracles: because both engines
    round ranks to 6 dp between iterations, every intermediate state
    is bit-identical and the replay is exact."""
    base = (1.0 - PAGERANK_DAMPING)  # emit the python double verbatim
    # edges/deg and each iteration are MATERIALIZED: with inlining,
    # every iteration's reference to the previous one re-evaluates
    # the whole chain back through the shingle pipeline.
    parts = [
        rf"""WITH {_SQL_EDGE_PAIRS}, edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), deg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
), nt AS MATERIALIZED (SELECT count(*) AS n FROM deg),
r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nt) AS rank FROM deg
)"""
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f""", m{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(r.rank / d.deg) AS in_mass
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d ON e.src = d.node
  GROUP BY e.dst
), r{i} AS MATERIALIZED (
  SELECT d.node,
         round({base!r} / (SELECT n FROM nt)
               + {PAGERANK_DAMPING!r} * coalesce(m.in_mass, 0.0), 6) AS rank
  FROM deg d LEFT JOIN m{i} m USING (node)
)"""
        )
        prev = f"r{i}"
    parts.append(
        f"\nSELECT node AS doc_id, round(rank * 1000, 4) AS pagerank_x1000 FROM {prev}"
    )
    return "".join(parts)


GRAPH_PAGERANK_SQL = _pagerank_sql()

QUERIES["graph_pagerank"] = (graph_pagerank, GRAPH_PAGERANK_SQL)


LPA_ITERS = 2


def label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """Synchronous majority-vote label propagation (community
    detection — distinct from ``connected_components``' min-id
    component fixpoint: LPA splits a weakly-bridged component into
    its dense cores). Each of the fixed ``iters`` rounds every node adopts
    the most frequent label among its NEIGHBORS (tie → smallest
    label, so the update is a deterministic function of the edge
    set), all nodes updating simultaneously.

    One shuffle per round (vote count) + one broadcast-size argmin;
    label state is (node, label) rows — never collected. The round
    count is fixed, so the DuckDB oracle replays it exactly as
    unrolled CTEs; integer vote counts mean no quantization is
    needed (unlike the pagerank replay).
    """
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .cache()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iters):
        votes = (
            sym.join(labels, sym.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = votes.groupBy("dst").agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
            ).alias("b")
        )
        labels = (
            labels.join(best, labels.node == best.dst, "left")
            .select(
                "node", F.coalesce(F.col("b.l"), F.col("label")).alias("label")
            )
            .localCheckpoint()  # truncate per-round lineage
        )
    sym.unpersist()
    return labels


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes of the near-dup document graph under 2-round
    LPA — the template-family detector: connected components says
    "these docs touch", LPA says "these docs cluster densely",
    which is the granularity boilerplate-family review wants."""
    docs = Catalog(spark, sf_dir).documents
    comm = label_propagation(_near_dup_edges(docs))
    return comm.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def _lpa_sql(iters: int = LPA_ITERS, final_select: str | None = None) -> str:
    """The fixed-round LPA replay as unrolled CTEs — exact (integer
    votes, total (c DESC, label ASC) tie order matches Spark's
    min(struct(-c, label)))."""
    parts = [
        rf"""WITH {_SQL_EDGE_PAIRS}, sym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM sym
)"""
    ]
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(
            f""", v{i} AS MATERIALIZED (
  SELECT s.dst, l.label, count(*) AS c
  FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT dst, label FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
    FROM v{i}
  ) WHERE rn = 1
), l{i} AS MATERIALIZED (
  SELECT p.node, coalesce(b{i}.label, p.label) AS label
  FROM {prev} p LEFT JOIN b{i} ON p.node = b{i}.dst
)"""
        )
        prev = f"l{i}"
    if final_select is None:
        final_select = (
            "\nSELECT label AS community, count(*) AS n_members"
            f" FROM {prev} GROUP BY label"
        )
    else:
        final_select = final_select.format(labels=prev)
    parts.append(final_select)
    return "".join(parts)


GRAPH_LABEL_PROPAGATION_SQL = _lpa_sql()

QUERIES["graph_label_propagation"] = (
    graph_label_propagation,
    GRAPH_LABEL_PROPAGATION_SQL,
)


PTR_DOUBLING_ROUNDS = 3  # covers hierarchy depth 2^3 = 8 (sf1 depth is 5)


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-hierarchy flattening without a recursive CTE —
    Spark has none, and a naive per-level loop is O(depth) joins.
    The Spark-first answer is POINTER DOUBLING: each round every
    node's pointer jumps to its pointer's pointer (one self-join),
    so after r rounds a node has compressed 2^r ancestry hops —
    O(log depth) rounds flattens any chain, the standard
    transitive-closure shape for 100 TB hierarchies (org charts,
    ledger roll-ups, BOM trees).

    The hierarchy is synthetic but fixed: parent(c) = floor(c/10)
    over consecutive customer keys (roots: c < 10), giving a real
    multi-level tree in every scale factor. Output: per-depth node
    count + account-balance rollup, hash-matched against a DuckDB
    WITH RECURSIVE walk of the same tree — the declarative spec the
    doubling loop must agree with.
    """
    c = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("node"), "c_acctbal"
    )
    state = c.select(
        "node",
        F.when(F.col("node") >= 10, F.floor(F.col("node") / 10))
        .otherwise(F.col("node"))
        .cast("long")
        .alias("ptr"),
        F.when(F.col("node") >= 10, F.lit(1)).otherwise(F.lit(0)).alias("d"),
    )
    for _ in range(PTR_DOUBLING_ROUNDS):
        hop = state.select(
            F.col("node").alias("_n"), F.col("ptr").alias("_p"), F.col("d").alias("_d")
        )
        state = (
            state.join(hop, state.ptr == hop._n)
            .select("node", F.col("_p").alias("ptr"), (F.col("d") + F.col("_d")).alias("d"))
            .localCheckpoint()  # truncate the doubling lineage
        )
    return (
        state.join(c, "node")
        .groupBy(F.col("d").alias("depth"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("acctbal_total"),
        )
    )


Q_HIERARCHY_ROLLUP_SQL = """
WITH RECURSIVE walk AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS d FROM customer
  UNION ALL
  SELECT node, CAST(floor(cur / 10) AS BIGINT), d + 1 FROM walk WHERE cur >= 10
), final AS (
  SELECT node, max(d) AS depth FROM walk GROUP BY node
)
SELECT depth, count(*) AS n_customers,
       round(sum(c_acctbal), 4) AS acctbal_total
FROM final JOIN customer ON node = c_custkey
GROUP BY depth
"""

QUERIES["q_hierarchy_rollup"] = (q_hierarchy_rollup, Q_HIERARCHY_ROLLUP_SQL)


_KCORE_K = 2
_KCORE_ROUNDS = 3


def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel (k=2, 3 rounds) over the near-dup pair
    graph: repeatedly drop nodes with degree < k and the edges they
    carry, reporting the (nodes, edges) census after each round —
    the cheap structural screen that separates chained/clustered
    template families from isolated accidental pairs.

    Fixed round count keeps the computation SQL-expressible (the
    oracle chains three CTE generations) and the Spark plan a
    static DAG: each round is degree-aggregate → semi-join filter,
    both keyed on doc ids. At 100 TB each round is two hash
    shuffles on the shrinking edge set; full convergence would wrap
    the same body in the ``connected_components`` loop pattern
    (localCheckpoint every few rounds).
    """
    docs = Catalog(spark, sf_dir).documents
    # truncate lineage per round (same medicine as
    # connected_components): without it round N's plan re-nests the
    # whole shingle/edge builder N times and every census re-runs it
    und = _near_dup_edges(docs).localCheckpoint()
    summaries = []
    for rnd in range(1, _KCORE_ROUNDS + 1):
        sym = und.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
            und.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        alive = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("u").alias("node"))
        )
        und = (
            und.join(alive, und.doc_a == alive.node, "left_semi")
            .join(alive, F.col("doc_b") == alive.node, "left_semi")
            .localCheckpoint()
        )
        summaries.append(
            und.select(F.explode(F.array("doc_a", "doc_b")).alias("x")).agg(
                F.lit(rnd).alias("round"),
                F.count_distinct("x").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.union(s)
    return out


def _kcore_sql() -> str:
    gens = []
    prev = "pairs"
    for rnd in range(1, _KCORE_ROUNDS + 1):
        gens.append(f"""sym{rnd} AS (
  SELECT doc_a AS u, doc_b AS v FROM {prev}
  UNION ALL SELECT doc_b, doc_a FROM {prev}
), alive{rnd} AS (
  SELECT u AS node FROM sym{rnd} GROUP BY u HAVING count(*) >= {_KCORE_K}
), e{rnd} AS (
  SELECT p.doc_a, p.doc_b FROM {prev} p
  JOIN alive{rnd} a ON p.doc_a = a.node
  JOIN alive{rnd} b ON p.doc_b = b.node
)""")
        prev = f"e{rnd}"
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, count(DISTINCT x) AS n_nodes,"
        f" CAST(count(*) / 2 AS BIGINT) AS n_edges FROM"
        f" (SELECT doc_a AS x FROM e{r} UNION ALL SELECT doc_b FROM e{r})"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return (
        "WITH " + _SQL_EDGE_PAIRS.removeprefix("WITH RECURSIVE ").strip()
        if _SQL_EDGE_PAIRS.startswith("WITH")
        else "WITH " + _SQL_EDGE_PAIRS
    ) + ", " + ", ".join(gens) + "\n" + unions


QUERIES["graph_kcore_peel"] = (graph_kcore_peel, _kcore_sql())


def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution shape of the near-dup graph: the degree
    histogram plus a log-log OLS slope over it — scale-free-ish
    corpora (slope ≈ −2..−3) mean a few template hubs dominate,
    which changes the dedup strategy (cap-and-star) versus a flat
    random-overlap graph.

    Degrees are one aggregate over the edge list; the histogram is
    bounded by max degree; the fit is the algebraic regr pair over
    histogram rows. Returned as one row so the driver hash covers
    slope, fit quality, and the census extremes together.
    """
    docs = Catalog(spark, sf_dir).documents
    edges = _near_dup_edges(docs)
    deg = (
        edges.select(F.col("doc_a").alias("n"))
        .union(edges.select(F.col("doc_b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    fit = hist.agg(
        F.count(F.lit(1)).alias("n_degree_levels"),
        F.sum("n_nodes").alias("n_nodes_total"),
        F.max("degree").alias("max_degree"),
        _R4(
            F.regr_slope(
                F.log(F.col("n_nodes").cast("double")),
                F.log(F.col("degree").cast("double")),
            ),
            "loglog_slope",
        ),
        _R4(
            F.regr_r2(
                F.log(F.col("n_nodes").cast("double")),
                F.log(F.col("degree").cast("double")),
            ),
            "r2",
        ),
    )
    return fit


def _degree_powerlaw_sql() -> str:
    return f"""
WITH {_SQL_EDGE_PAIRS.removeprefix("WITH RECURSIVE ").strip() if _SQL_EDGE_PAIRS.startswith("WITH") else _SQL_EDGE_PAIRS},
deg AS (
  SELECT n, count(*) AS degree FROM (
    SELECT doc_a AS n FROM pairs UNION ALL SELECT doc_b FROM pairs
  ) GROUP BY n
), hist AS (
  SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
)
SELECT count(*) AS n_degree_levels,
       CAST(sum(n_nodes) AS BIGINT) AS n_nodes_total,
       CAST(max(degree) AS BIGINT) AS max_degree,
       round(regr_slope(ln(CAST(n_nodes AS DOUBLE)),
                        ln(CAST(degree AS DOUBLE))), 4) AS loglog_slope,
       round(regr_r2(ln(CAST(n_nodes AS DOUBLE)),
                     ln(CAST(degree AS DOUBLE))), 4) AS r2
FROM hist
"""


QUERIES["graph_degree_powerlaw"] = (graph_degree_powerlaw, _degree_powerlaw_sql())


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA partition over the near-dup
    graph — the one-number answer to "are these communities real":
    Q = Σ_c (e_c/m − (d_c/2m)²). Near zero means LPA found nothing
    beyond chance; the conventional ≥ 0.3 bar means the template
    families are structurally real.

    Reuses the deterministic LPA labels; the score is two bounded
    joins (edge→labels, incidence→labels) and scalar algebra — no
    extra iteration beyond LPA's fixed rounds.
    """
    docs = Catalog(spark, sf_dir).documents
    edges = _near_dup_edges(docs).localCheckpoint()
    labels = label_propagation(edges)
    la = labels.select(F.col("node").alias("doc_a"), F.col("label").alias("ca"))
    lb = labels.select(F.col("node").alias("doc_b"), F.col("label").alias("cb"))
    tagged = edges.join(la, "doc_a").join(lb, "doc_b")
    m = edges.count()
    intra = tagged.filter(F.col("ca") == F.col("cb")).groupBy("ca").agg(
        F.count(F.lit(1)).alias("e_c")
    )
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .union(edges.select(F.col("doc_b").alias("node")))
        .join(labels, "node")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    joined = deg.join(
        intra.withColumnRenamed("ca", "label"), "label", "left"
    ).select(
        "label",
        F.coalesce("e_c", F.lit(0)).alias("e_c"),
        "d_c",
    )
    q = joined.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(
            F.col("e_c") / F.lit(float(m))
            - F.pow(F.col("d_c") / F.lit(2.0 * m), 2)
        ).alias("q"),
    )
    return q.select(
        "n_communities",
        F.lit(m).alias("n_edges"),
        _R4(F.col("q"), "modularity"),
    )


def _modularity_sql() -> str:
    return _lpa_sql(
        final_select="""
, la AS (SELECT node, label FROM {labels}),
tagged AS (
  SELECT p.doc_a, p.doc_b, a.label AS ca, b.label AS cb
  FROM pairs p JOIN la a ON a.node = p.doc_a JOIN la b ON b.node = p.doc_b
), m AS (SELECT count(*) AS m FROM pairs),
intra AS (
  SELECT ca AS label, count(*) AS e_c FROM tagged WHERE ca = cb GROUP BY ca
), deg AS (
  SELECT l.label, count(*) AS d_c FROM (
    SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b FROM pairs
  ) i JOIN la l ON l.node = i.node GROUP BY l.label
)
SELECT count(*) AS n_communities,
       CAST(max(m.m) AS BIGINT) AS n_edges,
       round(sum(coalesce(intra.e_c, 0) / CAST(m.m AS DOUBLE)
                 - pow(deg.d_c / (2.0 * m.m), 2)), 4) AS modularity
FROM deg LEFT JOIN intra USING (label) CROSS JOIN m
"""
    )


QUERIES["graph_modularity"] = (graph_modularity, _modularity_sql())


_LINKPRED_TOP = 20
_CO_MIN = 3  # orders two parts must share to count as an edge


def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction (Liben-Nowell &
    Kleinberg 2003) over the part co-purchase graph: nodes are
    parts, an edge means the two parts were ordered together in at
    least ``_CO_MIN`` orders, and for part pairs with NO edge the
    score |N(a)∩N(b)| / |N(a)∪N(b)| ranks the bundles the graph
    says are missing — the classic "customers who buy these also
    buy" candidate list, computed purely from graph structure.

    Scale shape: co-occurrence pairs explode per order (≈ (7 choose
    2) rows per order — linear in lineitems, never parts²); common
    neighbors are one self-join of the symmetric adjacency on the
    shared-neighbor key (Σ deg² wedges, same budget as triangle
    counting); existing edges leave via a left-anti join; output is
    a bounded top-20.
    """
    # r17 (guide §2.5 input skew / §6): a compact lineitem parquet can
    # arrive as ONE scan split, serializing the distinct's partial
    # aggregate over millions of rows on a single core (measured: a
    # 4.4 s straggler task at sf1 while 20 cores idled, re-run once
    # per lazy-checkpoint consumer). Widen-only repartition first —
    # the same expand_parallelism idiom text_winnow_overlap got in
    # r16; a no-op on well-laid-out input at scale.
    li = (
        expand_parallelism(
            Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
        )
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    edges = (
        co.filter(F.col("n_co") >= _CO_MIN)
        .select("pa", "pb")
        # consumed 5x (sym both directions, anti-join, and via sym by
        # deg/commons): checkpoint so the per-order pair expansion
        # runs once
        .localCheckpoint(eager=False)
    )
    sym = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    ).select(F.col("pa").alias("node"), F.col("pb").alias("nbr"))
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    x, y = sym.alias("x"), sym.alias("y")
    commons = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(
            F.col("x.node").alias("na"), F.col("y.node").alias("nb")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = commons.join(
        edges,
        (F.col("na") == F.col("pa")) & (F.col("nb") == F.col("pb")),
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("node").alias("na"), F.col("deg").alias("da")), "na")
        .join(deg.select(F.col("node").alias("nb"), F.col("deg").alias("db")), "nb")
        .select(
            "na",
            "nb",
            "n_common",
            _R4(
                F.col("n_common")
                / (F.col("da") + F.col("db") - F.col("n_common")),
                "jaccard",
            ),
        )
    )
    # distributed top-k (TakeOrderedAndProject: per-partition k, then
    # a k·P driver merge), rank re-derived on the 20 surviving rows —
    # never one unpartitioned window over ALL wedge candidates
    wtop = [F.desc("jaccard"), F.asc("na"), F.asc("nb")]
    return (
        scored.orderBy(*wtop)
        .limit(_LINKPRED_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select("rank", F.col("na").alias("part_a"), F.col("nb").alias("part_b"),
                "n_common", "jaccard")
    )


GRAPH_LINKPRED_SQL = rf"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_co
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), edges AS (
  SELECT pa, pb FROM co WHERE n_co >= {_CO_MIN}
), sym AS (
  SELECT pa AS node, pb AS nbr FROM edges
  UNION ALL
  SELECT pb AS node, pa AS nbr FROM edges
), deg AS (
  SELECT node, count(*) AS deg FROM sym GROUP BY node
), commons AS (
  SELECT x.node AS na, y.node AS nb, count(*) AS n_common
  FROM sym x JOIN sym y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY 1, 2
), cand AS (
  SELECT c.* FROM commons c
  ANTI JOIN edges e ON c.na = e.pa AND c.nb = e.pb
), scored AS (
  SELECT na, nb, CAST(n_common AS BIGINT) AS n_common,
         round(n_common / CAST(da.deg + db.deg - n_common AS DOUBLE), 4)
           AS jaccard
  FROM cand JOIN deg da ON da.node = cand.na
            JOIN deg db ON db.node = cand.nb
)
SELECT CAST(row_number() OVER (ORDER BY jaccard DESC, na ASC, nb ASC)
            AS INTEGER) AS rank,
       na AS part_a, nb AS part_b, n_common, jaccard
FROM scored
ORDER BY rank LIMIT {_LINKPRED_TOP}
"""

QUERIES["graph_jaccard_link_prediction"] = (
    graph_jaccard_link_prediction,
    GRAPH_LINKPRED_SQL,
)



def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (pa < pb) part co-purchase edges: parts ordered
    together in ≥ ``_CO_MIN`` orders — the same graph
    ``graph_jaccard_link_prediction`` predicts over. Pair expansion
    is per-order (linear in lineitems, never parts²)."""
    # r17 (guide §2.4 remove shuffles; VERDICT r16 item 5): the build
    # was distinct (exchange 1) → self-join on l_orderkey (exchange 2
    # + SMJ sorts) → per-pair count (exchange 3). Measured at sf1,
    # this BUILD is the whole query — the co-purchase graph itself has
    # ~40 edges and max degree 1 (no hub skew to salt; the Σ deg²
    # wedge mass downstream is trivial). One order-keyed collect_set
    # (dedup folded into the aggregate) + bucket-local pair expansion
    # (pair_structs, the codebase's standard shape; array_sort keeps
    # the canonical pa < pb orientation) produces identical (pa, pb,
    # n_co) with TWO exchanges and no join. Baskets are bounded
    # (TPC-H ≤ 7 lineitems/order), so the expansion is linear.
    # expand_parallelism first: a compact lineitem parquet can arrive
    # as ONE scan split, serializing the partial aggregate on one
    # core (measured 4.4 s straggler at sf1 while 20 cores idled).
    from etl_gov_spark.operators.dedup import pair_structs

    li = expand_parallelism(
        Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    ).filter(F.size("ps") > 1)
    return (
        baskets.select(F.explode(pair_structs(F.col("ps"))).alias("p"))
        .groupBy(F.col("p.a").alias("pa"), F.col("p.b").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _CO_MIN)
        .select("pa", "pb")
    )


_COPURCHASE_SQL_HEAD = f"""li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT pa, pb FROM (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_co
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
  ) WHERE n_co >= {_CO_MIN}
)"""


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Newman
    2002): the Pearson correlation of endpoint degrees over edges —
    positive means hubs buy with hubs (assortative catalog bundles),
    negative means hubs anchor long-tail parts (hub-and-spoke
    merchandising). One edge census, one degree aggregate, one
    broadcast-joined correlation — no wedge expansion at all.

    Directed-edge convention: correlation over BOTH orientations of
    every undirected edge (the standard undirected estimator).
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    )
    deg = sym.groupBy("pa").agg(F.count(F.lit(1)).alias("deg"))
    j = (
        sym.join(F.broadcast(deg.withColumnRenamed("deg", "dx")), "pa")
        .join(
            F.broadcast(
                deg.select(
                    F.col("pa").alias("pb"), F.col("deg").alias("dy")
                )
            ),
            "pb",
        )
    )
    # explicit power-sum Pearson instead of F.corr: ANSI corr throws
    # DIVIDE_BY_ZERO on a zero-variance side (a tiny or k-regular
    # graph — observed at sf0.1 where the co-purchase graph is 2
    # edges, all degrees 1); this returns NULL there instead, and
    # the oracle replays the identical algebra
    sums = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pa").alias("n_nodes"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    vx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    vy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    return sums.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        "n_nodes",
        _R4(F.col("sx") / n, "mean_edge_degree"),
        F.when(vx * vy > 0, F.round(cov / F.sqrt(vx * vy), 4)).alias(
            "assortativity"
        ),
    )


GRAPH_ASSORTATIVITY_SQL = f"""
WITH {_COPURCHASE_SQL_HEAD}, sym AS (
  SELECT pa, pb FROM edges
  UNION ALL
  SELECT pb AS pa, pa AS pb FROM edges
), deg AS (
  SELECT pa, count(*) AS deg FROM sym GROUP BY pa
)
, sums AS (
  SELECT count(*) AS n,
         count(DISTINCT s.pa) AS n_nodes,
         sum(dx.deg) AS sx, sum(dy.deg) AS sy,
         sum(dx.deg * dx.deg) AS sxx, sum(dy.deg * dy.deg) AS syy,
         sum(dx.deg * dy.deg) AS sxy
  FROM sym s
  JOIN deg dx ON s.pa = dx.pa
  JOIN deg dy ON s.pb = dy.pa
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       round(sx / CAST(n AS DOUBLE), 4) AS mean_edge_degree,
       CASE WHEN (sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
               * (syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))) > 0
            THEN round((sxy / CAST(n AS DOUBLE)
                        - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                       / sqrt((sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                            * (syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))),
                       4)
            ELSE NULL END AS assortativity
FROM sums
"""

QUERIES["graph_assortativity"] = (graph_assortativity, GRAPH_ASSORTATIVITY_SQL)


def graph_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity of the co-purchase graph: 3×triangles /
    open-wedge count — ONE number for "how cliquish is the catalog"
    (the global companion of ``graph_triangle_count``'s per-node
    clustering over the dedup graph). Triangles come from the
    canonical wedge join + closure semi-join; the wedge denominator
    is the Σ deg(deg−1)/2 aggregate — no second expansion.
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(
            edges.select(F.col("pa").alias("a"), F.col("pb").alias("c")),
            ["a", "c"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    sym = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    )
    deg = sym.groupBy("pa").agg(F.count(F.lit(1)).alias("deg"))
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        F.col("n_wedges").cast("long").alias("n_wedges"),
        "n_nodes",
        _R4(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            "transitivity",
        ),
    )


GRAPH_TRANSITIVITY_SQL = f"""
WITH {_COPURCHASE_SQL_HEAD}, tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.pb = e2.pa
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.pa = e1.pa AND e3.pb = e2.pb)
), sym AS (
  SELECT pa, pb FROM edges
  UNION ALL
  SELECT pb AS pa, pa AS pb FROM edges
), deg AS (
  SELECT pa, count(*) AS deg FROM sym GROUP BY pa
), wed AS (
  SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
         count(*) AS n_nodes
  FROM deg
)
SELECT CAST(n_triangles AS BIGINT) AS n_triangles, n_wedges,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       round(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 4)
         AS transitivity
FROM tri CROSS JOIN wed
"""

QUERIES["graph_global_transitivity"] = (
    graph_global_transitivity,
    GRAPH_TRANSITIVITY_SQL,
)


def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach distribution of the co-purchase graph: for each
    part, |{nodes within distance ≤ 2}|, histogrammed into power-of-
    two buckets — the "how much of the catalog is one recommendation
    hop away" census that sizes any graph-expansion feature before
    you build it.

    One wedge join on the shared-neighbour key produces distance-2
    pairs (Σ deg² budget, the contract the round-8 stress measured);
    distinct union with direct neighbours, then two bounded
    aggregates. Bucket = floor(log₂ reach).
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    ).select(F.col("pa").alias("node"), F.col("pb").alias("nbr"))
    x, y = sym.alias("x"), sym.alias("y")
    two_hop = (
        x.join(y, F.col("x.nbr") == F.col("y.node"))
        .select(F.col("x.node").alias("node"), F.col("y.nbr").alias("reach"))
        .filter(F.col("node") != F.col("reach"))
    )
    # ONE shuffle keyed on node with map-side set dedup, instead of
    # distinct-on-pairs (shuffle 1) + regroup-by-node (shuffle 2):
    # the wedge output is Σ deg² rows and was paying both shuffles
    # at full width (worst per-query sf1 ratio in BENCH_SF1_r16).
    # Per-node set size is bounded by the part catalog (a dimension,
    # not a fact); a web-scale graph would swap the exact set for an
    # HLL sketch, same plan shape.
    reach = (
        sym.select("node", F.col("nbr").alias("reach"))
        .union(two_hop)
        .groupBy("node")
        .agg(F.size(F.collect_set("reach")).alias("n_reach"))
    )
    bucket = F.floor(F.log2("n_reach")).cast("int")
    return reach.groupBy(bucket.alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("n_reach").alias("min_reach"),
        F.max("n_reach").alias("max_reach"),
        _R4(F.avg("n_reach"), "mean_reach"),
    )


GRAPH_TWO_HOP_SQL = f"""
WITH {_COPURCHASE_SQL_HEAD}, sym AS (
  SELECT pa AS node, pb AS nbr FROM edges
  UNION ALL
  SELECT pb AS node, pa AS nbr FROM edges
), two_hop AS (
  SELECT x.node, y.nbr AS reach
  FROM sym x JOIN sym y ON x.nbr = y.node
  WHERE x.node <> y.nbr
), reach AS (
  SELECT node, count(*) AS n_reach FROM (
    SELECT node, nbr AS reach FROM sym
    UNION
    SELECT node, reach FROM two_hop
  ) GROUP BY node
)
SELECT CAST(floor(log2(n_reach)) AS INTEGER) AS log2_bucket,
       count(*) AS n_parts,
       CAST(min(n_reach) AS BIGINT) AS min_reach,
       CAST(max(n_reach) AS BIGINT) AS max_reach,
       round(avg(n_reach), 4) AS mean_reach
FROM reach GROUP BY 1
"""

QUERIES["graph_two_hop_reach"] = (graph_two_hop_reach, GRAPH_TWO_HOP_SQL)


def dedup_cluster_size_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution in power-of-two buckets,
    with the doc mass each bucket holds — the dedup triage readout:
    a heavy 2^4+ tail means template families (dedup pays off big),
    all-2s means scattered accidental pairs (exact dedup was enough).
    Complements ``graph_degree_powerlaw`` (edges) at cluster grain.

    One bounded aggregate on top of the connected-components output;
    cost is the ladder's, the census is free.
    """
    comp = dedup_clusters(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.max("cluster_size").alias("sz")
    )
    bucket = F.floor(F.log2("sz")).cast("int")
    tot = sizes.agg(F.sum("sz").alias("t"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .groupBy(bucket.alias("log2_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
            _R4(F.sum("sz") / F.max("t"), "doc_share"),
            F.min("sz").alias("min_size"),
            F.max("sz").alias("max_size"),
        )
    )


DEDUP_CLUSTER_POWERLAW_SQL = rf"""
WITH RECURSIVE {_SQL_EDGE_PAIRS}, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
), comp AS (
  SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
), sizes AS (
  SELECT component, count(*) AS sz FROM comp GROUP BY component
), tot AS (SELECT sum(sz) AS t FROM sizes)
SELECT CAST(floor(log2(sz)) AS INTEGER) AS log2_size,
       count(*) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       round(sum(sz) / CAST(max(t) AS DOUBLE), 4) AS doc_share,
       CAST(min(sz) AS BIGINT) AS min_size,
       CAST(max(sz) AS BIGINT) AS max_size
FROM sizes CROSS JOIN tot
GROUP BY 1
"""

QUERIES["dedup_cluster_size_powerlaw"] = (
    dedup_cluster_size_powerlaw,
    DEDUP_CLUSTER_POWERLAW_SQL,
)


# ---------------------------------------------------------------------------
# DBSCAN over the embedding ε-graph (density clustering, §D)
# ---------------------------------------------------------------------------

_DBSCAN_MIN_NBRS = 3  # core point: ≥3 ε-neighbors (minPts=4 w/ self)


def emb_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering over the embedding corpus — the
    classic clusters-of-arbitrary-shape + explicit-noise algorithm
    the Lloyd/SemDeDup family can't express (k-means assigns EVERY
    point; DBSCAN separates dense structure from outliers, the
    distinction a training-data curator actually wants).

    Composed from driver-green parts, LSH-blocked like everything
    else in the family: the ε-neighborhood graph IS
    ``dedup_embedding``'s verified pair set (sign-LSH banded
    candidates, exact-cosine edge test — deterministic and
    oracle-replayable, i.e. this is the standard approximate
    ε-graph DBSCAN at scale); core points have ≥ 3 neighbors;
    clusters are connected components over CORE-CORE edges (the
    shared min-label propagation); border points attach to the
    smallest component among their core neighbors; everything else
    is noise. Per-cluster readout + one component=-1 noise row, so
    the full partition of the corpus is value-checked.

    Scale: degree count and core filter are one aggregate over the
    symmetrized pair list; components iterate on the (much smaller)
    core subgraph; border assignment is one join. Nothing exceeds
    the pair census already priced in dedup_embedding.
    """
    from etl_gov_spark.operators.dedup import dedup_embedding

    # The pair list feeds degree count, core-edge build AND the
    # per-round convergence checks inside connected_components;
    # without truncation each consumer re-runs the whole LSH
    # banding pipeline (observed: minutes instead of seconds).
    # Bounded intermediate (one row per ε-edge), same stance as
    # ann_ivf_topk's cells.
    # r17: eager (was lazy) — a lazy checkpoint shares NOTHING between
    # the multiple subtree copies inside one action (sym references
    # pairs twice, core_edges twice more); the event log showed each
    # copy re-running the whole banding+verify pipeline (~0.5-0.9 s
    # per copy at sf0.1). Eager materializes once; every consumer
    # reads the checkpointed blocks. Same lesson applied to core /
    # core_comp / clusters below.
    pairs = (
        dedup_embedding(spark, sf_dir)
        .select("vec_a", "vec_b")
        .localCheckpoint(eager=True)
    )
    sym = pairs.union(
        pairs.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    )
    deg = sym.groupBy("vec_a").agg(F.count(F.lit(1)).alias("deg"))
    # r16 OPTIMIZATION (guide §2.4): `core` feeds FOUR consumers
    # (both sides of the core-edge build, the lone-core anti-join,
    # the border anti-join); untruncated, each consumer's job
    # re-evaluated the symmetrize + degree aggregate, and the final
    # plan carried ~50 Exchanges of duplicated subtrees. One lazy
    # checkpoint (bounded: one id per core point) makes every
    # consumer share a single evaluation.
    core = (
        deg.filter(F.col("deg") >= _DBSCAN_MIN_NBRS)
        .select(F.col("vec_a").alias("vec_id"))
        .localCheckpoint(eager=True)
    )
    core_edges = (
        pairs.join(core.withColumnRenamed("vec_id", "vec_a"), "vec_a")
        .join(core.withColumnRenamed("vec_id", "vec_b"), "vec_b")
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    comp = connected_components(core_edges).withColumnRenamed("node", "vec_id")
    # isolated cores (no core neighbor) form singleton clusters
    lone = core.join(comp, "vec_id", "left_anti").select(
        "vec_id", F.col("vec_id").alias("component")
    )
    # shared by the border label join and the final core/border
    # union — one evaluation instead of two (bounded: one row per
    # core point).
    core_comp = comp.unionByName(lone).localCheckpoint(eager=True)
    border = (
        sym.withColumnRenamed("vec_a", "vec_id")
        .withColumnRenamed("vec_b", "nbr")
        .join(core, "vec_id", "left_anti")  # not itself core
        .join(
            core_comp.select(
                F.col("vec_id").alias("nbr"), "component"
            ),
            "nbr",
        )
        .groupBy("vec_id")
        .agg(F.min("component").alias("component"))
    )
    assigned = core_comp.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    # r16 OPTIMIZATION (guide §2.4): the noise row used to count
    # `assigned` with a SECOND full copy of the union/border subtree
    # in the same plan; n_assigned == Σ size over the (tiny,
    # checkpoint-shared) per-cluster readout by construction, so it
    # is derived from `clusters` instead — one evaluation of the
    # assignment pipeline per run.
    clusters = (
        assigned.groupBy("component")
        .agg(
            F.sum(F.when(F.col("role") == "core", 1).otherwise(0)).alias("n_core"),
            F.sum(F.when(F.col("role") == "border", 1).otherwise(0)).alias(
                "n_border"
            ),
            F.count(F.lit(1)).alias("size"),
        )
        .localCheckpoint(eager=True)
    )
    n_total = Catalog(spark, sf_dir).embeddings.agg(
        F.count(F.lit(1)).alias("n_total")
    )
    n_assigned = clusters.agg(F.sum("size").alias("n_assigned"))
    noise = (
        n_total.crossJoin(F.broadcast(n_assigned))
        .select(
            F.lit(-1).cast("long").alias("component"),
            F.lit(0).cast("long").alias("n_core"),
            F.lit(0).cast("long").alias("n_border"),
            (F.col("n_total") - F.col("n_assigned")).alias("size"),
        )
    )
    return clusters.unionByName(noise).orderBy("component")


def _cc_replay_sql(edges_cte: str, rounds: int = MAX_ROUNDS) -> str:
    """Unrolled non-recursive CC oracle: replay ``rounds`` rounds of
    EXACTLY the Spark large-star/small-star edge rewrite as
    MATERIALIZED CTEs over the symmetrized edge CTE ``edges_cte`` —
    the ``_pagerank_sql`` replay scheme applied to components. Each
    round is two grouped mins + two joins + two distincts, all
    linear in |E| (and E shrinks); the trajectory is a
    deterministic set function of the input edges, so the replay is
    hash-exact, and both steps are identity transforms at the
    star-forest fixpoint, so rounds after convergence are no-ops
    (Spark's early break cannot diverge from the fixed unroll).
    Replaces the WITH RECURSIVE transitive closure that went
    quadratic under the sf1 clone replication. Yields CTEs ending
    in ``ccfinal(node, label)``."""
    parts = [
        f""", e0 AS MATERIALIZED (
  SELECT DISTINCT greatest(a, b) AS hi, least(a, b) AS lo
  FROM {edges_cte} WHERE a <> b
)"""
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f""", sy{r} AS (
  SELECT hi AS u, lo AS v FROM {prev}
  UNION ALL
  SELECT lo AS u, hi AS v FROM {prev}
), ml{r} AS MATERIALIZED (
  SELECT u, least(min(v), u) AS m FROM sy{r} GROUP BY u
), ls{r} AS MATERIALIZED (
  SELECT DISTINCT s.v AS hi, m.m AS lo
  FROM sy{r} s JOIN ml{r} m USING (u) WHERE s.v > s.u
), ms{r} AS MATERIALIZED (
  SELECT hi, min(lo) AS m FROM ls{r} GROUP BY hi
), e{r} AS MATERIALIZED (
  SELECT DISTINCT hi, lo FROM (
    SELECT l.lo AS hi, m.m AS lo
    FROM ls{r} l JOIN ms{r} m USING (hi) WHERE l.lo <> m.m
    UNION ALL
    SELECT hi, m AS lo FROM ms{r}
  )
)"""
        )
        prev = f"e{r}"
    parts.append(
        f""", ccfinal AS MATERIALIZED (
  SELECT n.node, coalesce(p.component, n.node) AS label
  FROM (SELECT DISTINCT a AS node FROM {edges_cte}) n
  LEFT JOIN (SELECT hi, min(lo) AS component FROM {prev} GROUP BY hi) p
    ON p.hi = n.node
)"""
    )
    return "".join(parts)


EMB_DBSCAN_SQL = f"""
WITH pairsrc AS MATERIALIZED (
  SELECT vec_a, vec_b FROM ({{EMB_PAIRS_SQL}}) p
), sym AS (
  SELECT vec_a AS a, vec_b AS b FROM pairsrc
  UNION ALL
  SELECT vec_b AS a, vec_a AS b FROM pairsrc
), deg AS (
  SELECT a AS vec_id, count(*) AS deg FROM sym GROUP BY a
), core AS (
  SELECT vec_id FROM deg WHERE deg >= {_DBSCAN_MIN_NBRS}
), core_edges AS (
  SELECT p.vec_a AS a, p.vec_b AS b FROM pairsrc p
  WHERE p.vec_a IN (SELECT vec_id FROM core)
    AND p.vec_b IN (SELECT vec_id FROM core)
), cesym AS MATERIALIZED (
  SELECT a, b FROM core_edges UNION ALL SELECT b, a FROM core_edges
){_cc_replay_sql("cesym")}, comp AS (
  SELECT node AS vec_id, label AS component FROM ccfinal
), core_comp AS (
  SELECT vec_id, component FROM comp
  UNION ALL
  SELECT vec_id, vec_id AS component FROM core
  WHERE vec_id NOT IN (SELECT vec_id FROM comp)
), border AS (
  SELECT s.a AS vec_id, min(cc.component) AS component
  FROM sym s JOIN core_comp cc ON cc.vec_id = s.b
  WHERE s.a NOT IN (SELECT vec_id FROM core)
  GROUP BY s.a
), assigned AS (
  SELECT vec_id, component, 'core' AS role FROM core_comp
  UNION ALL
  SELECT vec_id, component, 'border' AS role FROM border
), clusters AS (
  SELECT component,
         sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS n_core,
         sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS n_border,
         count(*) AS size
  FROM assigned GROUP BY component
)
SELECT component, CAST(n_core AS BIGINT) AS n_core,
       CAST(n_border AS BIGINT) AS n_border, CAST(size AS BIGINT) AS size
FROM clusters
UNION ALL
SELECT -1, 0, 0,
       (SELECT count(*) FROM embeddings)
         - (SELECT count(*) FROM assigned)
ORDER BY component
"""


def _dbscan_sql() -> str:
    from etl_gov_spark.operators.dedup import DEDUP_EMBEDDING_SQL

    return EMB_DBSCAN_SQL.replace("{EMB_PAIRS_SQL}", DEDUP_EMBEDDING_SQL)


QUERIES["emb_dbscan_clusters"] = (emb_dbscan_clusters, _dbscan_sql())

"""Dedup semantics on planted duplicates.

The real corpus has no exact dups, so these tests write a synthetic
documents.parquet (with planted exact + near duplicates) to a temp
dir and run the same operators through the standard catalog path —
proving detection actually fires.
"""

from __future__ import annotations

import pytest

from etl_gov_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the window and the bird sings a morning song"
)


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("planted"))
    rows = [
        (0, BASE, "en", "src0", len(BASE)),
        (1, BASE, "en", "src0", len(BASE)),  # exact dup of 0
        (2, BASE.replace("morning", "evening"), "en", "src0", len(BASE)),  # near dup
        (3, "completely different text about spark query engines and shuffles "
            "with partitions and joins everywhere in the plan tree", "en", "src0", 120),
        (4, "another unrelated document mentioning parquet files and columnar "
            "storage formats for analytical workloads at scale", "en", "src1", 115),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return tmp


def test_exact_dedup_finds_planted_dup(spark, planted_dir):
    rows = D.dedup_exact(spark, planted_dir).collect()
    dup_groups = [r for r in rows if r.group_size > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0].keep_doc_id == 0
    assert dup_groups[0].group_size == 2


def test_minhash_lsh_finds_exact_and_near_dup(spark, planted_dir):
    pairs = {(r.doc_a, r.doc_b): r for r in D.dedup_minhash_lsh(spark, planted_dir).collect()}
    assert (0, 1) in pairs  # exact dup: all bands collide
    assert pairs[(0, 1)].n_shared_bands == D.N_BANDS
    assert pairs[(0, 1)].sig_agreement == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught by >=1 band
    # unrelated docs don't pair with the dup cluster
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_ngram_jaccard_ranks_near_dup_first(spark, planted_dir):
    rows = D.dedup_ngram_jaccard(spark, planted_dir).collect()
    src0 = [r for r in rows if r.source == "src0"]
    top = min(src0, key=lambda r: r.rank)
    assert (top.doc_a, top.doc_b) == (0, 1)
    assert top.jaccard == 1.0


def test_simhash_clusters_near_dups(spark, planted_dir):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.dedup_simhash(spark, planted_dir).collect()}
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash
    assert (0, 2) in pairs  # near dup within hamming threshold
    assert (0, 3) not in pairs  # unrelated doc far away


def test_embedding_dedup_on_planted_vectors(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("vecs"))
    base = [1.0] * 64
    near = [1.0] * 63 + [0.9]
    ortho = [1.0, -1.0] * 32
    df = spark.createDataFrame(
        [(0, base, 0), (1, near, 0), (2, ortho, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in D.dedup_embedding(spark, tmp).collect()}
    # a true near-dup (cos ~0.9999) must survive LSH blocking
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 2) not in pairs


def test_emb_mask_keys_expr_matches_column_build(spark):
    """r17: _emb_mask_keys builds its 128 masked keys as ONE SQL
    expression string (driver-time fix); this pins it against the
    original per-key Column construction — identical values, order
    and schema for random 8-bit band patterns."""
    import random

    from pyspark.sql import functions as F

    random.seed(7)
    rows = [([random.randint(0, 255) for _ in range(16)],) for _ in range(100)]
    df = spark.createDataFrame(rows, "pats array<int>")
    a = df.select(D._emb_mask_keys("pats").alias("k"))
    b = df.select(D._emb_mask_keys_cols(F.col("pats")).alias("k"))
    assert a.schema == b.schema
    assert [r.k for r in a.collect()] == [r.k for r in b.collect()]


def test_embedding_dedup_lsh_recall_vs_exact(spark, sf_dir):
    """The LSH-blocked path must recover most of the exact pair set
    at the registered threshold (the misses are deterministic and
    replayed identically by the oracle)."""
    from pyspark.sql import functions as F
    from etl_gov_spark.io.sources import Catalog

    emb = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)))
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    exact = set(
        (r.vec_a, r.vec_b)
        for r in a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", (dot / (F.col("na") * F.col("nb"))).alias("c"))
        .filter(F.col("c") >= D.EMB_DUP_THRESHOLD)
        .collect()
    )
    got = set((r.vec_a, r.vec_b) for r in D.dedup_embedding(spark, sf_dir).collect())
    assert got <= exact  # exact verify: no false positives
    assert len(got) / len(exact) >= 0.8  # measured ~0.90 at sf0.01


def test_containment_catches_embedded_subdocument(spark, tmp_path_factory):
    """A short doc fully embedded in a long one scores containment
    1.0 even though Jaccard is low."""
    from etl_gov_spark.operators.dedup import dedup_containment

    tmp = str(tmp_path_factory.mktemp("contain"))
    short = " ".join(f"w{i}" for i in range(10))
    long = short + " " + " ".join(f"x{i}" for i in range(80))
    rows = [
        (0, short, "en", "s", 10),
        (1, long, "en", "s", 90),
        (2, " ".join(f"z{i}" for i in range(40)), "en", "s", 40),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {(r.doc_a, r.doc_b): r.containment for r in dedup_containment(spark, tmp).collect()}
    assert got[(0, 1)] == 1.0
    assert (0, 2) not in got and (1, 2) not in got


def test_hot_bucket_ceiling_bounds_and_mirrors(spark, tmp_path_factory):
    """A 400-doc identical-text cluster (> MAX_BAND_BUCKET and
    > MAX_SHINGLE_DF) exercises both hot-bucket routes: the LSH band
    path star-routes it (399 hub-spoke pairs instead of
    C(400,2)=79800 — the cluster stays catchable, linearly), the
    inverted shingle-df path drops its stop-shingles, the routing is
    observable via HOT_BUCKET_OBS, legit small clusters elsewhere
    still pair, and the DuckDB oracles — which mirror both rules —
    produce identical results while the ceiling is biting."""
    import duckdb

    tmp = str(tmp_path_factory.mktemp("hotbucket"))
    other = (
        "another unrelated document mentioning parquet files and columnar "
        "storage formats for analytical workloads at scale"
    )
    rows = [(i, BASE, "en", "src0", len(BASE)) for i in range(400)] + [
        (1000, other, "en", "src1", len(other)),
        (1001, other.replace("storage", "memory"), "en", "src1", len(other)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet/*.parquet'"
    )

    mh = D.dedup_minhash_lsh(spark, tmp).collect()
    obs = D.HOT_BUCKET_OBS["dedup_minhash_lsh"].get
    assert obs["hot_buckets"] >= 1
    assert obs["max_bucket"] == 400
    # star route: every cluster member pairs with the hub (doc 0),
    # full signature agreement, all 4 bands — and nothing quadratic
    star = [r for r in mh if r.doc_a == 0]
    assert len(star) == 399
    assert all(r.sig_agreement == 1.0 and r.n_shared_bands == 4 for r in star)
    assert all(r.doc_a == 0 or r.doc_a >= 1000 for r in mh)
    duck_mh = sorted(tuple(r) for r in con.sql(D.DEDUP_MINHASH_SQL).fetchall())
    assert sorted((r.doc_a, r.doc_b, r.n_shared_bands, r.sig_agreement) for r in mh) == duck_mh

    jac = D.dedup_ngram_jaccard(spark, tmp).collect()
    jobs_ = D.HOT_BUCKET_OBS["dedup_ngram_jaccard"].get
    assert jobs_["hot_buckets"] >= 1
    src1 = [r for r in jac if r.source == "src1"]
    assert (src1[0].doc_a, src1[0].doc_b) == (1000, 1001)  # legit pair survives
    assert not [r for r in jac if r.source == "src0"]  # hot shingles dropped
    duck_jac = sorted(tuple(r) for r in con.sql(D.DEDUP_JACCARD_SQL).fetchall())
    assert sorted((r.source, r.doc_a, r.doc_b, r.jaccard, r.rank) for r in jac) == duck_jac


def test_hot_cluster_keeps_canonical_doc_mapping(spark, tmp_path_factory):
    """The 100 TB boilerplate case: a planted hot cluster (identical
    docs, every shingle bucket over MAX_SHINGLE_DF) must still
    resolve to ONE canonical doc — the star route keeps hub edges so
    connected components sees one cluster; with route=drop the
    cluster would vanish from dedup entirely. The DuckDB recursive
    oracle mirrors the hub rule exactly."""
    import duckdb

    from etl_gov_spark.operators import graphs as G

    tmp = str(tmp_path_factory.mktemp("hotcluster"))
    n_hot = 3 * D.MAX_SHINGLE_DF  # 192 identical docs, df 192 > 64
    other = (
        "totally separate text about orchestration engines scheduling "
        "distributed dataflow graphs onto elastic compute clusters"
    )
    rows = [(i, BASE, "en", "src0", len(BASE)) for i in range(n_hot)] + [
        (5000, other, "en", "src1", len(other)),
        (5001, other.replace("elastic", "ephemeral"), "en", "src1", len(other)),
        (5002, "short standalone unrelated snippet entirely", "en", "src1", 40),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    clusters = {r.doc_id: r for r in G.dedup_clusters(spark, tmp).collect()}
    # every hot-cluster member maps to the same component, size n_hot
    assert all(clusters[i].component == 0 for i in range(n_hot))
    assert clusters[0].cluster_size == n_hot
    # ...and the unrelated near-dup pair forms its own component
    assert clusters[5000].component == clusters[5001].component == 5000
    assert 5002 not in clusters  # singleton: no edges

    keep = {r.component: r for r in G.dedup_keep_policy(spark, tmp).collect()}
    assert keep[0].keep_doc_id == 0 and keep[0].cluster_size == n_hot
    assert keep[0].purged_ids.split(",") == [str(i) for i in range(1, n_hot)]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet/*.parquet'"
    )
    duck = sorted(tuple(r) for r in con.sql(G.DEDUP_CLUSTERS_SQL).fetchall())
    got = sorted(
        (r.doc_id, r.component, r.cluster_size)
        for r in G.dedup_clusters(spark, tmp).collect()
    )
    assert got == duck


# ---------------------------------------------------------------- #
# property: the star route is linear and cluster-preserving        #
# ---------------------------------------------------------------- #

def _components(n_docs: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    """Union-find over doc ids 0..n_docs-1 → {doc: min-id of component}."""
    parent = list(range(n_docs))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in range(n_docs)}


def test_star_route_pair_count_and_components_property(spark):
    """Property (hypothesis): for ANY bucket layout, route='star'
    (1) emits at most C(s,2) pairs for under-cap buckets and exactly
    s-1 for over-cap buckets — linear, never quadratic — and
    (2) leaves every bucket connected, so connected components (and
    hence the min-id canonical-doc mapping dedup_keep_policy
    derives) are IDENTICAL to the uncapped all-pairs graph."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    cap = 6

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(st.integers(0, 39), min_size=2, max_size=3 * cap, unique=True),
            min_size=1,
            max_size=8,
        )
    )
    def check(buckets: list[list[int]]) -> None:
        buckets = [sorted(b) for b in buckets]
        df = spark.createDataFrame(
            [(i, b) for i, b in enumerate(buckets)], "bucket_id long, ds array<long>"
        )
        bounded = D.bounded_buckets(df, "ds", cap, "prop_test", route="star")
        pairs = (
            bounded.select(F.explode(D.pair_structs(F.col("ds"))).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .collect()
        )
        got = {(min(r.a, r.b), max(r.a, r.b)) for r in pairs}

        # (1) pair budget: linear for hot buckets, quadratic only small
        budget = sum(
            len(b) - 1 if len(b) > cap else len(b) * (len(b) - 1) // 2
            for b in buckets
        )
        assert len(pairs) <= budget
        for b in buckets:
            if len(b) > cap:
                hub = b[0]
                # hub-spoke only: every emitted pair inside a hot
                # bucket touches its hub
                inside = {p for p in got if p[0] in set(b) and p[1] in set(b)}
                covered = {(min(hub, x), max(hub, x)) for x in b[1:]}
                assert covered <= got, "star route lost a hub edge"

        # (2) canonical mapping unchanged vs the uncapped graph
        uncapped = {
            (x, y) for b in buckets for i, x in enumerate(b) for y in b[i + 1 :]
        }
        assert _components(40, got) == _components(40, uncapped)

    check()


def test_threshold_sweep_monotone(spark, sf_dir):
    from etl_gov_spark.operators.dedup import dedup_threshold_sensitivity

    r = dedup_threshold_sensitivity(spark, sf_dir).collect()[0]
    assert (
        r.n_candidates
        >= r.pairs_ge_01
        >= r.pairs_ge_02
        >= r.pairs_ge_03
        >= r.pairs_ge_05
        >= 0
    )


def test_lsh_recall_audit(spark, sf_dir):
    """Recall ∈ [0,1] per band, captured ≤ true, and the corpus's
    high-similarity near-dups (≥0.7) must be fully recalled — 4
    bands of 2 hashes catch J≥0.7 pairs with near-certainty, so a
    miss there means the banding broke."""
    from etl_gov_spark.operators.dedup import dedup_lsh_recall

    rows = dedup_lsh_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_captured <= r.n_true_pairs
        assert 0.0 <= r.recall <= 1.0
    top = [r for r in rows if r.band == "0.7-1.0"]
    # 4 bands x 2 hashes: catch prob at J just above 0.7 is ~93%,
    # so pin 0.9 — the corpus's near-dups sit near J=1 but corpus
    # regeneration must not flake this
    assert top and top[0].recall >= 0.9


def test_lsh_precision_monotone_in_agreement(spark, sf_dir):
    """Precision and mean true Jaccard must not DECREASE as
    signature agreement rises — the estimator's whole premise."""
    from etl_gov_spark.operators.dedup import dedup_lsh_precision

    rows = {r.band: r for r in dedup_lsh_precision(spark, sf_dir).collect()}
    assert rows
    order = [b for b in ("agree_lo", "agree_mid", "agree_hi") if b in rows]
    for a, b in zip(order, order[1:]):
        assert rows[b].precision >= rows[a].precision - 1e-9
        assert rows[b].mean_jaccard >= rows[a].mean_jaccard - 1e-9
    for r in rows.values():
        assert 0 <= r.n_true <= r.n_candidates


def test_incremental_minhash_equals_full_corpus(spark, sf_dir):
    """incremental(epoch1 ⊎ epoch2) ≡ one-shot dedup_minhash_lsh —
    the contract that lets a nightly ingest dedup against the
    fingerprint store instead of re-scanning the corpus."""
    from etl_gov_spark.operators.dedup import (
        dedup_incremental_minhash,
        dedup_minhash_lsh,
    )

    inc = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands, r.sig_agreement)
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    )
    full = sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands, r.sig_agreement)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    )
    assert inc == full


def test_fingerprint_store_footer_prune_and_append(spark, sf_dir, tmp_path):
    """The store probe is footer-pruned: a NARROW probe batch (a few
    docs → a few band keys) must touch strictly fewer store files
    than exist (metadata-only pruning via io/cow.file_key_ranges),
    and the post-run store must hold every ingested fingerprint."""
    import os

    from pyspark.sql import functions as F2

    from etl_gov_spark.io.cow import file_key_ranges, touched_files
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.dedup import _banded_fingerprints

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    store = str(tmp_path / "store")
    fp = _banded_fingerprints(docs)
    write_range_clustered(fp, store, ("band_key",), num_files=16)
    n_files = sum(1 for n in os.listdir(store) if n.endswith(".parquet"))
    assert n_files >= 8

    # narrow probe: 2 docs → at most 8 band keys
    probe = _banded_fingerprints(docs.filter(F2.col("doc_id").isin(3, 9)))
    ranges = file_key_ranges(store, "band_key")
    touched = touched_files(spark, ranges, probe.select("band_key"), "band_key")
    assert touched is not None
    assert 0 < len(touched) < n_files  # pruning actually bit

    # append a second generation and re-read: nothing lost
    write_range_clustered(probe, store, ("band_key",), num_files=2, mode="append")
    assert spark.read.parquet(store).count() == fp.count() + probe.count()


def test_substring_census_planted_run(spark, tmp_path):
    """dedup_substring_census: plant an exactly-shared 20-token run
    inside otherwise-unrelated documents and require the census to
    report that pair with longest_run_tokens == 20 (k-gram chain
    extension must neither truncate nor over-extend it), the purge
    candidate as the higher doc_id, and no pair for the unrelated
    doc."""
    from etl_gov_spark.operators.dedup import dedup_substring_census

    shared = " ".join(f"shared{i}" for i in range(20))
    docs = [
        (1, f"alpha beta gamma {shared} delta epsilon zeta", "en", "src1"),
        (2, f"one two three four five six seven {shared} eight nine", "en", "src1"),
        (3, "totally unrelated words " + " ".join(f"u{i}" for i in range(30)), "en", "src2"),
    ]
    df = spark.createDataFrame(
        [(d, t, lang, s, len(t)) for d, t, lang, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = dedup_substring_census(spark, str(tmp_path)).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.longest_run_tokens == 20
    assert r.n_diagonals == 1 and r.n_islands == 1
    assert r.purge_candidate == 2


def test_substring_exposure_consistent_with_census(spark, sf_dir):
    """dedup_substring_exposure must agree with the pair census:
    global max run equal, every exposed doc appears in some census
    pair, exposed counts per source match the distinct doc sets the
    census implies."""
    from collections import defaultdict

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.dedup import (
        dedup_substring_census,
        dedup_substring_exposure,
    )

    pairs = dedup_substring_census(spark, sf_dir).collect()
    expo = {r.source: r for r in dedup_substring_exposure(spark, sf_dir).collect()}
    src_of = {
        r.doc_id: r.source
        for r in Catalog(spark, sf_dir).documents.select("doc_id", "source").collect()
    }
    exposed = defaultdict(set)
    best = defaultdict(int)
    for p in pairs:
        for d in (p.doc_a, p.doc_b):
            exposed[src_of[d]].add(d)
            best[d] = max(best[d], p.longest_run_tokens)
    for src, r in expo.items():
        assert r.n_exposed == len(exposed.get(src, set())), src
        if exposed.get(src):
            assert r.max_run_tokens == max(best[d] for d in exposed[src])


def test_cascade_census_monotone_and_consistent(spark, sf_dir):
    """dedup_cascade_census: stages strictly ordered, survivor
    counts monotone non-increasing, purge arithmetic consistent,
    stage-1 survivors equal the independent exact-dedup keeper
    count, and the embeddings/doc key domains really do coincide
    (the assumption the semantic stage joins on)."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.cascade import dedup_cascade_census

    rows = {r.stage: r for r in dedup_cascade_census(spark, sf_dir).collect()}
    assert [rows[i].stage_name for i in range(4)] == [
        "input", "exact", "neardup", "semantic",
    ]
    for i in range(1, 4):
        assert rows[i].docs_out <= rows[i - 1].docs_out
        assert rows[i].tokens_out <= rows[i - 1].tokens_out
        assert rows[i].docs_purged == rows[i - 1].docs_out - rows[i].docs_out
    cat = Catalog(spark, sf_dir)
    exact_keepers = (
        cat.documents.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .count()
        .count()
    )
    assert rows[1].docs_out == exact_keepers
    doc_ids = {r.doc_id for r in cat.documents.select("doc_id").collect()}
    vec_ids = {r.vec_id for r in cat.embeddings.select("vec_id").collect()}
    assert vec_ids <= doc_ids  # semantic stage joins embeddings by doc key


def test_split_leakage_consistent_with_split_and_edges(spark, sf_dir):
    """dedup_split_leakage: pair totals must equal the raw edge
    count, leakage rows are exactly the cross-split cells, and
    within-split cells report zero docs in crossing pairs."""
    from pyspark.sql import functions as F

    from etl_gov_spark.io.sources import Catalog
    from etl_gov_spark.operators.cascade import dedup_split_leakage
    from etl_gov_spark.operators.graphs import _near_dup_edges

    rows = dedup_split_leakage(spark, sf_dir).collect()
    n_edges = _near_dup_edges(Catalog(spark, sf_dir).documents).count()
    assert sum(r.n_pairs for r in rows) == n_edges
    for r in rows:
        assert r.is_leakage == (r.split_a != r.split_b)
        assert r.split_a <= r.split_b  # canonical unordered pair
        if not r.is_leakage:
            assert r.n_docs_in_cross_pairs == 0
        else:
            assert 0 < r.n_docs_in_cross_pairs <= 2 * r.n_pairs


def test_substring_excise_planted_runs(spark, tmp_path):
    """dedup_substring_excise: plant (a) a 30-token run shared by two
    docs and (b) a doc repeating its own 30-token run twice. The
    canonical first occurrence (min (doc_id, pos)) must survive
    untouched; every other occurrence is excised; kept_hash must
    equal the md5 of the manually reconstructed kept token stream."""
    import hashlib

    from etl_gov_spark.operators.dedup import dedup_substring_excise

    run = " ".join(f"shared{i}" for i in range(30))
    selfrep = " ".join(f"rep{i}" for i in range(30))
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(12))
    filler_c = " ".join(f"c{i}" for i in range(9))
    docs = [
        (1, f"{filler_a} {run}", "en", "src1"),             # canonical owner
        (2, f"{filler_b} {run} tail1 tail2", "en", "src1"),  # cross-doc dup
        (3, f"{selfrep} {filler_c} {selfrep}", "en", "src2"),  # within-doc dup
        (4, "totally unrelated " + " ".join(f"u{i}" for i in range(40)), "en", "src2"),
    ]
    df = spark.createDataFrame(
        [(d, t, lang, s, len(t)) for d, t, lang, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in dedup_substring_excise(spark, str(tmp_path)).collect()}

    # canonical doc 1 and the unrelated doc 4 are never rewritten
    assert set(rows) == {2, 3}, rows

    r2 = rows[2]
    assert r2.n_tokens == 12 + 30 + 2
    assert r2.n_spans == 1
    assert r2.excised_tokens == 30
    assert r2.kept_tokens == 14
    kept2 = f"{filler_b} tail1 tail2"
    assert r2.kept_hash == hashlib.md5(kept2.encode()).hexdigest()

    # within-doc: SECOND occurrence excised, first kept
    r3 = rows[3]
    assert r3.n_tokens == 30 + 9 + 30
    assert r3.n_spans == 1
    assert r3.excised_tokens == 30
    kept3 = f"{selfrep} {filler_c}"
    assert r3.kept_hash == hashlib.md5(kept3.encode()).hexdigest()

    # ledger arithmetic holds on every row
    for r in rows.values():
        assert r.n_tokens == r.kept_tokens + r.excised_tokens
        assert r.n_spans >= 1


def test_substring_excise_short_runs_untouched(spark, tmp_path):
    """Runs shorter than SUBSTR_EXCISE_MIN_RUN are census-visible but
    must NOT trigger excision (the Lee et al. threshold gate)."""
    from etl_gov_spark.operators.dedup import (
        SUBSTR_EXCISE_MIN_RUN,
        dedup_substring_excise,
    )

    short = " ".join(f"s{i}" for i in range(SUBSTR_EXCISE_MIN_RUN - 1))
    docs = [
        (1, f"alpha beta gamma {short}", "en", "src1"),
        (2, f"one two three {short} four", "en", "src1"),
    ]
    df = spark.createDataFrame(
        [(d, t, lang, s, len(t)) for d, t, lang, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    assert dedup_substring_excise(spark, str(tmp_path)).count() == 0


def test_canonical_url_rules(spark):
    """canonical_url applies each rule independently of the synth:
    case, www, default ports (kept non-default), fragment, trailing
    slash, tracking params, query-key sort."""
    from pyspark.sql import functions as F

    from etl_gov_spark.operators.dedup import canonical_url

    cases = [
        ("HTTPS://WWW.Ex.COM:443/A/?b=2&a=1&utm_x=9#frag", "https://ex.com/A?a=1&b=2"),
        ("http://ex.com:80/p?id=1", "http://ex.com/p?id=1"),
        ("http://ex.com:8080/p?id=1", "http://ex.com:8080/p?id=1"),
        ("https://ex.com/p/?ref=z&z=1&gclid=g&fbclid=f", "https://ex.com/p?z=1"),
        ("http://ex.com/", "http://ex.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_canonical_census_accounting(spark, sf_dir):
    """dedup_url_canonical: kept+purged == docs per source, the
    corpus-wide keep count equals the distinct canonical URL count,
    and every page group keeps its FIRST capture (min doc_id)."""
    from etl_gov_spark.operators.dedup import dedup_url_canonical

    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_purged == r.n_docs
        assert 0.0 <= r.purge_rate <= 1.0
    # corpus-wide: one keeper per canonical URL (page group of 3)
    n_docs = sum(r.n_docs for r in rows)
    assert sum(r.n_kept for r in rows) == (n_docs + 2) // 3


def test_host_census_blocklist_partition(spark, sf_dir):
    """mm_host_census: blocked domains never appear as kept rows,
    the __blocked__ rollup plus kept rows account for every doc,
    and doc shares sum to ~1."""
    from etl_gov_spark.operators.multimodal import HOST_BLOCKLIST, mm_host_census

    rows = mm_host_census(spark, sf_dir).collect()
    by = {r.domain: r for r in rows}
    assert "__blocked__" in by
    assert not (set(by) & set(HOST_BLOCKLIST))
    from etl_gov_spark.io.sources import Catalog

    n_total = Catalog(spark, sf_dir).documents.count()
    assert sum(r.n_docs for r in rows) == n_total
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 0.01

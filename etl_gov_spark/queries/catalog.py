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
PIN_ROTATION_ROUND = 16

# Queries pinned to the very front of queries() so the driver's
# 50-entry correctness prefix re-adjudicates them first.
_PINNED_FIRST = (
    # Round-16 rotation (VERDICT r15 "Next round" #2). Slots split:
    # (1) the 17 r16 new/changed implementations — the two NEW crawl
    # ops, the funnel that now embeds URL dedup, the batched-BPE
    # family (trajectory changed), everything downstream of the
    # pointer-doubling connected components, the AQE-join
    # dedup_embedding, and the capped-query BM25 + hybrid family;
    # then (2) the oldest independent driver signal, (vintage, name)
    # order: all 26 r3-vintage names, then the 7 oldest r4 names.
    # --- new / changed in round 16 ---
    "dedup_url_canonical",
    "mm_host_census",
    "pipeline_crawl_prep",
    "corpus_bpe_vocab",
    "corpus_bpe_compression",
    "corpus_bpe_apply",
    "corpus_tokenizer_compare",
    "emb_dbscan_clusters",
    "dedup_clusters",
    "dedup_keep_policy",
    "dedup_semdedup_keep",
    "dedup_embedding",
    "text_bm25_topk",
    "ann_hybrid_rrf",
    "ann_hybrid_rsf",
    "ann_hybrid_recall",
    "ann_hybrid_weight_sweep",
    # --- oldest-vintage refresh: latest driver signal r3 ---
    "dq_null_profile",
    "dq_referential",
    "dq_uniqueness",
    "dq_value_bounds",
    "merge_upsert_customers",
    "mm_binary_meta",
    "mm_frame_sample",
    "mm_modality_mix",
    "mm_shard_manifest",
    "q_benford_digits",
    "q_chi2_segment_priority",
    "q_gini_concentration",
    "q_hhi_supplier_concentration",
    "q_impute_clamp",
    "q_new_vs_returning",
    "q_order_backlog",
    "q_pareto_share",
    "q_reservoir_per_group",
    "q_sequence_gaps",
    "q_structuring_screen",
    "q_unpivot_metrics",
    "q_weekly_seasonality",
    "q_weighted_sample",
    "scd2_order_status_history",
    "scd2_temporal_join",
    "text_pii_scrub",
    # --- oldest-vintage refresh: latest driver signal r4 ---
    "dq_checksum_manifest",
    "dq_freshness",
    "emb_pca_top_component",
    "emb_quantize_int8",
    "fuzzy_join_names",
    "graph_pagerank",
    "mm_feature_extract",
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

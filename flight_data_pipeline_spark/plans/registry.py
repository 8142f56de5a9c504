"""Query registry: every public operator as (Spark callable, oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()``
and ``__spark_entry__.oracle_sql()``. Each registered query is a
function ``(spark, sf_dir) -> DataFrame``; the optional ``oracle`` is
the ANSI-SQL twin DuckDB runs on the same parquet tables for the
driver's hash-compare (row count + schema + order-insensitive value
hash). Non-SQL-expressible operators register with ``oracle=None`` and
get a rows-only check.

Determinism rules (SURVEY.md §7.4):
- no ``current_timestamp()`` in checked queries — "now" is a pinned
  literal shared by both sides;
- every computed column aliased identically on both sides;
- float aggregates rounded (ROUND(x, 4)) on both sides so partial-sum
  ordering differences can't flip the value hash;
- ties in top-k / dedup broken by a unique key so row selection is
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE_SQL: dict[str, str] = {}

# Driver-sample priority. The verification driver checks the FIRST 50
# registered queries per round (CORRECTNESS_r02 = exactly the first 50
# of r2's registration order), so with >50 registered the tail never
# gets an official correctness row. Queries listed here are emitted
# first by ``ordered()``. Round-4 ordering (VERDICT r3 item 6):
# (a) the seven timestamp-touching queries regressed or invalidated by
# the round-3 TIMESTAMP_NTZ fixture drift — the loader fix
# (tables.py) must be proven end-to-end in the driver's own session;
# (b) every query REGISTERED THIS ROUND (never driver-sampled — a
# first official correctness row beats refreshing an old green);
# (c) the stalest r1/r2-vintage greens fill the remaining sample
# slots in staleness order. With >50 in this tuple the tail past the
# sample size keeps its last green row (visible in BASELINE.md's
# rotation table as debt, not an implied pass).
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- (a) timestamp family: prove the NTZ loader fix end-to-end --
    "user_sessions",                # crashed r3 (NTZ cast)
    "views_before_purchase_1h",     # err row in CORRECTNESS_r03
    "purchase_attribution_asof",
    "session_window_stats",
    "hour_dedup",
    "freshness_flags_daily",
    "daily_rollup",
    # -- (b) registered in r4 — never sampled; first rows needed --
    "salted_value_stats_by_type",
    "fuzzy_part_name_pairs",
    "blocklist_redaction_stats",
    "leakage_safe_split",
    "dedup_keep_best",
    "referential_integrity_audit",
    "events_column_profile",
    "winsorized_value_stats",
    "props_variant_stats",
    "value_psi_drift",
    "compression_ratio_stats",
    "hourly_value_ohlc",
    "ranking_functions_probe",
    "deterministic_group_sample",
    "date_functions_probe",
    "rolling_median_daily_value",
    "value_equidepth_histogram",
    "urgent_order_customers_exists",
    "setops_bag_semantics",
    "dedup_signal_agreement",
    "rolling_distinct_users_hll",
    "recursive_calendar_spine",
    "weekly_value_growth",
    "string_functions_probe_2",
    "null_and_bool_probe",
    "lang_id_predictions",          # promoted rows-only → checked in r4
    "ann_ivf_pq_topk",
    "corpus_curation_stats",
    "late_shipment_priority_counts",
    "promo_revenue_ratio_monthly",
    "source_quality_topp",
    "token_budget_mixture",
    "late_events_merge",
    "user_state_history_scd2",
    "dup_span_removal",
    "incremental_rollup_merge",
    "conversion_funnel",
    "key_skew_stats",
    "matryoshka_dim_audit",
    "hourly_gap_fill",
    "top2_orders_per_customer_lateral",
    "orders_fingerprint",
    "events_snapshot_diff",
    "cumulative_unique_users_daily",
    "cohort_retention",
    "event_value_histogram",
    "daily_value_anomalies",
    # -- (c) stalest greens (r1/r2 vintage), staleness order --
    "tokenization_stats",           # r1
    "exact_dedup_documents",        # r1
    "minhash_lsh_near_dups",        # r1
    "cosine_topk_bruteforce",       # r1
    "label_centroid_stats",         # r1
    "ann_lsh_topk",                 # r1
    "multimodal_byte_features",     # r1
    "hourly_event_windows",
    "revenue_7d_moving_avg",
    "parts_above_avg_price",
    "first_order_per_customer",
    "avg_order_gap_by_segment",
    "order_grouping_sets",
    "nation_presence_full_outer",
    "lineitem_cube",
    "string_functions_probe",
    "large_volume_orders",
    "brand_supplier_diversity",
    "parts_above_brand_avg",
    "order_price_quantiles",
    "top_customer_per_segment",
    "nations_per_region",
    "token_stats_by_lang",
    "doc_quality_bands",
    "doc_fingerprint_dups",
    "top_tokens",
    "approx_distinct_stats",
    "repetition_stats",
    "gopher_quality_flags",
    "doc_chunking_stats",
)


def ordered() -> dict[str, SparkQuery]:
    """QUERIES with DRIVER_PRIORITY entries first (then registration
    order) — the order ``__spark_entry__.queries()`` exposes."""
    out = {n: QUERIES[n] for n in DRIVER_PRIORITY if n in QUERIES}
    out.update((n, fn) for n, fn in QUERIES.items() if n not in out)
    return out


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from flight_data_pipeline_spark.plans import (  # noqa: F401
        reference_queries,
        relational_queries,
        temporal_queries,
        text_queries,
        dedup_queries,
        vector_queries,
    )

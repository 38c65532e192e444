"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here as a
named query; the driver harness runs the Spark side and the oracle SQL
side-by-side at sf0.01 and hash-compares. Queries whose semantics are
not ANSI-SQL-expressible (custom stateful streaming, approximate
algorithms) register with ``oracle=None`` and get rows-only checks.

Determinism contract for oracle-paired queries (why they hash-match):

- money/metric doubles are cast to DECIMAL before SUM on BOTH sides —
  decimal addition is exact and order-independent, so shuffle order
  can't change a single bit; the final cast back to double is a single
  deterministic rounding.
- any LIMIT/top-k orders by a unique tie-break key.
- timestamps are emitted as formatted strings (session TZ pinned UTC).
- floating point that must stay float (cosine similarity) is computed
  as the same sequential left-fold in double on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str


def register(
    name: str, *, category: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _driver_green(root: str | None = None) -> frozenset[str]:
    """Queries with a GREEN driver CORRECTNESS row, read from the
    CORRECTNESS_r*.json files the harness leaves at the repo root —
    the union across rounds, counting only passes (a failed or errored
    row must re-enter the priority rotation, not fall out of it).
    Falls back to the r01+r02 snapshot below when no files are
    readable (e.g. the package imported outside the repo)."""
    import glob
    import json
    import os

    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    green = _green_rounds(root)
    return frozenset(green) if green is not None else _R01_R02_SNAPSHOT


def _green_rounds(root: str | None = None) -> dict[str, int] | None:
    """name -> LATEST round number with a green driver row (None when
    no CORRECTNESS files are readable). The latest-round value drives
    the green tail's rotation: with ~50 sampled per round over 170
    queries, sorting greens least-recently-checked-first guarantees
    every query re-earns a current-runtime row every few rounds
    instead of the same early registrations soaking the sample."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    latest: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return None
    for path in files:
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            # oracle rows need the value hash; rows-only rows have no
            # hash key and count on a clean rows check
            ok = row.get("hash_match")
            if ok is None:
                ok = row.get("rows_match")
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


# The driver samples ~50 queries per round in catalog order, so
# `all_queries`/`all_oracles` emit never-driver-checked queries FIRST —
# this guarantees queries the previous samples rotated past (and any
# newly added ones) a CORRECTNESS row in upcoming rounds. Purely an
# ordering hint; every query is identical regardless of position.
_R01_R02_SNAPSHOT: frozenset[str] = frozenset(
    {
        "d01_exact_dedup", "d02_minhash_signature", "d03_jaccard_pairs",
        "d04_minhash_lsh_pairs", "d05_simhash",
        "m01_insert_if_absent", "m02_upsert", "m03_delete_by_keys",
        "m04_delete_queue_dedup", "m05_idempotency_filter",
        "m06_file_versioning", "m07_status_transition", "m08_scd2_upsert",
        "q01_pricing_summary", "q02_filter_project", "q03_point_lookup",
        "q04_topk_orders", "q05_revenue_by_nation",
        "q06_max_coalesce_version", "q07_distinct_users",
        "q08_topk_per_group", "q09_running_total", "q10_semi_join",
        "q11_anti_join", "q12_intersect_users", "q13_except_users",
        "q14_cube_qty", "q15_rollup_revenue", "q16_scalar_pipeline",
        "q17_json_props", "q18_monthly_revenue", "q19_pivot_event_values",
        "q20_lag_lead", "q21_range_join", "q22_collect_sets",
        "q23_asof_join", "q24_exact_median", "q25_grouping_sets",
        "q26_range_frame", "q27_unpivot", "q33_above_customer_avg",
        "q34_shipping_priority", "q35_argmax_latest", "q36_transport_codec",
        "q37_late_shipment_exists", "q38_order_count_distribution",
        "s01_cosine_topk", "s02_blocked_near_dup",
        "st01_tumbling_stream", "st02_sliding_window", "st03_session_window",
        "st04_dedup_first_arrival",
        "x01_token_stats", "x02_term_frequency", "x03_quality_features",
        "x04_doc_fingerprint", "x05_lang_id", "x07_bpe_token_budget",
        "x08_tfidf_terms", "x09_term_scrub", "x10_stratified_split",
        "x11_sequence_packing", "x12_column_profile",
    }
)

# (r5: the former _STALE_GREEN pair — q20/q26, whose green rows
# predated the Spark-4 runtime — earned fresh CORRECTNESS_r05 rows,
# so the special-case is retired; staleness is now handled uniformly
# by the least-recently-checked green rotation below.)
DRIVER_CHECKED: frozenset[str] = _driver_green()

# Never-driver-checked queries by age: _OLDEST_UNCHECKED (named in
# VERDICT r02) have waited two sampling rounds; _R2_UNCHECKED were
# registered by end of round 2 but missed every sample. Both outrank
# round-3+ additions in the rotation below, so the longest-waiting
# queries always reach the driver's ~50-query sample first.
_OLDEST_UNCHECKED: frozenset[str] = frozenset(
    {
        "d06_dedup_clusters", "d07_simhash_pairs", "q29_full_outer_join",
        "q30_distinct_rows", "q31_rank_family", "q32_map_functions",
        "s05_embedding_clusters", "st07_notification_render",
        "st08_interval_join", "x06_edit_distance", "xm02_frame_schedule",
    }
)
_R2_UNCHECKED: frozenset[str] = frozenset(
    {
        "q40_volume_shipping", "q41_market_share", "q42_sales_opportunity",
        "q43_small_quantity_revenue", "q44_top_supplier",
        "q45_promo_revenue_share", "q46_salted_skew_join",
        "q47_salted_aggregation", "q48_funnel_conversion",
        "q49_min_cost_supplier", "q50_product_profit", "q51_important_parts",
        "q52_shipping_delay_histogram", "q53_supplier_part_counts",
        "q54_disjunctive_revenue", "q55_excess_shipments",
        "q56_late_sole_suppliers", "q57_returned_items",
        "q58_revenue_forecast", "q59_multi_distinct", "q60_share_of_region",
        "q61_large_volume_orders", "q62_ordered_export",
        "q63_value_window_family", "q64_multiset_set_ops",
        "q65_locf_gap_fill", "q66_multi_agg_pivot", "q67_string_battery",
        "q68_record_days", "q69_interpolated_quartiles", "q70_gaps_islands",
        "q71_ewma_daily", "q72_proration", "m09_incremental_agg_maintenance",
        "x13_repetition_ratio", "x14_decontamination", "x15_weighted_sample",
        "x16_curriculum_bins", "x17_pii_redact", "x18_chunk_windows",
        "x19_chunk_dup_stats", "x20_shard_balance", "x21_source_mixture",
        "x22_block_pack_spans", "x23_oov_rate", "x24_per_source_cap",
        "x25_quality_gate", "x26_contrastive_pairs",
        "d09_minhash_estimate_audit", "s06_label_centroids",
        "s07_cluster_cohesion", "d08_semantic_keep_list",
        "st09_stream_static_enrichment", "st10_cascaded_rollup",
        "st11_interval_join_outer",
    }
)


def _catalog_order() -> list[str]:
    """Registration order, rotated: never-driver-checked oracle-paired
    queries first (oldest-waiting before newly added), then rows-only
    (whose driver rows are the weaker rows-only check, so they re-earn
    one every round), then already-green queries LEAST-RECENTLY
    CHECKED first — the green tail cycles through the ~50-query driver
    sample so every query's newest green row stays within a few rounds
    of the current runtime."""
    names = list(_REGISTRY)
    last = _green_rounds() or {}

    def rank(n: str) -> tuple[int, int, int]:
        if n in DRIVER_CHECKED:
            return (4, last.get(n, 0), names.index(n))
        if not _REGISTRY[n].oracle:
            return (3, 0, names.index(n))
        if n in _OLDEST_UNCHECKED:
            return (0, 0, names.index(n))
        return (1 if n in _R2_UNCHECKED else 2, 0, names.index(n))

    return sorted(names, key=rank)


def specs() -> dict[str, QuerySpec]:
    return {name: _REGISTRY[name] for name in _catalog_order()}


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name].fn for name in _catalog_order()}


def all_oracles() -> dict[str, str]:
    return {
        name: _REGISTRY[name].oracle
        for name in _catalog_order()
        if _REGISTRY[name].oracle
    }

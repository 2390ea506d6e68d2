"""Query inventory registry — the driver's correctness-gate surface.

Each entry: name → (callable(spark, sf_dir) -> DataFrame, oracle SQL or
None). Aggregated from the per-domain modules; `__spark_entry__.py` is a
thin shim over this registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deltacat_spark.workloads import dml, relational

Entry = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]

REGISTRY: dict[str, Entry] = {}
REGISTRY.update(relational.QUERIES)
REGISTRY.update(dml.QUERIES)


def _late_modules() -> list:
    """Modules that may not exist yet in early rounds; imported lazily so a
    partial checkout still exposes the core inventory."""
    mods = []
    for name in (
        "text",
        "text2",
        "text3",
        "text4",
        "similarity2",
        "similarity3",
        "similarity4",
        "similarity",
        "graph",
        "sketch",
        "linkage",
        "tokenize",
        "positional",
        "scd",
        "mv",
        "windows",
        "relational2",
        "relational3",
        "relational4",
        "relational5",
        "relational6",
        "composition",
        "profiling",
        "search",
        "behavior",
        "lakehouse_interop",
        "lakehouse_maintenance",
        "multimodal_rows",
    ):
        try:
            mods.append(
                __import__(f"deltacat_spark.workloads.{name}", fromlist=["QUERIES"])
            )
        except ImportError:
            pass
    return mods


for _m in _late_modules():
    REGISTRY.update(_m.QUERIES)

# The driver checks a rotating ~50-query subset per round, taken from the
# head of the dict. Queries that have never had a driver CORRECTNESS row
# (or were rotated out before getting one) are ordered FIRST so every
# operator accumulates at least one driver-checked row across rounds.
_CHECK_FIRST = [
    "winnow_fingerprint_pairs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "hudi_cluster_incremental",
    "hudi_log_format",
    "hudi_mor_snapshot",
    "mv_keyed_refresh",
    "bm25_search",
    "pca_power_iter",
    "delta_optimize_vacuum",
    "mv_record_keyed_refresh",
    "tumbling_window_events",
    "sliding_window_events",
    "session_window_events",
    "count_distinct_parts",
    "q7_trade_flow",
    "min_cost_part",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_part_supplier_relation",
    "q20_part_promotion",
    "weighted_sample_docs",
    "skew_profile_orders",
    "seasonal_naive_backtest",
    "completeness_profile",
    "events_daily_anomalies",
    "inverted_index",
    "iceberg_equality_deletes",
    "delta_deletion_vectors",
    "hudi_mor_stream",
    "lakehouse_format_migration",
    "iceberg_bucket_partitioned",
    "jpeg_progressive_pixel_stats",
    "scan_filter_project",
    "q3_shipping_priority",
    "q5_region_revenue",
    "broadcast_join_dims",
    "agg_having",
    "window_topk_per_group",
    "window_running_sum",
    "rollup_returnflag",
    "set_except_customers",
    "distinct_order_profile",
    "sql_merge_predicated",
    "sql_merge_column_set",
    "merge_upsert",
    "delete_equality",
    "merge_partial_upsert",
    "hash_bucket_distribution",
    "text_bpe_tokens",
]


def _ordered() -> "dict[str, Entry]":
    head = {n: REGISTRY[n] for n in _CHECK_FIRST if n in REGISTRY}
    return {**head, **{n: e for n, e in REGISTRY.items() if n not in head}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _ordered().items() if sql is not None
    }

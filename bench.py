"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-style sink (full column
materialization, no driver collect) so timings reflect the whole plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # Relational / TPC-H-ish
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "window_topk_per_group",
    "rollup_returnflag",
    # DML / compaction dataflow
    "merge_upsert",
    "delete_equality",
    "dedupe_lww",
    "hash_bucket_distribution",
    # LLM-pipeline surface
    "text_quality",
    "simhash_fingerprint",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from deltacat_spark.session import build_session
    from deltacat_spark.workloads import REGISTRY

    spark = build_session("deltacat-spark-bench")
    # Warm the JVM/codegen/parquet-reader paths once so per-query numbers
    # measure the engine, not session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Synthetic scale-up generator for DEEP benchmarking only.

Replicates the driver-provided sf0.1 testdata N× (default 10× ≈ sf1)
into a cache dir so the heavy queries can be benchmarked past the
job-overhead regime. This data is NEVER used for correctness: the
oracle gate and the driver's CORRECTNESS comparison always run on the
pristine /root/testdata trees.

Replication rules keep query semantics realistic at scale:
- Fact tables (lineitem/orders/events/documents/embeddings) replicate
  with their primary keys shifted per replica; dimension tables
  (region/nation/customer/supplier/part) are copied once — dims grow
  slower than facts, so each dim key now matches ~N× fact rows, which
  is exactly the fan-in a real 100 TB table shows.
- orders.o_orderkey and lineitem.l_orderkey shift by the SAME span so
  the order↔lineitem join keeps its 1:N structure.
- documents.text gets every 4th token salted with the replica id:
  cross-replica shingle overlap drops to ~0 (a verbatim 10× copy would
  turn every doc into a 10-clone cluster and quadratically distort the
  near-dup workloads), while near-dup pairs WITHIN a replica keep their
  original Jaccard because both members salt the same token positions.
- embeddings.embedding gets a tiny deterministic per-replica rotation
  of one coordinate so ANN top-k doesn't degenerate into 10-way exact
  ties.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]

ORDERKEY_SPAN = 10_000_000
ID_SPAN = 10_000_000


def _salt_text(col, replica: int):
    return F.concat_ws(
        " ",
        F.transform(
            F.split(col, " "),
            lambda w, i: F.when(
                i % 4 == replica % 4, F.concat(w, F.lit(f"_{replica}"))
            ).otherwise(w),
        ),
    )


def _replica(df, table: str, i: int):
    if i == 0:
        return df
    if table == "orders":
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * ORDERKEY_SPAN
        )
    if table == "lineitem":
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + i * ORDERKEY_SPAN
        )
    if table == "events":
        return df.withColumn("event_id", F.col("event_id") + i * ID_SPAN)
    if table == "documents":
        return df.withColumn("doc_id", F.col("doc_id") + i * ID_SPAN).withColumn(
            "text", _salt_text(F.col("text"), i)
        )
    if table == "embeddings":
        # Perturb coordinate (i mod dim) by a small deterministic delta.
        return df.withColumn("vec_id", F.col("vec_id") + i * ID_SPAN).withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: F.when(
                    j % 16 == i % 16, x + F.lit(0.001 * i)
                ).otherwise(x),
            ),
        )
    return df


def build(spark: SparkSession, src_dir: str, out_dir: str, replicas: int = 10) -> str:
    """Idempotent: returns immediately if the marker file exists."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t in FACTS:
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        out = _replica(df, t, 0)
        for i in range(1, replicas):
            out = out.unionByName(_replica(df, t, i))
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write(f"replicas={replicas} src={src_dir}\n")
    return out_dir


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deltacat_spark.session import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_scale",
        "sf1x",
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session("make-scale", master="local[16]", shuffle_partitions=32)
    print(build(spark, src, dst, n))
    spark.stop()

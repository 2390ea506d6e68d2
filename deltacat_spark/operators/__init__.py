"""DataFrame programs implementing the reference's mutation operators.

SURVEY §2.3/§2.4/§2.5: upsert merge, partial upsert, equality delete,
last-writer-wins dedupe, hash-bucket shuffle — all re-expressed as
declarative Spark plans (window functions + joins) instead of the
reference's Ray/PyArrow kernels.
"""

from deltacat_spark.operators.merge import (
    dedupe_last_writer,
    equality_delete,
    hash_bucket,
    partial_upsert,
    upsert,
)

__all__ = [
    "dedupe_last_writer",
    "equality_delete",
    "hash_bucket",
    "partial_upsert",
    "upsert",
]

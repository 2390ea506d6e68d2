"""Logical-plan helpers: partition/sort transforms and the
engine-neutral expression AST → Spark Column compiler."""

from deltacat_spark.plans.expr import Expr, col, lit
from deltacat_spark.plans.transforms import (
    PartitionKey,
    SortKey,
    partition_columns,
    sort_columns,
)

__all__ = [
    "Expr",
    "PartitionKey",
    "SortKey",
    "col",
    "lit",
    "partition_columns",
    "sort_columns",
]

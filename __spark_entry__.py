"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `deltacat_spark.workloads` — the query inventory with
per-query DuckDB oracles (SURVEY.md §2 coverage).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deltacat_spark import workloads  # noqa: E402
from deltacat_spark.workloads.relational import q5_region_revenue  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q5_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workloads.queries()


def oracle_sql() -> dict[str, str]:
    return workloads.oracle_sql()

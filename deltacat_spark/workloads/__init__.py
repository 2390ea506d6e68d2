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
    for name in ("text", "similarity", "windows", "relational2"):
        try:
            mods.append(
                __import__(f"deltacat_spark.workloads.{name}", fromlist=["QUERIES"])
            )
        except ImportError:
            pass
    return mods


for _m in _late_modules():
    REGISTRY.update(_m.QUERIES)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

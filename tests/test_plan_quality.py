"""Physical-plan quality guards: the properties that make these plans
survive a 100× scale-up, asserted so a refactor can't silently regress
them — filters reach the parquet scan, column pruning holds, small
dimensions broadcast, and no query in the inventory plans a cartesian
or broadcast-nested-loop join."""

import pytest

from deltacat_spark.workloads import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    fn, _ = REGISTRY[name]
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    # at least one concrete filter actually pushed (not the empty list)
    assert "PushedFilters: []" not in plan.split("PushedFilters:", 1)[1][:200]


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "scan_filter_project")
    # The lineitem FileScan's projected column list must be a strict
    # subset of the table's 11 columns (ReadSchema is truncated in the
    # rendered plan; the bracket list is the same information).
    import re

    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans and all(s.count(",") < 10 for s in scans)


def test_small_dims_broadcast(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation_map_side_combine(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # partial + final HashAggregate pair = map-side combine before the
    # exchange; a single aggregate would shuffle raw rows
    assert plan.count("HashAggregate") >= 2


# Queries whose DESIGN is a broadcast cross join of a tiny probe side:
# the brute-force ANN baselines broadcast the (bounded, few-row) query
# vectors against the corpus — the oracle-parity baseline the bucketed
# LSH/IVF variants are measured against, not a scale path.
_BROADCAST_CROSS_BY_DESIGN = {"ann_cosine_topk", "ann_ivf_topk"}


@pytest.mark.parametrize(
    "name",
    sorted(REGISTRY),
)
def test_no_cartesian_or_nested_loop(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin is legitimate only when the build side is
    # bounded by construction (scalar aggregate or the whitelisted
    # broadcast-probe designs); anything joining two real relations
    # without an equi-key is a scale bug.
    if (
        "BroadcastNestedLoopJoin" in plan
        and name not in _BROADCAST_CROSS_BY_DESIGN
    ):
        assert "HashAggregate" in plan or "collect_" in plan, name

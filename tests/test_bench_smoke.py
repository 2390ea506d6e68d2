"""Smoke test: every BENCH_QUERIES entry must run end-to-end at sf0.001.

Round 3's official bench record was lost because one query (an
events.ts schema drift) raised mid-loop. bench.py now isolates queries
with try/except, but a red query still costs its timing row — this test
makes a broken bench query a local pytest failure *before* it reaches
the driver.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _bench_names():
    import bench

    return bench.BENCH_QUERIES


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
@pytest.mark.parametrize("name", _bench_names())
def test_bench_query_runs(spark, name):
    from deltacat_spark.workloads import REGISTRY

    fn, _sql = REGISTRY[name]
    df = fn(spark, SF_DIR)
    # Same sink bench.py uses: full materialization, no driver collect.
    df.write.format("noop").mode("overwrite").save()

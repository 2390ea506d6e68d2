"""Driver output contract: every registry query returns scalar-only columns.

The driver's correctness gate canonicalizes each result via a pandas
sort-by-all-columns; array/struct/map cells raise
``TypeError: unhashable type`` there before any comparison happens
(round-4 casualties: ``embedding_quantize``, ``inverted_index``). This
guard builds every query's *plan* at sf0.001 (no collect — the schema is
known after analysis) and rejects any nested-typed output column, so the
class dies in CI instead of in the driver.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

_NESTED = ("array", "map", "struct")


def _registry():
    import __spark_entry__ as ent

    return sorted(ent.queries().items())


@pytest.mark.parametrize(
    "name,fn", _registry(), ids=[n for n, _ in _registry()]
)
def test_query_output_is_scalar_only(spark, name, fn):
    df = fn(spark, SF_DIR)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.dataType.typeName() in _NESTED
    ]
    assert not bad, (
        f"{name} emits non-scalar output columns {bad}; the driver's "
        "pandas canonicalizer cannot sort/hash them — serialize to "
        "canonical strings in both the Spark query and the DuckDB oracle "
        "(see workloads/base.py docstring)"
    )

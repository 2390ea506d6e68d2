"""Property-based merge-semantics test: random MERGE/DELETE sequences
must equal a sequential dict model under BOTH copy-on-write and
merge-on-read (the reference's table-driven compaction cases
generalized — `tests/compute/compact_partition_test_cases.py`)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

KEYS = st.integers(min_value=0, max_value=9)

op_strategy = st.lists(
    st.tuples(
        st.sampled_from(["merge", "delete"]),
        st.lists(KEYS, min_size=1, max_size=6),
    ),
    min_size=1,
    max_size=5,
)


def apply_model(ops):
    state = {}
    serial = 0
    for mode, keys in ops:
        if mode == "merge":
            for k in keys:  # later rows in a batch win within the batch
                serial += 1
                state[k] = serial
        else:
            for k in set(keys):
                state.pop(k, None)
    return state


def apply_engine(spark, tmp_path, ops, read_optimization, tag):
    cat = Catalog(spark, str(tmp_path / f"prop_{read_optimization}_{tag}"))
    cat.create_table(
        "t",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("serial", T.LongType())]
        ),
        properties={"read_optimization": read_optimization},
    )
    serial = 0
    for mode, keys in ops:
        if mode == "merge":
            rows = []
            for k in keys:
                serial += 1
                rows.append((k, serial))
            cat.write_to_table(
                spark.createDataFrame(rows, "id long, serial long"), "t", mode="merge"
            )
        else:
            serial += len(keys)
            cat.write_to_table(
                spark.createDataFrame([(k,) for k in keys], "id long"),
                "t",
                mode="delete",
            )
    return {r.id: r.serial for r in cat.read_table("t").collect()}


def apply_model_serial_aware(ops):
    """Model matching apply_engine's serial numbering (deletes consume
    serials too, to keep numbering aligned)."""
    state = {}
    serial = 0
    for mode, keys in ops:
        if mode == "merge":
            for k in keys:
                serial += 1
                state[k] = serial
        else:
            serial += len(keys)
            for k in set(keys):
                state.pop(k, None)
    return state


@pytest.mark.parametrize("ro", ["max", "none"])
@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(ops=op_strategy)
def test_random_dml_sequences_match_model(spark, tmp_path_factory, ro, ops):
    tmp = tmp_path_factory.mktemp(f"prop{ro}")
    model = apply_model_serial_aware(ops)
    engine = apply_engine(spark, tmp, ops, ro, abs(hash(str(ops))) % 10**8)
    assert engine == model

"""Golden write-mode matrix: the reference's combinatorial coverage
(mode × merge-key shape × merge-order × partition/sort layout × schema
evolution × file-split), mirrored as one table-driven suite run through
BOTH read-optimization paths (CoW `read_optimization=max` and MoR
`read_optimization=none`).

Models reference `tests/catalog/test_default_catalog_impl.py:810,1078,
2488-3289` and `tests/compute/compact_partition_test_cases.py:42-45`:
each case is (schema shape, layout, list of (mode, rows) deltas) →
expected final table content (or expected error). The expected value is
written by hand (golden), never derived from the engine.
"""

from dataclasses import dataclass, field

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema, SchemaError

# Universal column family: id long, cat string, v int, ts long.
# Evolution deltas add `extra string`. ts doubles as the merge-order /
# event-time channel (numeric event time is accepted by CHRONO).
BASE_DDL = "id long, cat string, v int, ts long"
EVOLVED_DDL = BASE_DDL + ", extra string"
DELETE_ID_DDL = "id long"
DELETE_KEYS_DDL = "id long, cat string"


def make_schema(
    keys=(),
    merge_order=None,  # (field, "asc"|"desc")
    event_time=None,  # field name flagged event_time
    evolved=False,
):
    def f(name, typ):
        return Field(
            name,
            typ,
            merge_key=name in keys,
            merge_order=(merge_order[1], "last")
            if merge_order and merge_order[0] == name
            else None,
            event_time=(name == event_time),
        )

    fields = [
        f("id", T.LongType()),
        f("cat", T.StringType()),
        f("v", T.IntegerType()),
        f("ts", T.LongType()),
    ]
    if evolved:
        fields.append(f("extra", T.StringType()))
    return Schema(fields)


@dataclass(frozen=True)
class Case:
    name: str
    deltas: tuple  # ((mode, ddl, rows), ...)
    expect: tuple | None = None  # expected rows in BASE/EVOLVED order
    raises: type | None = None
    keys: tuple = ()
    merge_order: tuple | None = None
    event_time: str | None = None
    partition: tuple = ()
    sort: tuple = ()
    props: dict = field(default_factory=dict)
    min_files: int = 0  # assert at least this many live data files


B = BASE_DDL
E = EVOLVED_DDL

CASES = [
    # ---- Group A: keyless append family -------------------------------
    Case(
        "append_single",
        ((("append"), B, [(1, "a", 10, 100), (2, "b", 20, 200)]),),
        expect=((1, "a", 10, 100), (2, "b", 20, 200)),
    ),
    Case(
        "append_accumulates",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("append", B, [(2, "b", 2, 2)]),
            ("append", B, [(3, "c", 3, 3)]),
        ),
        expect=((1, "a", 1, 1), (2, "b", 2, 2), (3, "c", 3, 3)),
    ),
    Case(
        "add_accumulates_unordered",
        (
            ("add", B, [(1, "a", 1, 1)]),
            ("add", B, [(2, "b", 2, 2)]),
        ),
        expect=((1, "a", 1, 1), (2, "b", 2, 2)),
    ),
    Case(
        "auto_keyless_is_append",
        (
            ("auto", B, [(1, "a", 1, 1)]),
            ("auto", B, [(1, "a", 1, 1)]),  # duplicate row NOT merged
        ),
        expect=((1, "a", 1, 1), (1, "a", 1, 1)),
    ),
    Case(
        "replace_clears_appends",
        (
            ("append", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("replace", B, [(9, "z", 9, 9)]),
        ),
        expect=((9, "z", 9, 9),),
    ),
    Case(
        "replace_first_write",
        (("replace", B, [(1, "a", 1, 1)]),),
        expect=((1, "a", 1, 1),),
    ),
    Case(
        "append_after_replace",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("replace", B, [(2, "b", 2, 2)]),
            ("append", B, [(3, "c", 3, 3)]),
        ),
        expect=((2, "b", 2, 2), (3, "c", 3, 3)),
    ),
    Case(
        "append_schema_evolution_backfills_null",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("append", E, [(2, "b", 2, 2, "x")]),
        ),
        expect=((1, "a", 1, 1, None), (2, "b", 2, 2, "x")),
    ),
    Case(
        "double_replace_last_wins",
        (
            ("replace", B, [(1, "a", 1, 1)]),
            ("replace", B, [(2, "b", 2, 2)]),
        ),
        expect=((2, "b", 2, 2),),
    ),
    # ---- Group B: single merge key ------------------------------------
    Case(
        "merge_upsert_lww",
        (
            ("merge", B, [(1, "a", 10, 1), (2, "b", 20, 1)]),
            ("merge", B, [(2, "B", 21, 2), (3, "c", 30, 2)]),
        ),
        expect=((1, "a", 10, 1), (2, "B", 21, 2), (3, "c", 30, 2)),
        keys=("id",),
    ),
    Case(
        "merge_within_batch_last_wins",
        (("merge", B, [(1, "first", 1, 1), (1, "last", 2, 2)]),),
        expect=((1, "last", 2, 2),),
        keys=("id",),
    ),
    Case(
        "merge_order_desc_max_wins",
        (
            ("merge", B, [(1, "new", 9, 900)]),
            ("merge", B, [(1, "old", 5, 500)]),  # arrives later, loses
        ),
        expect=((1, "new", 9, 900),),
        keys=("id",),
        merge_order=("ts", "desc"),
    ),
    Case(
        "merge_order_asc_min_wins",
        (
            ("merge", B, [(1, "hi", 9, 900)]),
            ("merge", B, [(1, "lo", 5, 500)]),
        ),
        expect=((1, "lo", 5, 500),),
        keys=("id",),
        merge_order=("ts", "asc"),
    ),
    Case(
        "merge_then_delete_subset",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 2, 2), (3, "c", 3, 3)]),
            ("delete", DELETE_ID_DDL, [(2,)]),
        ),
        expect=((1, "a", 1, 1), (3, "c", 3, 3)),
        keys=("id",),
    ),
    Case(
        "delete_then_reinsert",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("delete", DELETE_ID_DDL, [(1,)]),
            ("merge", B, [(1, "re", 2, 2)]),
        ),
        expect=((1, "re", 2, 2),),
        keys=("id",),
    ),
    Case(
        "delete_everything",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("delete", DELETE_ID_DDL, [(1,), (2,)]),
        ),
        expect=(),
        keys=("id",),
    ),
    Case(
        "merge_null_values_overwrite",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("merge", B, [(1, None, None, 2)]),
        ),
        expect=((1, None, None, 2),),
        keys=("id",),
    ),
    Case(
        "auto_keyed_is_merge",
        (
            ("auto", B, [(1, "a", 1, 1)]),
            ("auto", B, [(1, "A", 2, 2)]),
        ),
        expect=((1, "A", 2, 2),),
        keys=("id",),
    ),
    Case(
        "merge_schema_evolution",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("merge", E, [(1, "A", 2, 2, "x"), (2, "b", 3, 3, "y")]),
        ),
        expect=((1, "A", 2, 2, "x"), (2, "b", 3, 3, "y")),
        keys=("id",),
    ),
    Case(
        "merge_interleaved_chain",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 1, 1)]),
            ("delete", DELETE_ID_DDL, [(1,)]),
            ("merge", B, [(3, "c", 1, 1), (2, "B", 2, 2)]),
            ("delete", DELETE_ID_DDL, [(3,)]),
            ("merge", B, [(4, "d", 1, 1)]),
        ),
        expect=((2, "B", 2, 2), (4, "d", 1, 1)),
        keys=("id",),
    ),
    Case(
        "replace_resets_keyed_table",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("replace", B, [(7, "r", 7, 7)]),
            ("merge", B, [(7, "R", 8, 8)]),
        ),
        expect=((7, "R", 8, 8),),
        keys=("id",),
    ),
    # ---- Group C: composite merge key ---------------------------------
    Case(
        "composite_key_distinct_combos",
        (
            ("merge", B, [(1, "x", 1, 1), (1, "y", 2, 2)]),
            ("merge", B, [(2, "x", 3, 3)]),
        ),
        expect=((1, "x", 1, 1), (1, "y", 2, 2), (2, "x", 3, 3)),
        keys=("id", "cat"),
    ),
    Case(
        "composite_key_lww_same_combo",
        (
            ("merge", B, [(1, "x", 1, 1)]),
            ("merge", B, [(1, "x", 9, 9)]),
        ),
        expect=((1, "x", 9, 9),),
        keys=("id", "cat"),
    ),
    Case(
        "composite_key_delete_by_both",
        (
            ("merge", B, [(1, "x", 1, 1), (1, "y", 2, 2)]),
            ("delete", DELETE_KEYS_DDL, [(1, "x")]),
        ),
        expect=((1, "y", 2, 2),),
        keys=("id", "cat"),
    ),
    Case(
        "composite_key_within_batch_dupes",
        (("merge", B, [(1, "x", 1, 1), (1, "x", 2, 2), (1, "y", 3, 3)]),),
        expect=((1, "x", 2, 2), (1, "y", 3, 3)),
        keys=("id", "cat"),
    ),
    # ---- Group D: event-time / CHRONO ---------------------------------
    Case(
        "event_time_default_merge_order",
        (
            ("merge", B, [(1, "new", 1, 900)]),
            ("merge", B, [(1, "old", 2, 500)]),  # older event loses
        ),
        expect=((1, "new", 1, 900),),
        keys=("id",),
        event_time="ts",
    ),
    Case(
        "event_time_newer_wins_reversed_arrival",
        (
            ("merge", B, [(1, "old", 1, 500)]),
            ("merge", B, [(1, "new", 2, 900)]),
        ),
        expect=((1, "new", 2, 900),),
        keys=("id",),
        event_time="ts",
    ),
    Case(
        "chrono_out_of_order_accumulates",
        (
            ("chrono", B, [(1, "a", 1, 900)]),
            ("chrono", B, [(2, "b", 2, 500)]),  # late event accepted
        ),
        expect=((1, "a", 1, 900), (2, "b", 2, 500)),
        event_time="ts",
    ),
    Case(
        "chrono_requires_event_time",
        (("chrono", B, [(1, "a", 1, 1)]),),
        raises=SchemaError,
    ),
    # ---- Group E: mode/shape errors -----------------------------------
    Case(
        "append_rejected_on_keyed",
        (("append", B, [(1, "a", 1, 1)]),),
        raises=SchemaError,
        keys=("id",),
    ),
    Case(
        "add_rejected_on_keyed",
        (("add", B, [(1, "a", 1, 1)]),),
        raises=SchemaError,
        keys=("id",),
    ),
    Case(
        "chrono_rejected_on_keyed",
        (("chrono", B, [(1, "a", 1, 1)]),),
        raises=SchemaError,
        keys=("id",),
        event_time="ts",
    ),
    Case(
        "merge_rejected_on_keyless",
        (("merge", B, [(1, "a", 1, 1)]),),
        raises=SchemaError,
    ),
    Case(
        "delete_rejected_on_keyless",
        (("delete", DELETE_ID_DDL, [(1,)]),),
        raises=SchemaError,
    ),
    # ---- Group F: partition / sort layouts ----------------------------
    Case(
        "partitioned_append",
        (
            ("append", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("append", B, [(3, "a", 3, 3)]),
        ),
        expect=((1, "a", 1, 1), (2, "b", 2, 2), (3, "a", 3, 3)),
        partition=("cat",),
        min_files=3,  # one file per (delta, partition value)
    ),
    Case(
        "partitioned_merge_lww",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("merge", B, [(1, "a", 9, 9)]),
        ),
        expect=((1, "a", 9, 9), (2, "b", 2, 2)),
        keys=("id",),
        partition=("cat",),
    ),
    Case(
        "partitioned_delete",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("delete", DELETE_ID_DDL, [(1,)]),
        ),
        expect=((2, "b", 2, 2),),
        keys=("id",),
        partition=("cat",),
    ),
    Case(
        "partitioned_replace",
        (
            ("append", B, [(1, "a", 1, 1), (2, "b", 2, 2)]),
            ("replace", B, [(3, "c", 3, 3)]),
        ),
        expect=((3, "c", 3, 3),),
        partition=("cat",),
    ),
    Case(
        "sorted_append_content_intact",
        (("append", B, [(3, "c", 3, 3), (1, "a", 1, 1), (2, "b", 2, 2)]),),
        expect=((1, "a", 1, 1), (2, "b", 2, 2), (3, "c", 3, 3)),
        sort=("id",),
    ),
    Case(
        "partition_and_sort_merge",
        (
            ("merge", B, [(1, "a", 1, 1), (2, "a", 2, 2), (3, "b", 3, 3)]),
            ("merge", B, [(2, "a", 9, 9)]),
        ),
        expect=((1, "a", 1, 1), (2, "a", 9, 9), (3, "b", 3, 3)),
        keys=("id",),
        partition=("cat",),
        sort=("v",),
    ),
    Case(
        "partitioned_evolution_append",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("append", E, [(2, "b", 2, 2, "x")]),
        ),
        expect=((1, "a", 1, 1, None), (2, "b", 2, 2, "x")),
        partition=("cat",),
    ),
    # ---- Group G: file split / compaction triggers --------------------
    Case(
        "small_files_append",
        (("append", B, [(i, "a", i, i) for i in range(5)]),),
        expect=tuple((i, "a", i, i) for i in range(5)),
        props={"max_records_per_file": 2},
        min_files=3,
    ),
    Case(
        "small_files_merge_lww",
        (
            ("merge", B, [(i, "a", i, i) for i in range(6)]),
            ("merge", B, [(0, "A", 99, 99), (5, "Z", 55, 55)]),
        ),
        expect=tuple((i, "a", i, i) for i in range(1, 5))
        + ((0, "A", 99, 99), (5, "Z", 55, 55)),
        keys=("id",),
        props={"max_records_per_file": 2},
    ),
    Case(
        "autocompaction_trigger_preserves_content",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("append", B, [(2, "b", 2, 2)]),
            ("append", B, [(3, "c", 3, 3)]),
            ("append", B, [(4, "d", 4, 4)]),
        ),
        expect=((1, "a", 1, 1), (2, "b", 2, 2), (3, "c", 3, 3), (4, "d", 4, 4)),
        props={"compaction.trigger.deltas": 3},
    ),
    Case(
        "many_small_merge_deltas",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("merge", B, [(2, "b", 1, 1)]),
            ("merge", B, [(1, "a2", 2, 2)]),
            ("merge", B, [(3, "c", 1, 1)]),
            ("merge", B, [(2, "b2", 2, 2)]),
        ),
        expect=((1, "a2", 2, 2), (2, "b2", 2, 2), (3, "c", 1, 1)),
        keys=("id",),
    ),
    # ---- Group H: partial upserts / merge-order nulls -----------------
    Case(
        "partial_upsert_fills_from_old",
        (
            ("merge", B, [(1, "alice", 1, 1), (2, "bob", 2, 2)]),
            ("merge", "id long, v int", [(1, 99)]),  # no cat/ts columns
        ),
        expect=((1, "alice", 99, 1), (2, "bob", 2, 2)),
        keys=("id",),
    ),
    Case(
        "partial_upsert_new_key_nulls",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("merge", "id long, v int", [(2, 22)]),
        ),
        expect=((1, "a", 1, 1), (2, None, 22, None)),
        keys=("id",),
    ),
    Case(
        "partial_then_full_upsert",
        (
            ("merge", B, [(1, "a", 1, 1)]),
            ("merge", "id long, v int", [(1, 50)]),
            ("merge", B, [(1, "z", 9, 9)]),
        ),
        expect=((1, "z", 9, 9),),
        keys=("id",),
    ),
    Case(
        "merge_order_null_ts_loses",
        (
            ("merge", B, [(1, "stamped", 1, 500)]),
            ("merge", B, [(1, "unstamped", 2, None)]),  # nulls last: loses
        ),
        expect=((1, "stamped", 1, 500),),
        keys=("id",),
        merge_order=("ts", "desc"),
    ),
    Case(
        "merge_order_null_ts_loses_reversed_arrival",
        (
            ("merge", B, [(1, "unstamped", 2, None)]),
            ("merge", B, [(1, "stamped", 1, 500)]),
        ),
        expect=((1, "stamped", 1, 500),),
        keys=("id",),
        merge_order=("ts", "desc"),
    ),
    Case(
        "delete_by_non_key_column",
        (
            ("merge", B, [(1, "a", 7, 1), (2, "b", 7, 2), (3, "c", 9, 3)]),
            ("delete", "v int", [(7,)]),
        ),
        expect=((3, "c", 9, 3),),
        keys=("id",),
    ),
    Case(
        "keyless_mixed_sequence",
        (
            ("append", B, [(1, "a", 1, 1)]),
            ("add", B, [(2, "b", 2, 2)]),
            ("replace", B, [(3, "c", 3, 3)]),
            ("append", B, [(4, "d", 4, 4)]),
            ("add", B, [(5, "e", 5, 5)]),
        ),
        expect=((3, "c", 3, 3), (4, "d", 4, 4), (5, "e", 5, 5)),
    ),
]

_IDS = [c.name for c in CASES]
assert len(set(_IDS)) == len(_IDS)


def _run_case(spark, tmp_path, case: Case, read_opt: str):
    c = Catalog(spark, str(tmp_path / f"golden_{read_opt}"))
    schema = make_schema(
        keys=case.keys,
        merge_order=case.merge_order,
        event_time=case.event_time,
    )
    props = {"read_optimization": read_opt, **case.props}
    part = None
    srt = None
    if case.partition or case.sort:
        from deltacat_spark.plans.transforms import PartitionKey, SortKey

        part = [PartitionKey(f) for f in case.partition] or None
        srt = [SortKey(f) for f in case.sort] or None
    c.create_table(
        "t", schema=schema, properties=props, partition_scheme=part, sort_scheme=srt
    )

    def apply_all():
        for mode, ddl, rows in case.deltas:
            c.write_to_table(spark.createDataFrame(rows, ddl), "t", mode=mode)

    if case.raises is not None:
        with pytest.raises(case.raises):
            apply_all()
        return
    apply_all()

    got = c.read_table("t").collect()
    cols = ["id", "cat", "v", "ts"] + (
        ["extra"] if any(len(r) == 5 for r in case.expect or ()) else []
    )
    got_rows = sorted(tuple(r[col] for col in cols) for r in got)
    want = sorted(
        tuple(row) + (None,) * (len(cols) - len(row)) for row in case.expect
    )
    assert got_rows == want, f"{case.name} [{read_opt}]"
    if case.min_files:
        snap = c.snapshot("t")
        from deltacat_spark.storage.commit import DeltaType

        data_files = [
            f
            for f in snap.files
            if f.delta_type != DeltaType.POSITIONAL_DELETE
        ]
        assert len(data_files) >= case.min_files, case.name


@pytest.mark.parametrize("case", CASES, ids=_IDS)
def test_golden_cow(spark, tmp_path, case):
    _run_case(spark, tmp_path, case, "max")


@pytest.mark.parametrize("case", CASES, ids=_IDS)
def test_golden_mor(spark, tmp_path, case):
    _run_case(spark, tmp_path, case, "none")

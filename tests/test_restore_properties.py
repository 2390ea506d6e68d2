"""Property + race tests for RESTORE.

Property: after ANY random merge/delete history (append is rejected on
merge-key tables, reference parity), restoring to a
recorded version must reproduce exactly the state read at that version
— and the pre-restore head must stay time-travelable. Race: RESTORE
serializes with concurrent appends through commit-version conflicts
(no lost commits, no partial states).
"""

import threading
import uuid

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

KEYS = st.integers(min_value=0, max_value=9)

history_strategy = st.lists(
    st.tuples(
        st.sampled_from(["merge", "delete"]),
        st.lists(KEYS, min_size=1, max_size=5),
    ),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=history_strategy, data=st.data())
@pytest.mark.slow
def test_restore_reproduces_any_recorded_version(spark, tmp_path, ops, data):
    # fresh root per drawn example — hypothesis replays examples into the
    # same function-scoped tmp_path
    cat = Catalog(spark, str(tmp_path / f"rp_{uuid.uuid4().hex}"))
    cat.create_table(
        "t",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
    )
    serial = 0
    versions = []
    for mode, keys in ops:
        if mode == "delete":
            cat.write_to_table(
                spark.createDataFrame([(k,) for k in set(keys)], "id long"),
                "t",
                mode="delete",
            )
        else:
            rows = []
            for k in keys:
                serial += 1
                rows.append((k, serial))
            cat.write_to_table(
                spark.createDataFrame(rows, "id long, v long"), "t", mode=mode
            )
        versions.append(cat.snapshot("t").version)

    pick = data.draw(st.sampled_from(versions), label="restore_to")
    expected = sorted(
        (r.id, r.v) for r in cat.read_table("t", version_as_of=pick).collect()
    )
    head_before = cat.snapshot("t").version
    head_state = sorted((r.id, r.v) for r in cat.read_table("t").collect())

    cat.restore_table("t", version=pick)
    assert (
        sorted((r.id, r.v) for r in cat.read_table("t").collect()) == expected
    )
    # pre-restore head still time-travelable
    assert (
        sorted(
            (r.id, r.v)
            for r in cat.read_table("t", version_as_of=head_before).collect()
        )
        == head_state
    )


def test_restore_races_appends_without_lost_commits(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "race"))
    cat.write_to_table(
        spark.createDataFrame([(0,)], "id long"), "t", mode="auto"
    )
    v1 = cat.snapshot("t").version
    errs = []

    def appender(i):
        try:
            Catalog(spark, str(tmp_path / "race")).write_to_table(
                spark.createDataFrame([(100 + i,)], "id long"), "t", mode="append"
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def restorer():
        try:
            Catalog(spark, str(tmp_path / "race")).restore_table("t", version=v1)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    threads.insert(2, threading.Thread(target=restorer))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # Log is linear: every commit landed at a distinct version, and the
    # final state equals replaying that serialized history.
    hist = cat.history("t")
    assert len({h["version"] for h in hist}) == len(hist)
    ops = [h["operation"] for h in sorted(hist, key=lambda h: h["version"])]
    # 1 initial write + 4 racing appenders; exactly one restore
    assert ops.count("APPEND") == 5 and ops.count("RESTORE") == 1
    # appends after the restore survive; appends before it were rolled
    # back — the live set must equal {0} ∪ {rows of appends that landed
    # after the restore} (which value landed where is racy, so read each
    # surviving commit's delta instead of guessing by thread index).
    restore_v = next(
        h["version"] for h in hist if h["operation"] == "RESTORE"
    )
    survivors = {0}
    for h in hist:
        if h["operation"] == "APPEND" and h["version"] > restore_v:
            survivors |= {r.id for r in cat.read_delta("t", h["version"]).collect()}
    assert {r.id for r in cat.read_table("t").collect()} == survivors

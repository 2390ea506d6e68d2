"""F8 `concurrent_writers` tests: exactly one winner per commit version,
append auto-rebase, merge conflict + catalog-level retry, snapshot
isolation (FIXTURES.md F8; reference `test_default_catalog_impl.py:3398`)."""

import threading

from pyspark.sql import types as T

from deltacat_spark.schema import Field, Schema
from deltacat_spark.storage.commit import Commit, CommitConflictError, CommitLog


def test_log_level_single_winner_per_version(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE"))
    wins = []

    def contender(i):
        ok = log.try_commit(Commit(version=2, operation="APPEND"))
        if ok:
            wins.append(i)

    threads = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1


def test_concurrent_appends_all_land(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE"))
    errors = []

    def writer(i):
        try:
            base = log.latest_version()
            log.commit(
                Commit(
                    version=base + 1,
                    operation="APPEND",
                    actions=[{"add": {"path": f"f{i}.parquet", "records": 1}}],
                )
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # every append landed at a distinct version, none lost
    assert log.latest_version() == 9
    paths = set()
    for c in log.replay():
        paths.update(a["path"] for a in c.adds)
    assert paths == {f"f{i}.parquet" for i in range(8)}


def test_concurrent_merges_serialize_via_retry(spark, catalog):
    """Catalog-level retry: overlapping MERGE writers both eventually
    apply; the final table equals some serial order of the two."""
    schema = Schema(
        [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
    )
    catalog.create_table("t", schema=schema)
    catalog.write_to_table(
        spark.createDataFrame([(1, 0), (2, 0)], "id long, v long"), "t", mode="merge"
    )
    errors = []

    def merger(val):
        try:
            catalog.write_to_table(
                spark.createDataFrame([(1, val)], "id long, v long"),
                "t",
                mode="merge",
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=merger, args=(v,)) for v in (10, 20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    m = {r.id: r.v for r in catalog.read_table("t").collect()}
    assert m[2] == 0 and m[1] in (10, 20)
    # both merges committed (serialized at distinct versions)
    assert catalog.snapshot("t").version >= 4


def test_snapshot_isolation(spark, catalog):
    df = spark.createDataFrame([(1,)], "id long")
    catalog.write_to_table(df, "t", mode="auto")
    v1 = catalog.snapshot("t").version
    reader_view = catalog.read_table("t", version_as_of=v1)
    catalog.write_to_table(spark.createDataFrame([(2,)], "id long"), "t", mode="append")
    # pinned snapshot unaffected by the later commit
    assert reader_view.count() == 1
    assert catalog.read_table("t").count() == 2

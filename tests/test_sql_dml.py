"""SQL DML bridge (`Catalog.sql`): INSERT INTO / DELETE FROM / UPDATE
mapped onto the catalog write path. The conditions and payload SELECTs
are parsed by Spark itself — this bridge only routes statements, so the
SQL dialect is exactly Spark's."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "sqldml"))
    c.create_table(
        "users",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
            ]
        ),
    )
    c.sql("INSERT INTO users VALUES (1, 'ann', 30), (2, 'bob', 40), (3, 'cy', 50)")
    return c


def test_insert_values_and_select(cat):
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {1: ("ann", 30), 2: ("bob", 40), 3: ("cy", 50)}
    # INSERT ... SELECT reading a catalog table (self-referential)
    res = cat.sql(
        "INSERT INTO users SELECT id + 10 AS id, name, age + 1 AS age"
        " FROM users WHERE age >= 40"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 40, 3: 50, 12: 41, 13: 51}


def test_insert_with_column_list(cat):
    cat.sql("INSERT INTO users (id, name, age) VALUES (9, 'zed', 60)")
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[9] == "zed"


def test_delete_where_and_full_delete(cat):
    res = cat.sql("DELETE FROM users WHERE age > 35")
    assert res.collect()[0].rows == 2
    assert {r.id for r in cat.read_table("users").collect()} == {1}
    res2 = cat.sql("DELETE FROM users")
    assert res2.collect()[0].rows == 1
    assert cat.read_table("users").count() == 0


def test_update_set_where(cat):
    res = cat.sql(
        "UPDATE users SET age = age + 1, name = upper(name) WHERE id <= 2"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {1: ("ANN", 31), 2: ("BOB", 41), 3: ("cy", 50)}
    # UPDATE without WHERE touches every row
    cat.sql("UPDATE users SET age = 0")
    assert {r.age for r in cat.read_table("users").collect()} == {0}


def test_update_merges_not_duplicates(cat):
    cat.sql("UPDATE users SET age = 99 WHERE id = 1")
    assert cat.read_table("users").count() == 3  # upsert, not append


def test_select_still_works(cat):
    df = cat.sql("SELECT count(*) AS n FROM users WHERE age < 45")
    assert df.collect()[0].n == 2


def test_malformed_set_raises(cat):
    with pytest.raises(ValueError, match="malformed SET"):
        cat.sql("UPDATE users SET age 31 WHERE id = 1")


def test_dml_is_versioned_like_api_writes(cat):
    v0 = cat.snapshot("users").version
    cat.sql("UPDATE users SET age = 1 WHERE id = 1")
    snap = cat.snapshot("users")
    assert snap.version > v0
    old = cat.read_table("users", version_as_of=v0)
    assert {r.age for r in old.collect()} == {30, 40, 50}  # time travel intact


def test_merge_into_upsert_star(cat, spark):
    src = spark.createDataFrame(
        [(2, "bobby", 41), (7, "new", 70)], "id long, name string, age int"
    )
    src.createOrReplaceTempView("updates")
    res = cat.sql(
        "MERGE INTO users AS t USING (SELECT * FROM updates) AS s"
        " ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {
        1: ("ann", 30),
        2: ("bobby", 41),
        3: ("cy", 50),
        7: ("new", 70),
    }


def test_merge_into_using_catalog_table(cat, spark):
    cat.create_table(
        "staged",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
            ]
        ),
    )
    cat.sql("INSERT INTO staged VALUES (3, 'cyrus', 51)")
    cat.sql(
        "MERGE INTO users t USING staged s ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET *"
    )
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[3] == "cyrus"


def test_merge_into_delete(cat, spark):
    spark.createDataFrame([(1,), (3,)], "id long").createOrReplaceTempView(
        "doomed"
    )
    res = cat.sql(
        "MERGE INTO users t USING (SELECT id FROM doomed) s ON t.id = s.id"
        " WHEN MATCHED THEN DELETE"
    )
    assert res.collect()[0].rows == 2
    assert {r.id for r in cat.read_table("users").collect()} == {2}


def test_merge_into_rejects_non_key_on(cat, spark):
    spark.createDataFrame(
        [(1, "x", 1)], "id long, name string, age int"
    ).createOrReplaceTempView("u2")
    with pytest.raises(ValueError, match="merge keys"):
        cat.sql(
            "MERGE INTO users t USING (SELECT * FROM u2) s ON t.name = s.name"
            " WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="alias.col"):
        cat.sql(
            "MERGE INTO users t USING (SELECT * FROM u2) s ON t.id = s.id + 1"
            " WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="unsupported MERGE actions"):
        cat.sql(
            "MERGE INTO users t USING (SELECT * FROM u2) s ON t.id = s.id"
            " WHEN MATCHED THEN FROB"
        )
    with pytest.raises(ValueError, match="merge-key column"):
        cat.sql(
            "MERGE INTO users t USING (SELECT * FROM u2) s ON t.id = s.id"
            " WHEN MATCHED THEN UPDATE SET id = s.id + 1"
        )
    with pytest.raises(ValueError, match="multiple WHEN MATCHED"):
        cat.sql(
            "MERGE INTO users t USING (SELECT * FROM u2) s ON t.id = s.id"
            " WHEN MATCHED AND s.age > 1 THEN DELETE"
            " WHEN MATCHED THEN UPDATE SET *"
        )


def test_merge_update_only_ignores_unmatched(cat, spark):
    spark.createDataFrame(
        [(2, "bobby", 41), (99, "ghost", 9)], "id long, name string, age int"
    ).createOrReplaceTempView("u3")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM u3) s ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET *"
    )
    assert res.collect()[0].rows == 1  # only the matched row
    ids = {r.id for r in cat.read_table("users").collect()}
    assert 99 not in ids and ids == {1, 2, 3}


def test_create_table_as_select(cat):
    res = cat.sql(
        "CREATE TABLE seniors AS SELECT id, name FROM users WHERE age >= 40"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: r.name for r in cat.read_table("seniors").collect()}
    assert got == {2: "bob", 3: "cy"}
    assert "seniors" in cat.list_tables()


def test_insert_overwrite_replaces_and_time_travels(cat):
    v0 = cat.snapshot("users").version
    res = cat.sql("INSERT OVERWRITE users VALUES (8, 'only', 10)")
    assert res.collect()[0].rows == 1
    got = {(r.id, r.name) for r in cat.read_table("users").collect()}
    assert got == {(8, "only")}
    # REPLACE keeps history: the pre-overwrite generation still reads
    old = cat.read_table("users", version_as_of=v0)
    assert old.count() == 3


def test_sql_dml_inside_transaction(cat, spark):
    """txn.sql buffers DML with read-your-writes: statements see prior
    statements through the overlay, other readers see nothing until
    seal, and everything lands as one atomic transaction."""
    observer = Catalog(spark, cat.root)
    with cat.transaction() as txn:
        txn.sql("INSERT INTO users VALUES (20, 'txn', 1)")
        txn.sql("UPDATE users SET age = 99 WHERE id <= 1")
        txn.sql("DELETE FROM users WHERE id = 3")
        # read-your-writes inside the txn
        seen = {
            r.id: r.age
            for r in txn.sql("SELECT id, age FROM users").collect()
        }
        assert seen == {1: 99, 2: 40, 20: 1}
        # invisible outside until seal
        assert observer.read_table("users").count() == 3
        assert {
            r.age for r in observer.read_table("users").collect()
        } == {30, 40, 50}
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 99, 2: 40, 20: 1}


def test_txn_sql_update_sees_buffered_insert(cat):
    with cat.transaction() as txn:
        txn.sql("INSERT INTO users VALUES (30, 'late', 5)")
        res = txn.sql("UPDATE users SET age = age * 10 WHERE id = 30")
        assert res.collect()[0].rows == 1
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got[30] == 50


def test_txn_sql_merge_rejected(cat):
    with cat.transaction() as txn:
        with pytest.raises(ValueError, match="MERGE INTO inside a transaction"):
            txn.sql(
                "MERGE INTO users t USING users s ON t.id = s.id"
                " WHEN MATCHED THEN UPDATE SET *"
            )
        txn.sql("INSERT INTO users VALUES (40, 'ok', 1)")  # txn still usable
    assert 40 in {r.id for r in cat.read_table("users").collect()}


def test_txn_sql_rejects_ddl(cat):
    with cat.transaction() as txn:
        with pytest.raises(ValueError, match="CREATE TABLE inside"):
            txn.sql("CREATE TABLE t2 AS SELECT * FROM users")
        txn.sql("INSERT INTO users VALUES (50, 'after', 2)")
    assert 50 in {r.id for r in cat.read_table("users").collect()}


def test_txn_sql_insert_overwrite_buffers_replace(cat, spark):
    """Directive: buffered REPLACE — overwrite + merge in ONE seal,
    atomic under a concurrent reader."""
    observer = Catalog(spark, cat.root)
    with cat.transaction() as txn:
        res = txn.sql("INSERT OVERWRITE users VALUES (8, 'only', 10)")
        assert res.collect()[0].rows == 1
        # read-your-writes sees the new generation...
        assert {r.id for r in txn.sql("SELECT id FROM users").collect()} == {8}
        # ...then a merge on top of the buffered replace
        txn.sql("UPDATE users SET age = 11 WHERE id = 8")
        txn.sql("INSERT INTO users VALUES (9, 'post', 1)")
        # nothing visible outside until seal
        assert observer.read_table("users").count() == 3
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {8: ("only", 11), 9: ("post", 1)}


def test_txn_write_replace_mode_seals_atomically(cat, spark):
    df = spark.createDataFrame([(100, "r", 1)], "id long, name string, age int")
    with cat.transaction() as txn:
        txn.write(df, "users", mode="replace")
        assert {r.id for r in txn.read("users").collect()} == {100}
    assert {r.id for r in cat.read_table("users").collect()} == {100}


# ---- round-7: generalized MERGE INTO + ADVICE fixes --------------------


def test_merge_matched_predicate(cat, spark):
    spark.createDataFrame(
        [(1, "a", 100), (2, "b", 1)], "id long, name string, age int"
    ).createOrReplaceTempView("m7src")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM m7src) s ON t.id = s.id"
        " WHEN MATCHED AND t.age >= 40 THEN UPDATE SET *"
    )
    assert res.collect()[0].rows == 1  # only id=2 (age 40) passes the pred
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 1, 3: 50}


def test_merge_column_set_list(cat, spark):
    spark.createDataFrame(
        [(1, 7), (2, 8)], "id long, bump int"
    ).createOrReplaceTempView("m7bump")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM m7bump) s ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET age = t.age + s.bump,"
        " name = upper(t.name)"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {1: ("ANN", 37), 2: ("BOB", 48), 3: ("cy", 50)}


def test_merge_predicated_update_plus_insert_one_commit(cat, spark):
    spark.createDataFrame(
        [(2, "bobby", 41), (7, "new", 70), (9, "teen", 12)],
        "id long, name string, age int",
    ).createOrReplaceTempView("m7mix")
    v0 = cat.snapshot("users").version
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM m7mix) s ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET age = s.age"
        " WHEN NOT MATCHED AND s.age >= 18 THEN INSERT *"
    )
    assert res.collect()[0].rows == 2  # update id=2, insert id=7; 9 filtered
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {
        1: ("ann", 30),
        2: ("bob", 41),  # SET list keeps the target name
        3: ("cy", 50),
        7: ("new", 70),
    }
    assert cat.snapshot("users").version == v0 + 1  # single commit


def test_merge_delete_with_predicate(cat, spark):
    spark.createDataFrame(
        [(1,), (2,), (3,)], "id long"
    ).createOrReplaceTempView("m7del")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT id FROM m7del) s ON t.id = s.id"
        " WHEN MATCHED AND t.age > 35 THEN DELETE"
    )
    assert res.collect()[0].rows == 2
    assert {r.id for r in cat.read_table("users").collect()} == {1}


def test_merge_insert_only(cat, spark):
    spark.createDataFrame(
        [(1, "dup", 1), (11, "fresh", 60)], "id long, name string, age int"
    ).createOrReplaceTempView("m7ins")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM m7ins) s ON t.id = s.id"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.collect()[0].rows == 1
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[1] == "ann" and got[11] == "fresh"  # matched row untouched


def test_merge_delete_plus_insert_atomic(cat, spark):
    spark.createDataFrame(
        [(1, "gone", 0), (12, "kept", 22)], "id long, name string, age int"
    ).createOrReplaceTempView("m7di")
    res = cat.sql(
        "MERGE INTO users t USING (SELECT * FROM m7di) s ON t.id = s.id"
        " WHEN MATCHED THEN DELETE"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.collect()[0].rows == 2
    got = {r.id for r in cat.read_table("users").collect()}
    assert got == {2, 3, 12}


def test_update_set_merge_key_rejected(cat):
    with pytest.raises(ValueError, match="merge-key column"):
        cat.sql("UPDATE users SET id = id + 1")
    # and inside a transaction
    with cat.transaction() as txn:
        with pytest.raises(ValueError, match="merge-key column"):
            txn.sql("UPDATE users SET id = 99 WHERE id = 1")
        txn.sql("INSERT INTO users VALUES (60, 'fine', 3)")
    assert 60 in {r.id for r in cat.read_table("users").collect()}


def test_update_set_string_literal_with_comma(cat):
    res = cat.sql("UPDATE users SET name = 'a,b' WHERE id = 1")
    assert res.collect()[0].rows == 1
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[1] == "a,b"
    # escaped quote ('') inside the literal
    cat.sql("UPDATE users SET name = 'o''brien, jr' WHERE id = 2")
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[2] == "o'brien, jr"


def test_table_name_inside_literal_not_registered(cat):
    # a table name INSIDE a string literal is not a reference — it must
    # not cost a snapshot resolution / view registration
    assert cat._referenced_tables("SELECT 'users are great' AS s") == []
    assert cat._referenced_tables(
        "SELECT * FROM users WHERE name != 'users'"
    ) == ["users"]
    # escaped '' inside a literal doesn't end the literal early
    assert cat._referenced_tables("SELECT 'it''s users' AS s") == []


def test_count_rows_false_skips_count(cat):
    res = cat.sql(
        "UPDATE users SET age = age + 1 WHERE id = 1", count_rows=False
    )
    row = res.collect()[0]
    assert row.operation == "UPDATE" and row.rows == -1
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got[1] == 31  # the write still happened
    res2 = cat.sql("INSERT INTO users VALUES (70, 'nc', 1)", count_rows=False)
    assert res2.collect()[0].rows == -1
    assert 70 in {r.id for r in cat.read_table("users").collect()}


def test_nondeterministic_payload_single_evaluation(cat):
    """The pinned payload means the reported count and the written rows
    come from one evaluation of a rand()-dependent filter."""
    res = cat.sql(
        "INSERT INTO users SELECT id + 100 AS id, name, age FROM users"
        " WHERE rand() >= 0"  # always true but non-deterministic plan
    )
    assert res.collect()[0].rows == 3
    assert cat.read_table("users").count() == 6


def test_sql_time_travel_version_as_of(cat):
    v0 = cat.snapshot("users").version
    cat.sql("UPDATE users SET age = age + 100")
    # plain historical read
    old = cat.sql(f"SELECT id, age FROM users VERSION AS OF {v0}")
    assert {r.age for r in old.collect()} == {30, 40, 50}
    # the directive's shape: current state joined against own history
    diff = cat.sql(
        f"SELECT c.id, c.age - o.age AS delta FROM users c"
        f" JOIN users VERSION AS OF {v0} o ON c.id = o.id"
    )
    assert {r.delta for r in diff.collect()} == {100}


def test_sql_time_travel_timestamp_as_of(cat):
    hist = cat.history("users")
    ts0 = hist[0]["timestamp_ms"]  # newest commit (the seed insert)
    cat.sql("DELETE FROM users WHERE id = 3")
    got = cat.sql(f"SELECT id FROM users TIMESTAMP AS OF {ts0}")
    assert {r.id for r in got.collect()} == {1, 2, 3}
    # ISO string form (naive = UTC)
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(ts0 / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f"
    )
    got2 = cat.sql(f"SELECT id FROM users TIMESTAMP AS OF '{iso}'")
    assert {r.id for r in got2.collect()} == {1, 2, 3}
    assert {r.id for r in cat.sql("SELECT id FROM users").collect()} == {1, 2}


def test_sql_time_travel_inside_dml_payload(cat):
    v0 = cat.snapshot("users").version
    cat.sql("DELETE FROM users WHERE id IN (2, 3)")
    # re-insert the deleted rows from history through the DML payload
    res = cat.sql(
        f"INSERT INTO users SELECT * FROM users VERSION AS OF {v0}"
        " WHERE id = 3"
    )
    assert res.collect()[0].rows == 1
    assert {r.id for r in cat.read_table("users").collect()} == {1, 3}


def test_sql_time_travel_literal_blind(cat):
    df = cat.sql("SELECT 'VERSION AS OF 1' AS s FROM users")
    assert df.collect()[0].s == "VERSION AS OF 1"


def test_describe_table_sql(cat):
    rows = cat.sql("DESCRIBE TABLE users").collect()
    by_name = {r.col_name: r for r in rows}
    assert set(by_name) == {"id", "name", "age"}
    assert by_name["id"].merge_key is True and by_name["id"].data_type == "bigint"
    assert by_name["age"].merge_key is False
    # bare DESCRIBE works too; non-catalog names still fall through
    assert len(cat.sql("DESCRIBE users").collect()) == 3


def test_show_partitions_sql(cat, spark):
    from deltacat_spark.plans.transforms import PartitionKey

    cat.create_table(
        "pt",
        schema=Schema(
            [
                Field("k", T.LongType(), merge_key=True),
                Field("cat", T.StringType()),
            ]
        ),
        partition_scheme=[PartitionKey("cat")],
    )
    cat.write_to_table(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "k long, cat string"
        ),
        "pt",
        mode="merge",
    )
    parts = {r.partition for r in cat.sql("SHOW PARTITIONS pt").collect()}
    assert parts == {"cat=a", "cat=b"}
    with pytest.raises(ValueError, match="not partitioned"):
        cat.sql("SHOW PARTITIONS users")


def test_alter_table_sql(cat):
    cat.sql("ALTER TABLE users ADD COLUMN score double")
    cols = {r.col_name: r.data_type for r in cat.sql("DESCRIBE users").collect()}
    assert cols["score"] == "double"
    cat.sql("ALTER TABLE users ADD COLUMNS (tags array<string>, note string)")
    cols = {r.col_name: r.data_type for r in cat.sql("DESCRIBE users").collect()}
    assert cols["tags"] == "array<string>" and "note" in cols
    # old rows read with nulls in the new columns
    assert {r.score for r in cat.read_table("users").collect()} == {None}

    cat.sql("ALTER TABLE users SET TBLPROPERTIES ('owner'='ml-team', 'ttl'='30')")
    props = cat.get_table("users")["properties"]
    assert props["owner"] == "ml-team" and props["ttl"] == "30"

    cat.sql("ALTER TABLE users RENAME TO people")
    assert "people" in cat.list_tables() and "users" not in cat.list_tables()
    assert cat.read_table("people").count() == 3


def test_create_table_ddl(cat):
    cat.sql(
        "CREATE TABLE items (item_id BIGINT PRIMARY KEY, name STRING,"
        " price DECIMAL(10,2), qty INT NOT NULL)"
    )
    rows = {r.col_name: r for r in cat.sql("DESCRIBE items").collect()}
    assert rows["item_id"].merge_key and rows["item_id"].data_type == "bigint"
    assert rows["price"].data_type == "decimal(10,2)"
    cat.sql("INSERT INTO items VALUES (1, 'x', 9.99, 2)")
    cat.sql("INSERT INTO items VALUES (1, 'x2', 8.88, 3)")  # upsert on PK
    assert cat.read_table("items").count() == 1
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE items (a INT)")
    cat.sql("CREATE TABLE IF NOT EXISTS items (a INT)")  # no-op


def test_create_table_composite_pk_partitioned(cat):
    cat.sql(
        "CREATE TABLE m (a BIGINT, b STRING, v INT, PRIMARY KEY (a, b))"
        " PARTITIONED BY (b) TBLPROPERTIES ('owner'='x')"
    )
    rows = {r.col_name: r for r in cat.sql("DESCRIBE m").collect()}
    assert rows["a"].merge_key and rows["b"].merge_key and rows["b"].partition
    assert cat.get_table("m")["properties"]["owner"] == "x"
    cat.sql("INSERT INTO m VALUES (1, 'p', 5), (1, 'q', 6)")
    assert {r.partition for r in cat.sql("SHOW PARTITIONS m").collect()} == {
        "b=p",
        "b=q",
    }


def test_drop_and_truncate_table_sql(cat):
    res = cat.sql("TRUNCATE TABLE users")
    assert res.collect()[0].rows == 3
    assert cat.read_table("users").count() == 0
    cat.sql("DROP TABLE users")
    assert "users" not in cat.list_tables()
    cat.sql("DROP TABLE IF EXISTS users")  # no-op
    from deltacat_spark.catalog.catalog import TableNotFoundError

    with pytest.raises(TableNotFoundError):
        cat.sql("DROP TABLE users")


def test_copy_into_sql(cat, tmp_path, spark):
    src = str(tmp_path / "ext.parquet")
    spark.createDataFrame(
        [(50, "ext", 9)], "id long, name string, age int"
    ).write.parquet(src)
    res = cat.sql(f"COPY INTO users FROM '{src}' FILEFORMAT = PARQUET")
    assert res.collect()[0].rows == 1
    assert 50 in {r.id for r in cat.read_table("users").collect()}


def test_alter_drop_column_sql(cat):
    v0 = cat.snapshot("users").version
    cat.sql("ALTER TABLE users DROP COLUMN name")
    assert {r.col_name for r in cat.sql("DESCRIBE users").collect()} == {
        "id",
        "age",
    }
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 40, 3: 50}  # data intact, column gone
    # time travel still sees the dropped column (metadata-only drop)
    old = cat.read_table("users", version_as_of=v0)
    assert "name" in old.columns
    with pytest.raises(Exception, match="merge-key|partition"):
        cat.sql("ALTER TABLE users DROP COLUMN id")
    with pytest.raises(ValueError, match="unknown columns"):
        cat.sql("ALTER TABLE users DROP COLUMN ghost")


def test_alter_column_type_widening_sql(cat):
    cat.sql("ALTER TABLE users ALTER COLUMN age TYPE BIGINT")
    rows = {r.col_name: r.data_type for r in cat.sql("DESCRIBE users").collect()}
    assert rows["age"] == "bigint"
    assert {r.age for r in cat.read_table("users").collect()} == {30, 40, 50}
    from deltacat_spark.schema import SchemaError

    with pytest.raises(SchemaError):  # narrowing rejected
        cat.sql("ALTER TABLE users ALTER COLUMN age TYPE SMALLINT")


def test_saved_views(cat):
    cat.sql("CREATE VIEW adults AS SELECT id, name FROM users WHERE age >= 40")
    got = {r.id for r in cat.sql("SELECT * FROM adults").collect()}
    assert got == {2, 3}
    # a view is VIRTUAL: it tracks table mutations
    cat.sql("UPDATE users SET age = 18 WHERE id = 3")
    assert {r.id for r in cat.sql("SELECT * FROM adults").collect()} == {2}
    # nested views expand recursively
    cat.sql("CREATE VIEW adult_names AS SELECT name FROM adults")
    assert {r.name for r in cat.sql("SELECT * FROM adult_names").collect()} == {
        "bob"
    }
    assert {r.view for r in cat.sql("SHOW VIEWS").collect()} == {
        "adults",
        "adult_names",
    }
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE VIEW adults AS SELECT 1 AS x")
    cat.sql("CREATE OR REPLACE VIEW adults AS SELECT id FROM users")
    assert cat.sql("SELECT count(*) AS n FROM adults").collect()[0].n == 3
    cat.sql("DROP VIEW adult_names")
    with pytest.raises(FileNotFoundError):
        cat.sql("DROP VIEW adult_names")
    cat.sql("DROP VIEW IF EXISTS adult_names")  # no-op
    with pytest.raises(ValueError, match="existing table"):
        cat.sql("CREATE VIEW users AS SELECT 1 AS x")


def test_view_in_dml_payload(cat):
    cat.sql("CREATE VIEW seniors_v AS SELECT * FROM users WHERE age >= 50")
    res = cat.sql(
        "INSERT INTO users SELECT id + 100 AS id, name, age FROM seniors_v"
    )
    assert res.collect()[0].rows == 1
    assert 103 in {r.id for r in cat.read_table("users").collect()}


def test_materialized_view_record_wise_incremental(cat):
    res = cat.sql(
        "CREATE MATERIALIZED VIEW mv_adults AS"
        " SELECT id, name FROM users WHERE age >= 40"
    )
    assert "full" in res.collect()[0].operation  # bootstrap rebuild
    assert {r.id for r in cat.sql("SELECT * FROM mv_adults").collect()} == {2, 3}
    # append-only source change → INCREMENTAL refresh
    cat.write_to_table(
        cat.spark.createDataFrame(
            [(7, "new", 70)], "id long, name string, age int"
        ),
        "users",
        mode="merge",
    )
    res2 = cat.sql("REFRESH MATERIALIZED VIEW mv_adults")
    op = res2.collect()[0].operation
    assert {r.id for r in cat.sql("SELECT * FROM mv_adults").collect()} == {
        2,
        3,
        7,
    }
    # a MERGE into existing keys forces a rebuild; result stays exact
    cat.sql("UPDATE users SET age = 10 WHERE id = 2")
    res3 = cat.sql("REFRESH MATERIALIZED VIEW mv_adults")
    assert "full" in res3.collect()[0].operation
    assert {r.id for r in cat.sql("SELECT * FROM mv_adults").collect()} == {3, 7}
    # no-op refresh short-circuits
    res4 = cat.sql("REFRESH MATERIALIZED VIEW mv_adults")
    assert "noop" in res4.collect()[0].operation
    cat.sql("DROP MATERIALIZED VIEW mv_adults")
    assert "mv_adults" not in cat.list_tables()


def test_materialized_view_aggregate_rebuilds(cat):
    cat.sql(
        "CREATE MATERIALIZED VIEW mv_stats AS"
        " SELECT count(*) AS n, sum(age) AS total_age FROM users"
    )
    row = cat.sql("SELECT * FROM mv_stats").collect()[0]
    assert (row.n, row.total_age) == (3, 120)
    cat.sql("INSERT INTO users VALUES (9, 'x', 10)")
    res = cat.sql("REFRESH MATERIALIZED VIEW mv_stats")
    # aggregates NEVER take the incremental append path
    assert "full" in res.collect()[0].operation
    row = cat.sql("SELECT * FROM mv_stats").collect()[0]
    assert (row.n, row.total_age) == (4, 130)
    # multi-table MVs are supported since r8 (pinned-snapshot full
    # rebuild, one watermark per source — tests/test_mv_rewrite.py);
    # only table-free SQL is rejected here
    cat.sql("CREATE TABLE others AS SELECT id FROM users WHERE id = 1")
    cat.sql(
        "CREATE MATERIALIZED VIEW mv_joined AS"
        " SELECT u.id FROM users u JOIN others o ON u.id = o.id"
    )
    assert {r.id for r in cat.sql("SELECT * FROM mv_joined").collect()} == {1}
    with pytest.raises(ValueError, match="no catalog table"):
        cat.create_materialized_view("mv_bad", "SELECT 1 AS one")


def test_check_constraints(cat):
    from deltacat_spark.catalog.catalog import ConstraintViolationError

    cat.sql("ALTER TABLE users ADD CONSTRAINT adult CHECK (age >= 18)")
    # violating write rejected, nothing committed
    v0 = cat.snapshot("users").version
    with pytest.raises(ConstraintViolationError, match="adult"):
        cat.sql("INSERT INTO users VALUES (10, 'kid', 7)")
    assert cat.snapshot("users").version == v0
    assert 10 not in {r.id for r in cat.read_table("users").collect()}
    # passing write proceeds; NULL passes (SQL UNKNOWN semantics)
    cat.sql("INSERT INTO users VALUES (11, 'ok', 21), (12, 'nullage', NULL)")
    assert {11, 12} <= {r.id for r in cat.read_table("users").collect()}
    # declaring a constraint existing rows violate is rejected
    with pytest.raises(ConstraintViolationError, match="violate"):
        cat.sql("ALTER TABLE users ADD CONSTRAINT young CHECK (age < 40)")
    # duplicate name rejected; unknown expression rejected
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE users ADD CONSTRAINT adult CHECK (age >= 21)")
    with pytest.raises(ValueError, match="resolve"):
        cat.sql("ALTER TABLE users ADD CONSTRAINT ghost CHECK (nope > 1)")
    # UPDATE through the merge path is constrained too
    with pytest.raises(ConstraintViolationError):
        cat.sql("UPDATE users SET age = 2 WHERE id = 1")
    # drop, then the violating write is allowed
    cat.sql("ALTER TABLE users DROP CONSTRAINT adult")
    cat.sql("INSERT INTO users VALUES (10, 'kid', 7)")
    assert 10 in {r.id for r in cat.read_table("users").collect()}
    with pytest.raises(ValueError, match="no constraint"):
        cat.sql("ALTER TABLE users DROP CONSTRAINT adult")


def test_check_constraint_partial_payload_skipped(cat, spark):
    cat.sql("ALTER TABLE users ADD CONSTRAINT named CHECK (length(name) > 1)")
    # partial payload without `name`: the constraint can't be falsified
    # by this write — it must not block the partial upsert
    part = spark.createDataFrame([(1, 33)], "id long, age int")
    cat.write_to_table(part, "users", mode="merge")
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got[1] == ("ann", 33)


def test_show_create_table_round_trips(cat, spark):
    from deltacat_spark.plans.transforms import PartitionKey

    cat.create_table(
        "rt",
        schema=Schema(
            [
                Field("a", T.LongType(), merge_key=True),
                Field("b", T.StringType()),
                Field("v", T.IntegerType(), nullable=False),
            ]
        ),
        partition_scheme=[PartitionKey("b")],
        properties={"owner": "x"},
    )
    cat.sql("ALTER TABLE rt ADD CONSTRAINT pos CHECK (v > 0)")
    ddl = cat.sql("SHOW CREATE TABLE rt").collect()[0].create_statement
    assert "PRIMARY KEY (a)" in ddl and "PARTITIONED BY (b)" in ddl
    assert "'constraint.pos'='v > 0'" in ddl and "'owner'='x'" in ddl
    # the emitted DDL recreates an equivalent table in a fresh catalog
    cat2 = Catalog(spark, cat.root + "_rt2")
    cat2.sql(ddl)
    d1 = {r.col_name: r for r in cat.sql("DESCRIBE rt").collect()}
    d2 = {r.col_name: r for r in cat2.sql("DESCRIBE rt").collect()}
    assert {k: (v.data_type, v.merge_key, v.partition) for k, v in d1.items()} == {
        k: (v.data_type, v.merge_key, v.partition) for k, v in d2.items()
    }
    # and the constraint survives the round trip
    from deltacat_spark.catalog.catalog import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        cat2.sql("INSERT INTO rt VALUES (1, 'p', -5)")


def test_merge_using_time_travel(cat, spark):
    """MERGE whose USING subquery time-travels: re-apply a historical
    state onto the current table through one statement."""
    v0 = cat.snapshot("users").version
    cat.sql("UPDATE users SET age = 0")
    cat.sql(
        f"MERGE INTO users t USING"
        f" (SELECT * FROM users VERSION AS OF {v0}) s"
        " ON t.id = s.id WHEN MATCHED THEN UPDATE SET age = s.age"
    )
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 40, 3: 50}


def test_update_set_evaluates_preimage_simultaneously(cat):
    """r14 (same class as the Delta update_delta fix): every SET RHS
    evaluates against the PRE-image — `SET name = CAST(age AS STRING),
    age = age + LENGTH(name)` must use the OLD name's length and OLD
    age, and cross-references must not see already-updated columns."""
    cat.sql(
        "UPDATE users SET name = CAST(age AS STRING), "
        "age = age + LENGTH(name) WHERE id = 1"
    )
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    # pre-image: name='ann' (len 3), age=30
    assert got[1] == ("30", 33)
    assert got[2] == ("bob", 40)


def test_update_set_unknown_column_rejected(cat):
    with pytest.raises(ValueError, match="nope"):
        cat.sql("UPDATE users SET nope = 1 WHERE id = 1")


def test_txn_update_set_evaluates_preimage(cat):
    with cat.transaction() as txn:
        txn.sql(
            "UPDATE users SET name = CAST(age AS STRING), "
            "age = age + LENGTH(name) WHERE id = 2"
        )
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got[2] == ("40", 43)  # old name 'bob' (len 3), old age 40

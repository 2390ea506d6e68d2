"""Field-group (subschema) tests: independent column-family writers over
shared merge keys, zipper-merged at read (reference subschemas
`schema.py:937-973`; rivulet zipper merge `block_scanner.py:80-129`).

The Spark realization: each field-group write is a partial upsert
(outer-join column coalesce) — the same plan the reference's zipper
block scanner executes across column families.
"""

from pyspark.sql import types as T

from deltacat_spark.schema import Field, Schema

DOC_SCHEMA = Schema(
    [
        Field("doc_id", T.LongType(), merge_key=True),
        Field("text", T.StringType(), subschema="text"),
        Field("lang", T.StringType(), subschema="text"),
        Field("embedding", T.ArrayType(T.FloatType()), subschema="vectors"),
        Field("image_digest", T.StringType(), subschema="media"),
    ]
)


def test_subschema_views():
    assert DOC_SCHEMA.subschema_names() == ["text", "vectors", "media"]
    assert DOC_SCHEMA.subschema_columns("vectors") == ["doc_id", "embedding"]
    s2 = Schema.from_json(DOC_SCHEMA.to_json())
    assert s2.field("embedding").subschema == "vectors"


def test_field_group_writers_zipper_merge(spark, catalog):
    catalog.create_table("docs", schema=DOC_SCHEMA)
    # writer 1: text group
    catalog.write_to_table(
        spark.createDataFrame(
            [(1, "hello", "en"), (2, "hola", "es")],
            "doc_id long, text string, lang string",
        ),
        "docs",
        mode="merge",
    )
    # writer 2: vectors group (different columns, same keys)
    catalog.write_to_table(
        spark.createDataFrame(
            [(1, [0.1, 0.2]), (3, [0.3, 0.4])],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("embedding", T.ArrayType(T.FloatType())),
                ]
            ),
        ),
        "docs",
        mode="merge",
    )
    # writer 3: media group
    catalog.write_to_table(
        spark.createDataFrame(
            [(2, "abc123")], "doc_id long, image_digest string"
        ),
        "docs",
        mode="merge",
    )
    rows = {r.doc_id: r for r in catalog.read_table("docs").collect()}
    # zipper semantics: groups stitched by key, absent groups null
    assert rows[1].text == "hello" and list(rows[1].embedding) == [
        0.10000000149011612,
        0.20000000298023224,
    ]
    assert rows[2].text == "hola" and rows[2].image_digest == "abc123"
    assert rows[3].text is None and rows[3].embedding is not None

"""Schema model tests (reference semantics: merge-key constraints
`schema.py:468-494`, permissive promotion `schema.py:671-804`,
consistency `schema.py:595-670`)."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.schema import Field, Schema, SchemaError


def test_merge_key_rejects_float_and_nested():
    with pytest.raises(SchemaError):
        Field("x", T.DoubleType(), merge_key=True)
    with pytest.raises(SchemaError):
        Field("x", T.ArrayType(T.LongType()), merge_key=True)


def test_merge_key_forces_non_nullable():
    f = Field("id", T.LongType(), merge_key=True)
    assert f.nullable is False


def test_roundtrip_json():
    s = Schema(
        [
            Field("id", T.LongType(), merge_key=True),
            Field("ts", T.TimestampNTZType(), event_time=True),
            Field("name", T.StringType(), past_default="unknown"),
            Field("seq", T.LongType(), merge_order=("desc", "last")),
        ]
    )
    s2 = Schema.from_json(s.to_json())
    assert s2.merge_keys == ["id"]
    assert s2.event_time_field == "ts"
    assert s2.field("name").past_default == "unknown"
    assert s2.field("seq").merge_order == ("desc", "last")
    assert [f.field_id for f in s2.fields] == [1, 2, 3, 4]


def test_evolve_widens_and_appends():
    s = Schema([Field("id", T.LongType(), merge_key=True), Field("age", T.IntegerType())])
    inc = Schema([Field("age", T.LongType()), Field("score", T.DoubleType())])
    ev = s.evolve(inc)
    assert ev.field("age").data_type == T.LongType()
    assert ev.field("score").data_type == T.DoubleType()
    assert ev.merge_keys == ["id"]


def test_evolve_rejects_narrowing_incompatible():
    s = Schema([Field("name", T.StringType())])
    with pytest.raises(SchemaError):
        s.evolve(Schema([Field("name", T.LongType())]))


def test_evolve_no_narrow():
    s = Schema([Field("age", T.LongType())])
    ev = s.evolve(Schema([Field("age", T.IntegerType())]))
    assert ev.field("age").data_type == T.LongType()


def test_validate_and_coerce(spark):
    s = Schema(
        [
            Field("id", T.LongType(), merge_key=True),
            Field("age", T.IntegerType()),
            Field("email", T.StringType(), future_default="n/a"),
        ]
    )
    df = spark.createDataFrame([(1, 30)], ["id", "age"])
    out = s.validate_and_coerce(df)
    row = out.collect()[0]
    assert row.email == "n/a"
    assert out.schema["age"].dataType == T.IntegerType()


def test_validate_mode_raises(spark):
    s = Schema([Field("age", T.IntegerType(), consistency="validate")])
    df = spark.createDataFrame([(30,)], ["age"])  # long
    with pytest.raises(SchemaError):
        s.validate_and_coerce(df)


def test_decimal_promotion_covers_both():
    from pyspark.sql import types as T

    from deltacat_spark.schema import _promote

    d = T.DecimalType
    assert _promote(d(10, 2), d(3, 2), "p") == d(10, 2)  # narrower payload
    assert _promote(d(3, 2), d(10, 2), "p") == d(10, 2)  # widening evolve
    assert _promote(d(10, 2), d(8, 4), "p") == d(12, 4)  # covering type
    # at the 38-digit boundary, integer capacity wins: existing
    # decimal(38,0) values must stay representable, so scale gives way
    assert _promote(d(38, 0), d(10, 10), "p") == d(38, 0)

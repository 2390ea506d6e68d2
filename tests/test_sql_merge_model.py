"""Randomized model check for the generalized SQL `MERGE INTO`
(`catalog/catalog.py:_sql_merge`): every supported clause-shape
combination — star/column-SET updates, DELETE, INSERT, each with and
without WHEN predicates — is replayed against a plain-Python dict model
and the table end state must match exactly. The same style as the DML
model fuzz (`test_model_random.py`), aimed at the statement parser +
payload-composition layer rather than the commit protocol."""

import random

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

# (sql fragment, python evaluator over (t_row, s_row)) — t/s are dicts.
MATCHED_PREDS = [
    (None, lambda t, s: True),
    ("s.age > 50", lambda t, s: s["age"] > 50),
    ("t.age < 40", lambda t, s: t["age"] < 40),
    ("s.age > t.age", lambda t, s: s["age"] > t["age"]),
]
UNMATCHED_PREDS = [
    (None, lambda s: True),
    ("s.age >= 30", lambda s: s["age"] >= 30),
    ("s.name LIKE 'u%'", lambda s: s["name"].startswith("u")),
]
SET_LISTS = [
    ("*", None),
    (
        "age = t.age + s.age",
        lambda t, s: {**t, "age": t["age"] + s["age"]},
    ),
    (
        "name = upper(s.name), age = s.age - 1",
        lambda t, s: {**t, "name": s["name"].upper(), "age": s["age"] - 1},
    ),
]


def _apply_model(target, source, action, m_pred, set_fn, ins, u_pred):
    out = dict(target)
    for key, s in source.items():
        if key in target:
            t = target[key]
            if not m_pred(t, s):
                continue
            if action == "delete":
                out.pop(key, None)
            elif set_fn is None:
                out[key] = dict(s)
            else:
                out[key] = set_fn(t, s)
        elif ins and u_pred(s):
            out[key] = dict(s)
    return out


@pytest.mark.slow
def test_merge_shapes_match_model(spark, tmp_path):
    rng = random.Random(73)
    cat = Catalog(spark, str(tmp_path / "mm"))
    schema = Schema(
        [
            Field("id", T.LongType(), merge_key=True),
            Field("name", T.StringType()),
            Field("age", T.IntegerType()),
        ]
    )
    names = ["uma", "bob", "ula", "kim", "zed", "ann"]
    trial = 0
    for action in ("update", "delete"):
        for mi, (m_sql, m_py) in enumerate(MATCHED_PREDS):
            for ins in (False, True):
                u_sql, u_py = UNMATCHED_PREDS[trial % len(UNMATCHED_PREDS)]
                if action == "update":
                    set_sql, set_fn = SET_LISTS[trial % len(SET_LISTS)]
                else:
                    set_sql, set_fn = None, None
                trial += 1
                # fresh deterministic state per trial
                tname = f"t{trial}"
                target = {
                    i: {"id": i, "name": rng.choice(names), "age": rng.randrange(18, 80)}
                    for i in rng.sample(range(1, 30), 12)
                }
                source = {
                    i: {"id": i, "name": rng.choice(names), "age": rng.randrange(18, 80)}
                    for i in rng.sample(range(1, 40), 10)
                }
                cat.write_to_table(
                    spark.createDataFrame(
                        [tuple(r.values()) for r in target.values()],
                        "id long, name string, age int",
                    ),
                    tname,
                    schema=schema,
                )
                cat.write_to_table(
                    spark.createDataFrame(
                        [tuple(r.values()) for r in source.values()],
                        "id long, name string, age int",
                    ),
                    f"s{trial}",
                )
                m_clause = "WHEN MATCHED"
                if m_sql:
                    m_clause += f" AND {m_sql}"
                if action == "delete":
                    m_clause += " THEN DELETE"
                else:
                    m_clause += f" THEN UPDATE SET {set_sql}"
                stmt = (
                    f"MERGE INTO {tname} t USING s{trial} s ON t.id = s.id "
                    + m_clause
                )
                if ins:
                    stmt += " WHEN NOT MATCHED"
                    if u_sql:
                        stmt += f" AND {u_sql}"
                    stmt += " THEN INSERT *"
                cat.sql(stmt, count_rows=False)
                got = {
                    r.id: {"id": r.id, "name": r.name, "age": r.age}
                    for r in cat.read_table(tname).collect()
                }
                want = _apply_model(
                    target, source, action, m_py, set_fn, ins, u_py
                )
                assert got == want, f"shape mismatch for: {stmt}"

"""Model-based randomized write-sequence test: seeded random
merge/delete/replace programs applied both to the catalog (CoW and MoR)
and to a plain in-memory dict model of upsert semantics; final states
must agree exactly. Randomization amplifies the hand-written golden
matrix the way the reference's combinatorial suite amplifies its unit
cases — same oracle idea, machine-chosen interleavings.
"""

import random

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType(), merge_key=True),
        Field("name", T.StringType()),
        Field("v", T.IntegerType()),
    ]
)

KEYSPACE = 12  # small on purpose: forces upsert/delete collisions


def _random_program(seed: int, n_ops: int = 8):
    rng = random.Random(seed)
    ops = []
    serial = 0
    for _ in range(n_ops):
        kind = rng.choices(["merge", "delete", "replace"], [6, 3, 1])[0]
        if kind == "merge":
            rows = []
            for _ in range(rng.randint(1, 5)):
                serial += 1
                rows.append(
                    (rng.randrange(KEYSPACE), f"n{serial}", serial)
                )
            ops.append(("merge", rows))
        elif kind == "delete":
            ids = sorted(
                rng.sample(range(KEYSPACE), rng.randint(1, 3))
            )
            ops.append(("delete", [(i,) for i in ids]))
        else:
            serial += 1
            ops.append(
                ("replace", [(rng.randrange(KEYSPACE), f"r{serial}", serial)])
            )
    return ops


def _model_apply(model: dict, ops):
    for kind, rows in ops:
        if kind == "merge":
            for i, name, v in rows:  # batch order: last writer wins
                model[i] = (name, v)
        elif kind == "delete":
            for (i,) in rows:
                model.pop(i, None)
        else:  # replace
            model.clear()
            for i, name, v in rows:
                model[i] = (name, v)


@pytest.mark.parametrize("read_opt", ["max", "none"], ids=["cow", "mor"])
@pytest.mark.parametrize("seed", [11, 23, 37, 53])
def test_random_program_matches_model(spark, tmp_path, seed, read_opt):
    ops = _random_program(seed)
    c = Catalog(spark, str(tmp_path / f"m{seed}{read_opt}"))
    c.create_table(
        "t", schema=SCHEMA, properties={"read_optimization": read_opt}
    )
    for kind, rows in ops:
        ddl = "id long" if kind == "delete" else "id long, name string, v int"
        c.write_to_table(spark.createDataFrame(rows, ddl), "t", mode=kind)
    model: dict = {}
    _model_apply(model, ops)
    got = {r.id: (r.name, r.v) for r in c.read_table("t").collect()}
    assert got == model, f"seed={seed} opt={read_opt} ops={ops}"


@pytest.mark.parametrize("read_opt", ["max", "none"], ids=["cow", "mor"])
def test_random_program_matches_model_with_blooms(spark, tmp_path, read_opt):
    """The same randomized program with per-file blooms enabled: the
    write-path sidecar pass and prune-time probes must not perturb any
    result — full-table reads AND point lookups both match the model."""
    from deltacat_spark.plans.expr import col

    seed = 71
    ops = _random_program(seed)
    c = Catalog(spark, str(tmp_path / f"mb{read_opt}"))
    c.create_table(
        "t",
        schema=SCHEMA,
        properties={
            "read_optimization": read_opt,
            "bloom_filter_columns": "id,name",
            "max_records_per_file": 25,
        },
    )
    for kind, rows in ops:
        ddl = "id long" if kind == "delete" else "id long, name string, v int"
        c.write_to_table(spark.createDataFrame(rows, ddl), "t", mode=kind)
    model: dict = {}
    _model_apply(model, ops)
    got = {r.id: (r.name, r.v) for r in c.read_table("t").collect()}
    assert got == model
    import random

    rng = random.Random(seed)
    for i in rng.sample(range(120), 15):
        got_pt = [
            (r.name, r.v)
            for r in c.read_table("t", predicate=col("id").eq(i)).collect()
        ]
        want = [model[i]] if i in model else []
        assert got_pt == want, f"point lookup id={i}"

"""Model-based randomized check of the multi-table-MV contract: under a
random interleaving of source writes, refreshes, restores, and queries,

* after every refresh, the MV's contents equal the view SQL evaluated
  at the sources' CURRENT versions (exactness of the pinned rebuild);
* every query answered by the REWRITE returns exactly what direct
  evaluation returns (the freshness gate can never serve stale rows);
* a query after any source moved is NEVER answered by the rewrite.
"""

import random

from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

VIEW = (
    "SELECT s.grp, count(*) AS n, sum(s.v) AS total "
    "FROM src s JOIN dim d ON s.grp = d.grp GROUP BY s.grp"
)


def _direct(cat):
    return {
        (r.grp, r.n, r.total)
        for r in cat.sql(VIEW, mv_rewrite=False).collect()
    }


def _mv(cat):
    return {
        (r.grp, r.n, r.total) for r in cat.read_table("mv_m").collect()
    }


def test_multi_table_mv_random_program(spark, tmp_path):
    rng = random.Random(80801)
    cat = Catalog(spark, str(tmp_path / "mvmodel"))
    cat.create_table(
        "src",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
    )
    cat.create_table(
        "dim",
        schema=Schema(
            [
                Field("grp", T.StringType(), merge_key=True),
                Field("label", T.StringType()),
            ]
        ),
    )
    cat.sql("INSERT INTO dim VALUES ('a', 'x'), ('b', 'y'), ('c', 'z')")
    cat.sql("INSERT INTO src VALUES (0, 'a', 5)")
    cat.create_materialized_view("mv_m", VIEW)

    next_id = 1
    fresh = True  # our model of whether the rewrite may fire
    for step in range(24):
        op = rng.choice(["ins_src", "ins_dim", "refresh", "query", "query"])
        if op == "ins_src":
            g = rng.choice("abc")
            cat.sql(
                f"INSERT INTO src VALUES ({next_id}, '{g}', {rng.randint(1, 9)})"
            )
            next_id += 1
            fresh = False
        elif op == "ins_dim":
            g = rng.choice("de")
            cat.sql(
                f"INSERT INTO dim VALUES ('{g}{next_id}', 'l{next_id}')"
            )
            next_id += 1
            fresh = False
        elif op == "refresh":
            audit = cat.refresh_materialized_view("mv_m")
            assert audit["mode"] == ("noop" if fresh else "rebuild"), (
                step,
                audit,
                fresh,
            )
            assert _mv(cat) == _direct(cat), (step, "refresh not exact")
            fresh = True
        else:  # query
            want = _direct(cat)
            got = {
                (r.grp, r.n, r.total) for r in cat.sql(VIEW).collect()
            }
            assert got == want, (step, "wrong answer")
            if fresh:
                assert cat.last_sql_rewrite == "mv_m", (
                    step,
                    "fresh MV should have answered",
                )
            else:
                assert cat.last_sql_rewrite is None, (
                    step,
                    "stale MV answered",
                )

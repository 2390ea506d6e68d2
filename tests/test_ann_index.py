"""Persisted IVF ANN index (`operators/ann_index.py`): build commits
the quantizer + keyed assignment tables, insert-only and MERGE/DELETE
windows maintain them incrementally against FROZEN centroids, wholesale
windows retrain, and serving reads only the index tables. The index
table's spec state — "every current corpus vector assigned to its
nearest frozen centroid" — is recomputed independently per step."""

import pytest
from pyspark.sql import functions as F, types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.operators.ann_index import (
    ANN_SRC_VERSION,
    build_ivf_index,
    ivf_index_topk,
    refresh_ivf_index,
)
from deltacat_spark.operators.similarity import _nearest_cid
from deltacat_spark.schema import Field, Schema


def _vec(i: int, d: int = 4) -> list:
    # deterministic, well-spread small vectors
    return [float((i * 7 + j * 13) % 19 - 9) / 3.0 for j in range(d)]


def _rows(ids):
    return [(i, _vec(i)) for i in ids]


SCHEMA = Schema(
    [
        Field("vec_id", T.LongType(), merge_key=True, nullable=False),
        Field(
            "embedding", T.ArrayType(T.DoubleType()), nullable=False
        ),
    ]
)


@pytest.fixture()
def acat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "annidx"))
    c.create_table(
        "emb", schema=SCHEMA, properties={"read_optimization": "none"}
    )
    c.write_to_table(
        spark.createDataFrame(
            _rows(range(10, 40)), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="merge",
    )
    return c


def _spec_assignment(cat):
    """The index table's SPEC state: current corpus, frozen centroids,
    nearest-cid — computed fresh, not through the maintenance paths."""
    cents = cat.read_table("emb_ivf__centroids")
    cur = cat.read_table("emb").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return {
        (r.id, r.cid) for r in _nearest_cid(cur, cents).collect()
    }


def _index_state(cat):
    return {
        (r.cand_id, r.cid) for r in cat.read_table("emb_ivf").collect()
    }


def test_build_and_serve(spark, acat):
    audit = build_ivf_index(acat, "emb", "emb_ivf", n_centroids=4)
    assert audit["mode"] == "build"
    assert _index_state(acat) == _spec_assignment(acat)
    q = spark.createDataFrame(
        _rows(range(3)), "vec_id long, embedding array<double>"
    )
    got = ivf_index_topk(acat, "emb_ivf", q, k=3, nprobe=2).collect()
    assert {r.q_id for r in got} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in got)
    # serving is read-only: watermark/noop unchanged
    assert refresh_ivf_index(acat, "emb", "emb_ivf")["mode"] == "noop"


def test_merge_window_maintains_keyed(spark, acat):
    build_ivf_index(acat, "emb", "emb_ivf", n_centroids=4)
    cents_before = {
        (r.cid, tuple(r.c_vec))
        for r in acat.read_table("emb_ivf__centroids").collect()
    }
    # new keys + moved vectors (existing keys re-bucket) in one window
    acat.write_to_table(
        spark.createDataFrame(
            _rows(range(40, 55)) + [(12, _vec(99)), (13, _vec(88))],
            "vec_id long, embedding array<double>",
        ),
        "emb",
        mode="merge",
    )
    audit = refresh_ivf_index(acat, "emb", "emb_ivf")
    assert audit["mode"] == "incremental_keyed", audit
    assert audit["touched"] == 17
    assert _index_state(acat) == _spec_assignment(acat)
    # centroids FROZEN across incremental refreshes
    assert {
        (r.cid, tuple(r.c_vec))
        for r in acat.read_table("emb_ivf__centroids").collect()
    } == cents_before


def test_delete_window_removes_keys(spark, acat):
    build_ivf_index(acat, "emb", "emb_ivf", n_centroids=4)
    acat.sql("DELETE FROM emb WHERE vec_id % 5 = 0")
    audit = refresh_ivf_index(acat, "emb", "emb_ivf")
    assert audit["mode"] == "incremental_keyed", audit
    state = _index_state(acat)
    assert state == _spec_assignment(acat)
    assert not any(cid for (cand, cid) in state if cand % 5 == 0)


def test_insert_only_window_on_unkeyed_source(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "annins"))
    c.create_table("emb")
    c.write_to_table(
        spark.createDataFrame(
            _rows(range(10, 30)), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="append",
    )
    build_ivf_index(c, "emb", "emb_ivf", n_centroids=4)
    c.write_to_table(
        spark.createDataFrame(
            _rows(range(30, 45)), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="append",
    )
    audit = refresh_ivf_index(c, "emb", "emb_ivf")
    assert audit["mode"] == "incremental_insert", audit
    cents = c.read_table("emb_ivf__centroids")
    cur = c.read_table("emb").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    want = {(r.id, r.cid) for r in _nearest_cid(cur, cents).collect()}
    assert {
        (r.cand_id, r.cid) for r in c.read_table("emb_ivf").collect()
    } == want


def test_replace_window_retrains(spark, acat):
    build_ivf_index(acat, "emb", "emb_ivf", n_centroids=4)
    acat.write_to_table(
        spark.createDataFrame(
            _rows(range(100, 120)), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="replace",
    )
    audit = refresh_ivf_index(acat, "emb", "emb_ivf")
    assert audit["mode"] == "build"  # wholesale window → retrain
    assert _index_state(acat) == _spec_assignment(acat)
    # trained k survives the rebuild
    assert acat.read_table("emb_ivf__centroids").count() == 4


def test_corrupt_watermark_rebuilds(spark, acat):
    build_ivf_index(acat, "emb", "emb_ivf", n_centroids=4)
    acat.alter_table("emb_ivf", properties={ANN_SRC_VERSION: "junk"})
    acat.write_to_table(
        spark.createDataFrame(
            _rows([60]), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="merge",
    )
    audit = refresh_ivf_index(acat, "emb", "emb_ivf")
    assert audit["mode"] == "build"
    assert _index_state(acat) == _spec_assignment(acat)
    # and incremental maintenance resumes
    acat.write_to_table(
        spark.createDataFrame(
            _rows([61]), "vec_id long, embedding array<double>"
        ),
        "emb",
        mode="merge",
    )
    assert (
        refresh_ivf_index(acat, "emb", "emb_ivf")["mode"]
        == "incremental_keyed"
    )
    assert _index_state(acat) == _spec_assignment(acat)

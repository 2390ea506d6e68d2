"""Persisted ANN indexes: IVF as catalog tables, maintained like an MV.

Before round 10 the IVF family recomputed centroids + assignments per
query job. At 100 TB that is the wrong serving shape: the index must be
BUILT once, COMMITTED as tables, and MAINTAINED incrementally as the
corpus moves — serving is then "read the (tiny) centroid table + probe
the cid-bucketed assignment table", never a corpus rescan.

Two catalog tables per index (reference has no vector surface; the
index-as-MV design reuses this repo's own CDC/watermark machinery,
`catalog/materialize.py`):

* ``{name}__centroids`` — (cid, c_vec): the trained coarse quantizer,
  k tiny rows. Frozen across incremental refreshes (standard IVF
  serving practice — retraining the quantizer re-buckets everything),
  recomputed only on full rebuild.
* ``{name}`` — (cand_id [merge key], cid, vec): one row per corpus
  vector, bucketed by nearest centroid. MERGE-keyed so refreshes are
  point-writes.

The source high-water version rides the assignment commit
(``ann.src_version`` property), exactly like MV watermarks — refresh is
crash-atomic and idempotent. Maintenance modes:

* insert-only window → assign ONLY the new rows to the frozen
  centroids, merge them in: O(new rows × k).
* MERGE/DELETE window on a merge-keyed source → touched keys
  (`_touched_keys_for_window`) re-assign, vanished keys delete:
  O(touched keys × k).
* wholesale ops / CDC-invisible windows / corrupt watermark → full
  rebuild (exact for anything).

At 100 TB: every refresh path is change-slice-sized; serving joins are
an equi-join on cid with the query side broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from deltacat_spark.functions.vectors import dot, l2_norm
from deltacat_spark.operators.similarity import _nearest_cid, ivf_centroids

ANN_SRC_VERSION = "ann.src_version"


def _centroids_table(index_name: str) -> str:
    return f"{index_name}__centroids"


def _assign(catalog, src_df: DataFrame, centroids: DataFrame,
            id_col: str, vec_col: str) -> DataFrame:
    """(cand_id, cid, vec) nearest-centroid assignment — map-side
    broadcast cross of n×k, never a shuffle of the corpus."""
    c = src_df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    return _nearest_cid(c, centroids).select(
        F.col("id").alias("cand_id"), "cid", "vec"
    )


def build_ivf_index(
    catalog,
    src: str,
    index_name: str,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train the coarse quantizer over the CURRENT source snapshot and
    commit both index tables; the source version rides the assignment
    commit. Idempotent: re-building replaces both tables."""
    from deltacat_spark.schema import Field, Schema

    snap = catalog.snapshot(src)
    src_df = catalog.read_table(src, version_as_of=snap.version)
    centroids = ivf_centroids(
        src_df, n_centroids, iters, id_col, vec_col
    ).localCheckpoint(eager=True)
    cname = _centroids_table(index_name)
    catalog.write_to_table(
        centroids,
        cname,
        mode="replace" if catalog.table_exists(cname) else "create",
    )
    assigned = _assign(catalog, src_df, centroids, id_col, vec_col)
    if catalog.table_exists(index_name):
        catalog.write_to_table(
            assigned,
            index_name,
            mode="replace",
            commit_properties={ANN_SRC_VERSION: str(snap.version)},
        )
    else:
        fields = [
            Field(
                f.name,
                f.dataType,
                nullable=False if f.name == "cand_id" else f.nullable,
                merge_key=(f.name == "cand_id"),
            )
            for f in assigned.schema.fields
        ]
        catalog.create_table(index_name, schema=Schema(fields))
        catalog.write_to_table(
            assigned,
            index_name,
            mode="merge",
            commit_properties={ANN_SRC_VERSION: str(snap.version)},
        )
    return {"mode": "build", "src_version": snap.version}


def refresh_ivf_index(
    catalog,
    src: str,
    index_name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Bring the index to the source's current version. Insert-only
    windows assign the new slice to the FROZEN centroids; MERGE/DELETE
    windows on a merge-keyed source re-assign exactly the touched keys
    and delete vanished ones; anything else rebuilds (retraining the
    quantizer too)."""
    from deltacat_spark.catalog.catalog import DEFAULT_NAMESPACE
    from deltacat_spark.catalog.materialize import (
        _insert_only_window,
        _touched_keys_for_window,
    )

    snap = catalog.snapshot(src)
    cur = snap.version
    last: "int | None" = None
    if catalog.table_exists(index_name):
        raw = catalog.snapshot(index_name).properties.get(ANN_SRC_VERSION)
        try:
            last = int(raw)
        except (TypeError, ValueError):
            last = None
    if last is not None and last == cur:
        return {"mode": "noop", "src_version": cur}
    # dead-incarnation watermark (last > cur) or no prior build → rebuild
    if last is None or last > cur:
        return build_ivf_index(
            catalog, src, index_name,
            id_col=id_col, vec_col=vec_col,
            n_centroids=_n_centroids(catalog, index_name),
        )
    centroids = catalog.read_table(_centroids_table(index_name))
    wm = {ANN_SRC_VERSION: str(cur)}
    if _insert_only_window(catalog, src, DEFAULT_NAMESPACE, cur, last):
        batch = catalog.read_changes(
            src, from_version=last, to_version=cur
        ).drop("_commit_version", "_change_type", "_change_cols")
        assigned = _assign(catalog, batch, centroids, id_col, vec_col)
        catalog.write_to_table(
            assigned, index_name, mode="merge", commit_properties=wm
        )
        return {"mode": "incremental_insert", "src_version": cur,
                "since": last}
    src_schema = catalog.snapshot(src).schema
    mkeys = src_schema.merge_keys if src_schema else []
    keys = (
        _touched_keys_for_window(
            catalog, src, DEFAULT_NAMESPACE, cur, last, mkeys
        )
        if mkeys
        else None
    )
    if isinstance(keys, str):  # benign-only window
        catalog.alter_table(index_name, properties=wm)
        return {"mode": "incremental_keyed", "src_version": cur,
                "since": last, "touched": 0}
    if keys is not None and mkeys == [id_col]:
        # point maintenance: the index is keyed by the source key, so
        # touched keys re-assign and vanished keys delete (delete
        # first, watermark on the merge — the MV crash discipline)
        from deltacat_spark.catalog.materialize import (
            _bounds_predicate,
            _null_safe_semi,
        )

        keys = keys.persist()
        kpred = _bounds_predicate(keys, mkeys)
        cur_slice = _null_safe_semi(
            catalog.read_table(src, version_as_of=cur, predicate=kpred),
            keys,
            mkeys,
        )
        assigned = _assign(
            catalog, cur_slice, centroids, id_col, vec_col
        ).persist()
        vanished = _null_safe_semi(
            keys.select(F.col(id_col).alias("cand_id")),
            assigned,
            ["cand_id"],
            anti=True,
        )
        n_new = assigned.count()
        n_gone = vanished.count()
        if n_gone:
            catalog.write_to_table(
                vanished,
                index_name,
                mode="delete",
                commit_properties=wm if not n_new else None,
            )
        if n_new:
            catalog.write_to_table(
                assigned, index_name, mode="merge", commit_properties=wm
            )
        elif not n_gone:
            catalog.alter_table(index_name, properties=wm)
        assigned.unpersist()
        keys.unpersist()
        return {"mode": "incremental_keyed", "src_version": cur,
                "since": last, "touched": n_new + n_gone}
    # wholesale / CDC-invisible / key mismatch → retrain + rebuild
    return build_ivf_index(
        catalog, src, index_name,
        id_col=id_col, vec_col=vec_col,
        n_centroids=_n_centroids(catalog, index_name),
    )


def _n_centroids(catalog, index_name: str) -> int:
    """Rebuilds keep the trained k (the centroid table's row count) —
    a metadata-sized read."""
    cname = _centroids_table(index_name)
    if catalog.table_exists(cname):
        n = catalog.read_table(cname).count()
        if n > 0:
            return n
    return 8


def ivf_index_topk(
    catalog,
    index_name: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from the PERSISTED index: read the (tiny) centroid
    table, probe each query's `nprobe` nearest cells, equi-join on cid
    against the assignment table, exact cosine rerank. The corpus is
    touched only through its cid buckets — no rescan, no retraining."""
    centroids = catalog.read_table(_centroids_table(index_name))
    assigned = catalog.read_table(index_name).select(
        "cand_id", "cid", F.col("vec").alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    probes = _nearest_cid(q, centroids, keep=nprobe).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), "cid"
    )
    c_n = assigned.withColumn("c_norm", l2_norm(F.col("c_vec")))
    q_n = probes.withColumn("q_norm", l2_norm(F.col("q_vec")))
    scored = c_n.join(F.broadcast(q_n), "cid").select(
        "q_id",
        "cand_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_raw"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank"
        )
    )

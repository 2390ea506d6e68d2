"""Embedding-similarity inventory over the `embeddings` table.

Approximate-nearest-neighbor surface for the training-data pipeline:
brute-force cosine top-k (the exactness baseline), kNN label voting, and
per-label norm statistics. Dot products are index-ordered double folds on
both engines so cosine values hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.localdf import local_df

from deltacat_spark.functions.vectors import l2_norm
from deltacat_spark.operators.similarity import brute_force_topk, knn_label_vote
from deltacat_spark.workloads.base import cnt, cnt_sql, load

# DuckDB fragments: norm + cosine as index-ordered folds (bit-identical
# to Spark's zip_with/aggregate).
_NORM_SQL = "sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))"
_DOT_SQL = (
    "list_sum(list_transform(list_zip(q_vec, c_vec),"
    " p -> p[1]::DOUBLE * p[2]::DOUBLE))"
)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return brute_force_topk(candidates, queries, k=5)


ANN_TOPK_SQL = f"""
WITH v AS (SELECT vec_id, embedding, {_NORM_SQL} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, embedding AS c_vec, nrm AS c_nrm FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw FROM c CROSS JOIN q)
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings", spread=True)
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    topk = brute_force_topk(candidates, queries, k=10)
    return knn_label_vote(topk, e)


KNN_SQL = f"""
WITH v AS (SELECT vec_id, label, embedding, {_NORM_SQL} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, label, embedding AS c_vec, nrm AS c_nrm FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, label, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw FROM c CROSS JOIN q),
topk AS (SELECT q_id, cand_id, label
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                            ORDER BY cos_raw DESC, cand_id ASC) AS rn
               FROM s)
         WHERE rn <= 10),
votes AS (SELECT q_id, label, count(*) AS votes FROM topk GROUP BY q_id, label)
SELECT q_id, label AS predicted_label, CAST(votes AS BIGINT) AS votes
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY votes DESC, label ASC) AS rn
      FROM votes)
WHERE rn = 1
"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings", spread=True)
    n = e.select("label", l2_norm(F.col("embedding")).alias("nrm"))
    return n.groupBy("label").agg(
        cnt("n_vectors"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


NORM_STATS_SQL = f"""
SELECT label, {cnt_sql('n_vectors')},
  ROUND(CAST(SUM(CAST(nrm AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS avg_norm,
  ROUND(MIN(nrm), 6) AS min_norm,
  ROUND(MAX(nrm), 6) AS max_norm
FROM (SELECT label, {_NORM_SQL} AS nrm FROM embeddings)
GROUP BY label
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the scale path — see
    `operators.similarity.lsh_topk`): same-bucket candidates only."""
    from deltacat_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings", spread=True)
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return lsh_topk(candidates, queries, k=5, n_planes=4)


def _lsh_sql() -> str:
    from deltacat_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, 4)
    dots = []
    for p in planes:
        arr = "[" + ", ".join(f"{x}::DOUBLE" for x in p) + "]"
        dots.append(
            "list_sum(list_transform(list_zip(embedding, "
            + arr
            + "), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )
    bucket = "0"
    for d in dots:
        bucket = f"({bucket}) * 2 + (CASE WHEN {d} >= 0 THEN 1 ELSE 0 END)"
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {_NORM_SQL} AS nrm, {bucket} AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, bucket
      FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, embedding AS c_vec, nrm AS c_nrm, bucket
      FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw
      FROM c JOIN q USING (bucket))
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


ANN_LSH_SQL = _lsh_sql()


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: probe all buckets at Hamming distance ≤ 1 —
    recall recovery at bounded extra fan-out."""
    from deltacat_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings", spread=True)
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return lsh_topk(candidates, queries, k=5, n_planes=4, multiprobe=True)


def _lsh_multiprobe_sql() -> str:
    base = _lsh_sql()
    # queries probe xor-flipped buckets; candidates keep their own bucket
    return base.replace(
        "q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, bucket\n      FROM v WHERE vec_id < 10),",
        """q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm,
             xor(bucket, flip) AS bucket
      FROM v CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS flip)
      WHERE vec_id < 10),""",
    )


ANN_LSH_MULTIPROBE_SQL = _lsh_multiprobe_sql()


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (second scale path, data-adaptive cells — see
    `operators.similarity.ivf_topk`): md5-seeded k-means-lite centroids,
    two Lloyd rounds, nprobe=3 (measured recall 0.74 vs LSH multiprobe's
    0.58 on this testdata, `tests/test_ann_recall.py`)."""
    from deltacat_spark.operators.similarity import ivf_topk

    e = load(spark, sf_dir, "embeddings", spread=True)
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return ivf_topk(
        candidates, queries, k=5, n_centroids=8, nprobe=3, iters=2
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"(list_sum(list_transform(list_zip({a}, {b}),"
        " p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        f" / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))))"
    )


def _lloyd_round_sql(src_cents: str, n: int) -> str:
    # One Lloyd round: cosine-assign every candidate to its nearest
    # centroid from `src_cents`, then per-position scaled-long means.
    return f"""assign{n} AS (
  SELECT id, vec, cid FROM (
    SELECT c0.id, c0.vec, s.cid,
           row_number() OVER (PARTITION BY c0.id
             ORDER BY {_cos_sql('c0.vec', 's.c_vec')} DESC, s.cid ASC) AS rn
    FROM c0 CROSS JOIN {src_cents} s) t WHERE rn = 1),
comp{n} AS (
  SELECT cid, i,
         ROUND(CAST(SUM(CAST(FLOOR(CAST(vec[i] AS DOUBLE) * CAST(1000000 AS DOUBLE)
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
               / CAST(1000000 AS DOUBLE) / COUNT(*), 6) AS cval
  FROM assign{n} CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY cid, i),
cents{n} AS (SELECT cid, list(cval ORDER BY i) AS c_vec FROM comp{n} GROUP BY cid)"""


def _ivf_sql() -> str:
    # Mirrors operators.similarity.ivf_centroids/ivf_topk exactly:
    # md5-ordered seeds, cosine assignment (ties -> smaller cid), two
    # Lloyd rounds with scaled-long per-position means, nprobe=3, top-5.
    return f"""
WITH c0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 10),
q0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id < 10),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cid,
         vec AS c_vec
  FROM c0 ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
{_lloyd_round_sql('seeds', 0)},
{_lloyd_round_sql('cents0', 1)},
cents AS (SELECT * FROM cents1),
cassign AS (
  SELECT id AS cand_id, vec AS c_vec2, cid FROM (
    SELECT c0.id, c0.vec, s.cid,
           row_number() OVER (PARTITION BY c0.id
             ORDER BY {_cos_sql('c0.vec', 's.c_vec')} DESC, s.cid ASC) AS rn
    FROM c0 CROSS JOIN cents s) t WHERE rn = 1),
probes AS (
  SELECT id AS q_id, vec AS q_vec2, cid FROM (
    SELECT q0.id, q0.vec, s.cid,
           row_number() OVER (PARTITION BY q0.id
             ORDER BY {_cos_sql('q0.vec', 's.c_vec')} DESC, s.cid ASC) AS rn
    FROM q0 CROSS JOIN cents s) t WHERE rn <= 3),
s AS (SELECT q_id, cand_id, {_cos_sql('q_vec2', 'c_vec2')} AS cos_raw
      FROM cassign JOIN probes USING (cid))
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


ANN_IVF_SQL = _ivf_sql()


def ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF served from a PERSISTED index (round-10 index-as-MV,
    `operators/ann_index.py`): the coarse quantizer is trained once
    over the initial corpus and committed as catalog tables; an append
    batch then lands as a MERGE window on the keyed source, the
    refresh must take the keyed incremental path — re-assigning ONLY
    the new keys to the FROZEN centroids, never retraining or
    rescanning (raises on any other mode) — and serving reads the
    index tables alone. Oracle: the same frozen-quantizer IVF in pure
    SQL (train on the initial subset, assign/probe the full corpus)."""
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
        refresh_ivf_index,
    )
    from deltacat_spark.schema import Schema

    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="dcs_annidx_")
    try:
        cat = Catalog(spark, root)
        e = load(spark, sf_dir, "embeddings", spread=True).select("vec_id", "embedding")
        queries = e.filter(F.col("vec_id") < 10)
        cands = e.filter(F.col("vec_id") >= 10)
        sch = Schema.from_dataframe(cands)
        for fld in sch.fields:
            if fld.name == "vec_id":
                fld.merge_key = True
                fld.nullable = False
        cat.create_table(
            "emb", schema=sch, properties={"read_optimization": "none"}
        )
        cat.write_to_table(
            cands.filter(F.col("vec_id") % 3 != 0), "emb", mode="merge"
        )
        build_ivf_index(cat, "emb", "emb_ivf", n_centroids=8, iters=2)
        # the corpus grows: a keyed MERGE window
        cat.write_to_table(
            cands.filter(F.col("vec_id") % 3 == 0), "emb", mode="merge"
        )
        audit = refresh_ivf_index(cat, "emb", "emb_ivf")
        if audit["mode"] != "incremental_keyed":
            raise RuntimeError(
                f"append window must maintain the index keyed, got {audit}"
            )
        out = ivf_index_topk(cat, "emb_ivf", queries, k=5, nprobe=3)
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _ivf_persisted_sql() -> str:
    # Frozen-quantizer IVF: seeds + two Lloyd rounds train on the
    # INITIAL corpus subset only (c0 — what build_ivf_index saw);
    # assignment and probing run over the FULL final corpus (cf).
    return f"""
WITH c0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
            WHERE vec_id >= 10 AND vec_id % 3 <> 0),
cf AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 10),
q0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id < 10),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cid,
         vec AS c_vec
  FROM c0 ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
{_lloyd_round_sql('seeds', 0)},
{_lloyd_round_sql('cents0', 1)},
cents AS (SELECT * FROM cents1),
cassign AS (
  SELECT id AS cand_id, vec AS c_vec2, cid FROM (
    SELECT cf.id, cf.vec, s.cid,
           row_number() OVER (PARTITION BY cf.id
             ORDER BY {_cos_sql('cf.vec', 's.c_vec')} DESC, s.cid ASC) AS rn
    FROM cf CROSS JOIN cents s) t WHERE rn = 1),
probes AS (
  SELECT id AS q_id, vec AS q_vec2, cid FROM (
    SELECT q0.id, q0.vec, s.cid,
           row_number() OVER (PARTITION BY q0.id
             ORDER BY {_cos_sql('q0.vec', 's.c_vec')} DESC, s.cid ASC) AS rn
    FROM q0 CROSS JOIN cents s) t WHERE rn <= 3),
s AS (SELECT q_id, cand_id, {_cos_sql('q_vec2', 'c_vec2')} AS cos_raw
      FROM cassign JOIN probes USING (cid))
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


ANN_IVF_PERSISTED_SQL = _ivf_persisted_sql()


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (the storage/serving shrink
    step before ANN at scale): codes = floor(x * 127/max|x| + 0.5),
    emitted with the scale factor for dequantization. Pure projection —
    map-side only, zero shuffle at any corpus size. Codes are exact
    integers on both engines; the scale double is one IEEE division of
    identical operands. Zero vectors (scale undefined) are excluded by
    the max|x| > 0 guard on BOTH engines. `codes` is emitted as a
    canonical comma-joined string (driver output contract: no
    array/struct/map columns in query results — see workloads/base.py)."""
    e = load(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x))
    ).cast("double")
    d = e.select("vec_id", "embedding", maxabs.alias("m")).filter(F.col("m") > 0)
    scale = F.lit(127.0) / F.col("m")
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int"),
    )
    codes_str = F.array_join(
        F.transform(codes, lambda c: c.cast("string")), ","
    )
    return d.select(
        "vec_id", scale.alias("scale"), codes_str.alias("codes")
    ).orderBy("vec_id")


QUANTIZE_SQL = """
WITH m AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS m
  FROM embeddings)
SELECT vec_id, 127.0 / m AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) * (127.0 / m) + 0.5) AS INT)), ',') AS codes
FROM m WHERE m > 0 ORDER BY vec_id
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
    "ann_lsh_multiprobe": (ann_lsh_multiprobe, ANN_LSH_MULTIPROBE_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_SQL),
    "ann_ivf_persisted": (ann_ivf_persisted, ANN_IVF_PERSISTED_SQL),
    "knn_classify": (knn_classify, KNN_SQL),
    "embedding_norm_stats": (embedding_norm_stats, NORM_STATS_SQL),
    "embedding_quantize": (embedding_quantize, QUANTIZE_SQL),
}


# --- k-means assignment step ------------------------------------------------
# One full Lloyd iteration building block: centroids seeded from the
# existing labels (integer-quantized, deterministic), then every vector
# re-assigned to its nearest centroid by exact integer squared-L2.
# Array-native on the Spark side: the 10 centroid arrays broadcast into
# a zip_with/aggregate fold — no N x D x K explode, one map-side pass
# plus a tiny argmin aggregation. The iterative loop is this same plan
# re-run with the assignment as the new label column.
_KM_SCALE = 10_000  # float -> scaled-long quantization (matches SUM_SCALE)
_XQ_EXPR = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_KM_SCALE}"
    " + 0.5) AS BIGINT))"
)


def kmeans_assign_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode(F.expr(_XQ_EXPR)).alias("dim", "xq")
    )
    # Quantized centroid coordinate: floor(sum/n) — sums stay < 2^53 so
    # the double division is exact before the floor on BOTH engines.
    cent = (
        ex.groupBy("label", "dim")
        .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("label").alias("cl"),
            "dim",
            F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
        )
    )
    cent_arr = cent.groupBy("cl").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .alias("c_arr")
    )
    q = e.select("vec_id", F.expr(_XQ_EXPR).alias("xq_arr"))
    scored = q.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "cl",
        F.expr(
            "aggregate(zip_with(xq_arr, c_arr, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dist"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cl")).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.cl").cast("int").alias("assigned_label"),
        F.col("b.dist").alias("dist"),
    ).orderBy("vec_id")


KMEANS_ASSIGN_SQL = f"""
WITH ex AS (
  SELECT vec_id, label, u.dim AS dim,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_KM_SCALE} + 0.5) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS dim) u),
cent AS (
  SELECT label AS cl, dim,
         CAST(FLOOR(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM ex GROUP BY label, dim),
dist AS (
  SELECT e.vec_id, c.cl, CAST(SUM((e.xq - c.c) * (e.xq - c.c)) AS BIGINT) AS dist
  FROM ex e JOIN cent c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cl)
SELECT vec_id, CAST(cl AS INT) AS assigned_label, dist
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cl) AS rn
      FROM dist)
WHERE rn = 1
ORDER BY vec_id
"""

QUERIES["kmeans_assign_step"] = (kmeans_assign_step, KMEANS_ASSIGN_SQL)

"""Embedding similarity search: brute-force cosine top-k + kNN vote.

Baseline ANN surface for the training-data pipeline (the reference has
no vector ops). Structure for scale:

* Norms are computed per row *before* the join (O(n) work), so the
  query×candidate join does only the dot product.
* The query side is broadcast — candidates never shuffle.
* Top-k is a per-query window over the (small) q×n result.

The scale path beyond brute force (LSH / IVF bucketing so each query
only meets one bucket) reuses `operators.dedupe.lsh_candidates`-style
band joins; brute force stays the exactness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from deltacat_spark.functions.vectors import dot, l2_norm


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", l2_norm(F.col(vec_col)))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (q_id, cand_id, cosine, rank). Deterministic tie-break on
    candidate id.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "cand_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH.

    Components derive from md5(plane:i) so Spark, DuckDB oracles, and
    any other engine can reproduce the exact same planes without a
    shared RNG.
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        v = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            # uniform in [-1, 1) from the first 8 hex chars
            v.append(round(int(h[:8], 16) / float(2**31) - 1.0, 6))
        planes.append(v)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = (dot(vec, plane_b) >= 0)."""
    bucket = F.lit(0)
    for plane in planes:
        d = dot(vec, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket * 2 + F.when(d >= 0, 1).otherwise(0)
    return bucket


def vec_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality from the data (one-row control-plane
    lookup, not a data collect)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None:
        raise ValueError(f"cannot derive vector dim from empty {vec_col!r}")
    return int(row.d)


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Bucketed ANN — the scale path past brute force.

    Both sides bucket by sign-LSH; the similarity join only compares
    pairs in the same bucket, an equi-join on the bucket id. With B
    buckets the candidate set shrinks ~B×: at 100 TB this turns the
    O(n·q) cross join into a shuffle-partitioned join keyed by bucket
    (multi-probe = union of per-plane bit flips, not implemented here).
    Returns (q_id, cand_id, cosine, rank) — approximate: neighbors in
    other buckets are missed, by design.
    """
    if dim is None:
        dim = vec_dim(candidates, vec_col)
    planes = hyperplanes(dim, n_planes)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    if multiprobe:
        # Probe every bucket at Hamming distance ≤ 1 (flip each sign
        # bit): recall recovers near-boundary neighbors at (n_planes+1)×
        # query fan-out — still a bucket equi-join, never a cross join.
        flips = F.array(
            F.lit(0), *[F.lit(1 << b) for b in range(n_planes)]
        )
        q = q.withColumn("__flip", F.explode(flips)).withColumn(
            "bucket", F.col("bucket").bitwiseXOR(F.col("__flip"))
        ).drop("__flip")
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "q_id",
        "cand_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def cosine_dedup_pairs(
    vectors: DataFrame,
    threshold: float,
    n_bands: int = 16,
    band_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold) via
    banded sign-LSH candidates + exact cosine verification.

    The scale path for all-pairs similarity over dense embeddings: an
    all-pairs comparison is a broadcast nested-loop join (O(n²) work and
    a driver-bounded broadcast — the r2 workload's shape); here each of
    the `n_bands` bands buckets every vector by `band_planes` sign bits,
    candidates come from a (band, bucket) self-equi-join (shuffle-
    partitioned, linear in bucket occupancy), and every candidate is
    verified with the exact cosine so precision is 1.0. Recall follows
    the OR-amplified sign-LSH bound 1-(1-(1-θ/π)^p)^L — tune
    (n_bands, band_planes) to the threshold; dense exact sub-quadratic
    APSS does not exist, so a recall knob is the honest contract.
    Hyperplanes are md5-derived (`hyperplanes`) — engine-reproducible.
    """
    if dim is None:
        dim = vec_dim(vectors, vec_col)
    planes = hyperplanes(dim, n_bands * band_planes)
    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col("_norm").alias("nrm"),
    )
    band_cols = [
        lsh_bucket(
            F.col("vec"), planes[b * band_planes : (b + 1) * band_planes]
        ).alias(f"__b{b}")
        for b in range(n_bands)
    ]
    stack = ", ".join(f"{b}, __b{b}" for b in range(n_bands))
    buckets = (
        v.select("id", *band_cols)
        .selectExpr("id", f"stack({n_bands}, {stack}) as (band, bucket)")
    )
    # Materialize the narrow (id, band, bucket) table before the
    # self-join: Spark evaluates an aliased sub-plan once PER JOIN SIDE
    # (the r7 lsh_candidates lesson), so without this the n_bands ×
    # band_planes hyperplane projections — the most expensive per-row
    # work in the pipeline — run twice over the corpus, and the
    # 2048-literal plane expression tree is planned twice (measured
    # ~0.8s driver planning + double execution on the 500-vector bench
    # row; guide §2.4/§7.3). 16n narrow rows, MEMORY_AND_DISK.
    buckets = buckets.localCheckpoint(eager=False)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = v.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = v.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _nearest_cid(
    vecs: DataFrame, centroids: DataFrame, keep: int = 1
) -> DataFrame:
    """Assign each (id, vec) row its `keep` nearest centroids by cosine
    (ties → smaller cid). Centroids are tiny (k rows) and broadcast, so
    assignment is a map-side cross of n×k — never a shuffle of the
    candidate set."""
    cents = centroids.select(
        "cid",
        F.col("c_vec").alias("__cv"),
        l2_norm(F.col("c_vec")).alias("__cn"),
    )
    scored = (
        vecs.withColumn("__vn", l2_norm(F.col("vec")))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "__cos",
            dot(F.col("vec"), F.col("__cv"))
            / (F.col("__vn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("__cos"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__cv", "__cn", "__vn", "__cos", "__rn")
    )


def ivf_centroids(
    candidates: DataFrame,
    n_centroids: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """K-means-lite centroids, engine-reproducible: seeds are the
    `n_centroids` vectors with the smallest md5(vec_id) (any engine can
    re-derive them — no shared RNG), refined by `iters` Lloyd rounds.

    Per-position centroid means go through scaled-long sums
    (floor(x·10⁶ + 0.5) summed as BIGINT) so the result is independent
    of Spark's partial-aggregation order — double summation order would
    otherwise make centroids (and every downstream cosine) run-to-run
    nondeterministic. Each round is one n×k map-side assignment plus one
    (cid, position) shuffle-aggregate: linear in n, no iteration-count
    blowup at 100 TB (iters is a small constant).
    """
    c = candidates.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    seeds = (
        c.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h", "id")
        .limit(n_centroids)
    )
    # Global (unpartitioned) window — intentionally: it runs over the
    # limit(n_centroids) rows only (k tiny seed rows, a model parameter),
    # never the candidate set. This is the source of Spark's "No
    # Partition Defined" WindowExec warning in bench logs; it is benign.
    w = Window.orderBy("__h", "id")
    centroids = seeds.withColumn(
        "cid", F.row_number().over(w) - F.lit(1)
    ).select("cid", F.col("vec").alias("c_vec"))
    # NOTE (r15 measurement): a per-dimension column-aggregate variant
    # (64 sum columns, no explode, one exchange per round) was built
    # and A/B-measured SLOWER warm (3.3s vs 2.6s per 2-round build) —
    # whole-stage codegen of the 64-column aggregate costs more than
    # the explode it removes, and the exploded (cid, pos) shuffle is
    # already bounded map-side by partial aggregation (k × d rows per
    # map task). Guide §1.1: the "ideal" plan lost to the gotcha;
    # keeping the measured-faster explode form. `dim` stays accepted
    # for callers that know it (unused by this implementation).
    for _ in range(iters):
        assigned = _nearest_cid(c, centroids)
        comp = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.round(
                    F.sum(
                        F.floor(F.col("val") * 1e6 + F.lit(0.5)).cast("long")
                    ).cast("double")
                    / F.lit(1e6)
                    / F.count(F.lit(1)),
                    6,
                ).alias("cval")
            )
        )
        centroids = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"],
            ).alias("c_vec")
        )
    return centroids


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: the second scale path next to sign-LSH (`lsh_topk`).

    Candidates partition into `n_centroids` Voronoi cells (data-adaptive,
    unlike LSH's data-oblivious hyperplanes — better recall at higher
    dimensionality); each query probes its `nprobe` nearest cells. The
    similarity join is an equi-join on cid — with k cells the candidate
    set shrinks ~k/nprobe ×, and the join is shuffle-partitioned by cid,
    never a cross join. Returns (q_id, cand_id, cosine, rank).
    """
    # Materialize the k centroids (k tiny rows — a model parameter, not
    # data): their lineage contains a full candidate scan per Lloyd
    # round, and three consumers below would otherwise recompute it.
    centroids = ivf_centroids(
        candidates, n_centroids, iters, id_col, vec_col
    ).localCheckpoint(eager=True)
    c = candidates.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    q = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    c_assigned = _nearest_cid(c, centroids).select(
        F.col("id").alias("cand_id"),
        F.col("vec").alias("c_vec"),
        "cid",
    )
    probes = _nearest_cid(q, centroids, keep=nprobe).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), "cid"
    )
    c_n = c_assigned.withColumn("c_norm", l2_norm(F.col("c_vec")))
    q_n = probes.withColumn("q_norm", l2_norm(F.col("q_vec")))
    scored = c_n.join(F.broadcast(q_n), "cid").select(
        "q_id",
        "cand_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank"
        )
    )


def knn_label_vote(
    topk: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Majority label among each query's neighbors (ties → smaller label)."""
    joined = topk.join(
        labels.select(F.col(id_col).alias("cand_id"), label_col), "cand_id"
    )
    counts = joined.groupBy("q_id", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc(label_col))
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("q_id", F.col(label_col).alias("predicted_label"), "votes")
    )

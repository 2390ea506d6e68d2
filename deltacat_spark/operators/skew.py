"""Hot-key skew mitigation: salted two-phase aggregation and salted
broadcast-free joins.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.py`) handles most runtime skew by splitting oversized shuffle
partitions, but two shapes still need explicit salting at 100 TB:

* an aggregation whose single hottest KEY exceeds one task's memory —
  partial aggregation bounds the map side, yet the final reduce for that
  key still lands on one task. `salted_aggregate` splits the key into
  `salt` sub-keys (deterministic md5 of a second column — NO rand(), so
  retried/speculative tasks re-produce identical rows), reduces the
  sub-keys in parallel, then re-reduces the `salt`-sized remainder.
  Works for any commutative-associative aggregate (sum/count/min/max).
* a join where the hot side is too big to broadcast and one key
  dominates: `salted_join` appends a salt to the big side's key and
  EXPLODES the small side `salt`-fold — turning one straggler partition
  into `salt` even ones at the cost of a `salt`× small-side shuffle.

Both are deterministic and produce exactly the unsalted results (tested
by equivalence with the direct forms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_col(col: Column, salt: int) -> Column:
    # md5-derived salt: stable across retries/speculation (rand() is
    # not), uniform across the salt space.
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("long"),
        F.lit(salt),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 32,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase reduce: groupBy(keys + salt) then groupBy(keys).

    `aggs` maps output column → one of sum/count/min/max (re-reducible
    aggregates: phase 2 applies SUM over phase-1 sums/counts, MIN over
    mins, MAX over maxes). `salt_on` names the column fed to the salt
    hash (defaults to the first non-key column) — any column with
    per-row variety works.
    """
    salt_src = salt_on or next(c for c in df.columns if c not in keys)
    phase1_aggs = []
    phase2_aggs = []
    for out, spec in aggs.items():
        spec_l = spec.lower()
        parts = spec_l.replace(")", "").split("(")
        fn, col = parts[0], parts[1] if len(parts) > 1 else ""
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(out))
            phase2_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(out))
            phase2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported re-reducible aggregate: {spec}")
    salted = df.withColumn("__salt", _salt_col(F.col(salt_src), salt))
    p1 = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    return p1.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `salt`
    sub-partitions; the small side replicates `salt`-fold via an
    explode (rows × salt — only viable when `small` is genuinely the
    small side, just too big or too skew-correlated to broadcast).

    Only big-side-preserving join types are supported: the small side
    exists `salt` times, so any type that emits UNMATCHED small-side
    rows (right/full outer) would emit each one once per salt value.
    For those, swap the sides (right outer → left outer with the big
    side preserved) or use AQE's skew-join split instead.
    """
    how_l = how.lower().replace("_", "").replace("outer", "")
    if how_l not in ("inner", "left", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the salt-fold "
            "replication of the small side would duplicate its unmatched "
            "rows salt times under right/full outer joins. Swap the sides "
            "so the preserved side is the big one, or rely on AQE skew-join."
        )
    # Salt from the FULL row, not the join key — rows sharing the hot key
    # must scatter across salt values (a key-derived salt would keep them
    # on one task). Exact-duplicate rows share a salt value; that only
    # nudges the distribution, never correctness.
    big_s = big.withColumn(
        "__salt",
        _salt_col(
            F.concat_ws("|", *[F.col(c).cast("string") for c in big.columns]),
            salt,
        ),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")

"""Partition and sort transforms as generated Spark columns.

Reference transforms (`storage/model/transform.py:11-343`): IDENTITY,
BUCKET (N buckets; digest or murmur3 strategy), TRUNCATE (width),
YEAR/MONTH/DAY/HOUR, VOID. Spark mapping per SURVEY §1.4:

* IDENTITY      → the column itself
* YEAR/.../HOUR → ``year(col)`` ... ``hour(col)``
* BUCKET        → murmur3 strategy = Spark's native ``hash`` (same
  murmur3 family Iceberg uses); digest strategy = md5-prefix mod N
  (engine-stable, mirrors the reference's SHA-1 default)
* TRUNCATE      → ``floor(col/w)*w`` for numbers, ``substring`` for
  strings
* VOID          → null (partition-evolution tombstone)

Partition columns materialize as ``_dcs_part_{name}`` generated columns
used for the physical ``partitionBy`` layout + per-file partition values
in the commit log; they are dropped again on read.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, functions as F

# No leading underscore — Spark/Hadoop path listing hides `_`/`.`-prefixed
# directory names, which would make partitioned data files invisible.
PART_PREFIX = "dcs_part_"


@dataclass
class PartitionKey:
    source: str
    transform: str = "identity"  # identity|year|month|day|hour|bucket|truncate|void
    num_buckets: int | None = None
    width: int | None = None
    strategy: str = "digest"  # bucket only: digest | murmur3
    name: str | None = None

    def part_name(self) -> str:
        return self.name or (
            self.source
            if self.transform == "identity"
            else f"{self.source}_{self.transform}"
        )

    def column(self, dtype=None) -> Column:
        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t in ("year", "month", "day", "hour"):
            fn = {
                "year": F.year,
                "month": F.month,
                "day": F.dayofmonth,
                "hour": F.hour,
            }[t]
            return fn(c)
        if t == "bucket":
            n = self.num_buckets or 8
            if self.strategy == "murmur3":
                return F.pmod(F.hash(c), F.lit(n))
            from deltacat_spark.workloads.base import md5_prefix_int

            return md5_prefix_int(c.cast("string")) % F.lit(n)
        if t == "truncate":
            w = self.width or 1
            if dtype is not None and dtype.typeName() == "string":
                return F.substring(c, 1, w)
            return (F.floor(c / F.lit(w)) * F.lit(w)).cast("long")
        if t == "void":
            return F.lit(None)
        raise ValueError(f"unknown transform {t!r}")

    def to_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if v is not None}

    @classmethod
    def from_dict(cls, d: dict) -> "PartitionKey":
        return cls(**d)


@dataclass
class SortKey:
    """Reference `storage/model/sort_key.py:19-130`."""

    column: str
    order: str = "asc"  # asc | desc
    nulls: str = "last"  # first | last

    def spark_col(self) -> Column:
        c = F.col(self.column)
        if self.order == "desc":
            return c.desc_nulls_last() if self.nulls == "last" else c.desc_nulls_first()
        return c.asc_nulls_last() if self.nulls == "last" else c.asc_nulls_first()

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    @classmethod
    def from_dict(cls, d: dict) -> "SortKey":
        return cls(**d)


def partition_columns(
    scheme: "list[PartitionKey] | None", schema=None
) -> dict[str, Column]:
    """name -> generated column for every partition key."""
    if not scheme:
        return {}
    types = {f.name: f.dataType for f in schema.fields} if schema else {}
    return {
        PART_PREFIX + pk.part_name(): pk.column(types.get(pk.source))
        for pk in scheme
    }


def sort_columns(scheme: "list[SortKey] | None") -> list[Column]:
    return [sk.spark_col() for sk in (scheme or [])]


def scheme_to_json(scheme: "list[PartitionKey] | list[SortKey] | None") -> "list[dict] | None":
    if scheme is None:
        return None
    return [k.to_dict() for k in scheme]


def zorder_column(
    df,
    columns: "list[str]",
    bits: int = 4,
    relative_error: float = 0.01,
):
    """Morton (Z-order) interleave column over rank-bucketed dimensions.

    Multi-dimensional clustering for data skipping: each input column is
    bucketed into ``2**bits`` quantile ranks (boundaries from one
    ``approxQuantile`` pass — a driver-side list of ≤2**bits scalars,
    never data), and the per-column bucket ids are bit-interleaved into
    one long. Sorting the table by that long gives every output file a
    tight min/max envelope on EVERY z-ordered column at once — the
    property linear sort orders only give their leading column. This is
    the OPTIMIZE ZORDER layout strategy of Delta/Iceberg-style
    lakehouses, feeding the same footer-stats pruning as
    `Snapshot.prune` (reference delta stats / rivulet SST min-max
    planning, SURVEY §4).

    Quantile bucketing (not linear min/max scaling) makes the curve
    skew-immune: each bucket holds ~1/2**bits of the rows regardless of
    the value distribution. Everything after the one quantile action is
    pure integer arithmetic inside whole-stage codegen — ``bits×k``
    shift/mask terms, no UDFs, no extra shuffle (the caller's
    ``repartitionByRange`` on the z-value is the single layout shuffle).

    Returns ``(df_with_z, zcol_name)``; caller sorts/partitions by the
    z column and drops it before writing.
    """
    if not columns:
        raise ValueError("zorder_column needs at least one column")
    n_buckets = 1 << bits
    k = len(columns)
    numeric = df
    src_cols = []
    for j, c in enumerate(columns):
        dt = dict(df.dtypes).get(c)
        if dt is None:
            raise ValueError(f"zorder column {c!r} not in schema")
        if dt in ("string", "binary") or dt.startswith(("array", "map", "struct")):
            raise ValueError(
                f"zorder column {c!r} has non-orderable-numeric type {dt}; "
                "z-order v1 supports numeric/date/timestamp/boolean columns"
            )
        name = f"_z_src_{j}"
        numeric = numeric.withColumn(name, F.col(c).cast("double"))
        src_cols.append(name)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    z = F.lit(0).cast("long")
    for j, name in enumerate(src_cols):
        bounds = numeric.approxQuantile(name, qs, relative_error)
        # Strictly increasing boundary list (skewed data repeats
        # quantiles; duplicates would double-count the same threshold).
        uniq = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        col = F.col(name)
        bucket = F.lit(0)
        for b in uniq:
            bucket = bucket + F.when(col >= F.lit(b), 1).otherwise(0)
        # NULLs sort into bucket 0 (min/max stats ignore them anyway).
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), i * k + j)
    zname = "_z_order_key"
    out = numeric.withColumn(zname, z).drop(*src_cols)
    return out, zname

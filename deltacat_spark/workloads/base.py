"""Shared helpers for the query inventory (`queries()` / `oracle_sql()`).

Design constraints driven by the driver's correctness gate (DuckDB oracle,
order-insensitive value-hash at sf=0.01):

* **Float sums are order-dependent**, and Spark's partial aggregation
  order is not deterministic across runs. Every SUM over a double column
  therefore casts to ``DECIMAL(38,10)`` first (exact, associative), rounds,
  and casts back to double — bit-identical on Spark and DuckDB.
* **events.ts type varies by testdata generation** — older drops wrote
  parquet timestamp[ns] (Spark reads int64 nanos under
  ``spark.sql.legacy.parquet.nanosAsLong``), current drops write
  timestamp[us] (Spark reads TIMESTAMP_NTZ). :func:`load` dispatches on
  the schema Spark actually sees and normalizes both to *epoch
  microseconds* (``ts_us``); DuckDB oracles use ``epoch_us(ts)``. The
  TIMESTAMP_NTZ→epoch conversion relies on the session timezone being
  pinned to UTC (``session.py``) so it matches DuckDB's UTC-naive
  ``epoch_us``.
* DuckDB 1.0 has no ``sha1``/``conv``; portable hashing uses ``md5`` hex
  plus explicit nibble decoding (see ``md5_bucket_sql``).
* **No array/struct/map columns in query output.** The driver's
  canonicalizer sorts a pandas frame by *all* columns before hashing;
  list/dict cells raise ``TypeError: unhashable type`` there (round-4:
  ``embedding_quantize``, ``inverted_index``). Serialize nested values
  to canonical comma-joined strings — Spark
  ``F.array_join(F.transform(a, x -> x.cast("string")), ",")``, DuckDB
  ``array_to_string(a, ',')`` — in BOTH engines. Enforced by
  ``tests/test_output_contract.py`` and ``tools/verify_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

DEC = "decimal(38,10)"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _spread_small_scan(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Unsplittable-input guard (optimization guide §2.5 "input skew:
    one huge unsplittable file... otherwise repartition immediately
    after the read"): the testdata tables are single parquet files with
    ONE row group, so their scans collapse to a single task and any
    per-row compute above them (shingle explodes, hashing, vector math)
    serializes on one core regardless of cluster size. When the WHOLE
    input is smaller than one scan split (`spark.sql.files.
    maxPartitionBytes`), fan rows out round-robin to the session's
    default parallelism; for real multi-split inputs the gate never
    fires and the plan is unchanged — scale-adaptive by construction
    (reads data size + cluster parallelism, no local-only constants).
    Only compute-heavy consumers opt in via ``load(..., spread=True)``;
    plain scan→agg queries keep their exchange-free plans."""
    import os as _os

    try:
        if _os.path.isdir(path):
            files = [
                _os.path.join(path, f)
                for f in _os.listdir(path)
                if not f.startswith((".", "_"))
            ]
            # A hive-partitioned layout (subdirectories) sizes wrong via
            # getsize (dirent bytes, ~4KB) — such datasets are real
            # multi-file tables anyway, so the gate stays off.
            if any(_os.path.isdir(p) for p in files):
                return df
            total = sum(_os.path.getsize(p) for p in files)
        else:
            files = [path]
            total = _os.path.getsize(path)
    except OSError:
        return df
    conf = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "p": 1024**5}
    s = str(conf).strip().lower().rstrip("b")
    try:
        max_split = (
            int(s[:-1]) * units[s[-1]] if s and s[-1] in units
            else int(s or 134217728)
        )
    except ValueError:
        max_split = 134217728
    par = spark.sparkContext.defaultParallelism
    # Two conditions, both data-derived: the input must be small enough
    # that splitting cannot help (single-row-group files only split by
    # file count), AND the file count must leave at least half the
    # cores idle — a multi-file input that already scans with ~par
    # tasks gains nothing from the extra exchange (A/B at 30x: the
    # repartition was cost-neutral-to-negative once the replica dir had
    # ~30 part files).
    if total <= max_split and len(files) < max(2, par // 2):
        return df.repartition(par)
    return df


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp column.

    The returned events DataFrame carries ``ts_us`` (epoch microseconds,
    bigint) instead of the raw ``ts`` so queries match DuckDB's
    ``epoch_us(ts)`` exactly — regardless of whether this testdata
    generation stores ``ts`` as parquet timestamp[ns] (read as int64
    nanos) or timestamp[us] (read as TIMESTAMP_NTZ).

    ``spread=True`` routes the scan through :func:`_spread_small_scan`
    — for compute-heavy consumers whose per-row work would otherwise
    serialize on an unsplittable single-task scan.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # No-op for timestamp[us]/[ms] data; required to scan the older
        # INT64(TIMESTAMP(NANOS)) generation without an error. Runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ→TIMESTAMP cast below must be the identity mapping that
        # DuckDB's UTC-naive epoch_us uses. Our build_session pins this
        # already; setting it here too makes the inventory correct under
        # ANY caller-provided session (the driver builds its own).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos-as-long generation. Integer division — double division
            # loses precision at 1e18 nanos.
            df = df.withColumn("ts_us", F.expr("ts div 1000")).drop("ts")
        else:
            # timestamp[us] generation: TIMESTAMP_NTZ (or TIMESTAMP).
            # unix_micros requires TIMESTAMP, so cast first; with the
            # session timezone pinned to UTC the NTZ→TIMESTAMP cast is
            # the identity mapping DuckDB uses.
            df = df.withColumn(
                "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
            ).drop("ts")
    else:
        df = spark.read.parquet(path)
    return _spread_small_scan(spark, df, path) if spread else df


# SQL fragment: events with ts_us, for oracle queries.
EVENTS_US = "(SELECT * EXCLUDE (ts), epoch_us(ts) AS ts_us FROM events)"


# Scaled-long aggregation: each value rounds to 1e-4 units, sums as
# BIGINT (exact + associative → order-independent, unlike double sums),
# divides back at the end. Measured 5.4× faster than DECIMAL(38,10)
# aggregation (128-bit path) on Spark with identical results on both
# engines. Headroom: 1e4-scaled values up to ~1e10/row keep a 9.2e18
# bigint safe past 1e8 rows per group; for extreme scale bump to
# DECIMAL sums (the previous revision of these helpers).
SUM_SCALE = 10_000


def _scaled(c: Column) -> Column:
    return F.floor(c * SUM_SCALE + F.lit(0.5)).cast("long")


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent sum of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(_scaled(c)) / F.lit(float(SUM_SCALE)), scale).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    # `/ 10000.0` would parse as a DECIMAL literal in Spark SQL (result
    # column decimal(24,2), while DuckDB returns double) — cast explicitly.
    return (
        f"ROUND(CAST(SUM(CAST(FLOOR(({expr}) * {SUM_SCALE} + 0.5) AS BIGINT))"
        f" AS BIGINT) / CAST({SUM_SCALE} AS DOUBLE), {scale}) AS {alias}"
    )


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent average via the scaled-long sum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(_scaled(c)).cast("double") / F.lit(float(SUM_SCALE)) / F.count(c),
        scale,
    ).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(FLOOR(({expr}) * {SUM_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / CAST({SUM_SCALE} AS DOUBLE) / COUNT({expr}), {scale}) AS {alias}"
    )


def cnt(alias: str) -> Column:
    return F.count(F.lit(1)).alias(alias)


def cnt_sql(alias: str) -> str:
    return f"CAST(COUNT(*) AS BIGINT) AS {alias}"


def md5_prefix_int(col: Column, nchars: int = 6) -> Column:
    """First `nchars` hex chars of md5 → bigint, portably (Spark side).

    Replaces the reference's SHA-1 primary-key digest
    (`utils/primary_key_index.py:26-59`) with md5 (the hash both engines
    share). Decoded nibble-by-nibble because DuckDB has no `conv`.
    """
    h = F.md5(col)
    val = F.lit(0)
    for i in range(nchars):
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - F.lit(1)
        val = val * F.lit(16) + nib
    return val.cast("long")


def md5_prefix_int_sql(expr: str, nchars: int = 6) -> str:
    """DuckDB fragment mirroring :func:`md5_prefix_int` bit-for-bit."""
    parts = []
    for i in range(nchars):
        parts.append(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (nchars - 1 - i)}"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"

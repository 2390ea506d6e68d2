"""Materialized-view maintenance + rewrite, driven end-to-end as
oracle-checked registry queries.

`mv_keyed_refresh` exercises the round-9 keyed incremental path
(`catalog/materialize.py:_touched_keys_for_window`): a merge-keyed MoR
table takes a MERGE-heavy commit window (upsert + inserts + predicate
DELETE) after the MV bootstrap, and the refresh must take the
`incremental_agg_keyed` mode — touched merge keys → touched groups →
exact per-group recompute — never the full rebuild (the function RAISES
if the audit says otherwise, so the driver row turns red on any path
regression). The returned MV contents are oracle-checked against a pure
SQL reconstruction of the final table state.

`sql_mv_rewrite_route` exercises the automatic MV query rewrite through
the REAL `Catalog.sql` path: the SELECT textually equal to a fresh MV's
definition must be answered FROM THE MV TABLE — proven by
`last_sql_rewrite` AND by `DataFrame.inputFiles()` pointing at the MV
table's files, the plan-level evidence VERDICT r8 asked for.

Reference parity: deltacat has no view surface (`api.py:480-481` stubs
SQL); this is the repo's Delta-style extension (SURVEY §2 addendum).

At 100 TB: refresh cost is O(touched keys + touched groups' rows) —
the point-read discipline the keyed MV path exists for; the rewrite
path turns a full aggregation into a tiny MV table scan.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.localdf import local_df

from deltacat_spark.workloads.base import load

MV_KEYED_VIEW_SQL = (
    "SELECT c_nationkey, COUNT(*) AS n_cust, "
    "SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_cents, "
    "MIN(c_custkey) AS min_ck, MAX(c_custkey) AS max_ck "
    "FROM cust GROUP BY c_nationkey"
)


def mv_keyed_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.schema import Schema

    root = tempfile.mkdtemp(prefix="dcs_mvkeyed_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        sch = Schema.from_dataframe(c)
        for fld in sch.fields:
            if fld.name == "c_custkey":
                fld.merge_key = True
                fld.nullable = False
        # MoR so the MERGE/DELETE window surfaces row-level in
        # read_changes — the eligibility the keyed path requires
        cat.create_table(
            "cust", schema=sch, properties={"read_optimization": "none"}
        )
        cat.write_to_table(c, "cust", mode="merge")
        cat.create_materialized_view("nat_mv", MV_KEYED_VIEW_SQL)
        # this row PROVES the keyed maintenance machinery; the window
        # below touches all 25 nation groups, which the default cost
        # gate (mv.keyed_gate=0.5 — rebuild when most groups touched)
        # would route to the rebuild path, so pin the gate high
        cat.alter_table("nat_mv", properties={"mv.keyed_gate": "100"})
        # the MERGE-heavy window: field update, new-key inserts, then a
        # predicate DELETE (positional delta — CDC emits pre-images)
        cat.write_to_table(
            c.filter(F.col("c_custkey") % 7 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
            ),
            "cust",
            mode="merge",
        )
        cat.write_to_table(
            c.filter(F.col("c_custkey") % 11 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(1_000_000)
            ),
            "cust",
            mode="merge",
        )
        cat.sql("DELETE FROM cust WHERE c_custkey % 13 = 0")
        audit = cat.refresh_materialized_view("nat_mv")
        if audit["mode"] != "incremental_agg_keyed":
            raise RuntimeError(
                f"MERGE-heavy window must refresh incrementally, got {audit}"
            )
        out = cat.read_table("nat_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_KEYED_REFRESH_SQL = """
WITH final AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS bal
  FROM customer
  WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_nationkey, c_acctbal AS bal
  FROM customer
  WHERE c_custkey % 11 = 0 AND (c_custkey + 1000000) % 13 <> 0
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(FLOOR(bal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents,
       MIN(c_custkey) AS min_ck,
       MAX(c_custkey) AS max_ck
FROM final
GROUP BY c_nationkey
"""


MV_REWRITE_VIEW_SQL = (
    "SELECT o_orderstatus, COUNT(*) AS n_orders, "
    "SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS price_cents "
    "FROM ord GROUP BY o_orderstatus"
)


def sql_mv_rewrite_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deltacat_spark.catalog import Catalog

    root = tempfile.mkdtemp(prefix="dcs_mvroute_")
    try:
        cat = Catalog(spark, root)
        o = load(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderstatus", "o_totalprice"
        )
        cat.write_to_table(o, "ord")
        cat.create_materialized_view("ord_mv", MV_REWRITE_VIEW_SQL)
        df = cat.sql(MV_REWRITE_VIEW_SQL)
        if cat.last_sql_rewrite != "ord_mv":
            raise RuntimeError(
                f"fresh-MV SELECT must route to the MV table, got "
                f"last_sql_rewrite={cat.last_sql_rewrite!r}"
            )
        files = df.inputFiles()
        if not files or not all("ord_mv" in f for f in files):
            raise RuntimeError(
                f"rewritten plan must scan ONLY the MV table's files, "
                f"got {files[:3]}"
            )
        rows = df.collect()
        return local_df(spark, rows, df.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_MV_REWRITE_ROUTE_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
GROUP BY o_orderstatus
"""


MV_RECORD_VIEW_SQL = (
    "SELECT c_custkey, c_nationkey, "
    "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents "
    "FROM cust WHERE c_acctbal >= 0.0"
)


def mv_record_keyed_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-wise MV over a merge-keyed MoR source, maintained
    POINT-WISE under a MERGE/DELETE window (round-9
    `incremental_record_keyed`): upserts can move rows across the
    view's WHERE boundary (negative balances leave the view), deletes
    remove them — the refresh must take the keyed path, never the full
    rebuild (raises otherwise)."""
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.schema import Schema

    root = tempfile.mkdtemp(prefix="dcs_mvrec_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        sch = Schema.from_dataframe(c)
        for fld in sch.fields:
            if fld.name == "c_custkey":
                fld.merge_key = True
                fld.nullable = False
        cat.create_table(
            "cust", schema=sch, properties={"read_optimization": "none"}
        )
        cat.write_to_table(c, "cust", mode="merge")
        cat.create_materialized_view("rec_mv", MV_RECORD_VIEW_SQL)
        # %9 rows get balance - 5000 (many cross below 0 and must LEAVE
        # the view); %13 rows are deleted outright
        cat.write_to_table(
            c.filter(F.col("c_custkey") % 9 == 0).withColumn(
                "c_acctbal", F.col("c_acctbal") - F.lit(5000.0)
            ),
            "cust",
            mode="merge",
        )
        cat.sql("DELETE FROM cust WHERE c_custkey % 13 = 0")
        audit = cat.refresh_materialized_view("rec_mv")
        if audit["mode"] != "incremental_record_keyed":
            raise RuntimeError(
                f"keyed record-wise MV must refresh point-wise, got {audit}"
            )
        out = cat.read_table("rec_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_RECORD_KEYED_REFRESH_SQL = """
WITH final AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_custkey % 9 = 0 THEN c_acctbal - 5000.0
              ELSE c_acctbal END AS bal
  FROM customer
  WHERE c_custkey % 13 <> 0
)
SELECT c_custkey, c_nationkey,
       CAST(FLOOR(bal * 100 + 0.5) AS BIGINT) AS bal_cents
FROM final
WHERE bal >= 0.0
"""


MV_JOIN_VIEW_SQL = (
    "SELECT x.c_custkey AS ck, x.c_nationkey AS nk, y.ok AS ok, "
    "y.price_cents AS price_cents "
    "FROM jcust x JOIN jord y ON x.c_custkey = y.o_custkey"
)


def mv_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table join MV maintained by FIRST-ORDER DELTA (round-9
    `incremental_join`): after appends land on BOTH sources, the
    refresh appends dA ⋈ B_cur ∪ A_old ⋈ dB in one commit — never a
    rebuild (raises if the audit says otherwise)."""
    from deltacat_spark.catalog import Catalog

    root = tempfile.mkdtemp(prefix="dcs_mvjoin_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        o = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"),
            "o_custkey",
            F.expr(
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("price_cents"),
        )
        cat.create_table("jcust")
        cat.create_table("jord")
        cat.write_to_table(c.filter(F.col("c_custkey") % 2 == 0), "jcust")
        cat.write_to_table(o.filter(F.col("ok") % 50 == 0), "jord")
        cat.create_materialized_view("join_mv", MV_JOIN_VIEW_SQL)
        # both sources move in one refresh window
        cat.write_to_table(
            c.filter(F.col("c_custkey") % 2 == 1), "jcust", mode="append"
        )
        cat.write_to_table(
            o.filter(F.col("ok") % 50 == 25), "jord", mode="append"
        )
        audit = cat.refresh_materialized_view("join_mv")
        if audit["mode"] != "incremental_join":
            raise RuntimeError(
                f"insert-only join window must delta-maintain, got {audit}"
            )
        out = cat.read_table("join_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_JOIN_INCREMENTAL_SQL = """
SELECT c.c_custkey AS ck, c.c_nationkey AS nk,
       o.o_orderkey AS ok,
       CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey % 50 IN (0, 25)
"""


MV_JOIN_AGG_VIEW_SQL = (
    "SELECT nk, COUNT(*) AS n_orders, SUM(price_cents) AS total_cents, "
    "MIN(price_cents) AS lo_cents, MAX(price_cents) AS hi_cents "
    "FROM gcust JOIN gord ON gcust.ck = gord.o_custkey "
    "GROUP BY nk"
)


def mv_join_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + GROUP BY MV maintained by delta partial-aggregation
    (round-9 `incremental_join_agg`): appends on BOTH sources, then one
    refresh that partial-aggregates the two delta join terms and merges
    group-wise into the nation-keyed MV — never a rebuild (raises
    otherwise)."""
    from deltacat_spark.catalog import Catalog

    root = tempfile.mkdtemp(prefix="dcs_mvjagg_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
        )
        o = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"),
            "o_custkey",
            F.expr(
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("price_cents"),
        )
        cat.create_table("gcust")
        cat.create_table("gord")
        cat.write_to_table(c.filter(F.col("ck") % 2 == 0), "gcust")
        cat.write_to_table(o.filter(F.col("ok") % 20 == 0), "gord")
        cat.create_materialized_view("jagg_mv", MV_JOIN_AGG_VIEW_SQL)
        cat.write_to_table(
            c.filter(F.col("ck") % 2 == 1), "gcust", mode="append"
        )
        cat.write_to_table(
            o.filter(F.col("ok") % 20 == 10), "gord", mode="append"
        )
        audit = cat.refresh_materialized_view("jagg_mv")
        if audit["mode"] != "incremental_join_agg":
            raise RuntimeError(
                f"insert-only join-agg window must delta-maintain, got {audit}"
            )
        out = cat.read_table("jagg_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_JOIN_AGG_INCREMENTAL_SQL = """
SELECT c.c_nationkey AS nk,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       MIN(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS lo_cents,
       MAX(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS hi_cents
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey % 20 IN (0, 10)
GROUP BY c.c_nationkey
"""


MV_JOIN3_VIEW_SQL = (
    "SELECT nk, COUNT(*) AS n_lines, SUM(qty_x10) AS qty_x10 "
    "FROM tcust JOIN tord ON tcust.ck = tord.o_custkey "
    "JOIN tli ON tord.ok = tli.l_orderkey "
    "GROUP BY nk"
)


def mv_join3_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-source join + GROUP BY MV maintained by the telescoping
    k-way delta (round-9): appends land on all three sources in one
    window; the refresh partial-aggregates the three delta terms and
    merges group-wise — never a rebuild (raises otherwise)."""
    from deltacat_spark.catalog import Catalog

    root = tempfile.mkdtemp(prefix="dcs_mvj3_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
        )
        o = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"), "o_custkey"
        )
        l = load(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.expr("CAST(FLOOR(l_quantity * 10 + 0.5) AS BIGINT)").alias(
                "qty_x10"
            ),
        )
        cat.create_table("tcust")
        cat.create_table("tord")
        cat.create_table("tli")
        cat.write_to_table(c.filter(F.col("ck") % 2 == 0), "tcust")
        cat.write_to_table(o.filter(F.col("ok") % 40 == 0), "tord")
        cat.write_to_table(
            l.filter(F.col("l_orderkey") % 80 == 0), "tli"
        )
        cat.create_materialized_view("j3_mv", MV_JOIN3_VIEW_SQL)
        cat.write_to_table(
            c.filter(F.col("ck") % 2 == 1), "tcust", mode="append"
        )
        cat.write_to_table(
            o.filter(F.col("ok") % 40 == 20), "tord", mode="append"
        )
        cat.write_to_table(
            l.filter(F.col("l_orderkey") % 80 == 40), "tli", mode="append"
        )
        audit = cat.refresh_materialized_view("j3_mv")
        if audit["mode"] != "incremental_join_agg":
            raise RuntimeError(
                f"3-way insert-only window must delta-maintain, got {audit}"
            )
        out = cat.read_table("j3_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_JOIN3_AGG_INCREMENTAL_SQL = """
SELECT c.c_nationkey AS nk,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_quantity * 10 + 0.5) AS BIGINT)) AS BIGINT)
         AS qty_x10
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 20 = 0 AND l.l_orderkey % 40 = 0
GROUP BY c.c_nationkey
"""


MV_JOIN_KEYED_VIEW_SQL = (
    "SELECT nk, COUNT(*) AS n_orders, SUM(price_cents) AS total_cents, "
    "MIN(price_cents) AS lo_cents, MAX(price_cents) AS hi_cents "
    "FROM kcust JOIN kord ON kcust.ck = kord.o_custkey "
    "GROUP BY nk"
)


def mv_join_keyed_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + GROUP BY MV maintained KEYED under MERGE/DELETE windows
    (round-10 `_mv_join_keyed_refresh` — the last cell of the MV
    maintenance matrix): both sources are merge-keyed MoR tables; a
    price-bump MERGE + predicate DELETE lands on the fact side, then a
    group-moving MERGE on the dimension side, and EACH refresh must
    take the `incremental_join_agg_keyed` mode — touched merge keys →
    pre/post join-term touched groups → exact per-group recompute —
    never a rebuild (raises otherwise). Contents oracle-checked
    against a pure SQL reconstruction of the final state."""
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.schema import Schema

    root = tempfile.mkdtemp(prefix="dcs_mvjk_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
        )
        o = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"),
            "o_custkey",
            F.expr(
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("price_cents"),
        )
        sch_c = Schema.from_dataframe(c)
        for fld in sch_c.fields:
            if fld.name == "ck":
                fld.merge_key = True
                fld.nullable = False
        sch_o = Schema.from_dataframe(o)
        for fld in sch_o.fields:
            if fld.name == "ok":
                fld.merge_key = True
                fld.nullable = False
        # MoR so MERGE/DELETE windows surface row-level in read_changes
        cat.create_table(
            "kcust", schema=sch_c, properties={"read_optimization": "none"}
        )
        cat.create_table(
            "kord", schema=sch_o, properties={"read_optimization": "none"}
        )
        cat.write_to_table(c, "kcust", mode="merge")
        cat.write_to_table(o, "kord", mode="merge")
        cat.create_materialized_view("kj_mv", MV_JOIN_KEYED_VIEW_SQL)
        # the windows below touch all 25 nation groups — pin the cost
        # gate high so the row PROVES the keyed machinery (the default
        # 0.5 gate would correctly route this tiny MV to the rebuild)
        cat.alter_table("kj_mv", properties={"mv.keyed_gate": "100"})
        # window 1: MERGE + DELETE on the FACT side
        cat.write_to_table(
            o.filter(F.col("ok") % 7 == 0).withColumn(
                "price_cents", F.col("price_cents") + F.lit(12345)
            ),
            "kord",
            mode="merge",
        )
        cat.sql("DELETE FROM kord WHERE ok % 13 = 0")
        audit = cat.refresh_materialized_view("kj_mv")
        if audit["mode"] != "incremental_join_agg_keyed":
            raise RuntimeError(
                f"fact-side MERGE window must refresh keyed, got {audit}"
            )
        # window 2: group-moving MERGE on the DIMENSION side
        cat.write_to_table(
            c.filter(F.col("ck") % 5 == 0).withColumn(
                "nk", (F.col("nk") + F.lit(1)) % 25
            ),
            "kcust",
            mode="merge",
        )
        audit = cat.refresh_materialized_view("kj_mv")
        if audit["mode"] != "incremental_join_agg_keyed":
            raise RuntimeError(
                f"dim-side MERGE window must refresh keyed, got {audit}"
            )
        out = cat.read_table("kj_mv")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


MV_JOIN_KEYED_REFRESH_SQL = """
WITH cust AS (
  SELECT c_custkey AS ck,
         CASE WHEN c_custkey % 5 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS nk
  FROM customer
),
ord AS (
  SELECT o_orderkey AS ok, o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 12345 ELSE 0 END
           AS price_cents
  FROM orders
  WHERE o_orderkey % 13 <> 0
)
SELECT nk,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents,
       MIN(price_cents) AS lo_cents,
       MAX(price_cents) AS hi_cents
FROM cust JOIN ord ON cust.ck = ord.o_custkey
GROUP BY nk
"""


QUERIES = {
    "mv_keyed_refresh": (mv_keyed_refresh, MV_KEYED_REFRESH_SQL),
    "mv_join_keyed_refresh": (
        mv_join_keyed_refresh,
        MV_JOIN_KEYED_REFRESH_SQL,
    ),
    "mv_join_incremental": (mv_join_incremental, MV_JOIN_INCREMENTAL_SQL),
    "mv_join_agg_incremental": (
        mv_join_agg_incremental,
        MV_JOIN_AGG_INCREMENTAL_SQL,
    ),
    "mv_join3_agg_incremental": (
        mv_join3_agg_incremental,
        MV_JOIN3_AGG_INCREMENTAL_SQL,
    ),
    "sql_mv_rewrite_route": (sql_mv_rewrite_route, SQL_MV_REWRITE_ROUTE_SQL),
    "mv_record_keyed_refresh": (
        mv_record_keyed_refresh,
        MV_RECORD_KEYED_REFRESH_SQL,
    ),
}

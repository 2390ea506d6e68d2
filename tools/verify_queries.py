"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB
over the same sf dir, then compares row count, sorted column names, and
an order-insensitive value hash (columns sorted by name, rows sorted by
their serialized form). Usage:

    python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Type-strict: a Decimal must NOT hash like the equivalent float.
        # The driver's gate distinguishes them (round-1 `grouping_sets_orders`
        # failed there while this gate passed) — keep the distinction here.
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as ent
    from deltacat_spark.session import build_session

    spark = build_session("verify", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        # Driver output contract: the driver's canonicalizer sorts a pandas
        # frame by ALL columns, which throws `unhashable type` on list/dict
        # cells (round-4: embedding_quantize, inverted_index). norm_cell
        # below stringifies them, so without this check the local gate
        # passes what the driver rejects. Fail fast instead.
        bad = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad:
            print(
                f"FAIL  {name}: non-scalar output columns {bad} "
                "(driver canonicalizer cannot sort/hash them — serialize "
                "to canonical strings)"
            )
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            # Fetch via Arrow, NOT fetchall(): fetchall() coerces DuckDB
            # HUGEINT (the type of a bare SUM over integers) to Python int,
            # silently masking the decimal128-vs-bigint drift that the
            # driver's Arrow-based hash catches (round-3 shipped 3 red hash
            # rows this gate had passed). to_pylist() keeps decimal128 as
            # decimal.Decimal, which norm_cell hashes type-strictly.
            atbl = con.sql(oracles[name]).arrow()
            dcols = atbl.column_names
            drows = [
                tuple(d[c] for c in dcols) for d in atbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        errs = []
        if len(srows) != len(drows):
            errs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            errs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not errs:
            fs = table_fingerprint(scols, [tuple(r) for r in srows])
            fd = table_fingerprint(dcols, drows)
            if fs != fd:
                errs.append("value-hash mismatch")
                # show first diffs
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_s) for r in srows
                )
                set_d = sorted(
                    "\x1f".join(norm_cell(r[i]) for i in order_d) for r in drows
                )
                diff_s = [x for x in set_s if x not in set(set_d)][:3]
                diff_d = [x for x in set_d if x not in set(set_s)][:3]
                for x in diff_s:
                    print(f"      spark-only: {x!r}")
                for x in diff_d:
                    print(f"      duck-only : {x!r}")
        if errs:
            print(f"FAIL  {name}: {'; '.join(errs)}")
            failures.append(name)
        else:
            print(f"PASS  {name}: rows={len(srows)} ({dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()

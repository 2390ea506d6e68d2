"""Incremental materialized-view maintenance over the change feed.

`refresh_incremental(catalog, src, dst, transform)` keeps ``dst`` equal
to ``transform(read_table(src))`` by applying ``transform`` to ONLY the
commits that landed since the last refresh (`Catalog.read_changes`) and
appending the derived rows — O(new data) per refresh, never O(table).
The source high-water version rides the SAME commit as the derived rows
(`write_to_table(commit_properties=...)`), so a crash between "data
written" and "watermark recorded" is impossible by construction: either
both are visible or neither is (the reference has no view maintenance;
this is the lakehouse-native derived-table pattern the CDC surface in
SURVEY §2.1/§2.6 exists to enable).

Scope: ``transform`` must be record-wise (projections/filters/derived
columns — distributive over unions) for the record-wise append path.
GROUP BY views (``agg_spec``) refresh incrementally under insert-only
windows (partials merged group-by-group) AND under MERGE/DELETE windows
on merge-keyed sources (touched-key → touched-group exact recompute,
`_touched_keys_for_window`). Wholesale ops (REPLACE/TRUNCATE/RESTORE),
CDC-invisible CoW rewrites, or a missing/corrupt watermark fall back to
a full REPLACE rebuild — exact for any transform, idempotent on
crash-retry.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

MV_SRC_VERSION = "mv.src_version"

# Aggregates whose partials merge associatively under INSERT-only
# change windows: COUNT/SUM combine by addition, MIN/MAX by least/
# greatest. AVG is deliberately absent (it does not merge without
# storing the SUM/COUNT decomposition — declare those two columns
# instead); DISTINCT aggregates don't merge at all.
_MERGEABLE = {"count", "sum", "min", "max"}


def parse_agg_view(view_sql: str, stripped: "str | None" = None):
    """Classify a single-table GROUP BY view as incrementally
    maintainable; returns ``{"group_cols": [...], "aggs":
    [{"func": ..., "alias": ...}]}`` or None.

    Accepted shape — conservative on purpose (anything else returns
    None and keeps the exact full-rebuild path):

        SELECT g1, ..., AGG(expr) AS alias, ... FROM t [WHERE pred]
        GROUP BY g1, ...

    with AGG ∈ {COUNT, SUM, MIN, MAX}, every aggregate explicitly
    aliased, group columns plain identifiers listed in both the SELECT
    list and the GROUP BY, and no DISTINCT/HAVING/ORDER/LIMIT/JOIN/
    window/subquery anywhere. The WHERE predicate is fine: it is
    record-wise and distributes over union with the aggregation.
    """
    import re

    s = stripped if stripped is not None else view_sql
    low = s.lower()
    if len(re.findall(r"\bselect\b", low)) != 1:
        return None
    if re.search(
        r"\b(distinct|having|order\s+by|limit|join|union|exists)\b"
        r"|\bover\s*\(",
        low,
    ):
        return None
    m = re.match(
        r"\s*select\s+(.*?)\s+from\s+\w+"
        r"(?:\s+where\s+.*?)?\s+group\s+by\s+([\w\s,]+?)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        return None
    select_list, group_by = m.groups()
    group_cols = [g.strip().lower() for g in group_by.split(",") if g.strip()]
    if not all(re.fullmatch(r"\w+", g) for g in group_cols):
        return None
    parsed = _parse_select_list(select_list, group_cols)
    if parsed is None:
        return None
    seen_groups, aggs = parsed
    return {"group_cols": seen_groups, "aggs": aggs}


def _parse_select_list(select_list: str, group_cols: "list[str]"):
    """Shared select-list classifier for the agg-view parsers: split at
    top-level commas into bare group columns + aliased mergeable
    aggregates. Returns (seen_groups, aggs) or None."""
    import re

    items, depth, cur = [], 0, []
    for ch in select_list:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur).strip())
    seen_groups: list[str] = []
    aggs: list[dict] = []
    for item in items:
        if re.fullmatch(r"\w+", item) and item.lower() in group_cols:
            seen_groups.append(item.lower())
            continue
        am = re.fullmatch(
            r"(count|sum|min|max)\s*\((.+)\)\s+as\s+(\w+)",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if not am or re.search(r"\bdistinct\b", am.group(2), re.IGNORECASE):
            return None
        aggs.append({"func": am.group(1).lower(), "alias": am.group(3)})
    if sorted(seen_groups) != sorted(group_cols) or not aggs:
        return None
    return seen_groups, aggs


def parse_join_agg_view(view_sql: str, n_tables: int = 2):
    """Classify a k-TABLE inner-join GROUP BY view as incrementally
    maintainable under insert-only windows; returns ``{"group_cols",
    "aggs"}`` or None. Accepted shape (conservative — anything else
    keeps the exact pinned rebuild):

        SELECT g1, ..., AGG(expr) AS alias, ...
        FROM a [x] JOIN b [y] ON pred [JOIN c [z] ON pred ...]
        [WHERE pred] GROUP BY g1, ...

    with AGG ∈ {COUNT, SUM, MIN, MAX} all aliased, group columns plain
    UNQUALIFIED identifiers in both lists, exactly n_tables-1 plain
    (INNER) JOINs, no subqueries/outer joins/DISTINCT/HAVING/ORDER/
    LIMIT/window."""
    import re

    from deltacat_spark.catalog.catalog import _strip_literals

    s = _strip_literals(view_sql)
    low = s.lower()
    if len(re.findall(r"\bselect\b", low)) != 1:
        return None
    if len(re.findall(r"\bjoin\b", low)) != n_tables - 1:
        return None
    if re.search(
        r"\b(left|right|full|semi|anti|natural|cross)\s+(outer\s+)?join\b",
        low,
    ):
        return None
    if re.search(
        r"\b(distinct|having|order\s+by|limit|union|exists)\b|\bover\s*\(",
        low,
    ):
        return None
    m = re.match(
        r"\s*select\s+(.*?)\s+from\s+\w+(?:\s+(?:as\s+)?\w+)?"
        r"(?:\s+join\s+\w+(?:\s+(?:as\s+)?\w+)?\s+on\s+.+?)+"
        r"\s+group\s+by\s+([\w\s,]+?)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        return None
    select_list, group_by = m.groups()
    group_cols = [g.strip().lower() for g in group_by.split(",") if g.strip()]
    if not all(re.fullmatch(r"\w+", g) for g in group_cols):
        return None
    parsed = _parse_select_list(select_list, group_cols)
    if parsed is None:
        return None
    seen_groups, aggs = parsed
    return {"group_cols": seen_groups, "aggs": aggs}


def _combine_partials(old_col, new_col, func: str):
    """Merge one aggregate column across refresh windows; null on one
    side (group absent, or an all-null SUM slice) keeps the other."""
    from pyspark.sql import functions as F

    if func in ("count", "sum"):
        op = old_col + new_col
    elif func == "min":
        op = F.least(old_col, new_col)
    else:
        op = F.greatest(old_col, new_col)
    return F.when(old_col.isNotNull() & new_col.isNotNull(), op).otherwise(
        F.coalesce(old_col, new_col)
    )


def _merge_partial_into_old(partial, old, group_cols, aggs):
    """Join the new-slice partial to the MV's current values NULL-SAFELY
    on the group columns (`<=>`): GROUP BY over a nullable column emits
    a NULL group whose partial must still find its old row — a plain
    list-join would drop it and the merge would then duplicate the
    NULL-key row instead of combining. Returns the merged upsert batch
    keyed by the partial's group columns."""
    from pyspark.sql import functions as F

    p = partial.alias("__mv_p")
    o = old.alias("__mv_o")
    cond = None
    for g in group_cols:
        c = F.col(f"__mv_p.{g}").eqNullSafe(F.col(f"__mv_o.{g}"))
        cond = c if cond is None else cond & c
    return p.join(o, cond, "left").select(
        *[F.col(f"__mv_p.{g}").alias(g) for g in group_cols],
        *[
            _combine_partials(
                F.col(f"__old_{a['alias']}"),
                F.col(f"__mv_p.{a['alias']}"),
                a["func"],
            ).alias(a["alias"])
            for a in aggs
        ],
    )


def _insert_only_window(catalog, src, namespace, src_version, last) -> bool:
    """Soundness check on the COMMIT LOG, not the change rows: a CoW
    MERGE without CDC sidecars produces no read_changes rows at all, so
    "every change row is an insert" would silently miss updates.
    Insert-family deltas and content-neutral maintenance commits
    (ALTER/ANALYZE/OPTIMIZE) are safe; anything else (MERGE/DELETE/
    REPLACE/TRUNCATE) forces a rebuild.

    The delta_type alone is NOT sufficient: a REPLACE commit records
    its new generation as an APPEND delta *plus removes for every
    prior file* — treating it as insert-only would append the new
    generation's derived rows onto the (now dead) old generation's.
    Any commit that removes files is therefore not insert-family; a
    REPLACE of an EMPTY table has no removes and genuinely is one.
    CREATE is benign (no content) so a from-version-0 window over an
    append-only table still classifies insert-only."""
    benign_ops = {"ALTER", "ANALYZE", "OPTIMIZE", "CREATE"}
    insert_deltas = {"APPEND", "ADD", "CHRONO"}
    window = catalog._log(src, namespace).replay(
        src_version, start_after=last
    )
    return all(
        c.operation in benign_ops
        or (c.delta_type in insert_deltas and not c.removes)
        for c in window
    )


def _touched_keys_for_window(
    catalog, src, namespace, hi, lo, merge_keys, group_cols=None
):
    """Touched-merge-key DataFrame for the key-addressed (lo, hi]
    window, or None when the window is ineligible for keyed incremental
    maintenance (wholesale ops, CDC-invisible CoW rewrites, schema
    drift → the caller full-rebuilds), or the string "empty" when only
    benign maintenance commits landed.

    With ``group_cols``, returns ``(keys_df, payload_groups)`` instead:
    ``payload_groups`` is the distinct group values carried by the
    window's change rows themselves (post-images + delete pre-images) —
    or None when some commit's partial payload omits a group column.
    Reading groups off the CHANGE ROWS saves the caller one full
    resolve of the current table (the change slice is window-sized,
    the table is not).

    Eligible windows contain only MERGE/DELETE commits whose row-level
    changes surface in `read_changes` (MoR deltas, CDC sidecars, or
    positional-delete joins) plus content-neutral maintenance — then
    every changed row is addressed by its merge key, and the union of
    the window's payload keys bounds everything that moved."""
    from pyspark.sql import functions as F

    benign = {"ALTER", "ANALYZE", "OPTIMIZE"}
    window = list(catalog._log(src, namespace).replay(hi, start_after=lo))
    for c in window:
        if c.operation in benign:
            continue
        if c.schema_json or c.partition_scheme:
            return None  # definition drift mid-window
        if c.operation not in ("MERGE", "DELETE"):
            return None  # REPLACE/TRUNCATE/RESTORE/... — wholesale
        cdc_visible = (c.delta_type is not None and c.adds) or c.cdc_files
        if not cdc_visible and (c.adds or c.removes):
            # CoW rewrite without CDC sidecars: the commit's row-level
            # changes are invisible to read_changes — keys unknowable
            return None
    ch = catalog.read_changes(
        src, from_version=lo, to_version=hi, namespace=namespace
    )
    meta = (
        ch.select("_commit_version", "_change_type", "_change_cols")
        .distinct()
        .collect()
    )  # one row per commit — bounded by the window's commit count
    if not meta:
        return "empty"
    mk_lower = {k.lower() for k in merge_keys}
    g_lower = {g.lower() for g in group_cols} if group_cols else set()
    parts = []
    group_parts = []
    for m in meta:
        carried = (
            {c.strip().lower() for c in m._change_cols.split(",")}
            if m._change_cols
            else None
        )
        rows = ch.filter(
            (F.col("_commit_version") == m._commit_version)
            & (F.col("_change_type") == m._change_type)
        )
        if carried is None or mk_lower <= carried:
            # full-row changes (upserts, positional-delete pre-images)
            # or partial payloads that carry the keys
            parts.append(rows.select(*merge_keys))
            # POST-side group values ride the change rows themselves
            # when carried. A partial payload OMITTING a group column
            # cannot change it (post group == pre group, covered by
            # the caller's pre-slice); a delete's post side is empty —
            # both safely contribute nothing.
            if group_cols and (carried is None or g_lower <= carried):
                group_parts.append(rows.select(*group_cols))
            elif group_cols and "DELETE" not in str(m._change_type):
                # partial MERGE payload omitting a group column: an
                # EXISTING key keeps its pre-image group (pre-slice
                # covers it), but a NEW key's absent columns null-fill
                # — the all-NULL group tuple may be born here, so
                # contribute it conservatively (recomputing an empty
                # group is a no-op)
                types = {f.name.lower(): f.dataType for f in rows.schema.fields}
                group_parts.append(
                    rows.select(
                        *[
                            F.lit(None).cast(types[c.lower()]).alias(c)
                            for c in group_cols
                        ]
                    ).limit(1)
                )
            continue
        if "DELETE" in str(m._change_type):
            # equality-delete predicate on non-key columns: resolve the
            # affected keys from the pre-delete snapshot (one prunable
            # semi-join scan per such commit; payload broadcasts)
            pay_cols = [c for c in rows.columns if c.lower() in carried]
            payload = rows.select(*pay_cols).distinct().alias("__mvd_p")
            pre = catalog.read_table(
                src, namespace, version_as_of=int(m._commit_version) - 1
            ).alias("__mvd_t")
            cond = None
            for c in pay_cols:
                cc = F.col(f"__mvd_t.{c}").eqNullSafe(F.col(f"__mvd_p.{c}"))
                cond = cc if cond is None else cond & cc
            parts.append(
                pre.join(F.broadcast(payload), cond, "left_semi").select(
                    *merge_keys
                )
            )
        else:
            return None  # merge payload without its keys — malformed
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.distinct()
    if group_cols is None:
        return out
    pg = None
    if group_parts:
        pg = group_parts[0]
        for p in group_parts[1:]:
            pg = pg.unionByName(p)
        pg = pg.distinct()
    return out, pg


def _snapshot_row_estimate(catalog, table, namespace) -> int:
    """Row-count estimate from live-file metadata — zero jobs. Exact on
    resolved (CoW) tables; an upper bound on MoR tables with pending
    upserts, which only makes the cost gate MORE willing to take the
    keyed path (acceptable: the gate is pure cost policy)."""
    snap = catalog.snapshot(table, namespace)
    return sum(
        f.records or 0
        for f in snap.files
        if not f.content_type and f.delta_type != "POSITIONAL_DELETE"
    )


def _bounds_predicate(probe, cols):
    """Conservative BETWEEN-conjunction over `probe`'s min/max per
    column — handed to `read_table(predicate=...)` so stats/bloom file
    skipping prunes the slice reads on sorted / range-partitioned
    tables (the point-read discipline: a keyed refresh should touch
    the files holding the touched keys, not the table). Superset by
    construction — the exact null-safe semi join still applies
    membership afterwards. Columns with NULLs or non-orderable values
    contribute nothing (None when no column can bound)."""
    from pyspark.sql import functions as F

    from deltacat_spark.plans.expr import col as _col

    _, pred = _count_and_bounds(probe, cols)
    return pred


def _count_and_bounds(probe, cols):
    """COUNT(*) plus `_bounds_predicate`'s min/max bounds in ONE Spark
    job — the keyed branches need both over the same (persisted) probe,
    and separate `.count()` + bounds actions cost two scheduling
    round-trips for frames that are typically window-sized."""
    from pyspark.sql import functions as F

    from deltacat_spark.plans.expr import col as _col

    row = probe.agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.min(F.col(c)).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c)).alias(f"hi_{i}") for i, c in enumerate(cols)],
        *[
            F.max(F.col(c).isNull().cast("int")).alias(f"n_{i}")
            for i, c in enumerate(cols)
        ],
    ).collect()[0]
    pred = None
    for i, c in enumerate(cols):
        lo, hi = row[f"lo_{i}"], row[f"hi_{i}"]
        if lo is None or hi is None or row[f"n_{i}"] == 1:
            continue
        if not isinstance(lo, (int, float, str)):
            continue
        p = _col(c).between(lo, hi)
        pred = p if pred is None else pred.and_(p)
    return row["__cnt"], pred


def _null_safe_semi(df, probe, cols, anti: bool = False):
    """Null-safe LEFT SEMI (or ANTI) join of `df` against the distinct
    `cols` tuples of `probe` — group/key membership where NULL matches
    NULL (GROUP BY treats NULL as a real group)."""
    from pyspark.sql import functions as F

    d = df.alias("__nss_d")
    p = probe.select(*cols).distinct().alias("__nss_p")
    cond = None
    for c in cols:
        cc = F.col(f"__nss_d.{c}").eqNullSafe(F.col(f"__nss_p.{c}"))
        cond = cc if cond is None else cond & cc
    return d.join(p, cond, "left_anti" if anti else "left_semi")


def refresh_incremental(
    catalog: Any,
    src: str,
    dst: str,
    transform: "Callable[[DataFrame], DataFrame]",
    namespace: str = "default",
    record_wise: bool = True,
    agg_spec: "dict | None" = None,
    record_keys: "list[str] | None" = None,
) -> dict[str, Any]:
    """Refresh ``dst`` from ``src``; returns a small audit dict.

    ``record_wise=False`` declares the transform NOT distributive over
    unions (aggregates/joins/distinct): the incremental append path is
    skipped entirely and every refresh is a full REPLACE rebuild —
    exact for any transform. The watermark still short-circuits no-op
    refreshes.

    ``agg_spec`` (from :func:`parse_agg_view`) switches a GROUP BY view
    onto the incremental-AGGREGATE path: the new slice is aggregated
    with the SAME SQL, then merged into the keyed MV table group by
    group (COUNT/SUM add, MIN/MAX least/greatest) via the catalog's own
    merge-upsert — refresh cost is O(new data + touched groups), and
    untouched groups' files are never rewritten. Insert-only windows
    merge partials; MERGE/DELETE windows on merge-keyed sources
    recompute exactly the touched groups (see the keyed branch below);
    wholesale/CDC-invisible windows fall back to the exact rebuild."""
    from pyspark.sql import functions as F

    src_snap = catalog.snapshot(src, namespace)
    last: int | None = None
    if catalog.table_exists(dst, namespace):
        dst_props = catalog.snapshot(dst, namespace).properties
        raw = dst_props.get(MV_SRC_VERSION)
        if raw is not None:
            try:
                last = int(raw)
            except ValueError:
                last = None
    # '==', not '>=': a watermark PAST the source's current version
    # means the source was dropped and recreated — the MV contents
    # describe a dead incarnation and must rebuild (same gate as the
    # multi-table path and the query rewrite)
    if last is not None and last == src_snap.version:
        return {"mode": "noop", "src_version": src_snap.version}

    # incremental paths require a real forward window (last < current —
    # a dead-incarnation watermark would replay an empty window and
    # "incrementally" append nothing onto the dead contents)
    if (
        last is not None
        and last < src_snap.version
        and record_wise
        and not record_keys  # keyed MVs take the keyed branch below
    ):
        if _insert_only_window(catalog, src, namespace, src_snap.version, last):
            changes = catalog.read_changes(
                src, from_version=last, to_version=src_snap.version,
                namespace=namespace,
            )
            batch = changes.drop("_commit_version", "_change_type", "_change_cols")
            out = transform(batch)
            catalog.write_to_table(
                out,
                dst,
                namespace,
                mode="add",
                commit_properties={MV_SRC_VERSION: str(src_snap.version)},
            )
            return {
                "mode": "incremental",
                "src_version": src_snap.version,
                "since": last,
            }

    if (
        last is not None
        and last < src_snap.version
        and record_keys
        and catalog.table_exists(dst, namespace)
    ):
        # Record-wise view over a keyed source, keys carried through:
        # the MV is keyed on the SOURCE merge keys, so a MERGE/DELETE
        # window maintains it by upserting the touched keys' derived
        # post-images and deleting keys whose post-image vanished
        # (source row deleted, or filtered out by the view's WHERE).
        # Same delete-first / watermark-on-merge crash discipline as
        # the keyed aggregate branch.
        keys_df = _touched_keys_for_window(
            catalog, src, namespace, src_snap.version, last, record_keys
        )
        if isinstance(keys_df, str):  # benign-only window
            catalog.alter_table(
                dst, namespace,
                properties={MV_SRC_VERSION: str(src_snap.version)},
            )
            return {
                "mode": "incremental_record_keyed",
                "src_version": src_snap.version,
                "since": last,
                "touched_keys": 0,
            }
        if keys_df is not None:
            # same COST GATE as the keyed-agg branch: when the window
            # touched most keys, the point-wise path's slice probes and
            # per-key merge cost more than one rebuild pass
            keys_df = keys_df.persist()
            # one job: the gate's count AND the slice-read bounds
            n_keys, kpred = _count_and_bounds(keys_df, record_keys)
            mv_rows = max(_snapshot_row_estimate(catalog, dst, namespace), 1)
            try:
                gate = float(
                    catalog.snapshot(dst, namespace).properties.get(
                        "mv.keyed_gate", "0.5"
                    )
                )
            except ValueError:
                gate = 0.5
            if n_keys >= gate * mv_rows:
                keys_df.unpersist()
                keys_df = None
        if keys_df is not None:
            # kpred (computed with the gate count above) prunes the
            # slice read on sorted / range-partitioned tables
            # (point-read discipline)
            # pinned to the version vector being stamped: a commit
            # landing mid-refresh must not leak into a window whose
            # watermark predates it (the next refresh owns it)
            cur = catalog.read_table(
                src, namespace, version_as_of=src_snap.version,
                predicate=kpred,
            )
            # persisted: consumed by the count, the merge write and the
            # vanished anti-join — one resolve of the current table
            post = transform(
                _null_safe_semi(cur, keys_df, record_keys)
            ).persist()
            vanished = _null_safe_semi(
                keys_df, post, record_keys, anti=True
            ).select(*record_keys).distinct()
            n_new = post.count()
            n_gone = vanished.count()
            if n_gone:
                catalog.write_to_table(
                    vanished,
                    dst,
                    namespace,
                    mode="delete",
                    commit_properties=(
                        {MV_SRC_VERSION: str(src_snap.version)}
                        if not n_new
                        else None
                    ),
                )
            if n_new:
                catalog.write_to_table(
                    post,
                    dst,
                    namespace,
                    mode="merge",
                    commit_properties={MV_SRC_VERSION: str(src_snap.version)},
                )
            elif not n_gone:
                catalog.alter_table(
                    dst, namespace,
                    properties={MV_SRC_VERSION: str(src_snap.version)},
                )
            keys_df.unpersist()
            post.unpersist()
            return {
                "mode": "incremental_record_keyed",
                "src_version": src_snap.version,
                "since": last,
                "touched_keys": n_new + n_gone,
            }

    if (
        last is not None
        and last < src_snap.version
        and agg_spec is not None
        and not _insert_only_window(
            catalog, src, namespace, src_snap.version, last
        )
        and catalog.table_exists(dst, namespace)
    ):
        # MERGE/DELETE in the window: keyed incremental maintenance.
        # Touched merge keys bound everything that moved; the touched
        # GROUPS (group values of the pre/post key-slices) are then
        # recomputed exactly from the current table and merge-upserted —
        # groups whose rows all vanished are deleted from the MV. Exact
        # for EVERY aggregate (including MIN/MAX, which pure retraction
        # arithmetic cannot retract) at O(touched keys + touched
        # groups' rows), never O(table). Ineligible windows (wholesale
        # ops, CDC-invisible CoW rewrites) fall through to the exact
        # full rebuild below.
        mkeys = (
            catalog.snapshot(src, namespace).schema.merge_keys
            if catalog.snapshot(src, namespace).schema
            else []
        )
        group_cols = list(agg_spec["group_cols"])
        res = (
            _touched_keys_for_window(
                catalog, src, namespace, src_snap.version, last, mkeys,
                group_cols=group_cols,
            )
            if mkeys
            else None
        )
        if isinstance(res, str):  # "empty": benign-only window
            catalog.alter_table(
                dst, namespace,
                properties={MV_SRC_VERSION: str(src_snap.version)},
            )
            return {
                "mode": "incremental_agg_keyed",
                "src_version": src_snap.version,
                "since": last,
                "touched_groups": 0,
            }
        keys_df = payload_groups = None
        if res is not None:
            keys_df, payload_groups = res
        if keys_df is not None:
            keys_df = keys_df.persist()
            mk_map = {k.lower(): k for k in mkeys}
            if all(g.lower() in mk_map for g in group_cols):
                # Group columns ⊆ merge keys (per-key rollups): a row
                # can never change group, so the touched-key projection
                # IS the touched-group superset — no pre-image slice
                # read, no pre-side bounds job (the change rows' keys
                # cover both the group a change left and the one it
                # landed in, because they are the same tuple).
                touched_groups = keys_df.select(
                    *[
                        F.col(mk_map[g.lower()]).alias(g)
                        for g in group_cols
                    ]
                ).distinct().persist()
            else:
                # POST-side groups come off the window's change rows
                # (window-sized); only the PRE side needs a key-slice
                # of the old snapshot — the current table is resolved
                # exactly once, for the recompute itself. Both slice
                # reads carry a bounds predicate so file skipping
                # prunes them on sorted / range-partitioned tables.
                kpred = _bounds_predicate(keys_df, mkeys)
                pre = catalog.read_table(
                    src, namespace, version_as_of=last, predicate=kpred
                )
                pre_groups = _null_safe_semi(pre, keys_df, mkeys).select(
                    *group_cols
                )
                touched_groups = (
                    payload_groups.unionByName(pre_groups)
                    if payload_groups is not None
                    else pre_groups
                ).distinct().persist()
            # COST GATE: recompute cost ~ touched groups' row share.
            # When the window touches most groups (low-cardinality
            # group column, scattered updates), the group-slice
            # recompute degenerates to a full scan PLUS the key-slice
            # probes — measured 7x slower than the plain rebuild at
            # sf0.1 with 3 groups. The MV row count IS the group count
            # (tiny read); past the threshold, fall through to the
            # exact rebuild. Override per MV with the `mv.keyed_gate`
            # table property (fraction; tests/fixtures pin it high).
            # one job: the gate's count AND the recompute slice bounds
            n_tg, gpred = _count_and_bounds(touched_groups, group_cols)
            mv_groups = max(_snapshot_row_estimate(catalog, dst, namespace), 1)
            try:
                gate = float(
                    catalog.snapshot(dst, namespace).properties.get(
                        "mv.keyed_gate", "0.5"
                    )
                )
            except ValueError:
                gate = 0.5
            if n_tg >= gate * mv_groups:
                touched_groups.unpersist()
                keys_df.unpersist()
                keys_df = None  # most groups touched — rebuild is cheaper
        if keys_df is not None:
            # the recompute reads whole touched GROUPS (not just the
            # touched keys), so its prune bound is the group-value
            # bounds (gpred, computed with the gate count above)
            # pinned to the stamped version (see record-keyed note)
            cur = catalog.read_table(
                src, namespace, version_as_of=src_snap.version,
                predicate=gpred,
            )
            # persist the group-slice aggregate: it is consumed three
            # times (count, merge write, vanished anti-join) and its
            # lineage embeds the one resolve of the current table slice
            recomputed = transform(
                _null_safe_semi(cur, touched_groups, group_cols)
            ).persist()
            vanished = _null_safe_semi(
                touched_groups, recomputed, group_cols, anti=True
            )
            n_new = recomputed.count()
            n_gone = vanished.count()
            # DELETE first, MERGE (with the watermark) last: a crash in
            # between leaves the watermark at `last`, so the retry
            # replays the whole (idempotent) recompute — the reverse
            # order could stamp the watermark with stale rows undeleted.
            if n_gone:
                catalog.write_to_table(
                    vanished,
                    dst,
                    namespace,
                    mode="delete",
                    commit_properties=(
                        {MV_SRC_VERSION: str(src_snap.version)}
                        if not n_new
                        else None
                    ),
                )
            if n_new:
                catalog.write_to_table(
                    recomputed,
                    dst,
                    namespace,
                    mode="merge",
                    commit_properties={MV_SRC_VERSION: str(src_snap.version)},
                )
            elif not n_gone:
                catalog.alter_table(
                    dst, namespace,
                    properties={MV_SRC_VERSION: str(src_snap.version)},
                )
            touched_groups.unpersist()
            recomputed.unpersist()
            keys_df.unpersist()
            return {
                "mode": "incremental_agg_keyed",
                "src_version": src_snap.version,
                "since": last,
                "touched_groups": n_new + n_gone,
            }

    if (
        last is not None
        and last < src_snap.version
        and agg_spec is not None
        and _insert_only_window(catalog, src, namespace, src_snap.version, last)
    ):
        changes = catalog.read_changes(
            src, from_version=last, to_version=src_snap.version,
            namespace=namespace,
        )
        batch = changes.drop("_commit_version", "_change_type", "_change_cols")
        partial = transform(batch)  # GROUP BY over the new slice only
        group_cols = list(agg_spec["group_cols"])
        aggs = list(agg_spec["aggs"])
        if partial.isEmpty():
            catalog.alter_table(
                dst, namespace,
                properties={MV_SRC_VERSION: str(src_snap.version)},
            )
            return {
                "mode": "incremental_agg",
                "src_version": src_snap.version,
                "since": last,
                "touched_groups": 0,
            }
        # current values of ONLY the touched groups (merge-key point
        # reads — stats/bloom-prunable on the MV table)
        old = catalog.read_table(dst, namespace).select(
            *group_cols,
            *[
                F.col(a["alias"]).alias(f"__old_{a['alias']}")
                for a in aggs
            ],
        )
        merged = _merge_partial_into_old(partial, old, group_cols, aggs)
        n_touched = merged.count()
        catalog.write_to_table(
            merged,
            dst,
            namespace,
            mode="merge",
            commit_properties={MV_SRC_VERSION: str(src_snap.version)},
        )
        return {
            "mode": "incremental_agg",
            "src_version": src_snap.version,
            "since": last,
            "touched_groups": n_touched,
        }

    # Bootstrap / fallback: full rebuild. REPLACE then stamp the
    # watermark; a crash in between re-runs the (idempotent) rebuild.
    out = transform(catalog.read_table(src, namespace))
    if catalog.table_exists(dst, namespace):
        catalog.write_to_table(out, dst, namespace, mode="replace")
    elif record_keys:
        # Keyed record-wise MV: keyed on the SOURCE merge keys so later
        # MERGE/DELETE windows upsert/delete point-wise (each source
        # row derives at most one view row — record-wise transform over
        # unique keys).
        from deltacat_spark.schema import Field, Schema

        kset = {k.lower() for k in record_keys}
        fields = [
            Field(
                f.name,
                f.dataType,
                nullable=f.nullable and f.name.lower() not in kset,
                merge_key=f.name.lower() in kset,
            )
            for f in out.schema.fields
        ]
        catalog.create_table(dst, namespace, schema=Schema(fields))
        catalog.write_to_table(out, dst, namespace, mode="merge")
    elif agg_spec is not None:
        # Create the MV keyed on its group columns so later refreshes
        # merge group-by-group instead of rewriting the table.
        from deltacat_spark.schema import Field, Schema

        group = {g.lower() for g in agg_spec["group_cols"]}
        fields = [
            Field(
                f.name,
                f.dataType,
                nullable=f.nullable and f.name.lower() not in group,
                merge_key=f.name.lower() in group,
            )
            for f in out.schema.fields
        ]
        catalog.create_table(dst, namespace, schema=Schema(fields))
        catalog.write_to_table(out, dst, namespace, mode="merge")
    else:
        catalog.write_to_table(out, dst, namespace, mode="auto")
    catalog.alter_table(
        dst, namespace, properties={MV_SRC_VERSION: str(src_snap.version)}
    )
    return {"mode": "full", "src_version": src_snap.version}


def stream_refresh_incremental(
    catalog: Any,
    src: str,
    dst: str,
    transform: "Callable[[DataFrame], DataFrame]",
    checkpoint_dir: str,
    namespace: str = "default",
    trigger_once: bool = True,
    agg_spec: "dict | None" = None,
    record_keys: "list[str] | None" = None,
):
    """Streaming materialized view: `refresh_incremental`'s contract
    driven by the change-feed source (`streaming/api.py:
    stream_read_changes`). Each micro-batch (a deterministic range of
    commit versions, checkpointed by Spark) transforms and appends in
    ONE commit that also records the batch's high-water source version —
    so although foreachBatch is at-least-once, a replayed batch sees its
    own watermark already recorded and skips: exactly-once end to end.
    (The guard is whole-batch: it also absorbs a LOST checkpoint as
    long as no new source commits landed since; a lost checkpoint plus
    new commits re-reads from version 0 into one overlapping batch —
    restart from the batch `refresh_incremental` watermark instead.)

    A micro-batch carrying MERGE/DELETE changes hands the whole step to
    the BATCH `refresh_incremental` (keyed maintenance on merge-keyed
    sources, exact rebuild otherwise) — the append-style sink has no
    retraction semantics, but the batch machinery does, so the query
    KEEPS RUNNING through update windows instead of stopping. Its
    watermark may then run ahead of the stream's batch boundaries; the
    replay guard absorbs the overlap.

    ``agg_spec`` (from :func:`parse_agg_view`) makes each micro-batch a
    streaming AGGREGATE maintenance step: the batch aggregates alone,
    then merges group-by-group into the keyed MV (the same combiner as
    the batch path), all inside the one watermark-stamped commit — a
    record-wise append would double-count aggregate partials.
    Returns the StreamingQuery.
    """
    from pyspark.sql import functions as F
    from deltacat_spark.streaming.api import stream_read_changes

    # positional-delete commits carry (_file,_pos) tuples the stream
    # source cannot expand — skip them HERE; the sink's commit-log
    # window check below still sees those commits and delegates the
    # step to the batch refresh, which reconstructs the deleted rows
    changes = stream_read_changes(
        catalog, src, namespace, on_positional_delete="skip"
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # an all-skipped batch (e.g. positional deletes only) still
            # moved the source; the batch refresh is watermark-gated, so
            # this is a cheap no-op when nothing actually changed
            refresh_incremental(
                catalog,
                src,
                dst,
                transform,
                namespace=namespace,
                record_wise=agg_spec is None and record_keys is None,
                agg_spec=agg_spec,
                record_keys=record_keys,
            )
            return
        hi = batch_df.agg(F.max("_commit_version").alias("h")).collect()[0].h
        last_wm = None
        if catalog.table_exists(dst, namespace):
            raw = catalog.snapshot(dst, namespace).properties.get(
                MV_SRC_VERSION
            )
            try:
                last_wm = int(raw) if raw is not None else None
            except ValueError:
                last_wm = None
            if last_wm is not None and last_wm >= int(hi):
                return  # replayed batch — already applied atomically
        # Soundness check on the COMMIT LOG, not the batch rows: the
        # feed labels a REPLACE's new generation APPEND and never emits
        # remove-only commits (TRUNCATE) or CoW rewrites at all — row
        # kinds alone would happily append onto a dead generation. Any
        # non-insert commit in (last_wm, hi] hands the whole step to
        # the batch refresh (keyed maintenance on merge-keyed sources,
        # exact rebuild otherwise), so the query KEEPS RUNNING. Its
        # watermark may land past this batch's boundary; the replay
        # guard above then skips the overlap.
        if not _insert_only_window(
            catalog, src, namespace, int(hi), last_wm or 0
        ):
            refresh_incremental(
                catalog,
                src,
                dst,
                transform,
                namespace=namespace,
                record_wise=agg_spec is None and record_keys is None,
                agg_spec=agg_spec,
                record_keys=record_keys,
            )
            return
        out = transform(batch_df.drop("_commit_version", "_change_type", "_change_cols"))
        if not catalog.table_exists(dst, namespace):
            if agg_spec is not None or record_keys:
                from deltacat_spark.schema import Field, Schema

                group = {
                    g.lower()
                    for g in (
                        agg_spec["group_cols"]
                        if agg_spec is not None
                        else record_keys
                    )
                }
                fields = [
                    Field(
                        f.name,
                        f.dataType,
                        nullable=f.nullable and f.name.lower() not in group,
                        merge_key=f.name.lower() in group,
                    )
                    for f in out.schema.fields
                ]
                catalog.create_table(dst, namespace, schema=Schema(fields))
                # Watermark rides the SAME commit as the bootstrap batch:
                # a separate alter_table would leave a crash window where
                # the batch replays (watermark absent) and double-applies
                # — double-counting aggregates. A crash between create
                # and this write is harmless: the replay finds an empty
                # keyed table and the merge path re-applies cleanly.
                catalog.write_to_table(
                    out, dst, namespace, mode="merge",
                    commit_properties={MV_SRC_VERSION: str(hi)},
                )
            else:
                catalog.write_to_table(
                    out, dst, namespace, mode="auto",
                    commit_properties={MV_SRC_VERSION: str(hi)},
                )
        elif agg_spec is not None:
            group_cols = list(agg_spec["group_cols"])
            aggs = list(agg_spec["aggs"])
            old = catalog.read_table(dst, namespace).select(
                *group_cols,
                *[
                    F.col(a["alias"]).alias(f"__old_{a['alias']}")
                    for a in aggs
                ],
            )
            merged = _merge_partial_into_old(out, old, group_cols, aggs)
            catalog.write_to_table(
                merged,
                dst,
                namespace,
                mode="merge",
                commit_properties={MV_SRC_VERSION: str(hi)},
            )
        else:
            catalog.write_to_table(
                out,
                dst,
                namespace,
                mode="add",
                commit_properties={MV_SRC_VERSION: str(hi)},
            )

    writer = (
        changes.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Engine-neutral predicate AST → Spark Column compiler.

Mirrors the reference's typed expression tree
(`storage/model/expression/expression.py:17-657`: Reference, Literal,
Equal..LessThanEqual, And/Or/Not, In, Between, Like, IsNull with fluent
builders) — but compiles to `pyspark.sql.Column`, where Catalyst takes
over pushdown (the reference needed its own visitors + per-engine
translators, `utils/daft.py:96-231`; SURVEY §2.2 notes Catalyst covers
all four pushdown kinds natively).

Also extracts the simple conjunctive (col op literal) predicates a
snapshot can use for file skipping (`Snapshot.prune`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, functions as F


@dataclass(frozen=True)
class Expr:
    op: str
    args: tuple

    # -- fluent builders (reference expression.py fluent API) ----------
    def eq(self, other) -> "Expr":
        return Expr("eq", (self, _wrap(other)))

    def ne(self, other) -> "Expr":
        return Expr("ne", (self, _wrap(other)))

    def gt(self, other) -> "Expr":
        return Expr("gt", (self, _wrap(other)))

    def lt(self, other) -> "Expr":
        return Expr("lt", (self, _wrap(other)))

    def ge(self, other) -> "Expr":
        return Expr("ge", (self, _wrap(other)))

    def le(self, other) -> "Expr":
        return Expr("le", (self, _wrap(other)))

    def in_(self, values) -> "Expr":
        return Expr("in", (self, tuple(values)))

    def between(self, lo, hi) -> "Expr":
        return Expr("between", (self, _wrap(lo), _wrap(hi)))

    def like(self, pattern: str) -> "Expr":
        return Expr("like", (self, pattern))

    def is_null(self) -> "Expr":
        return Expr("is_null", (self,))

    def and_(self, other: "Expr") -> "Expr":
        return Expr("and", (self, other))

    def or_(self, other: "Expr") -> "Expr":
        return Expr("or", (self, other))

    def not_(self) -> "Expr":
        return Expr("not", (self,))

    # -- compilation ---------------------------------------------------
    def to_column(self) -> Column:
        a = self.args
        comp = lambda e: e.to_column() if isinstance(e, Expr) else e  # noqa: E731
        if self.op == "ref":
            return F.col(a[0])
        if self.op == "lit":
            return F.lit(a[0])
        if self.op == "raw":
            # Opaque Spark-SQL condition (the SQL-DML bridge's WHERE
            # clause). Compiles via the engine parser; contributes NO
            # skipping predicates (conservative — see `_collect`).
            return F.expr(a[0])
        if self.op == "eq":
            return comp(a[0]) == comp(a[1])
        if self.op == "ne":
            return comp(a[0]) != comp(a[1])
        if self.op == "gt":
            return comp(a[0]) > comp(a[1])
        if self.op == "lt":
            return comp(a[0]) < comp(a[1])
        if self.op == "ge":
            return comp(a[0]) >= comp(a[1])
        if self.op == "le":
            return comp(a[0]) <= comp(a[1])
        if self.op == "in":
            return comp(a[0]).isin(*a[1])
        if self.op == "between":
            return comp(a[0]).between(comp(a[1]), comp(a[2]))
        if self.op == "like":
            return comp(a[0]).like(a[1])
        if self.op == "is_null":
            return comp(a[0]).isNull()
        if self.op == "and":
            return comp(a[0]) & comp(a[1])
        if self.op == "or":
            return comp(a[0]) | comp(a[1])
        if self.op == "not":
            return ~comp(a[0])
        raise ValueError(f"unknown op {self.op!r}")

    def skipping_predicates(self) -> list[tuple[str, str, Any]]:
        """(col, op, literal) conjuncts usable for file skipping; ORs and
        non-literal comparisons contribute nothing (conservative)."""
        out: list[tuple[str, str, Any]] = []
        _collect(self, out)
        return out

    def __repr__(self) -> str:  # SQL-ish, like the reference DisplayVisitor
        a = self.args
        if self.op == "ref":
            return str(a[0])
        if self.op == "lit":
            return repr(a[0])
        if self.op in ("and", "or"):
            return f"({a[0]!r} {self.op.upper()} {a[1]!r})"
        if self.op == "not":
            return f"(NOT {a[0]!r})"
        if self.op == "in":
            return f"{a[0]!r} IN {list(a[1])}"
        if self.op == "between":
            return f"{a[0]!r} BETWEEN {a[1]!r} AND {a[2]!r}"
        if self.op == "is_null":
            return f"{a[0]!r} IS NULL"
        if self.op == "raw":
            return f"({a[0]})"
        sym = {"eq": "=", "ne": "<>", "gt": ">", "lt": "<", "ge": ">=", "le": "<="}
        return f"{a[0]!r} {sym.get(self.op, self.op)} {a[1]!r}"


_OPMAP = {"eq": "=", "gt": ">", "lt": "<", "ge": ">=", "le": "<="}


def _collect(e: Expr, out: list) -> None:
    if e.op == "and":
        _collect(e.args[0], out)
        _collect(e.args[1], out)
        return
    if e.op in _OPMAP:
        lhs, rhs = e.args
        if (
            isinstance(lhs, Expr)
            and lhs.op == "ref"
            and isinstance(rhs, Expr)
            and rhs.op == "lit"
        ):
            out.append((lhs.args[0], _OPMAP[e.op], rhs.args[0]))
    elif e.op == "between":
        ref, lo, hi = e.args
        if isinstance(ref, Expr) and ref.op == "ref":
            if isinstance(lo, Expr) and lo.op == "lit":
                out.append((ref.args[0], ">=", lo.args[0]))
            if isinstance(hi, Expr) and hi.op == "lit":
                out.append((ref.args[0], "<=", hi.args[0]))
    elif e.op == "is_null":
        ref = e.args[0]
        if isinstance(ref, Expr) and ref.op == "ref":
            # pruned against the footer null_count (a file proving
            # zero nulls cannot match IS NULL)
            out.append((ref.args[0], "isnull", None))
    elif e.op == "not":
        child = e.args[0]
        if (
            isinstance(child, Expr)
            and child.op == "is_null"
            and isinstance(child.args[0], Expr)
            and child.args[0].op == "ref"
        ):
            # NOT col IS NULL — an all-null file cannot match
            out.append((child.args[0].args[0], "notnull", None))


def _wrap(v) -> Expr:
    return v if isinstance(v, Expr) else Expr("lit", (v,))


def col(name: str) -> Expr:
    return Expr("ref", (name,))


def lit(v) -> Expr:
    return Expr("lit", (v,))


def raw(sql: str) -> Expr:
    """Wrap a Spark-SQL boolean expression string as an Expr. Used by
    the SQL-DML bridge (`Catalog.sql`); compiles through the engine
    parser and never contributes file-skipping conjuncts."""
    return Expr("raw", (sql,))

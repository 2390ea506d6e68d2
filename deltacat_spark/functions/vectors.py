"""Vector column functions for embedding similarity.

Dot products and norms are index-ordered double folds
(`zip_with` + `aggregate`) — bit-identical to DuckDB's
`list_sum(list_transform(...))` so cosine values survive the
value-hash correctness gate. All JVM-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_components(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine from a precomputed-norm pair (norms computed per row before
    the join so the O(n·q) join does only the dot product)."""
    return dot(a, b) / (a_norm * b_norm)

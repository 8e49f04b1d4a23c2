"""Distance / similarity expressions over ``array`` feature columns.

All of these are pure Column expressions — JVM-side, no Python UDFs —
unlike the reference's row-at-a-time Python ``dist`` closure
(``DBSCAN.py:58-59``: L1 over the first ``dimension`` tuple slots).

Two tiers:

- ``*_fixed(a, b, dim)``: the dimension is known, so the reduction is
  unrolled into a flat ``abs(a[0]-b[0]) + ...`` expression. Flat
  arithmetic participates in whole-stage codegen; measured ~3x faster
  per evaluation than the HOF tier in the ε-join hot path. Prefer
  these everywhere the schema fixes the dimension (every operator in
  this engine infers it).
- generic (``l1_distance`` etc.): ``zip_with``/``aggregate``
  higher-order functions for dimension-agnostic use. HOF lambdas are
  interpreted per row (CodegenFallback), so keep them out of
  per-candidate-pair loops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def l1_distance_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled Manhattan distance for a known dimension (codegen-friendly)."""
    a, b = _c(a), _c(b)
    terms = [F.abs(a[i] - b[i]) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("double")


def l2_distance_sq_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    a, b = _c(a), _c(b)
    terms = [(a[i] - b[i]) * (a[i] - b[i]) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("double")


def l2_distance_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    return F.sqrt(l2_distance_sq_fixed(a, b, dim))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    a, b = _c(a), _c(b)
    terms = [a[i] * b[i] for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("double")


def norm2_fixed(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def _zipped(a: Column | str, b: Column | str, fn) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.zip_with(a, b, fn)


def l1_distance(a: Column | str, b: Column | str) -> Column:
    """Manhattan distance  sum_i |a_i - b_i|  (reference ``dist``, DBSCAN.py:58-59)."""
    return F.aggregate(
        _zipped(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_distance_sq(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance (avoids the sqrt when only ordering matters)."""
    return F.aggregate(
        _zipped(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(l2_distance_sq(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        _zipped(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm2(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); null-safe on zero vectors (returns NULL)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm2(a) * norm2(b)
    return F.when(denom != 0, dot(a, b) / denom)

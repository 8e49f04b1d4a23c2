"""Distance / similarity expressions over ``array`` feature columns.

All of these are pure Column expressions built from ``zip_with`` /
``aggregate`` higher-order functions — they run JVM-side inside
whole-stage codegen, unlike the reference's row-at-a-time Python
``dist`` closure (``DBSCAN.py:58-59``: L1 over the first ``dimension``
tuple slots). No Python UDFs, so the hot path of every distance join
stays vectorized on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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

"""Vector functions over ``array<float>`` embedding columns.

All pure column expressions (F.zip_with / F.aggregate fold left-to-right,
JVM-side) — no Python in the hot path. Computations are done in double
precision regardless of the storage type so results are stable and
oracle-comparable.

Scale note: expression-level dot products keep similarity search inside
whole-stage codegen; the quadratic part of similarity search is controlled
by the *operator* (LSH bucketing / block joins in operators/similarity.py),
not by these per-pair kernels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — matches DuckDB's list_dot_product
    evaluation order, so doubles are bit-identical for identical inputs."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = F.nullif(norm(a) * norm(b), F.lit(0.0))
    return dot(a, b) / denom


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))

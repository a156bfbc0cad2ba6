"""Z-order (Morton) clustering key for multi-column data skipping.

Range-clustering on ONE column makes that column's per-file min/max
disjoint and every other column's useless. Z-ordering interleaves the
bits of several columns' bucket ids so files end up compact in ALL the
clustered dimensions at once — each column's per-file range shrinks to
roughly its global range / 2^(bits/n_cols) — which is what lets
``TxTable.read(filters=...)`` prune on any of them (the publicly
documented idea behind Delta's OPTIMIZE ZORDER BY).

Construction (all expression-level, one driver-side approxQuantile per
column — a bounded sketch, never a data collect):

1. per column, take ``2^bits - 1`` approximate quantile boundaries, so
   buckets are equi-POPULATED (uniform ``width_bucket`` would collapse
   under skew: 99% of rows in one bucket = no clustering);
2. map each value to its bucket with an ``aggregate`` over the boundary
   array (O(2^bits) comparisons per row, linear, JVM-side);
3. interleave the bucket bits round-robin into one long Morton key.

Numeric and date/timestamp columns are supported (dates order as their
epoch numbers). Strings are rejected: there is no order-preserving
string→number mapping without collecting boundaries anyway — hash
buckets would CLUSTER fine but SKIP nothing, a silent lie.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_NUMERIC = ("byte", "short", "integer", "long", "float", "double", "decimal")


def _as_number(df: DataFrame, col: str) -> Column:
    t = df.schema[col].dataType.typeName()
    if t.startswith(_NUMERIC):
        return F.col(col).cast("double")
    if t == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if t in ("timestamp", "timestamp_ntz"):
        # unix_micros wants a zoned timestamp; the ntz->tz cast applies a
        # fixed session offset, which preserves order (all we need)
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    raise ValueError(
        f"z-order needs an ordered numeric axis; column {col!r} is {t} "
        "(hash-bucketing a string would cluster but never skip)"
    )


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> Column:
    """Morton key column over ``cols`` (each quantile-bucketed to
    ``bits`` bits). Total key width = bits * len(cols) <= 63."""
    cols = list(cols)
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a long")
    n_b = (1 << bits) - 1
    probs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        num = _as_number(df, c)
        # quantiles over the NUMERIC image of the column (approxQuantile
        # only accepts numerics — date/timestamp go through their epoch
        # mapping, which is order-preserving); deduped ascending
        # boundaries — low-cardinality columns just get fewer distinct
        # buckets (harmless)
        qs = sorted(
            set(
                df.select(num.alias("__zq"))
                .dropna()
                .approxQuantile("__zq", probs, 0.001)
            )
        )
        bucket = F.aggregate(
            F.array(*[F.lit(float(q)) for q in qs]),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(num > b, 1).otherwise(0),
        )
        # nulls sort first (bucket 0), like NULLS FIRST ordering
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        for bit in range(bits):
            # bit `bit` of this column lands at interleaved position
            # bit*len(cols) + ci
            key = key + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + ci,
            )
    return key

"""As-of (point-in-time) join.

Not present in the reference (its only temporal idiom is the string-date
window dedup, epa_ingestion.py:451) but a first-class operator for the
north-star training-data/event pipelines: "for each left event, the most
recent right event at-or-before it" (backward) or "the next right event
at-or-after it" (forward).

Spark-first plan — the *merge* formulation, not a range join:

    union(left tagged 1, right tagged 0)
      -> single hash shuffle on the key
      -> in-partition sort by (ts, tag)
      -> last(right_payload_struct, ignorenulls=True) over an
         UNBOUNDED PRECEDING .. CURRENT ROW frame
      -> keep left rows, unpack the matched struct

Why this shape at 100 TB: a naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts`
+ window-max explodes to every (left, earlier-right) pair before pruning —
quadratic per key. The merge form moves each row through exactly one
shuffle and one sort; cost is O((|L|+|R|) log) per key partition,
independent of match fan-in. Skewed keys split via AQE like any other
hash exchange.

The right payload travels as ONE struct so a matched row whose payload
field is genuinely NULL stays NULL (per-column ``last(ignorenulls)`` would
silently fall back to an older right row for just that column).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
    how: str = "left",
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the single nearest ``right`` row per
    key: latest with ``right_ts <= left_ts`` (backward, inclusive) or
    earliest with ``right_ts >= left_ts`` (forward, inclusive).

    ``tolerance`` (an SQL interval string, e.g. ``"30 minutes"``) bounds
    the match distance; a match further away is treated as no match.
    ``how='left'`` keeps unmatched left rows with NULL payload; ``'inner'``
    drops them. Non-key right columns must not collide with left columns.
    If multiple right rows share (key, ts), the one sorting last by the
    remaining payload columns wins — pre-dedup the right side for a
    caller-controlled rule.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    out_ts = matched_ts_col or f"matched_{right_ts}"

    packed = F.struct(
        F.col(right_ts).alias(out_ts), *[F.col(c) for c in payload_cols]
    ).alias("__asof")
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        packed,
    )
    l = left.select("*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"))
    u = l.unionByName(r, allowMissingColumns=True)

    # Backward: ascending ts, right (0) before left (1) at equal ts so an
    # equal-timestamp right row is visible — inclusive bound. Forward is the
    # mirror image on descending ts. ``__asof`` as a final sort key makes
    # same-(key, ts) right rows deterministic (struct comparison).
    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__is_left"), F.asc_nulls_first("__asof")]
    else:
        order = [F.desc("__ts"), F.asc("__is_left"), F.desc_nulls_first("__asof")]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__asof", ignorenulls=True).over(w)

    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            in_range = matched[out_ts] >= F.col("__ts") - iv
        else:
            in_range = matched[out_ts] <= F.col("__ts") + iv
        matched = F.when(in_range, matched)

    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__is_left") == 1)
        .select(
            *left.columns,
            F.col(f"__m.{out_ts}").alias(out_ts),
            *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
        )
    )
    if how == "inner":
        out = out.filter(F.col(out_ts).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how!r}")
    return out

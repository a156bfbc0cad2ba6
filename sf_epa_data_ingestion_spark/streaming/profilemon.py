"""Streaming data-quality profiling: mergeable per-batch column sketches.

The batch profiler (operators/profiling.py) answers "what does this
corpus look like" with one scan. A 100 TB ingest can't afford that scan
per question — observability there means MERGEABLE per-batch statistics
whose union equals the corpus answer without ever re-reading the
corpus. This module is that tier:

- ``profile_appender`` — a ``foreachBatch`` sink computing, per column,
  ONE map-side-combinable aggregate row per micro-batch: exact counts
  (rows, nulls), numeric moments (min/max/sum/sum-of-squares — all
  merge by +/min/max; double-precision, so exact for integer values
  within 2^53 and correctly rounded beyond), and a Datasketches HLL
  sketch of the
  column's values (``F.hll_sketch_agg``; sketches merge losslessly via
  ``hll_union_agg``, the property approx_count_distinct's internal
  state never exposes). Appended exactly-once (txn markers via
  ``txsink.append_once``) to a txlog state table whose size is
  O(columns x batches) — metadata, never data.
- ``current_profile`` — the corpus-level profile AT ANY MOMENT from the
  state table alone: counts/moments sum exactly; the unioned sketch's
  estimate carries HLL's published error (rsd ~1.04/sqrt(2^lg_k)), the
  same bound the batch profiler's approx tier quotes.
- drift alerts — each batch's null-rate per column is compared against
  the PRE-batch historical rate; a jump beyond ``null_jump`` appends an
  alert row (exactly-once, committed BEFORE the state append so a
  crash-replay recomputes the decision against the same pre-batch
  history — the decisions-before-state ordering every monitor in this
  package uses). A broken upstream extractor that starts shipping NULL
  text shows up at the batch that broke it, not at the next full scan.

Scale notes: the per-batch work is one aggregate over the micro-batch
(no shuffle beyond the agg's partial/final, no state read of anything
but the tiny profile table), so cost follows batch size. All sketching
is JVM-side codegen; nothing here touches Python row-at-a-time.

Reference anchor: the reference pipeline logs row counts per stage
(epa_ingestion.py logging calls) and otherwise trusts the warehouse;
this is the engine-side replacement a self-hosted 100 TB pipeline
needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sf_epa_data_ingestion_spark.storage.txlog import TxTable
from sf_epa_data_ingestion_spark.streaming.txsink import append_once

STATE_SCHEMA = (
    "batch_id long, col string, n long, nulls long, sketch binary, "
    "mn double, mx double, sm double, ssq double"
)
ALERT_SCHEMA = (
    "batch_id long, col string, kind string, observed double, "
    "expected double"
)

_NUMERIC = ("byte", "short", "integer", "long", "float", "double")


def batch_profile_rows(df: DataFrame, batch_id: int, columns=None,
                       lg_k: int = 12) -> list[tuple]:
    """The per-batch profile rows — ONE aggregate job over ``df``.
    Every column is sketched on its string form (HLL distinct of the
    string image == distinct of the values; Datasketches only ingests
    int/long/string/binary, and profiling cares about cardinality, not
    type identity). Numeric columns also carry exact moments."""
    # numeric moments are computed in double: exact for counts and for
    # integer values within double's 2^53 integer-exact range; long
    # columns beyond that (snowflake-style ids) get correctly-rounded,
    # not exact, moments — the HLL/count half is unaffected
    cols = list(columns or df.columns)
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn__{c}"))
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(int(lg_k)))
            .alias(f"sk__{c}")
        )
        if types.get(c) in _NUMERIC:
            d = F.col(c).cast("double")
            aggs.append(F.min(d).alias(f"mn__{c}"))
            aggs.append(F.max(d).alias(f"mx__{c}"))
            aggs.append(F.sum(d).alias(f"sm__{c}"))
            aggs.append(F.sum(d * d).alias(f"ssq__{c}"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        numeric = types.get(c) in _NUMERIC
        out.append((
            int(batch_id), c, int(row["__n"]),
            int(row["__n"]) - int(row[f"nn__{c}"]),
            row[f"sk__{c}"],
            float(row[f"mn__{c}"]) if numeric and row[f"mn__{c}"] is not None else None,
            float(row[f"mx__{c}"]) if numeric and row[f"mx__{c}"] is not None else None,
            float(row[f"sm__{c}"]) if numeric and row[f"sm__{c}"] is not None else None,
            float(row[f"ssq__{c}"]) if numeric and row[f"ssq__{c}"] is not None else None,
        ))
    return out


def profile_appender(
    state: TxTable,
    app_id: str,
    columns=None,
    lg_k: int = 12,
    alerts: TxTable | None = None,
    null_jump: float = 0.10,
    min_history_rows: int = 1000,
    max_retries: int = 5,
):
    """Build the ``foreachBatch`` callable. ``state`` must have
    ``STATE_SCHEMA``; ``alerts`` (optional) ``ALERT_SCHEMA``. Alert
    commits carry the SAME (app, batch) marker as the state commit but
    land first — see the module doc for why that ordering makes
    crash-replay decisions deterministic."""

    def write_batch(batch_df, batch_id: int) -> None:
        last = state.last_txn(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already durable
        spark = batch_df.sparkSession
        rows = batch_profile_rows(batch_df, batch_id, columns, lg_k)

        if alerts is not None:
            # pre-batch history: nulls/rows per column from the tiny
            # state table (row_count()==0 keeps batch 0 metadata-only)
            hist = {}
            if state.row_count() > 0:
                hist = {
                    r["col"]: (int(r["hn"]), int(r["hnulls"]))
                    for r in state.read().groupBy("col").agg(
                        F.sum("n").alias("hn"),
                        F.sum("nulls").alias("hnulls"),
                    ).collect()
                }
            fired = []
            for (_b, c, n, nulls, *_rest) in rows:
                hn, hnulls = hist.get(c, (0, 0))
                if hn < min_history_rows or n == 0:
                    continue
                rate, hrate = nulls / n, hnulls / hn
                if abs(rate - hrate) > null_jump:
                    fired.append(
                        (int(batch_id), c, "null_rate", rate, hrate)
                    )
            if fired:
                # no-alert batches commit NOTHING to the alerts table —
                # an empty marker append per quiet batch would grow the
                # log by a commit + an empty file per micro-batch
                # forever. Replay-safe without the marker: the decision
                # derives solely from PRE-batch state history, and the
                # state append (with its own marker) still lands last,
                # so a crash-replay recomputes the same empty decision.
                append_once(
                    alerts,
                    spark.createDataFrame(fired, ALERT_SCHEMA)
                    .repartition(1),
                    app_id, batch_id, max_retries,
                )

        append_once(
            state,
            spark.createDataFrame(rows, STATE_SCHEMA).repartition(1),
            app_id, batch_id, max_retries,
        )

    return write_batch


def current_profile(state: TxTable) -> DataFrame:
    """The corpus profile implied by every batch committed so far —
    one aggregate over the O(columns x batches) state table; the corpus
    itself is never read. Columns: rows/nulls exact, distinct_est (HLL,
    rsd ~1.04/sqrt(2^lg_k)), mn/mx and mean/variance from the merged
    double-precision moments (population variance; NULL where no
    numeric values; see batch_profile_rows for the 2^53 exactness
    scope).

    Variance is E[x^2] - E[x]^2 on merged moments — the only mergeable
    two-pass-free form — and is clamped at 0: for near-constant or
    large-magnitude columns the two terms are nearly equal and floating
    cancellation can land epsilon-negative (r11 ADVICE). The clamp fixes
    the sign, not the precision: when |mean| >> stddev the cancellation
    also erodes the magnitude's accuracy (relative error ~ eps *
    mean^2 / variance), so treat tiny variances of huge-mean columns as
    "near-constant", not as exact measurements.
    """
    nn = F.col("rows") - F.col("nulls")
    return (
        state.read()
        .groupBy("col")
        .agg(
            F.sum("n").alias("rows"),
            F.sum("nulls").alias("nulls"),
            # allowDifferentLgConfigK: an operator who re-tunes lg_k
            # mid-stream downgrades the union's precision instead of
            # breaking every future profile read
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch", F.lit(True))
            ).alias("distinct_est"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.sum("sm").alias("__sm"),
            F.sum("ssq").alias("__ssq"),
        )
        .withColumn(
            "mean", F.when(nn > 0, F.col("__sm") / nn)
        )
        .withColumn(
            "variance",
            # the __ssq null-guard keeps non-numeric columns NULL:
            # F.greatest SKIPS nulls, so a bare greatest(0.0, NULL)
            # would turn "no moments recorded" into variance 0.0
            F.when(
                (nn > 0) & F.col("__ssq").isNotNull(),
                F.greatest(
                    F.lit(0.0),
                    F.col("__ssq") / nn
                    - (F.col("__sm") / nn) * (F.col("__sm") / nn),
                ),
            ),
        )
        .drop("__sm", "__ssq")
    )

"""Deterministic sampling & dataset splitting for training-data pipelines.

Random sampling (``df.sample``) is seed-stable only per partitioning —
repartition and the sample changes. Training pipelines need *content-
deterministic* selections: the same row lands in the same split on any
cluster layout, any engine, any day. Everything here derives the decision
from a cryptographic hash of the row's key, so results are reproducible
and oracle-checkable (DuckDB computes identical md5 digests).

Scale: all pure column expressions on the scan — no shuffle, no state,
trivially parallel; the hash predicate pushes to a filter right above the
scan (rows drop before any downstream work).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _hash_unit(key: Column) -> Column:
    """Uniform [0, 1) from the first 13 hex digits of md5(key) — 52 bits,
    EXACT in a double (no rounding divergence between engines; DuckDB
    oracle: CAST('0x' || substr(md5(k), 1, 13) AS UBIGINT) / 2^52)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10).cast("double")
        / F.lit(float(1 << 52))
    )


def sample_by_hash(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — deterministic
    across runs/partitionings/engines, unlike ``df.sample``."""
    return df.filter(_hash_unit(F.col(key_col)) < F.lit(fraction))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
) -> DataFrame:
    """Tag each row 'train' / 'val' / 'test' by key hash. A key keeps its
    split forever (append-only corpora never leak val/test into train)."""
    u = _hash_unit(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(u < F.lit(test_fraction), F.lit("test"))
        .when(u < F.lit(test_fraction + val_fraction), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def stratified_sample_by_hash(
    df: DataFrame, key_col: str, stratum_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas).
    Strata absent from ``fractions`` are dropped — matching
    ``sampleBy`` semantics but reproducible."""
    u = _hash_unit(F.col(key_col))
    keep = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        keep = keep | ((F.col(stratum_col) == F.lit(stratum)) & (u < F.lit(frac)))
    return df.filter(keep)

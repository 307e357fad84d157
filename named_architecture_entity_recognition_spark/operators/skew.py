"""Explicit skew handling: salted repartition + salted join.

AQE's skew-join splitting (enabled in session.py) handles most runtime
imbalance, but north_rule requires explicit salting for the known-hot
keys of this workload: gazetteer head terms (a handful of component
names dominate mentions at corpus scale) and boilerplate LSH bands.

Pattern: the skewed (big) side gets a deterministic salt in
[0, n_salts); the small side is replicated n_salts times; the join key
becomes (key, salt). Aggregations use two-phase: partial agg on
(key, salt), final agg on key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: list | None = None) -> DataFrame:
    """Deterministic salt derived from the row content (never rand():
    reruns and resumed runs must land rows in the same salt bucket)."""
    basis = F.concat_ws("\x1f", *[F.col(c) for c in (cols or df.columns)])
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(basis), F.lit(n_salts)).cast("int")
    )


def replicate_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the small side with salt in [0, n_salts)."""
    return df.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Hot keys on the big side spread over n_salts reducers instead of one.
    """
    b = with_salt(big, n_salts)
    s = replicate_small_side(small, n_salts)
    return b.join(s, on + ["salt"], how).drop("salt")


def salted_count(df: DataFrame, key_cols: list, n_salts: int = 8) -> DataFrame:
    """Two-phase count for skewed keys: partial count per (key, salt),
    final sum per key — the hot key's rows never meet in one reducer."""
    partial = (
        with_salt(df, n_salts)  # salt over full row content, not the key
        .groupBy(*key_cols, "salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias("n"))
"""Skew-resilient join: key salting.

AQE's skew-join handles most hot keys automatically (enabled in
session.py), but it only splits SORT-MERGE join partitions; for
aggregation-after-join patterns or when AQE is off, explicit salting is
the standard fix. This helper implements the classic scheme:

* the skewed (large) side gets a random salt in [0, n),
* the small side is replicated n times (one copy per salt value),
* the join key becomes (key, salt) — hot keys spread over n partitions.

Cost model: replicates the build side n-fold — use for moderate n and a
build side that fits comfortably post-replication (it usually broadcasts
anyway; salting matters when BOTH sides are too big to broadcast and one
key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Join `skewed` (large, hot-keyed) with `other` on equi-keys, spreading
    each key over `salt_buckets` partitions. Result equals a plain
    `skewed.join(other, on, how)` for inner/left joins."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")

    salted = skewed.withColumn(
        SALT_COL, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted.join(replicated, keys + [SALT_COL], how)
    return out.drop(SALT_COL)

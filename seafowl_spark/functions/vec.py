"""Vectorized (Arrow-batched) vector math UDFs.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and postponed (string) annotations break its signature
inspection.

Bit-exactness contract: every reduction is a fixed-order loop over
dimensions with float64 elementwise ops — identical results to a SQL
left-fold chain `0.0 + x1 + x2 + ...` (no BLAS reduction-order
nondeterminism), so outputs can be compared across engines and runs.
"""

import numpy as np
import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf


def dot_exact_udf():
    """(array<double>, array<double>) -> double, left-fold order."""

    @pandas_udf("double")
    def dot_exact(a: pd.Series, b: pd.Series) -> pd.Series:
        A, B = np.stack(a.values), np.stack(b.values)
        acc = np.zeros(len(A), dtype=np.float64)
        for i in range(A.shape[1]):
            acc = acc + A[:, i] * B[:, i]
        return pd.Series(acc)

    return dot_exact


def nearest_centroid_udf(centroids: np.ndarray):
    """array<double> -> long: index of the max-dot-product centroid
    (first max wins ties; fixed-order accumulation per dimension)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("long")
    def cell_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        acc = np.zeros((len(X), len(cents)), dtype=np.float64)
        for i in range(X.shape[1]):
            acc += X[:, i : i + 1] * cents[:, i][None, :]
        return pd.Series(np.argmax(acc, axis=1))

    return cell_of


def hyperplane_bucket_udf(planes):
    """array<double> -> long LSH bucket: bit j set iff dot(emb, plane_j) >= 0.

    Per-plane dots use fixed-order accumulation, so the sign decisions are
    bit-identical to the SQL chain `e[1]*w1 + e[2]*w2 + ...` the oracle
    evaluates.
    """
    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)

    @pandas_udf("long")
    def bucket_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)  # (n, dim)
        out = np.zeros(len(X), dtype=np.int64)
        for j in range(P.shape[0]):
            acc = np.zeros(len(X), dtype=np.float64)
            for i in range(X.shape[1]):
                acc = acc + X[:, i] * P[j, i]
            out |= (acc >= 0).astype(np.int64) << j
        return pd.Series(out)

    return bucket_of


def norm_exact_udf():
    """array<double> -> double L2 norm, fixed-order accumulation + IEEE sqrt
    (bit-identical to sqrt of the SQL square-sum chain)."""

    @pandas_udf("double")
    def norm_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        acc = np.zeros(len(X), dtype=np.float64)
        for i in range(X.shape[1]):
            acc = acc + X[:, i] * X[:, i]
        return pd.Series(np.sqrt(acc))

    return norm_of

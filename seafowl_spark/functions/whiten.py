"""Arrow-batched whitening application UDF.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and postponed (string) annotations break its signature
inspection (same constraint as functions/bpe.py and functions/vec.py).
The whitening matrix and mean ride in the closure (the codebook-as-
closure design), so the plan is O(1) in the embedding dimension.
"""

import numpy as np
import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf


def whiten_udf(w, mu):
    """array<double> -> array<double>: y = W (x - mu), one matmul per
    Arrow batch."""
    w = np.asarray(w, dtype=np.float64)
    mu = np.asarray(mu, dtype=np.float64)

    @pandas_udf("array<double>")
    def _whiten(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())  # (batch, d)
        out = (mat - mu) @ w.T
        return pd.Series(list(out))

    return _whiten

"""Distributed logistic-regression training — the fastText-style quality
classifier every production corpus pipeline trains (complements the
inference-only Naive Bayes in operators/classifier.py with an actual
GRADIENT LOOP run as Spark aggregates).

Model: binary logistic regression over ``dim`` hashed token-count
features (md5 bucket of each token, counts normalized by document
length), full-batch gradient descent for a FIXED number of epochs from
zero weights.

Determinism/parity discipline (the q_pagerank unrolled-oracle pattern):

* features are exact: integer bucket counts divided once by the integer
  token total — one IEEE division, order-independent;
* the per-document sigmoid is quantized at DECIMAL(25,6) (the
  q_nb_classify ln() discipline) so JVM/libm exp() ulp differences
  cannot leak into the gradient;
* each gradient component sums ``(p - y) * x_j`` terms CAST to
  DECIMAL(25,12) — exact, order-independent accumulation — then one
  double cast; the weight update ``w - lr * (g / n)`` is a fixed
  left-to-right double chain. Every step therefore unrolls into CTE
  SQL that reproduces the weights bit for bit.

Scale: the corpus is touched ``epochs + 2`` times (one featurize, one
aggregate per epoch, one scoring projection) — each pass is one hash
aggregate or a pure projection; the model is ``dim + 1`` doubles living
in plain column literals (broadcast by construction, no join), and the
driver holds only the per-epoch gradient row. No Python executes on
corpus rows. At 100 TB you'd persist the featurized frame once
(``feat.localCheckpoint()`` here plays that role) and the epoch cost is
a map-side-combined aggregate over ``dim + 1`` columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int


def _tokens(col: Column) -> Column:
    # same tokenizer as operators/classifier.py (lower, \s+ split)
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def hashed_features(
    docs: DataFrame,
    label: Column,
    dim: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, y, x0..x{dim-1}): md5-bucketed token counts over document
    length. One explode + one hash aggregate; documents with zero
    tokens drop (no features to score)."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        label.cast("double").alias("y"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    b = md5_int(F.col("token")) % dim
    counts = toks.groupBy("__id").agg(
        F.first("y").alias("y"),
        *[
            F.count(F.when(b == j, F.lit(1))).alias(f"__c{j}")
            for j in range(dim)
        ],
        F.count(F.lit(1)).alias("__n"),
    )
    return counts.select(
        F.col("__id").alias(id_col),
        "y",
        *[
            (F.col(f"__c{j}").cast("double") / F.col("__n")).alias(f"x{j}")
            for j in range(dim)
        ],
    )


def _dot(weights: list[float], bias: float, dim: int) -> Column:
    """w·x + b as the fixed left-to-right double chain the oracle
    mirrors: ((w0*x0 + w1*x1) + ...) + b."""
    acc = F.lit(weights[0]) * F.col("x0")
    for j in range(1, dim):
        acc = acc + F.lit(weights[j]) * F.col(f"x{j}")
    return acc + F.lit(bias)


def _p_quantized(weights: list[float], bias: float, dim: int) -> Column:
    """sigmoid(w·x + b) quantized at DECIMAL(25,6), back as double."""
    z = _dot(weights, bias, dim)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return p.cast("decimal(25,6)").cast("double")


def train_logreg(
    feat: DataFrame,
    dim: int = 8,
    epochs: int = 2,
    lr: float = 0.5,
) -> tuple[list[float], float, int]:
    """Fixed-epoch full-batch gradient descent from zero weights.
    Returns (weights, bias, n_docs). One aggregate job per epoch; the
    only driver state is the ``dim + 1``-column gradient row."""
    n = feat.count()
    w = [0.0] * dim
    b = 0.0
    for _ in range(epochs):
        r = _p_quantized(w, b, dim) - F.col("y")
        g = feat.select(r.alias("__r"), *[f"x{j}" for j in range(dim)]).agg(
            *[
                F.sum(
                    (F.col("__r") * F.col(f"x{j}")).cast("decimal(25,12)")
                )
                .cast("double")
                .alias(f"g{j}")
                for j in range(dim)
            ],
            F.sum(F.col("__r").cast("decimal(25,12)"))
            .cast("double")
            .alias("gb"),
        ).collect()[0]
        w = [w[j] - lr * (g[f"g{j}"] / n) for j in range(dim)]
        b = b - lr * (g["gb"] / n)
    return w, b, n


def logreg_scores(
    feat: DataFrame,
    weights: list[float],
    bias: float,
    dim: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, p, pred): quantized sigmoid score + thresholded label —
    a pure projection over the featurized frame."""
    p = _p_quantized(weights, bias, dim)
    return feat.select(
        F.col(id_col),
        p.alias("p"),
        F.when(p >= 0.5, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
    )


def logreg_scored_with_label(
    feat: DataFrame,
    weights: list[float],
    bias: float,
    dim: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, y, p): the quantized sigmoid alongside the training label —
    the frame loss-style consumers (doremi.per_domain_loss) read. Pure
    projection, same quantization as logreg_scores."""
    return feat.select(
        F.col(id_col),
        "y",
        _p_quantized(weights, bias, dim).alias("p"),
    )

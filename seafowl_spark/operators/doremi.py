"""Domain reweighting by excess proxy loss (DoReMi-style, Xie et al.
2023 — public paper), simplified to the multiplicative-weights core.

DoReMi tunes pre-training mixture weights by watching where a small
PROXY model underperforms a REFERENCE model: domains with positive
excess loss get exponentially up-weighted. This module implements that
loop with the repo's logistic-regression proxy (operators/logreg.py):

* **Distributed part** (:func:`per_domain_loss`): ONE pass over the
  scored corpus — per-domain mean binary log-loss with the repo's
  decimal-sum discipline (quantized -ln terms, exact decimal sums, one
  division per domain). Map-side combined; |domains| rows to the
  driver.
* **Driver part** (:func:`reweight_domains`): the multiplicative-
  weights iteration ``w <- normalize(w * exp(lr * excess))`` with
  excess = max(0, loss - ref_loss) per domain, run for a fixed number
  of rounds — pure O(|domains| x iters) arithmetic, corpus-free
  (the k-means/PQ/BPE driver-route discipline).
* **Composition**: the returned weights are target fractions — feed
  them to mixture.mixture_sample (optionally after
  temperature_targets-style quantization) to realize the new mixture
  deterministically.

Full-fidelity DoReMi retrains the proxy under each intermediate
mixture; this fixed-proxy variant is the standard cheap approximation
(one scoring pass total) and is what the bounded-pass contract here
guarantees. Each round's arithmetic is pinned against a numpy mirror
in tests/test_doremi.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def per_domain_loss(
    scored: DataFrame,
    domain_col: str = "lang",
    y_col: str = "y",
    p_col: str = "p",
    eps: float = 1e-6,
) -> dict[str, float]:
    """Mean binary log-loss per domain over a scored frame
    (y in {0,1}, p = model probability): one map-side-combined
    aggregate; the -ln terms quantize at DECIMAL(25,6) (the
    q_nb_classify discipline) so the statistic is reproducible."""
    p = F.col(p_col)
    y = F.col(y_col).cast("double")
    clipped = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    nll = -(
        y * F.log(clipped) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - clipped)
    )
    agg = (
        scored.where(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("d"))
        .agg(
            F.sum(nll.cast(_DEC)).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )  # |domains| rows — bounded driver state
    return {r["d"]: r["s"] / r["n"] for r in agg}


def reweight_domains(
    losses: dict[str, float],
    ref_losses: dict[str, float] | float,
    iters: int = 5,
    lr: float = 1.0,
    init: dict[str, float] | None = None,
) -> dict[str, float]:
    """Fixed-round multiplicative-weights update. ``ref_losses`` is the
    reference model's per-domain loss (or one scalar baseline); excess
    below the reference contributes nothing (clipped at 0, per the
    paper). Deterministic: domains iterate in sorted order."""
    domains = sorted(losses)
    if not domains:
        return {}
    if isinstance(ref_losses, (int, float)):
        ref = {d: float(ref_losses) for d in domains}
    else:
        missing = [d for d in domains if d not in ref_losses]
        if missing:
            # a silently-defaulted reference of 0 would treat the whole
            # loss as excess and let that domain dominate the mixture
            raise ValueError(
                f"ref_losses missing domain(s) {missing}; pass a scalar "
                "baseline to apply one reference everywhere"
            )
        ref = {d: float(ref_losses[d]) for d in domains}
    if init:
        missing = [d for d in domains if d not in init]
        if missing:
            raise ValueError(f"init missing domain(s) {missing}")
        w = {d: float(init[d]) for d in domains}
    else:
        w = {d: 1.0 / len(domains) for d in domains}
    excess = {d: max(0.0, losses[d] - ref[d]) for d in domains}
    for _ in range(max(0, iters)):
        for d in domains:
            w[d] = w[d] * math.exp(lr * excess[d])
        tot = 0.0
        for d in domains:  # ordered fold — deterministic normalizer
            tot += w[d]
        for d in domains:
            w[d] = w[d] / tot
    return w


def doremi_targets(
    scored: DataFrame,
    ref_losses: dict[str, float] | float,
    domain_col: str = "lang",
    iters: int = 5,
    lr: float = 1.0,
) -> dict[str, float]:
    """One-call composition: per-domain proxy loss -> multiplicative
    reweighting -> target fractions for mixture.mixture_sample."""
    return reweight_domains(
        per_domain_loss(scored, domain_col=domain_col),
        ref_losses,
        iters=iters,
        lr=lr,
    )

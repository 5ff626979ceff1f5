"""Multinomial Naive Bayes text classification, as pure DataFrame ops.

The cheap-classifier stage of corpus curation (fastText-style quality /
domain / language gates): train from labeled examples with ONE pass of
aggregations, score the whole corpus with broadcast joins — no gradient
loop, no Python in either path.

Training (:func:`fit_nb`) produces two vocabulary-bounded DataFrames:

* priors: (label, log_prior, oov_ll, n_docs) — one row per class;
  ``oov_ll`` is that class's Laplace floor ``ln(1/(total_tokens + V))``,
  which is also the smoothed value for any vocab token the class never
  saw (count=0 rows need not exist).
* likelihood: (label, token, ll) — ``ln((count + 1)/(total_tokens + V))``
  over a capped global vocabulary (top ``vocab_size`` by corpus count,
  deterministic (n DESC, token) truncation like operators/vocab.py).

Scoring (:func:`nb_scores` / :func:`nb_predict`): token instances cross
the (few) classes via a broadcast, look up ``ll`` with a broadcast left
join (missing -> the class floor), and sum per (doc, class) through a
DECIMAL cast — order-independent, so scores are reproducible across runs
and engines (graded-window-ready). ``nb_predict`` takes the argmax class
per document with a deterministic (score DESC, label ASC) tiebreak.

Scale: the model is vocab x classes rows — broadcastable by construction
(the vocab cap bounds it); the corpus-side plan is explode + broadcast
joins + one hash aggregate on (doc, label), so token instances shuffle
once, multiplied only by the small class count.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class NbModel(NamedTuple):
    priors: DataFrame       # (label, log_prior, oov_ll, n_docs)
    likelihood: DataFrame   # (label, token, ll)


def _tokens(col: Column, lowercase: bool = True) -> Column:
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(base, r"\s+"), lambda t: t != "")


def fit_nb(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    vocab_size: int = 4096,
    min_count: int = 1,
    lowercase: bool = True,
) -> NbModel:
    """Train multinomial NB with Laplace smoothing over a capped global
    vocabulary. All aggregates partial-combine map-side; driver-side
    state is two scalar counts (vocab size, corpus size) — the model
    itself stays in DataFrames."""
    from ..functions import local_df

    spark = df.sparkSession
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col), lowercase)).alias("token"),
    )
    # The model tables are driver-bounded by construction (vocab_size
    # tokens; vocab_size x n_labels count rows), but as lazy plans each
    # downstream broadcast re-executes their full corpus tokenize+count
    # subtree — the r13 "before" capture shows 16 parquet scans of the
    # corpus in one scoring plan. Collect each ONCE and rebind as a
    # LocalRelation (guide §5): v_plus falls out of the collected length
    # (no separate count() pass), and scoring runs one corpus scan. All
    # floats (ll, log_prior) are still computed by the same JVM
    # expressions over the exact collected integers.
    #
    # r14 (the r13 verdict's task #6, guide §4.2/§8): training now
    # tokenizes the corpus ONCE. The (label, token) count table — the
    # natural partial-aggregate of both fit passes, bounded by distinct
    # (label, token) pairs, never corpus-sized — materializes via
    # localCheckpoint; the vocab count derives from it by a second
    # (tiny) aggregate (SUM of per-label counts == the global count,
    # exact integers), and the per-class counts are a join over it
    # instead of a second corpus tokenize. The per-label doc counts
    # (bounded by the class count) also collect once, which removes the
    # separate df.count() pass — n_total is their exact integer sum —
    # and takes the priors' corpus scan out of the scoring plan.
    lt = (
        toks.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    vocab_rows = [
        r.token
        for r in (
            lt.groupBy("token")
            .agg(F.sum("c").alias("n"))
            .where(F.col("n") >= min_count)
            .orderBy(F.desc("n"), "token")
            .limit(vocab_size)
            .select("token")
        ).collect()
    ]
    vocab = local_df(spark, [(t,) for t in vocab_rows], "token string")
    v_plus = len(vocab_rows) + 1  # +1: the shared OOV bucket

    label_tp = df.schema[label_col].dataType.simpleString()
    count_rows = lt.join(F.broadcast(vocab), "token").collect()
    counts = local_df(
        spark,
        [(r.label, r.token, r.c) for r in count_rows],
        f"label {label_tp}, token string, c bigint",
    )
    totals = counts.groupBy("label").agg(F.sum("c").alias("tot"))
    label_rows = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    n_total = sum(r.n_docs for r in label_rows)
    priors = (
        local_df(
            spark,
            [(r.label, r.n_docs) for r in label_rows],
            f"label {label_tp}, n_docs bigint",
        )
        .join(F.broadcast(totals), "label", "left")
        .select(
            "label",
            F.log(F.col("n_docs") / F.lit(float(n_total))).alias("log_prior"),
            F.log(
                F.lit(1.0)
                / (F.coalesce(F.col("tot"), F.lit(0)) + F.lit(float(v_plus)))
            ).alias("oov_ll"),
            "n_docs",
        )
    )
    likelihood = counts.join(F.broadcast(totals), "label").select(
        "label",
        "token",
        F.log(
            (F.col("c") + F.lit(1.0)) / (F.col("tot") + F.lit(float(v_plus)))
        ).alias("ll"),
    )
    return NbModel(priors=priors, likelihood=likelihood)


def nb_scores(
    df: DataFrame,
    model: NbModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    prec: int = 25,
    scale: int = 6,
) -> DataFrame:
    """(doc_id, label, score): per-class joint log-likelihood for every
    document. Documents with no tokens score log_prior alone for each
    class. Per-term values quantize at decimal(prec,scale) so the sum is
    order-independent."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_tokens(F.col(text_col), lowercase)).alias("token"),
    )
    labeled = toks.crossJoin(
        F.broadcast(model.priors.select("label", "log_prior", "oov_ll"))
    )
    scored = labeled.join(
        F.broadcast(model.likelihood), ["label", "token"], "left"
    ).select(
        "doc_id",
        "label",
        "log_prior",
        F.when(
            F.col("token").isNotNull(),
            F.coalesce(F.col("ll"), F.col("oov_ll")),
        )
        .otherwise(F.lit(0.0))
        .cast(f"decimal({prec},{scale})")
        .alias("term_ll"),
    )
    return scored.groupBy("doc_id", "label").agg(
        (
            F.first("log_prior")
            + F.sum("term_ll").cast("double")
        ).alias("score")
    )


def nb_predict(
    df: DataFrame,
    model: NbModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(doc_id, predicted, score): argmax class per document, ties on
    score break on label ascending."""
    from pyspark.sql.window import Window

    scores = nb_scores(df, model, text_col, id_col, lowercase)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scores.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("doc_id", F.col("label").alias("predicted"), "score")
    )

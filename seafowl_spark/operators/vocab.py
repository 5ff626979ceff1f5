"""Corpus vocabulary building and unigram-LM document scoring.

The two-stage shape every tokenizer/quality pipeline runs:

* :func:`build_vocab` — corpus-global token counts with optional top-K
  truncation and minimum-count floor. One hash-partitioned aggregate over
  exploded tokens; map-side partial aggregation means the shuffle carries
  (token, partial_count) pairs, not token instances, so the exchanged
  bytes scale with DISTINCT tokens per partition, not corpus size.
* :func:`unigram_logprob` — per-document average negative log probability
  under the corpus unigram model (the cheap perplexity proxy used to rank
  documents before an expensive LM pass). The vocabulary joins back as a
  broadcast when it is small (top-K capped vocabularies always are) —
  Spark's planner picks broadcast vs shuffled hash join by size, so the
  100 TB behavior degrades gracefully if someone scores against an
  uncapped vocab.

Out-of-vocabulary tokens get a configurable floor probability (add-one
style over the corpus total), so documents full of unseen junk score
badly instead of crashing the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
    min_count: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """``(token, n)`` corpus counts, descending; ties break on token so
    the result is deterministic. ``top_k`` truncates after ordering."""
    tok = F.explode(_tokens(F.col(text_col))).alias("token")
    counts = (
        df.select(tok)
        .select(F.lower(F.col("token")).alias("token") if lowercase else F.col("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "token")
    )
    return counts.limit(top_k) if top_k is not None else counts


def unigram_logprob(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Score each document by mean -ln p(token) under the unigram model
    defined by ``vocab`` (`(token, n)` as from :func:`build_vocab`).

    OOV tokens take the add-one floor 1/(total+1). Adds ``n_scored``
    (token instances) and ``avg_neg_logprob`` (lower = more typical of
    the corpus; the standard cheap quality rank).

    The mean is a DECIMAL(25,6) sum over count: quantizing each -ln p at
    1e-6 absorbs libm last-bit differences and makes the sum independent
    of partial-sum order, so scores are bit-reproducible across runs and
    engines (the t_vocab_unigram oracle mirrors the same cast).
    """
    total = vocab.agg(F.sum("n").alias("total"))
    tok_col = F.explode(_tokens(F.col(text_col))).alias("token")
    toks = df.select(F.col(id_col), tok_col)
    if lowercase:
        toks = toks.select(id_col, F.lower(F.col("token")).alias("token"))
    scored = (
        toks.join(vocab, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (
                -F.log(
                    F.coalesce(F.col("n").cast("double"), F.lit(1.0))
                    / (F.col("total") + 1)
                )
            ).alias("nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        (
            F.sum(F.col("nlp").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_neg_logprob"),
    )

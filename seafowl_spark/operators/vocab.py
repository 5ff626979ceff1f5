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
    tokens_col: str | None = None,
) -> DataFrame:
    """``(token, n)`` corpus counts, descending; ties break on token so
    the result is deterministic. ``top_k`` truncates after ordering.

    ``tokens_col`` (r14, guide §4.2 pass fusion): name of a column
    already holding the tokenized (and, when ``lowercase``, lowercased)
    token array — callers that tokenize once and feed several model
    stages pass it so this stage re-reads the shared pass instead of
    re-splitting the corpus. lower(token-of-split) == token-of-split on
    pre-lowered arrays by construction (the caller owns that contract).
    """
    if tokens_col is not None:
        toks = df.select(F.explode(F.col(tokens_col)).alias("token"))
    else:
        toks = df.select(
            F.explode(_tokens(F.col(text_col))).alias("token")
        ).select(
            F.lower(F.col("token")).alias("token")
            if lowercase
            else F.col("token")
        )
    counts = (
        toks.groupBy("token")
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
    tokens_col: str | None = None,
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
    if tokens_col is not None:
        # shared-pass fusion (r14): the caller tokenized (and lowered)
        # once for every model stage — see build_vocab's contract
        toks = df.select(
            F.col(id_col), F.explode(F.col(tokens_col)).alias("token")
        )
    else:
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


# --------------------------------------------------------------------------
# Bigram LM with interpolated smoothing (the CCNet-style perplexity gate)
# --------------------------------------------------------------------------

BOS = "<s>"
UNK = "<unk>"


def _pairs(text_col, lowercase: bool, tokens_col: str | None = None):
    """Row-local (prev, cur) adjacent-token pairs incl. a <s> start pair —
    zip of the token array with its own tail, NO shuffle and no per-token
    join for pair formation (the doc-keyed window alternative shuffles the
    whole token stream by document). ``tokens_col`` (r14): a column
    already holding filter(split(lower(text), '\\s+')) — the shared-pass
    contract (the array must be the lower-then-split form this function
    would otherwise compute)."""
    if tokens_col is not None:
        toks = F.col(tokens_col)
    else:
        base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
        toks = F.filter(F.split(base, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    body = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    start = F.when(
        n > 0,
        F.array(
            F.struct(
                F.lit(BOS).alias("prev"), F.element_at(toks, 1).alias("cur")
            )
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    return F.concat(start, body)


def _with_unk_mapped(df: DataFrame, vocab: DataFrame, cols: list[str]) -> DataFrame:
    """Map each of ``cols`` to itself if in-vocab else <unk> (<s> passes
    through) via one broadcast HASH join per column — O(1) membership per
    row; an array_contains against a collected vocab would scan O(V) per
    row, 4096 comparisons at the default size."""
    out = df
    for c in cols:
        probe = f"__v_{c}"
        vv = vocab.select(F.col("token").alias(probe)).distinct()
        out = (
            out.join(F.broadcast(vv), out[c] == F.col(probe), "left")
            .withColumn(
                c,
                F.when(
                    (F.col(c) == BOS) | F.col(probe).isNotNull(), F.col(c)
                ).otherwise(F.lit(UNK)),
            )
            .drop(probe)
        )
    return out


def fit_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    min_count: int = 1,
    lowercase: bool = True,
    vocab: DataFrame | None = None,
    tokens_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the model: returns ``(vocab, bigrams)`` where vocab is
    build_vocab's (token, n) capped at ``vocab_size`` and bigrams is
    (prev, cur, c, c_ctx) over UNK-mapped adjacent pairs (plus a <s>
    start context per document).

    Scale: pair formation is row-local (:func:`_pairs`); the only
    shuffles are the vocab count and the bigram count, both carrying
    map-side partials bounded by DISTINCT (mapped) keys — the UNK mapping
    caps the bigram key space at (vocab_size+2)^2 and real corpora sit
    far below it. UNK mapping is one broadcast hash join per pair side
    (vocab-bounded, O(1) membership per row — the same contract as
    unigram_logprob's broadcast join)."""
    if vocab is None:
        vocab = build_vocab(
            df, text_col=text_col, top_k=vocab_size, min_count=min_count,
            lowercase=lowercase,
        )
    pairs = _with_unk_mapped(
        df.select(
            F.explode(_pairs(text_col, lowercase, tokens_col)).alias("p")
        ).select(
            F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
        ),
        vocab,
        ["prev", "cur"],
    )
    counts = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    # context totals via a WINDOW over the aggregated counts — one pass.
    # An aggregate-and-join-back (ctx = counts.groupBy...; counts.join(ctx))
    # references the counts subtree twice, re-executing the corpus-sized
    # pair scan for each side (the repo's recorded double-subtree trap,
    # measured 4.5x on BM25); the window reuses counts' own partitioning.
    from pyspark.sql.window import Window

    return vocab, counts.withColumn(
        "c_ctx", F.sum("c").over(Window.partitionBy("prev"))
    )


def bigram_logprob(
    df: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.8,
    lowercase: bool = True,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document mean -ln p(cur | prev) under the interpolated bigram
    model: ``p = lam * c(prev,cur)/c_ctx(prev) + (1-lam) * p_uni(cur)``
    with add-one unigram smoothing ``p_uni(w) = (n_w + 1)/(total + V + 1)``
    over the UNK-mapped vocabulary — the cheap KenLM-perplexity stand-in
    CCNet-style pipelines gate on. Adds ``n_scored`` and
    ``avg_neg_logprob`` (lower = more corpus-typical).

    Scale: pairs form row-locally; the model joins are all vocab-bounded
    broadcasts; the per-doc mean is one aggregate. Decimal-quantized
    -ln p sums keep scores bit-reproducible (the unigram_logprob rule).
    """
    stats = vocab.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__vsz")
    )
    mapped = _with_unk_mapped(
        df.select(
            F.col(id_col),
            F.explode(_pairs(text_col, lowercase, tokens_col)).alias("p"),
        ).select(
            id_col,
            F.col("p.prev").alias("prev"),
            F.col("p.cur").alias("cur"),
        ),
        vocab,
        ["prev", "cur"],
    )
    joined = (
        mapped.join(
            F.broadcast(bigrams.select("prev", "cur", "c", "c_ctx")),
            ["prev", "cur"],
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("token").alias("cur"), "n")),
            "cur",
            "left",
        )
        .crossJoin(F.broadcast(stats))
    )
    p_uni = (F.coalesce(F.col("n"), F.lit(0)) + 1) / (
        F.col("__total") + F.col("__vsz") + 1
    )
    p_big = F.when(
        F.col("c_ctx").isNotNull(),
        F.col("c") / F.col("c_ctx"),
    ).otherwise(F.lit(0.0))
    p = F.lit(lam) * F.coalesce(p_big, F.lit(0.0)) + F.lit(1.0 - lam) * p_uni
    scored = joined.select(id_col, (-F.log(p)).alias("nlp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        (
            F.sum(F.col("nlp").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_neg_logprob"),
    )

"""Within-document repetition metrics — the Gopher-style quality filters
(duplicate-line fraction, duplicate n-gram fraction, top-n-gram mass) used
to drop template/boilerplate/spam documents from training corpora.

One Arrow-batched pass per document computes every metric (r14, guide
§4.2). The r4-r13 implementation was pure JVM column expressions — but
all of them were higher-order functions (transform / filter /
array_distinct / two aggregate folds carrying structs), which Spark
executes INTERPRETED per element, with each output column re-evaluating
the shared token/ngram arrays (no codegen, no subexpression elimination
across interpreted projections). Profiled at sf0.1: 53 s of task CPU in
the one projection stage — the whole cost of the operator at 100 TB.
The Arrow pass tokenizes once and computes all four metrics with Python
sets/Counter over the batch; the same trade the r13 minhash rewrite
made (~10x task CPU there).

Exactness contract (the t_repetition oracle hash-grades this): every
metric is an integer ratio — num/den division of exact ints is the same
IEEE-754 operation in the JVM and Python — and the tokenizer is the
same literal-space split with trailing empties kept then filtered
(Java split(text, " ", -1) == Python text.split(' ')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metrics_udf(ngram_n: int):
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(
        "dup_token_frac double, dup_ngram_frac double, "
        "top_ngram_frac double, max_run_len bigint"
    )
    def metrics(texts):
        from collections import Counter

        import pandas as pd

        dtf, dnf, tnf, mrl = [], [], [], []
        for t in texts:
            if t is None or (isinstance(t, float) and t != t):
                # NULL text: size(NULL)/aggregate(NULL) semantics of the
                # old expressions — fractions take the otherwise(0.0)
                # branch, the run fold yields NULL
                dtf.append(0.0)
                dnf.append(0.0)
                tnf.append(0.0)
                mrl.append(None)
                continue
            toks = [x for x in t.split(" ") if x != ""]
            n = len(toks)
            dtf.append((n - len(set(toks))) / n if n > 0 else 0.0)
            if n >= ngram_n:
                ng_counts = Counter(
                    " ".join(toks[i : i + ngram_n])
                    for i in range(n - ngram_n + 1)
                )
                m = n - ngram_n + 1
                dnf.append((m - len(ng_counts)) / m)
                tnf.append(max(ng_counts.values()) / m)
            else:
                dnf.append(0.0)
                tnf.append(0.0)
            best = run = 0
            prev = None
            for x in toks:
                run = run + 1 if x == prev else 1
                prev = x
                if run > best:
                    best = run
            mrl.append(best)
        return pd.DataFrame(
            {
                "dup_token_frac": dtf,
                "dup_ngram_frac": dnf,
                "top_ngram_frac": tnf,
                "max_run_len": pd.array(mrl, dtype="Int64"),
            }
        )

    return metrics


def repetition_metrics(
    df: DataFrame, text_col: str = "text", ngram_n: int = 3
) -> DataFrame:
    """Adds per-document repetition signals:

    * ``dup_token_frac`` — 1 - distinct/total tokens (type-token inverse);
    * ``dup_ngram_frac`` — fraction of n-gram INSTANCES that are repeats
      of an earlier instance (0 when every n-gram is unique);
    * ``top_ngram_frac`` — share of n-gram instances taken by the single
      most frequent n-gram (boilerplate mass);
    * ``max_run_len`` — longest run of the same token repeated
      consecutively (catches "buy buy buy ..." spam).

    Thresholding these (e.g. drop docs with dup_ngram_frac > 0.3) is the
    standard repetition gate in corpus quality pipelines.

    One ArrowEvalPython projection over just the text column — row-local,
    no shuffle; tokenization happens once per document and all four
    metrics come out of the same pass (see the module docstring for the
    interpreted-HOF history and the exactness contract).
    """
    m = _metrics_udf(ngram_n)(F.col(text_col))
    out = df.select("*", m.alias("__sfs_rep"))
    return out.select(
        *[c for c in df.columns],
        F.col("__sfs_rep.dup_token_frac").alias("dup_token_frac"),
        F.col("__sfs_rep.dup_ngram_frac").alias("dup_ngram_frac"),
        F.col("__sfs_rep.top_ngram_frac").alias("top_ngram_frac"),
        F.col("__sfs_rep.max_run_len").alias("max_run_len"),
    )

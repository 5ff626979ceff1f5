"""Arrow-batched BPE encoding UDF.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and postponed (string) annotations break its signature
inspection (same constraint as functions/vec.py).

The merge-rank table lives in the UDF closure (the codebook-as-closure
design operators/kmeans.py and operators/pq.py use): the plan stays O(1)
in vocabulary size, and the per-batch work is plain dict lookups with a
per-distinct-word memo — real corpora repeat words constantly, so each
batch encodes its distinct words once.
"""

import re

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf

# ASCII \s+ — Java regex \s (what learn_bpe's F.split uses) is ASCII-only,
# while Python str.split() splits Unicode whitespace; encoding MUST
# tokenize identically to training or segmentations diverge on e.g. NBSP
_WS = re.compile(r"\s+", re.ASCII)


def _encode_word(word: str, ranks: dict) -> list:
    """Greedy reference BPE apply: repeatedly merge the lowest-rank
    adjacent pair (left-to-right within a rank) until none applies.
    Identical to iterating the training merges in order — training
    rounds ARE rank order."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        # merge every non-overlapping (a, b) left-to-right, matching the
        # training round's JVM fold semantics
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_udf(merges, lowercase: bool = True):
    """string -> array<string>: whitespace pre-tokenize, then apply the
    learned merges per word (end-of-word marker ``</w>`` on the final
    symbol, matching training)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(text: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = []
            for w in _WS.split(t.lower() if lowercase else t):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return encode

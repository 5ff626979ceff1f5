"""Vectorized (Arrow-batched) vector math UDFs.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and postponed (string) annotations break its signature
inspection.

Bit-exactness contract: every reduction is a fixed-order loop over
dimensions with float64 elementwise ops — identical results to a SQL
left-fold chain `0.0 + x1 + x2 + ...` (no BLAS reduction-order
nondeterminism), so outputs can be compared across engines and runs.
"""

import math

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


def _centroid_scores(X: np.ndarray, cents: np.ndarray, metric: str) -> np.ndarray:
    """(n, k) score matrix with fixed per-dimension accumulation order —
    bit-identical to the SQL left-fold chain over dimensions. 'dot' scores
    higher-is-nearer; 'l2' is squared L2 distance, lower-is-nearer."""
    acc = np.zeros((len(X), len(cents)), dtype=np.float64)
    if metric == "dot":
        for i in range(X.shape[1]):
            acc += X[:, i : i + 1] * cents[:, i][None, :]
    elif metric == "l2":
        for i in range(X.shape[1]):
            d = X[:, i : i + 1] - cents[:, i][None, :]
            acc += d * d
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return acc


def nearest_centroid_udf(centroids, metric: str = "dot"):
    """array<double> -> long: nearest-centroid index. The codebook lives
    in this closure as a numpy array — broadcast to executors with the
    serialized UDF, so the PLAN stays O(1) in k (the k-literals-in-one-
    projection shape blows past codegen method limits at real codebook
    sizes). 'dot': max dot product, first max wins. 'l2': min squared L2,
    first min wins — both matching a ROW_NUMBER (score, cid) oracle."""
    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("long")
    def cell_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        acc = _centroid_scores(X, cents, metric)
        best = np.argmax(acc, axis=1) if metric == "dot" else np.argmin(acc, axis=1)
        return pd.Series(best)

    return cell_of


def nearest_cells_udf(centroids, nprobe: int, metric: str = "l2"):
    """array<double> -> array<long>: the ``nprobe`` nearest centroid
    indices, nearest first, index-ascending on ties (stable mergesort ==
    the oracle's (d ASC, cid) ROW_NUMBER). Codebook in the closure, as
    above — the IVF query-probe step at any k."""
    cents = np.asarray(centroids, dtype=np.float64)
    n_out = min(nprobe, len(cents))

    @pandas_udf("array<long>")
    def cells_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        acc = _centroid_scores(X, cents, metric)
        if metric == "dot":
            acc = -acc
        order = np.argsort(acc, axis=1, kind="stable")[:, :n_out]
        return pd.Series(list(order.astype(np.int64)))

    return cells_of


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


def simhash64_udf():
    """string -> struct<simhash_lo long, simhash_hi long>: row-local 64-bit
    SimHash (two 32-bit halves from md5 bytes [0:4) / [4:8), +/-1 majority
    vote per bit over single-space tokens, ties set the bit).

    Bit-identical to the explode -> 64-partial-sums construction (and to
    the oracle's unnest/sum SQL): the vote is integer counting, and the
    token hash int.from_bytes(md5[0:4]) == conv(substr(md5_hex,1,8),16,10).
    Token-less documents yield NULL halves (the aggregate construction
    emits no row for them); callers filter NULLs to match.

    Scale: the signature never shuffles — it is computed where the
    document lives, Arrow batch in, two longs out. The batch is processed
    as ONE flat token array (bit matrix + add.reduceat over per-doc
    segments), not per-document numpy calls — tiny-array overhead, not
    md5, dominates otherwise.
    """
    import hashlib

    @pandas_udf("simhash_lo long, simhash_hi long")
    def simhash64(text: pd.Series) -> pd.DataFrame:
        md5 = hashlib.md5
        n = len(text)
        # flatten: token hashes for all docs, contiguous per doc. md5 is
        # memoized per batch (r13): natural text repeats tokens heavily,
        # so the hash count drops to the batch's unique-token count.
        memo: dict = {}
        offsets, lo_flat, hi_flat, doc_pos = [], [], [], []
        for i, t in enumerate(text):
            toks = t.split(" ") if t is not None else []
            k0 = len(lo_flat)
            for x in toks:
                if x:
                    hs = memo.get(x)
                    if hs is None:
                        d = md5(x.encode()).digest()
                        hs = (
                            int.from_bytes(d[0:4], "big"),
                            int.from_bytes(d[4:8], "big"),
                        )
                        memo[x] = hs
                    lo_flat.append(hs[0])
                    hi_flat.append(hs[1])
            if len(lo_flat) > k0:
                offsets.append(k0)
                doc_pos.append(i)
        out_lo = np.full(n, np.nan)
        out_hi = np.full(n, np.nan)
        if doc_pos:
            offs = np.asarray(offsets, dtype=np.intp)
            pos = np.asarray(doc_pos, dtype=np.intp)
            ends = np.append(offs[1:], len(lo_flat))
            n_toks = (ends - offs).astype(np.int64)
            weights = (1 << np.arange(32, dtype=np.int64))
            for flat, out in ((lo_flat, out_lo), (hi_flat, out_hi)):
                hv = np.asarray(flat, dtype=np.int64)
                bits = (hv[:, None] >> np.arange(32)) & 1  # (T, 32)
                cnt = np.add.reduceat(bits, offs, axis=0)  # (docs, 32)
                sig = ((2 * cnt >= n_toks[:, None]) * weights).sum(axis=1)
                out[pos] = sig
        return pd.DataFrame(
            {"simhash_lo": pd.array(out_lo, dtype="Int64"),
             "simhash_hi": pd.array(out_hi, dtype="Int64")}
        )

    return simhash64


def minhash_sigs_py(
    texts, perm_a, perm_b, prime: int, n_shingle: int = 3, split: str = "space"
):
    """list[str|None] -> list[list[int] | None] MinHash signatures — THE
    Python body :func:`minhash_sigs_udf` maps over Arrow batches, callable
    driver-side for driver-bounded probe batches (the LSH index serving
    fast path): one code path, so a driver-computed probe signature is
    bit-identical to the executor-computed corpus signatures by
    construction. Docs with fewer than ``n_shingle`` tokens yield None.
    """
    import hashlib
    import re

    A = [int(a) for a in perm_a]
    B = [int(b) for b in perm_b]
    P = int(prime)
    nperm = len(A)
    ws_re = re.compile(r"[ \t\n\x0b\f\r]+") if split == "ascii_ws" else None
    md5 = hashlib.md5
    memo: dict = {}
    flat: list = []
    offs: list = []
    doc_pos: list = []
    n = len(texts)
    for i, t in enumerate(texts):
        if t is None:
            toks = []
        elif ws_re is not None:
            toks = [x for x in ws_re.split(t) if x]
        else:
            toks = [x for x in t.split(" ") if x]
        if len(toks) < n_shingle:
            continue
        seen = set()
        k0 = len(flat)
        for j in range(len(toks) - n_shingle + 1):
            s = " ".join(toks[j : j + n_shingle])
            if s in seen:
                continue
            seen.add(s)
            h = memo.get(s)
            if h is None:
                h = int.from_bytes(md5(s.encode()).digest()[:4], "big")
                memo[s] = h
            flat.append(h)
        if len(flat) > k0:
            offs.append(k0)
            doc_pos.append(i)
    out: list = [None] * n
    if doc_pos:
        H = np.asarray(flat, dtype=np.int64)
        offs_a = np.asarray(offs, dtype=np.intp)
        mins = np.empty((nperm, len(offs_a)), dtype=np.int64)
        for p in range(nperm):
            mins[p] = np.minimum.reduceat((A[p] * H + B[p]) % P, offs_a)
        for col, i in enumerate(doc_pos):
            out[i] = mins[:, col].tolist()
    return out


def minhash_sigs_udf(
    perm_a,
    perm_b,
    prime: int,
    n_shingle: int = 3,
    split: str = "space",
    empty: str = "nulls",
):
    """string -> array<long> MinHash signature, bit-identical to the JVM
    expression chain it replaces (r13, guide §4.2):

        toks     = filter(split(text, ' '), t -> t <> '')
        shingles = distinct 3-token windows joined with ' '   (n >= 3 else [])
        h        = conv(substr(md5(shingle), 1, 8), 16, 10)   (< 2^32)
        sig[i]   = min over shingles of (a_i * h + b_i) % prime

    Every step is exact integer arithmetic: Python md5 hex == Spark md5,
    int64 products stay below 2^62 (a < 2^30, h < 2^32), so the numpy
    path cannot diverge from the SQL fold. Shingle hashes are memoized
    per batch (natural text repeats shingles heavily) and the per-doc
    minima run as one reduceat per permutation over the batch-flat hash
    array — the tiny-array-per-doc overhead, not md5, dominates
    otherwise. Docs with no shingles yield an all-NULL signature, same
    as array_min over an empty array.

    Why a UDF at all: Spark's higher-order functions (transform /
    array_min) execute interpreted per element — profiling the previous
    chain showed 16 s of task CPU at sf0.1 (5k docs); this path is ~10x
    cheaper and frees the plan of a 16-lambda projection.

    ``split`` selects the tokenizer: "space" = the engine's literal
    single-space split (queries/similarity.py), "ascii_ws" = the
    cross-corpus operator's \\s+ regex split — Java's \\s is the ASCII
    class [ \\t\\n\\x0B\\f\\r] (no Unicode whitespace), matched here with
    an explicit class, NOT Python's Unicode-aware \\s. ``empty`` selects
    what a doc with no shingles yields: "nulls" = an all-NULL signature
    (array_min over an empty array), "drop" = a NULL row the caller
    filters — the twin of filtering size(toks) >= 3 before signing.
    """
    nperm = len(perm_a)

    @pandas_udf("array<long>")
    def sigs_of(text: pd.Series) -> pd.Series:
        out = minhash_sigs_py(
            list(text), perm_a, perm_b, prime, n_shingle, split
        )
        if empty == "drop":
            return pd.Series(out)
        nulls = [None] * nperm
        return pd.Series([v if v is not None else list(nulls) for v in out])

    return sigs_of


def shingle_hashes_udf(n_shingle: int = 3):
    """string -> array<long>: md5-int hashes of the doc's DISTINCT 3-token
    shingles — the Arrow-batched twin of
    list_transform(shingles, s -> conv(substr(md5(s),1,8),16,10)) over the
    staged shingle projection (r13, guide §4.2). Shingles are deduplicated
    as STRINGS (exactly array_distinct's semantics — two distinct shingles
    colliding to one 32-bit hash still emit two equal array elements), md5
    is memoized per batch, and docs with < 3 tokens yield an empty array
    (explode drops them, same as before). Tokenization is the engine's
    literal single-space split with empties filtered."""
    import hashlib

    @pandas_udf("array<long>")
    def hashes_of(text: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        memo: dict = {}
        out = []
        for t in text:
            toks = [x for x in t.split(" ") if x] if t is not None else []
            if len(toks) < n_shingle:
                out.append([])
                continue
            seen = set()
            hh = []
            for j in range(len(toks) - n_shingle + 1):
                s = " ".join(toks[j : j + n_shingle])
                if s in seen:
                    continue
                seen.add(s)
                h = memo.get(s)
                if h is None:
                    h = int.from_bytes(md5(s.encode()).digest()[:4], "big")
                    memo[s] = h
                hh.append(h)
            out.append(hh)
        return pd.Series(out)

    return hashes_of


def pq_encode_udf(codebooks):
    """array<double> -> array<int>: per-subspace nearest-centroid codes
    (product quantization). ``codebooks`` is (m, ksub, dsub); the whole
    (m x ksub x dsub) table rides in the closure, so the plan stays O(1)
    in both m and ksub. Distances use the same fixed-order accumulation
    as nearest_centroid_udf; ties pick the lowest code."""
    books = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _ksub, dsub = books.shape

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)  # (n, dim)
        codes = np.zeros((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            acc = _centroid_scores(sub, books[j], "l2")
            codes[:, j] = np.argmin(acc, axis=1)
        return pd.Series(list(codes))

    return encode


def pq_lut_udf(codebooks):
    """array<double> -> array<array<double>>: the query-side ADC lookup
    table — LUT[j][c] = dot(query_sub_j, codebooks[j][c]) with fixed-order
    accumulation. An encoded corpus vector's approximate dot product with
    the query is then sum_j LUT[j][code_j], pure JVM array math on the
    corpus side."""
    books = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _ksub, dsub = books.shape

    @pandas_udf("array<array<double>>")
    def lut(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        out = []
        tables = np.zeros((len(X), m, books.shape[1]), dtype=np.float64)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            tables[:, j, :] = _centroid_scores(sub, books[j], "dot")
        for row in tables:
            out.append([list(r) for r in row])
        return pd.Series(out)

    return lut


def _group_centroids(cents: np.ndarray, m: int, iters: int = 5):
    """Driver-side grouping of k centroids into m super-centroids
    (deterministic Lloyd's: init = evenly-strided centroids, ties to the
    lower index). k is codebook-sized, so this is microseconds of numpy —
    no Spark job, no randomness."""
    sup = cents[:: max(len(cents) // m, 1)][:m].copy()
    for _ in range(iters):
        d = ((cents[:, None, :] - sup[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for g in range(len(sup)):
            members = cents[assign == g]
            if len(members):
                sup[g] = members.mean(axis=0)
    d = ((cents[:, None, :] - sup[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d, axis=1)
    groups = [np.where(assign == g)[0] for g in range(len(sup))]
    return sup, groups


def hierarchical_nearest_centroid_udf(
    centroids, metric: str = "dot", nprobe: int = 2
):
    """Approximate nearest-centroid index in O(nprobe * sqrt(k)) scores
    per row instead of O(k): centroids are pre-grouped (driver-side)
    under ~sqrt(k) super-centroids; each row probes its ``nprobe``
    closest super-groups and takes the best member centroid. The classic
    two-level k-means trick — the scale answer when brute-force
    assignment's n x k dot products dominate (e.g. SemDeDup with
    corpus-scaled k). Approximate by construction: the true nearest
    centroid can live in an unprobed group; raise ``nprobe`` to trade
    work for agreement (test_kmeans.py pins the agreement rate)."""
    cents = np.asarray(centroids, dtype=np.float64)
    m = max(int(math.isqrt(len(cents))), 1)
    nprobe = min(nprobe, m)
    sup, groups = _group_centroids(cents, m)

    @pandas_udf("long")
    def cell_of(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.values)
        sup_scores = _centroid_scores(X, sup, metric)
        order = (
            np.argsort(-sup_scores, axis=1)
            if metric == "dot"
            else np.argsort(sup_scores, axis=1)
        )[:, :nprobe]
        worst = -np.inf if metric == "dot" else np.inf
        best_score = np.full(len(X), worst)
        best_cell = np.zeros(len(X), dtype=np.int64)
        for g, members in enumerate(groups):
            if len(members) == 0:
                continue
            rows = np.nonzero((order == g).any(axis=1))[0]
            if len(rows) == 0:
                continue
            sc = _centroid_scores(X[rows], cents[members], metric)
            if metric == "dot":
                loc = np.argmax(sc, axis=1)
                val = sc[np.arange(len(rows)), loc]
                upd = (val > best_score[rows]) | (
                    (val == best_score[rows])
                    & (members[loc] < best_cell[rows])
                )
            else:
                loc = np.argmin(sc, axis=1)
                val = sc[np.arange(len(rows)), loc]
                upd = (val < best_score[rows]) | (
                    (val == best_score[rows])
                    & (members[loc] < best_cell[rows])
                )
            r = rows[upd]
            best_score[r] = val[upd]
            best_cell[r] = members[loc][upd]
        return pd.Series(best_cell)

    return cell_of

def span_hashes_udf(span_tokens: int, stride: int = 1, nhex: int = 15):
    """string -> array<struct<pos:int, span_hash:long>>: positional
    md5-int hashes of every ``span_tokens``-token window (r14, guide
    §4.2) — the Arrow-batched twin of

        transform(sequence(0, size(toks) - span, stride),
                  s -> struct(s, conv(substr(md5(join(slice(...))),1,nhex),16,10)))

    which Spark executes interpreted per element: the span join + md5
    per window was the hottest stage of t_substring_dedup (14 s of task
    CPU at sf0.1). Values are bit-identical: the window string is the
    same ' '-joined token slice, Python md5 hex == Spark md5, and the
    first ``nhex`` hex digits read as an int equal conv(...,16,10)
    (60 bits at the default 15 — the caller's collision-safety bound).
    Tokenization is the operator's \\s+ split — Java's \\s is the ASCII
    class [ \\t\\n\\x0B\\f\\r], matched here explicitly, NOT Python's
    Unicode-aware \\s. Docs with fewer than ``span_tokens`` tokens yield
    an empty array (explode drops them, exactly the size(toks) >= span
    pre-filter)."""
    import hashlib
    import re

    shift = 4 * (32 - nhex)  # md5 digest is 32 hex digits

    @pandas_udf(f"array<struct<pos:int, span_hash:long>>")
    def spans_of(text: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
        memo: dict = {}
        out = []
        for t in text:
            toks = [x for x in ws_re.split(t) if x] if t is not None else []
            if len(toks) < span_tokens:
                out.append([])
                continue
            rows = []
            for s in range(0, len(toks) - span_tokens + 1, stride):
                w = " ".join(toks[s : s + span_tokens])
                h = memo.get(w)
                if h is None:
                    h = int.from_bytes(md5(w.encode()).digest(), "big") >> shift
                    memo[w] = h
                rows.append((s, h))
            out.append(rows)
        return pd.Series(out)

    return spans_of

"""Property-based tests (hypothesis) for the engine's custom logic.

These don't need Spark: pruning and squash are pure Python, so hundreds of
randomized cases run in seconds.

1. Pruning soundness: a file dropped by prune_files must contain NO row
   matching the predicate (conservativeness is the correctness contract —
   rewrites re-apply the predicate, so over-keeping is fine, over-pruning
   is data corruption).
2. Sync squash equivalence: squashing a random change sequence must yield
   the same final table state as applying every change one at a time to a
   naive dict model.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from seafowl_spark.engine.deltalite import AddFile
from seafowl_spark.engine.pruning import parse_predicate, prune_files
from seafowl_spark.streaming.sync import ColumnDescriptor, SyncSchema, SyncWriter

# --------------------------------------------------------------------------
# 1. pruning soundness
# --------------------------------------------------------------------------

_vals = st.integers(min_value=-50, max_value=50)


@st.composite
def _file_rows(draw):
    return draw(st.lists(_vals, min_size=1, max_size=6))


@st.composite
def _predicate(draw):
    depth = draw(st.integers(0, 2))

    def atom():
        op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "<>"]))
        lit = draw(_vals)
        return f"k {op} {lit}"

    def build(d):
        if d == 0:
            return atom()
        kind = draw(st.sampled_from(["and", "or", "not", "atom", "in", "between"]))
        if kind == "atom":
            return atom()
        if kind == "not":
            return f"NOT ({build(d - 1)})"
        if kind == "in":
            vs = draw(st.lists(_vals, min_size=1, max_size=4))
            return f"k IN ({', '.join(map(str, vs))})"
        if kind == "between":
            a, b = sorted((draw(_vals), draw(_vals)))
            return f"k BETWEEN {a} AND {b}"
        return f"({build(d - 1)}) {kind.upper()} ({build(d - 1)})"

    return build(depth)


def _matches(pred_sql: str, value: int) -> bool:
    """Ground truth via DuckDB evaluation of the same predicate text."""
    import duckdb

    out = duckdb.sql(f"SELECT ({pred_sql}) FROM (SELECT {value} AS k)").fetchone()[0]
    return bool(out)


@given(files=st.lists(_file_rows(), min_size=1, max_size=5), pred=_predicate())
@settings(max_examples=200, deadline=None)
def test_pruning_never_drops_matching_rows(files, pred):
    adds = []
    for i, rows_ in enumerate(files):
        adds.append(
            AddFile(
                path=f"f{i}.parquet",
                rows=len(rows_),
                size_bytes=0,
                stats={"k": {"min": min(rows_), "max": max(rows_), "nulls": 0}},
            )
        )
    kept = {f.path for f in prune_files(adds, pred)}
    ast = parse_predicate(pred)
    if ast is None:
        assert kept == {f.path for f in adds}  # unparseable -> keep all
        return
    for add, rows_ in zip(adds, files):
        if add.path not in kept:
            assert not any(_matches(pred, v) for v in rows_), (
                f"pruned file {add.path} with rows {rows_} matching {pred!r}"
            )


# --------------------------------------------------------------------------
# 2. sync squash equivalence
# --------------------------------------------------------------------------

_SCHEMA = SyncSchema(
    [
        ColumnDescriptor("old_pk", "old_pk", "pk"),
        ColumnDescriptor("new_pk", "new_pk", "pk"),
        ColumnDescriptor("v", "value", "v"),
    ]
)

_pk = st.integers(min_value=0, max_value=6)


@st.composite
def _change(draw):
    kind = draw(st.sampled_from(["insert", "update", "move", "delete"]))
    if kind == "insert":
        return (None, draw(_pk), draw(st.integers(0, 99)))
    if kind == "delete":
        return (draw(_pk), None, None)
    if kind == "move":
        return (draw(_pk), draw(_pk), draw(st.integers(0, 99)))
    pk = draw(_pk)
    return (pk, pk, draw(st.integers(0, 99)))


def _naive_apply(changes):
    state: dict[int, int] = {}
    for old, new, v in changes:
        if old is not None and new is None:
            state.pop(old, None)
        elif new is not None:
            if old is not None and old in state:
                prev = state.pop(old)
                state[new] = v if v is not None else prev
            else:
                state[new] = v
    return state


@given(changes=st.lists(_change(), min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_squash_equals_sequential_apply(changes):
    """Squash(upserts+deletes) applied to an EMPTY base must equal naive
    one-at-a-time application to an empty dict."""
    pdf = pd.DataFrame(changes, columns=["old_pk", "new_pk", "v"], dtype="object")
    upserts, deletes, pk_cols, value_cols = SyncWriter._squash([(_SCHEMA, pdf)])

    expected = _naive_apply(changes)
    got = {pk[0]: vals.get("v") for pk, vals in upserts.items()}
    assert got == expected
    # deletes may over-approximate (deleting absent keys is harmless) but
    # must never contain a key that survives
    for pk in deletes:
        assert pk[0] not in expected or pk in upserts


# --------------------------------------------------------------------------
# LSH scale parameterization (similarity.py): plane counts grow with the
# corpus, hyperplanes are prefix-stable, and bucket sizes are hard-capped.
# --------------------------------------------------------------------------

from seafowl_spark.queries.similarity import (  # noqa: E402
    HYPERPLANES,
    MAX_BUCKET_ROWS,
    MAX_PLANES,
    N_PLANES,
    TARGET_BUCKET_ROWS,
    hyperplanes,
    minhash_bands_for_corpus,
    planes_for_corpus,
)


@given(n=st.integers(min_value=0, max_value=10**13))
@settings(max_examples=300, deadline=None)
def test_planes_bound_expected_bucket_size(n):
    p = planes_for_corpus(n)
    assert N_PLANES <= p <= MAX_PLANES
    # within the representable range, the expected bucket size is bounded
    if p < MAX_PLANES:
        assert n / (1 << p) <= TARGET_BUCKET_ROWS


@given(a=st.integers(min_value=1, max_value=10**12), b=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_planes_monotone_in_corpus(a, b):
    lo, hi = sorted((a, b))
    assert planes_for_corpus(lo) <= planes_for_corpus(hi)


def test_hyperplanes_prefix_stable_and_oracle_constant():
    # oracle SQL is generated from HYPERPLANES: the generator must
    # reproduce it exactly at the floor plane count
    assert hyperplanes(N_PLANES) == HYPERPLANES
    # growing the plane count only appends planes (buckets split, never
    # reshuffle) — the property that keeps recall comparable across sizes
    assert hyperplanes(16)[:N_PLANES] == HYPERPLANES


@given(n=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_minhash_bands_bounded_monotone(n):
    b = minhash_bands_for_corpus(n)
    assert 4 <= b <= 16
    assert b <= minhash_bands_for_corpus(n * 10 + 1)


def test_bucket_cap_bounds_hot_bucket(spark):
    """60 identical vectors all hash to one bucket; with the cap the
    within-bucket join is at most cap^2 pairs, not 60^2."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    cap = 10
    df = spark.range(60).select(
        F.col("id").alias("vec_id"), F.lit(7).alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("vec_id")
    capped = (
        df.withColumn("brn", F.row_number().over(w))
        .where(F.col("brn") <= cap)
        .drop("brn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).count()
    assert pairs == cap * (cap - 1) // 2
    assert MAX_BUCKET_ROWS == 1024  # registry queries use the real cap


# --------------------------------------------------------------------------
# 3. parser totality: any input either parses to a Statement or raises
#    ParseError — never an uncontrolled exception (the frontends turn
#    ParseError into a 400; anything else would be a 500)
# --------------------------------------------------------------------------

_keywords = st.sampled_from(
    ["CREATE", "TABLE", "INSERT", "INTO", "UPDATE", "SET", "DELETE", "FROM",
     "COPY", "TO", "VACUUM", "OPTIMIZE", "ZORDER", "BY", "EXTERNAL", "STORED",
     "AS", "FUNCTION", "DROP", "SCHEMA", "WHERE", "VALUES", "SELECT", "'x'",
     "(", ")", ",", ";", "=", "t", "42", "\"q\"", "--c", "/*", "*/"]
)
_sqlish = st.lists(_keywords, max_size=12).map(" ".join)


@given(st.one_of(st.text(max_size=120), _sqlish))
@settings(max_examples=400, deadline=None)
def test_parse_statement_total(s):
    from seafowl_spark.engine.parser import ParseError, parse_statement

    try:
        stmt = parse_statement(s)
        assert stmt.kind
    except ParseError:
        pass


@given(st.one_of(st.text(max_size=120), _sqlish))
@settings(max_examples=400, deadline=None)
def test_split_statements_total(s):
    from seafowl_spark.engine.parser import split_statements

    parts = split_statements(s)
    assert isinstance(parts, list)
    for p in parts:
        assert p.strip()


# --------------------------------------------------------------------------
# 4. BPE encoder/trainer equivalence
# --------------------------------------------------------------------------
#
# functions/bpe._encode_word applies merges by RANK (repeatedly merging the
# lowest-rank adjacent pair present) — the standard fast-encoder loop. The
# training process instead applies each merge ONCE, in order, across the
# whole vocabulary. The encoder is only correct if both orders produce the
# same segmentation for every word; this is subtle (a later merge can
# create an adjacency whose pair has an earlier rank), so hammer it with
# randomized corpora: train merges with a reference Sennrich trainer, then
# check rank-priority encoding == sequential application for every word.

import collections  # noqa: E402


def _train_merges(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    wc = collections.Counter(words)
    vocab = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_apply_once(list(s), best): c for s, c in vocab.items()}
    return merges


def _apply_once(syms, merge):
    a, b = merge
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
@settings(max_examples=300, deadline=None)
def test_bpe_rank_priority_encoding_equals_sequential_application(
    words, n_merges
):
    from seafowl_spark.functions.bpe import _encode_word

    merges = _train_merges(words, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in set(words):
        sequential = list(w[:-1]) + [w[-1] + "</w>"]
        for m in merges:
            sequential = list(_apply_once(sequential, m))
        assert _encode_word(w, ranks) == sequential, (w, merges)


# --------------------------------------------------------------------------
# 6. r7 session-B operators: featurizer parity, fusion invariance,
#    normalization idempotence — randomized, mirrored in pure Python
# --------------------------------------------------------------------------

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_doc, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_dsir_buckets_match_python_mirror(spark, docs):
    """ngram_buckets == the md5 mirror for arbitrary corpora — the
    featurizer IS the model contract (oracle + python mirror both depend
    on it), so parity must hold beyond the fixed test corpus."""
    import hashlib
    import re as _re

    from seafowl_spark.operators.dsir import ngram_buckets

    b = 16

    def mirror(text):
        toks = [t for t in _re.split(r"\s+", text.lower()) if t]
        h = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % b
        return [h(t) for t in toks] + [
            h(f"{toks[i]} {toks[i+1]}") for i in range(len(toks) - 1)
        ]

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["buckets"]
        for r in ngram_buckets(df, "text", b).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == mirror(d), (i, d)


@given(st.permutations([0, 1, 2]))
@settings(max_examples=6, deadline=None)
def test_rrf_is_invariant_to_list_order(spark, perm):
    """RRF is a sum over lists — fusing [a, b, c] in any order must give
    identical scores and ranks."""
    from seafowl_spark.operators.fusion import rank_topk, rrf_fuse

    lists = [
        spark.createDataFrame(
            [(1, 10 + j, float(5 - j)) for j in range(3)],
            ["query_id", "doc_id", "score"],
        ),
        spark.createDataFrame(
            [(1, 11, 0.9), (1, 20, 0.8)], ["query_id", "doc_id", "score"]
        ),
        spark.createDataFrame(
            [(1, 30, 2.0), (1, 10, 1.0)], ["query_id", "doc_id", "score"]
        ),
    ]
    ranked = [rank_topk(x, 10) for x in lists]
    base = sorted(map(tuple, rrf_fuse(ranked).collect()))
    permuted = sorted(map(tuple, rrf_fuse([ranked[i] for i in perm]).collect()))
    assert base == permuted


@given(st.lists(st.text(max_size=30), min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_normalize_text_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x): the canonical form is a
    fixed point for ANY input — the property that makes it safe to apply
    at every pipeline stage without versioning drift."""
    from pyspark.sql import functions as F

    from seafowl_spark.operators.normalize import normalize_text

    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    out = df.select(
        normalize_text(F.col("t")).alias("once"),
        normalize_text(normalize_text(F.col("t"))).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]


# ---- quoted-identifier name splitting (r7 session C: ANSI "..." parts)

_plain_part = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
_special_part = st.text(
    alphabet=st.characters(
        blacklist_characters='".', min_codepoint=32, max_codepoint=126
    ),
    min_size=1,
    max_size=10,
).filter(lambda s: s.strip())


@given(
    st.lists(
        st.tuples(st.booleans(), st.one_of(_plain_part, _special_part)),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=300, deadline=None)
def test_split_name_parts_round_trip(parts):
    """Rendering parts (quoting any that need or request it) then
    splitting recovers the original parts exactly — including dots and
    specials INSIDE quotes."""
    import re

    from seafowl_spark.engine.parser import split_name_parts

    rendered = []
    for force_quote, p in parts:
        plain = re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", p)
        rendered.append(f'"{p}"' if force_quote or not plain else p)
    got = split_name_parts(".".join(rendered))
    assert got == [p for _, p in parts]


@given(st.lists(st.one_of(_plain_part, _special_part), min_size=1, max_size=3))
@settings(max_examples=300, deadline=None)
def test_parse_qualified_quoted_equals_plain(parts):
    """parse_qualified gives identical results whether every part is
    quoted or only the ones that need it (dots force quoting)."""
    import re

    from seafowl_spark.engine.parser import ParseError, parse_qualified

    all_quoted = ".".join(f'"{p}"' for p in parts)
    minimal = ".".join(
        p if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", p) else f'"{p}"'
        for p in parts
    )
    try:
        a = parse_qualified(all_quoted)
    except ParseError:
        # >3 effective parts (unquoted dots) — must fail both ways
        with __import__("pytest").raises(ParseError):
            parse_qualified(minimal)
        return
    assert a == parse_qualified(minimal)

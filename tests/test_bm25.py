"""BM25 ranking operator (operators/bm25.py): formula parity against a
pure-Python reference implementation, edge cases, and the plan gates that
make it a 100 TB operator (row-local postings, broadcast-only joins)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.bm25 import bm25_topk, build_postings

SF_DIR = "/root/testdata/sf0.001"

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox"),
    (3, "lazy dogs sleep all day the dog barks"),
    (4, "quick quick quick brown foxes"),
    (5, ""),
    (6, "an unrelated document about spark query engines"),
]
QUERIES = [(100, "quick fox"), (200, "lazy dog"), (300, "zebra")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Reference implementation: plain loops, same idf/tf formula, and the
    same per-term decimal(25,6) quantization the Spark side applies so
    near-tie rankings can't diverge on sub-1e-6 score differences."""
    from decimal import ROUND_HALF_UP, Decimal

    def q6(x):
        return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    tok = {d: t.lower().split() for d, t in docs}
    tok = {d: [w for w in t if w] for d, t in tok.items()}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in tok.values()) / n_docs
    df = {}
    for t in tok.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(qtext.lower().split()):
            if term not in df:
                continue
            idf = math.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            for d, words in tok.items():
                tf = words.count(term)
                if not tf:
                    continue
                s = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(words) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + q6(s)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture()
def frames(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(QUERIES, ["query_id", "query_text"])
    return docs, queries


class TestPostings:
    def test_row_local_term_freqs(self, spark, frames):
        docs, _ = frames
        postings, dfreq, stats = build_postings(docs)
        got = {
            (r.term, r.doc_id): (r.tf, r.dl) for r in postings.collect()
        }
        assert got[("quick", 4)] == (3, 5)
        assert got[("the", 1)] == (2, 9)
        assert got[("fox", 2)] == (1, 4)
        assert ("", 5) not in got  # empty doc yields no postings
        df = {r.term: r.df for r in dfreq.collect()}
        assert df["quick"] == 3 and df["fox"] == 2 and df["the"] == 3
        st = stats.collect()[0]
        assert st.n_docs == 6
        assert st.avgdl == pytest.approx(sum(len(t.split()) for _, t in DOCS) / 6)

    def test_postings_build_has_no_shuffle(self, spark, frames):
        """The inverted-index build is a projection: sorting/cutting runs
        happens inside each row, so the plan has no exchange at all."""
        docs, _ = frames
        postings, _, _ = build_postings(docs)
        plan = postings._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestBm25Scores:
    def test_parity_with_reference_impl(self, spark, frames):
        docs, queries = frames
        got = {}
        for r in bm25_topk(docs, queries, k=10).collect():
            got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
        expect = _py_bm25(DOCS, QUERIES)
        assert set(got) == {100, 200}  # zebra matches nothing
        for qid in got:
            got[qid].sort()
            assert [d for _, d, _ in got[qid]] == [d for d, _ in expect[qid]]
            for (_, _, s), (_, es) in zip(got[qid], expect[qid]):
                # per-term scores quantize at decimal(25,6) for
                # order-independent sums — tolerance is 1e-6 per term
                assert s == pytest.approx(es, abs=5e-6)

    def test_k_truncates_and_ranks_contiguous(self, spark, frames):
        docs, queries = frames
        rows = bm25_topk(docs, queries, k=2).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        for ranks in per_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 2

    def test_duplicate_query_terms_count_once(self, spark, frames):
        docs, _ = frames
        q1 = docs.sparkSession.createDataFrame(
            [(1, "fox fox fox")], ["query_id", "query_text"]
        )
        q2 = docs.sparkSession.createDataFrame(
            [(1, "fox")], ["query_id", "query_text"]
        )
        a = {(r.doc_id): r.score for r in bm25_topk(docs, q1).collect()}
        b = {(r.doc_id): r.score for r in bm25_topk(docs, q2).collect()}
        assert a == b

    def test_on_testdata_documents(self, spark):
        """Full parity over the real documents table: the Spark ranking
        must match a pure-Python BM25 over the whole corpus — same top-25
        docs, same order, same scores."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        rows = [(r.doc_id, r.text) for r in docs.collect()]
        probe_text = dict(rows)[0]
        words = sorted(
            set(probe_text.lower().split()), key=lambda w: (len(w), w)
        )[-5:]
        queries = spark.createDataFrame(
            [(1, " ".join(words))], ["query_id", "query_text"]
        )
        top = bm25_topk(docs, queries, k=25).orderBy("rank").collect()
        expect = _py_bm25(rows, [(1, " ".join(words))])[1][:25]
        assert [r.doc_id for r in top] == [d for d, _ in expect]
        for r, (_, es) in zip(top, expect):
            assert r.score == pytest.approx(es, abs=5e-6)


class TestBm25Plan:
    def test_broadcast_only_joins_and_bounded_exchanges(self, spark, frames):
        """100 TB gates on the static plan (same convention as
        test_plans.py): every join is broadcast (the one-row stats ride a
        BNLJ), no sort-merge or cartesian anywhere, and at most ONE hash
        exchange carries non-aggregated rows — the term-keyed df window
        over the query-pruned candidates; everything else ships
        aggregated or group-limited data, so raw corpus token instances
        never shuffle."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        _, queries = frames
        out = bm25_topk(docs, queries, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan
        # query-term prune + per-(query,term) join; df comes from a
        # window (no extra broadcasts since the r6 one-scan change)
        assert len(re.findall(r"BroadcastHashJoin", plan)) == 2
        lines = plan.splitlines()
        n_exchanges = n_candidate_shuffles = 0
        for i, line in enumerate(lines):
            if "Exchange hashpartitioning" not in line:
                continue
            n_exchanges += 1
            child = lines[i + 1]
            if re.search(r"HashAggregate|WindowGroupLimit|Sort ", child):
                continue  # aggregated / group-limited payload
            # exactly ONE exchange may carry non-aggregated rows: the
            # term-keyed window computing df over the QUERY-PRUNED
            # candidates (the deliberate one-scan trade-off) — never a
            # corpus-wide shuffle
            assert re.search(r"hashpartitioning\(term", line), (
                f"unexpected raw-data exchange:\n{line}\n{child}"
            )
            n_candidate_shuffles += 1
        assert n_candidate_shuffles <= 1
        # per-(query,doc) score agg, rank window, df window,
        # plus the tiny query-side distincts
        assert n_exchanges <= 6


class TestPersistedIndex:
    def test_indexed_matches_adhoc_and_prunes_partitions(self, spark, frames, tmp_path):
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        queries = spark.createDataFrame(
            [(1, "spark merge join window"), (2, "batch stream filter")],
            ["query_id", "query_text"],
        )
        idx = str(tmp_path / "bm25_idx")
        write_bm25_index(docs, idx, n_buckets=16)

        adhoc = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk(docs, queries, k=10).collect()
        }
        via_index = bm25_topk_indexed(spark, idx, queries, k=10)
        got = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in via_index.collect()
        }
        assert got == adhoc and got

        # the postings scan must read ONLY the buckets the query terms
        # hash into — the partition filter must reach the scan
        # (inputFiles() lists the file index pre-pruning, so gate on the
        # plan's PartitionFilters and the scan's partition count)
        formatted = via_index._sc._jvm.PythonSQLUtils.explainString(
            via_index._jdf.queryExecution(), "formatted"
        )
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", formatted)
        assert m and "bucket" in m.group(1) and m.group(1).strip()
        import glob

        n_all = len(glob.glob(f"{idx}/postings/bucket=*"))
        n_terms = 7  # distinct terms across the two queries
        assert n_all > n_terms  # empty hash buckets are simply absent
        # the filter admits at most one bucket per distinct term — a
        # strict subset of the materialized index
        in_list = re.search(r"bucket#\d+ IN \(([^)]*)\)", formatted)
        assert in_list and len(in_list.group(1).split(",")) <= n_terms

    def test_no_matching_terms_empty_result(self, spark, tmp_path):
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
        idx = str(tmp_path / "idx2")
        write_bm25_index(docs, idx, n_buckets=4)
        q = spark.createDataFrame([(1, "")], ["query_id", "query_text"])
        assert bm25_topk_indexed(spark, idx, q).count() == 0

    def test_append_matches_full_rebuild(self, spark, tmp_path):
        """Index half the corpus, append the other half: retrieval must
        equal an index built over everything at once — postings land in
        the same term-hash partitions and the stats fragments merge to
        exact corpus totals."""
        from seafowl_spark.operators.bm25 import (
            append_bm25_index,
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        first = docs.where(F.col("doc_id") < 250)
        rest = docs.where(F.col("doc_id") >= 250)
        queries = spark.createDataFrame(
            [(1, "spark merge join window"), (2, "batch stream filter")],
            ["query_id", "query_text"],
        )

        inc = str(tmp_path / "inc_idx")
        write_bm25_index(first, inc, n_buckets=16)
        append_bm25_index(rest, inc)

        full = str(tmp_path / "full_idx")
        write_bm25_index(docs, full, n_buckets=16)

        got_inc = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, inc, queries, k=10).collect()
        }
        got_full = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, full, queries, k=10).collect()
        }
        assert got_inc == got_full and got_inc


FDOCS = [
    (1, "spark engine", "the spark analytics engine runs queries"),
    (2, "index serving", "bm25 index serving with spark"),
    (3, "empty body", ""),
    (4, "", "spark spark spark engine engine"),
    (5, None, None),
    (6, "spark title only", None),
]
FIELDS = [("title", 2.0), ("body", 1.0)]
FQUERIES = [(0, "spark engine"), (1, "bm25 serving"), (2, "zebra")]


def _py_bm25f(docs, fields, queries, k1=1.2, b=0.75):
    """Weighted multi-field reference: each field contributes
    weight x tf to a combined term frequency and weight x length to a
    combined document length; one idf per term (df = docs containing the
    term in ANY field); same decimal(25,6) per-term quantization."""
    from decimal import ROUND_HALF_UP, Decimal

    def q6(x):
        return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    tfw, dlw = {}, {}
    for row in docs:
        d = row[0]
        acc, wl = {}, 0.0
        for (fname, w), val in zip(fields, row[1:]):
            words = [x for x in (val or "").lower().split() if x]
            wl += w * len(words)
            for t in words:
                acc[t] = acc.get(t, 0.0) + w
        tfw[d], dlw[d] = acc, wl
    n_docs = len(docs)
    avgdl = sum(dlw.values()) / n_docs
    df = {}
    for acc in tfw.values():
        for term in acc:
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(qtext.lower().split()):
            if term not in df:
                continue
            idf = math.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            for d, acc in tfw.items():
                tf = acc.get(term, 0.0)
                if not tf:
                    continue
                s = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dlw[d] / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + q6(s)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


class TestMatchAll:
    def test_and_semantics_filter(self, spark, frames):
        """match_all keeps only documents containing EVERY distinct query
        term; surviving docs keep the exact OR-mode scores."""
        from seafowl_spark.operators.bm25 import bm25_topk

        docs, queries = frames
        got_any = {
            (r.query_id, r.doc_id): r.score
            for r in bm25_topk(docs, queries, k=10).collect()
        }
        got_all = {
            (r.query_id, r.doc_id): r.score
            for r in bm25_topk(docs, queries, k=10, match_all=True).collect()
        }
        # 'quick fox': docs 1, 2 have both; 3 (lazy dog only), 4 (quick
        # only) drop. 'lazy dog': 1 and 3. 'zebra': nothing anywhere.
        assert set(got_all) == {(100, 1), (100, 2), (200, 1), (200, 3)}
        for key, score in got_all.items():
            assert score == got_any[key]

    def test_partially_matching_query_empty_in_all_mode(self, spark, frames):
        """A query with one indexed and one absent term matches nothing
        under AND semantics (nobody contains the absent term)."""
        from seafowl_spark.operators.bm25 import bm25_topk

        docs, _ = frames
        q = spark.createDataFrame(
            [(1, "quick zebra")], ["query_id", "query_text"]
        )
        assert bm25_topk(docs, q, k=10, match_all=True).count() == 0
        assert bm25_topk(docs, q, k=10).count() > 0  # OR mode still ranks

    def test_indexed_match_all(self, spark, frames, tmp_path):
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs, queries = frames
        idx = str(tmp_path / "ma_idx")
        write_bm25_index(docs, idx, n_buckets=8)
        got = {
            (r.query_id, r.doc_id)
            for r in bm25_topk_indexed(
                spark, idx, queries, k=10, match_all=True
            ).collect()
        }
        assert got == {(100, 1), (100, 2), (200, 1), (200, 3)}


class TestFieldedBm25:
    @pytest.fixture()
    def fframes(self, spark):
        docs = spark.createDataFrame(FDOCS, ["doc_id", "title", "body"])
        queries = spark.createDataFrame(
            FQUERIES, ["query_id", "query_text"]
        )
        return docs, queries

    def test_parity_with_reference_impl(self, spark, fframes):
        from seafowl_spark.operators.bm25 import bm25f_topk

        docs, queries = fframes
        want = _py_bm25f(FDOCS, FIELDS, FQUERIES)
        got = bm25f_topk(docs, queries, FIELDS, k=10).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
        for qid, expected in want.items():
            rows_q = sorted(by_q.get(qid, []))
            assert [d for _rk, d, _s in rows_q] == [d for d, _s in expected]
            for (_rk, _d, s), (_d2, s2) in zip(rows_q, expected):
                assert s == pytest.approx(s2, abs=1e-9)

    def test_null_field_does_not_drop_document(self, spark, fframes):
        from seafowl_spark.operators.bm25 import bm25f_topk

        docs, _ = fframes
        q = spark.createDataFrame([(0, "spark")], ["query_id", "query_text"])
        ids = {
            r.doc_id for r in bm25f_topk(docs, q, FIELDS, k=10).collect()
        }
        assert 6 in ids  # title-only doc (NULL body) still ranks

    def test_fielded_build_has_no_shuffle(self, spark, fframes):
        from seafowl_spark.operators.bm25 import build_postings_fielded

        docs, _ = fframes
        postings, _stats = build_postings_fielded(docs, FIELDS)
        plan = postings._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_persisted_fielded_append_replays_weighting(
        self, spark, fframes, tmp_path
    ):
        """Appending to a fielded index replays the SIDECAR's field spec
        (the caller's text_col is ignored): half+append equals a
        from-scratch fielded build."""
        from seafowl_spark.operators.bm25 import (
            append_bm25_index,
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs, queries = fframes
        first = docs.where(F.col("doc_id") <= 3)
        rest = docs.where(F.col("doc_id") > 3)

        inc = str(tmp_path / "f_inc")
        write_bm25_index(first, inc, n_buckets=8, fields=FIELDS)
        append_bm25_index(rest, inc)

        full = str(tmp_path / "f_full")
        write_bm25_index(docs, full, n_buckets=8, fields=FIELDS)

        got_inc = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, inc, queries, k=10).collect()
        }
        got_full = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, full, queries, k=10).collect()
        }
        assert got_inc == got_full and got_inc


class TestDeleteTombstones:
    def test_delete_matches_rebuild_exactly(self, spark, frames, tmp_path):
        """delete_from_bm25_index + masked lookup == an index built over
        the surviving corpus, bit-for-bit: df derives from the masked
        candidates and the negative stats fragment fixes n_docs/avgdl."""
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            delete_from_bm25_index,
            write_bm25_index,
        )

        docs, queries = frames
        idx = str(tmp_path / "del_idx")
        write_bm25_index(docs, idx, n_buckets=8)
        removed = docs.where(F.col("doc_id").isin([1, 4]))
        delete_from_bm25_index(removed, idx)

        rebuilt = str(tmp_path / "rb_idx")
        write_bm25_index(
            docs.where(~F.col("doc_id").isin([1, 4])), rebuilt, n_buckets=8
        )
        got = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, idx, queries, k=10).collect()
        }
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(
                spark, rebuilt, queries, k=10
            ).collect()
        }
        assert got == want and got
        assert 1 not in {d for d, _s in got.values()}

    def test_fielded_delete_replays_weighting(self, spark, tmp_path):
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            delete_from_bm25_index,
            write_bm25_index,
        )

        docs = spark.createDataFrame(FDOCS, ["doc_id", "title", "body"])
        queries = spark.createDataFrame(FQUERIES, ["query_id", "query_text"])
        idx = str(tmp_path / "fdel_idx")
        write_bm25_index(docs, idx, n_buckets=8, fields=FIELDS)
        delete_from_bm25_index(docs.where(F.col("doc_id") == 1), idx)

        rebuilt = str(tmp_path / "frb_idx")
        write_bm25_index(
            docs.where(F.col("doc_id") != 1), rebuilt, n_buckets=8,
            fields=FIELDS,
        )
        got = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, idx, queries, k=10).collect()
        }
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(
                spark, rebuilt, queries, k=10
            ).collect()
        }
        assert got == want and got

    def test_full_write_clears_mask(self, spark, frames, tmp_path):
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            delete_from_bm25_index,
            write_bm25_index,
        )
        from seafowl_spark.operators.index_tombstones import has_tombstones

        docs, queries = frames
        idx = str(tmp_path / "cl_idx")
        write_bm25_index(docs, idx, n_buckets=8)
        delete_from_bm25_index(docs.where(F.col("doc_id") == 1), idx)
        assert has_tombstones(idx)
        write_bm25_index(docs, idx, n_buckets=8)  # full rebuild
        assert not has_tombstones(idx)
        got = {
            r.doc_id
            for r in bm25_topk_indexed(spark, idx, queries, k=10).collect()
        }
        assert 1 in got  # unmasked


class TestIndexedFieldedParity:
    def test_indexed_fielded_equals_adhoc(self, spark, tmp_path):
        """The persisted fielded index serves the exact scores the
        ad-hoc bm25f_topk computes (same scoring tail; tie-break and
        decimal quantization can't drift)."""
        from seafowl_spark.operators.bm25 import (
            bm25_topk_indexed,
            bm25f_topk,
            write_bm25_index,
        )

        docs = spark.createDataFrame(FDOCS, ["doc_id", "title", "body"])
        queries = spark.createDataFrame(FQUERIES, ["query_id", "query_text"])
        idx = str(tmp_path / "fp_idx")
        write_bm25_index(docs, idx, n_buckets=8, fields=FIELDS)
        got = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, idx, queries, k=10).collect()
        }
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in bm25f_topk(docs, queries, FIELDS, k=10).collect()
        }
        assert got == want and got


class TestSharedPerDoc:
    """r13: q_bm25_search computes ONE per-(query,doc) score table
    (score_per_doc + localCheckpoint) and derives every ranking branch
    from it. These pins guarantee the shared table is value-identical
    to each branch's original operator composition."""

    def test_split_composition_equals_bm25_topk(self, spark, frames):
        from seafowl_spark.operators.bm25 import (
            _tokens,
            rank_and_cut,
            score_per_doc,
        )

        docs, queries = frames
        postings, _dfreq, stats = build_postings(docs)
        qterms = queries.select(
            "query_id", F.explode(_tokens(F.col("query_text"))).alias("term")
        ).distinct()
        per_doc = score_per_doc(postings, qterms, stats, k1=1.2, b=0.75)
        for match_all in (False, True):
            got = {
                (r.query_id, r.rank): (r.doc_id, r.score)
                for r in rank_and_cut(
                    per_doc, 10, match_all=match_all, qterms=qterms
                ).collect()
            }
            want = {
                (r.query_id, r.rank): (r.doc_id, r.score)
                for r in bm25_topk(
                    docs, queries, k=10, match_all=match_all
                ).collect()
            }
            assert got == want and got

    def test_nterms_equals_term_overlap_scores(self, spark, frames):
        # the rrf overlap list's score is per_doc.__nterms cast to
        # double — must equal the operator it replaces (COUNT(DISTINCT
        # matched term) per (query, doc)) on every row
        from seafowl_spark.operators.bm25 import _tokens, score_per_doc
        from seafowl_spark.operators.fusion import term_overlap_scores

        docs, queries = frames
        postings, _dfreq, stats = build_postings(docs)
        qterms = queries.select(
            "query_id", F.explode(_tokens(F.col("query_text"))).alias("term")
        ).distinct()
        per_doc = score_per_doc(postings, qterms, stats, k1=1.2, b=0.75)
        got = {
            (r.query_id, r.doc_id): r.score
            for r in per_doc.select(
                "query_id",
                "doc_id",
                F.col("__nterms").cast("double").alias("score"),
            ).collect()
        }
        want = {
            (r.query_id, r.doc_id): r.score
            for r in term_overlap_scores(docs, queries).collect()
        }
        assert got == want and got

    def test_shared_hardneg_equals_operator(self, spark, frames):
        from seafowl_spark.operators.bm25 import (
            _tokens,
            rank_and_cut,
            score_per_doc,
        )
        from seafowl_spark.operators.negatives import (
            mine_hard_negatives,
            rerank_negatives,
        )

        docs, queries = frames
        k = 3
        postings, _dfreq, stats = build_postings(docs)
        qterms = queries.select(
            "query_id", F.explode(_tokens(F.col("query_text"))).alias("term")
        ).distinct()
        per_doc = score_per_doc(postings, qterms, stats, k1=1.2, b=0.75)
        bm = rank_and_cut(per_doc, k)
        positives = bm.where(
            (F.col("rank") <= 2) & (F.col("doc_id") % 2 == 0)
        ).select("query_id", "doc_id")
        pmax = (
            positives.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        got = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in rerank_negatives(
                rank_and_cut(per_doc, k + int(pmax or 0)), positives, k=k
            ).collect()
        }
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in mine_hard_negatives(
                docs, queries, positives, k=k
            ).collect()
        }
        assert got == want and got

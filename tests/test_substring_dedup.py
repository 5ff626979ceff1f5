"""Exact substring dedup (operators/substring_dedup.py): span detection,
keep-first policy, interval merging/removal semantics vs a pure-Python
reference, stride behavior, and edge cases."""

from __future__ import annotations

import hashlib

import pytest

from seafowl_spark.operators.substring_dedup import (
    find_repeated_spans,
    remove_repeated_spans,
)

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens

DOCS = [
    (1, f"unique one two three {SHARED} tail1 tail2"),
    (2, f"prefix {SHARED} something else entirely here now"),
    (3, "totally distinct words nothing shared at all okay fine"),
    (4, f"{SHARED} {SHARED} doubled inside one document"),
    (5, "short"),
    (6, ""),
]
SPAN = 4  # 4-token windows


def _py_spans(docs, span, stride=1):
    """All (hash, doc, pos) span occurrences."""
    out = []
    for d, t in docs:
        toks = [w for w in t.split() if w]
        for p in range(0, len(toks) - span + 1, stride):
            h = hashlib.md5(" ".join(toks[p : p + span]).encode()).hexdigest()
            out.append((int(h[:15], 16), d, p))
    return out


def _py_remove(docs, span, stride=1):
    occs = _py_spans(docs, span, stride)
    by_hash = {}
    for h, d, p in occs:
        by_hash.setdefault(h, []).append((d, p))
    doomed = {}
    for h, lst in by_hash.items():
        if len(lst) < 2:
            continue
        for d, p in sorted(lst)[1:]:
            doomed.setdefault(d, []).append(p)
    out = {}
    for d, t in docs:
        toks = [w for w in t.split() if w]
        covered = set()
        for p in sorted(doomed.get(d, [])):
            covered.update(range(p, p + span))
        kept = [w for i, w in enumerate(toks) if i not in covered]
        out[d] = (len(toks), len(covered & set(range(len(toks)))), " ".join(kept))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestFindSpans:
    def test_repeated_spans_found_with_keep_first(self, docs):
        rows = find_repeated_spans(docs, span_tokens=SPAN).collect()
        assert rows  # the shared block repeats across docs 1, 2, 4
        by_hash = {}
        for r in rows:
            by_hash.setdefault(r.span_hash, []).append(r)
        for h, occ in by_hash.items():
            assert len(occ) >= 2
            assert occ[0].n_occurrences == len(occ)
            keeps = [(r.doc_id, r.pos) for r in occ if r.keep]
            assert keeps == [min((r.doc_id, r.pos) for r in occ)]

    def test_doc3_never_appears(self, docs):
        rows = find_repeated_spans(docs, span_tokens=SPAN).collect()
        assert all(r.doc_id != 3 for r in rows)

    def test_within_document_duplication_detected(self, docs):
        """Doc 4 repeats the shared block twice internally: its second
        occurrence must be doomed even against its own first."""
        rows = find_repeated_spans(docs, span_tokens=SPAN).collect()
        doc4 = [r for r in rows if r.doc_id == 4]
        assert any(not r.keep for r in doc4)

    def test_stride_reduces_occurrences(self, docs):
        full = find_repeated_spans(docs, span_tokens=SPAN, stride=1).count()
        strided = find_repeated_spans(docs, span_tokens=SPAN, stride=2).count()
        assert 0 < strided < full


class TestRemoveSpans:
    def test_matches_python_reference(self, docs):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed_tokens, r.clean_text)
            for r in remove_repeated_spans(docs, span_tokens=SPAN).collect()
        }
        expect = _py_remove(DOCS, SPAN)
        assert set(got) == set(expect)
        for d in expect:
            assert got[d] == expect[d], d

    def test_first_occurrence_survives_verbatim(self, docs):
        out = {
            r.doc_id: r.clean_text
            for r in remove_repeated_spans(docs, span_tokens=SPAN).collect()
        }
        # doc 1 holds the first occurrence of the shared block: untouched
        assert out[1] == DOCS[0][1]
        # docs 2 and 4 lose their copies
        assert SHARED not in out[2]
        assert SHARED not in out[4]

    def test_short_and_empty_docs_pass_through(self, docs):
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(docs, span_tokens=SPAN).collect()
        }
        assert out[5].clean_text == "short" and out[5].n_removed_tokens == 0
        assert out[6].clean_text == "" and out[6].n_removed_tokens == 0

    def test_total_rows_preserved(self, docs):
        assert remove_repeated_spans(docs, span_tokens=SPAN).count() == len(DOCS)

    def test_wall_to_wall_duplicate_doc_linear_rebuild(self, spark):
        """The r7 gap-slice rebuild removed the O(tokens x covered) mask:
        a document that is one giant duplicated block (every token
        covered) must come out empty, quickly, with exact counts."""
        block = " ".join(f"w{i}" for i in range(400))
        docs = spark.createDataFrame(
            [(1, block), (2, block)], ["doc_id", "text"]
        )
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(docs, span_tokens=SPAN).collect()
        }
        # keep-first: doc 1 intact, doc 2 fully removed
        assert out[1].clean_text == block
        assert out[1].n_removed_tokens == 0
        assert out[2].clean_text == ""
        assert out[2].n_tokens == 400
        assert out[2].n_removed_tokens == 400

    def test_random_corpus_parity_sweep(self, spark):
        """Seeded-random corpus with engineered repeats: heavy coverage of
        the interval-merge + gap-slice rebuild (nested/overlapping/
        adjacent doomed spans) vs the python reference in one Spark
        call."""
        import random

        rng = random.Random(11)
        blocks = [
            " ".join(f"b{b}_{i}" for i in range(rng.randint(4, 9)))
            for b in range(6)
        ]
        docs = []
        for d in range(60):
            parts = []
            for _ in range(rng.randint(1, 6)):
                if rng.random() < 0.5:
                    parts.append(blocks[rng.randrange(len(blocks))])
                else:
                    parts.append(
                        " ".join(
                            f"u{d}_{rng.randrange(10000)}"
                            for _ in range(rng.randint(1, 7))
                        )
                    )
            docs.append((d, " ".join(parts)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.n_removed_tokens, r.clean_text)
            for r in remove_repeated_spans(df, span_tokens=SPAN).collect()
        }
        expect = _py_remove(docs, SPAN)
        mismatch = {d: (got[d], expect[d]) for d in expect if got.get(d) != expect[d]}
        assert not mismatch, dict(list(mismatch.items())[:3])


class TestParagraphDedup:
    """CCNet-style paragraph-level exact dedup
    (operators/paragraph_dedup.py, r8): first corpus-wide occurrence by
    (doc_id, position) survives, normalization collapses case/whitespace,
    empty paragraphs pass through."""

    def test_keep_first_occurrence(self, spark):
        from seafowl_spark.operators.paragraph_dedup import dedup_paragraphs

        docs = spark.createDataFrame(
            [
                (1, "alpha beta\n\nshared footer text\n\ngamma"),
                (2, "delta\n\nshared footer text\n\nepsilon"),
                (3, "shared footer text\n\nzeta"),
            ],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: (r["n_paragraphs"], r["n_removed_paragraphs"], r["clean_text"])
            for r in dedup_paragraphs(docs).collect()
        }
        assert out[1] == (3, 0, "alpha beta\n\nshared footer text\n\ngamma")
        assert out[2] == (3, 1, "delta\n\nepsilon")
        assert out[3] == (2, 1, "zeta")

    def test_normalized_copies_deduplicate(self, spark):
        from seafowl_spark.operators.paragraph_dedup import dedup_paragraphs

        docs = spark.createDataFrame(
            [
                (1, "Hello   World"),
                (2, "hello world"),
                (3, "  HELLO\tWORLD  "),
            ],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: r["n_removed_paragraphs"]
            for r in dedup_paragraphs(docs).collect()
        }
        # doc 1 is first; 2 and 3 are reformatted copies
        assert out == {1: 0, 2: 1, 3: 1}

    def test_empty_paragraphs_survive(self, spark):
        from seafowl_spark.operators.paragraph_dedup import dedup_paragraphs

        docs = spark.createDataFrame(
            [(1, "a\n\n\n\nb"), (2, "a\n\n\n\nc")],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: (r["n_removed_paragraphs"], r["clean_text"])
            for r in dedup_paragraphs(docs).collect()
        }
        # the middle empty paragraph is formatting, kept in BOTH docs;
        # 'a' deduplicates to doc 1
        assert out[1] == (0, "a\n\n\n\nb")
        assert out[2] == (1, "\n\nc")

    def test_null_text_documents_pass_through(self, spark):
        # split(NULL) -> NULL array emits no posexplode rows; without the
        # coalesce those doc_ids would vanish from the output entirely —
        # a silent row-count change for corpus reassembly (r8 review).
        from seafowl_spark.operators.paragraph_dedup import dedup_paragraphs

        docs = spark.createDataFrame(
            [(1, "alpha"), (2, None), (3, "alpha")],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: (r["n_paragraphs"], r["n_removed_paragraphs"], r["clean_text"])
            for r in dedup_paragraphs(docs).collect()
        }
        assert set(out) == {1, 2, 3}  # every input document appears
        assert out[2] == (1, 0, "")  # NULL text -> one empty paragraph
        assert out[3] == (1, 1, "")  # 'alpha' deduped to doc 1

    def test_single_shuffle_no_python(self, spark):
        from seafowl_spark.operators.paragraph_dedup import dedup_paragraphs

        docs = spark.createDataFrame(
            [(i, f"p{i % 3}\n\nq{i}") for i in range(20)],
            "doc_id bigint, text string",
        )
        plan = (
            dedup_paragraphs(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan

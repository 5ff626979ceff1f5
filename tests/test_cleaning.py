"""C4/RefinedWeb-style cleaning operators (operators/cleaning.py)."""

from __future__ import annotations

import pytest

from seafowl_spark.operators.cleaning import (
    clean_lines,
    frequent_lines,
    strip_boilerplate_lines,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (
            1,
            "This is a proper sentence.\n"
            "short\n"
            "Enable javascript to continue.\n"
            "Another good line stays here!\n"
            "no terminal punctuation here",
        ),
        (2, "One fine line survives the filter.\nSee our cookie policy."),
        (3, "Function bodies look like { code }."),
        (4, "Lorem ipsum dolor sit amet, consectetur."),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCleanLines:
    def test_line_rules(self, docs):
        out = {r["doc_id"]: r for r in clean_lines(docs).collect()}
        # doc 1: 5 lines; keeps the two full sentences only
        assert out[1]["n_lines"] == 5
        assert out[1]["n_kept_lines"] == 2
        assert out[1]["clean_text"] == (
            "This is a proper sentence.\nAnother good line stays here!"
        )
        # blocklisted markers drop their line, not the document
        assert "cookie policy" not in out[2]["clean_text"]
        assert out[2]["n_kept_lines"] == 1
        assert not out[2]["doc_blocked"]
        # curly brace / lorem ipsum are document-level kills in C4
        assert out[3]["doc_blocked"]
        assert out[4]["doc_blocked"]
        # empty text: split yields one empty line, zero kept
        assert out[5]["n_kept_lines"] == 0

    def test_min_words_tunable(self, docs):
        out = {
            r["doc_id"]: r
            for r in clean_lines(docs, min_words=6).collect()
        }
        assert out[2]["n_kept_lines"] == 1  # 6-word line still passes
        assert out[1]["n_kept_lines"] == 0  # both 5-word lines now fail


@pytest.fixture()
def corpus(spark):
    header = "Site Header Menu"
    rows = [(i, f"{header}\nUnique body line {i} for this document.") for i in range(50)]
    rows += [(100 + i, f"Distinct document {i} with no header at all.") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBoilerplate:
    def test_frequent_lines_detected(self, corpus):
        freq = frequent_lines(corpus, corpus.count(), max_doc_frac=0.1)
        got = {r["line"]: r["n_docs"] for r in freq.collect()}
        assert got == {"Site Header Menu": 50}

    def test_distinct_per_doc(self, spark):
        # one doc repeating a line 100 times must not make it boilerplate
        df = spark.createDataFrame(
            [(1, "echo\n" * 100), (2, "other text.")], "doc_id long, text string"
        )
        assert frequent_lines(df, 2, max_doc_frac=0.9).count() == 0

    def test_strip_preserves_order_and_counts(self, corpus):
        out = {r["doc_id"]: r for r in strip_boilerplate_lines(corpus, max_doc_frac=0.1).collect()}
        assert len(out) == 60
        assert out[0]["n_boilerplate_removed"] == 1
        assert out[0]["stripped_text"] == "Unique body line 0 for this document."
        assert out[105]["n_boilerplate_removed"] == 0
        assert out[105]["stripped_text"] == out[105]["text"]

    @pytest.mark.parametrize("broadcast_max", [4096, 0])
    def test_multiline_order_stable(self, spark, broadcast_max):
        """Both physical strategies: broadcast-array row-local filter and
        the large-set join fallback produce identical output."""
        df = spark.createDataFrame(
            [(i, f"HDR\nalpha {i}.\nHDR\nbeta {i}.\ngamma {i}.") for i in range(20)],
            "doc_id long, text string",
        )
        out = strip_boilerplate_lines(
            df, max_doc_frac=0.05, broadcast_max_lines=broadcast_max
        ).collect()
        assert len(out) == 20
        for r in out:
            i = r["doc_id"]
            assert r["stripped_text"] == f"alpha {i}.\nbeta {i}.\ngamma {i}."
            assert r["n_boilerplate_removed"] == 2


class TestFrequentLinesApprox:
    def test_matches_exact_finder(self, spark):
        """With capacity >= 1/max_doc_frac the MG guarantee covers every
        line above the boilerplate threshold, so the approximate finder
        returns exactly the exact finder's set (with exact counts)."""
        from seafowl_spark.operators.cleaning import (
            frequent_lines,
            frequent_lines_approx,
        )

        docs = [(i, f"unique line {i}\nall rights reserved.\n"
                    + ("subscribe now!" if i % 3 == 0 else f"tail {i}"))
                for i in range(60)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        exact = {
            (r.line, r.n_docs)
            for r in frequent_lines(df, 60, max_doc_frac=0.05).collect()
        }
        approx = {
            (r.line, r.n_docs)
            for r in frequent_lines_approx(
                df, 60, max_doc_frac=0.05, capacity=64
            ).collect()
        }
        assert approx == exact
        assert ("all rights reserved.", 60) in approx
        assert any(l == "subscribe now!" for l, _ in approx)

    def test_auto_capacity_sizes_from_measured_lines_per_doc(self, spark):
        """capacity='auto' measures lines/doc and sizes 2L/max_doc_frac,
        so the exact-equivalence guarantee holds even for long documents
        where the 4096 default would be too small."""
        from seafowl_spark.operators.cleaning import (
            frequent_lines,
            frequent_lines_approx,
        )

        # 30 docs x ~50 distinct lines each: L ~ 51 > 40, the default
        # capacity's guarantee limit at 1%
        docs = [
            (
                i,
                "\n".join(f"line {i} {j}" for j in range(50))
                + "\nall rights reserved.",
            )
            for i in range(30)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        exact = {
            (r.line, r.n_docs)
            for r in frequent_lines(df, 30, max_doc_frac=0.05).collect()
        }
        auto = {
            (r.line, r.n_docs)
            for r in frequent_lines_approx(
                df, 30, max_doc_frac=0.05, capacity="auto"
            ).collect()
        }
        assert auto == exact
        assert ("all rights reserved.", 30) in auto

    def test_bad_capacity_rejected(self, spark):
        from seafowl_spark.operators.cleaning import frequent_lines_approx

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            frequent_lines_approx(df, 1, capacity="huge")

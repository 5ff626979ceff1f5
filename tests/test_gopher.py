"""Gopher quality rules (operators/gopher.py, r8 session D — Rae et al.
2021 §A1.1): per-rule metrics, the failure bitmask, and the combined
gate over hand-crafted documents hitting each rule's boundary. The
corpus-scale value check rides t_langid_quality's oracle row."""

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.gopher import (
    GOPHER_STOPWORDS,
    MIN_REQUIRED_STOPWORDS,
    MIN_WORDS,
    add_gopher_quality,
)


def _score(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in add_gopher_quality(df).collect()
    }


GOOD = (
    "The quick brown fox jumps over the lazy dog and runs to be free "
    "of that noisy farm with all the other animals have gone away now. "
) * 3  # ~75 words, all rules pass


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        got = _score(spark, [GOOD])[0]
        assert got["gopher_pass"] is True
        assert got["gopher_fail_mask"] == 0
        assert got["n_req_stop"] >= MIN_REQUIRED_STOPWORDS

    def test_short_doc_fails_word_count_only(self, spark):
        short = "the cat sat to be of and that have with here now"
        got = _score(spark, [short])[0]
        assert got["gopher_pass"] is False
        assert got["gopher_fail_mask"] == 1  # bit 0 = word count
        assert len(short.split()) < MIN_WORDS

    def test_bullet_lines_flagged(self, spark):
        bullets = "\n".join(["- item one here", "* item two here", "• three"])
        got = _score(spark, [GOOD + "\n" + bullets])[0]
        # 3 bullet lines of 4 non-empty lines = 0.75 < 0.9 -> still under
        assert got["bullet_line_frac"] == pytest.approx(0.75)
        only_bullets = _score(spark, [bullets])[0]
        assert only_bullets["bullet_line_frac"] == 1.0
        assert only_bullets["gopher_fail_mask"] & (1 << 3)

    def test_ellipsis_lines_flagged(self, spark):
        t = "first line runs on...\nsecond line is fine\nthird trails …  "
        got = _score(spark, [t])[0]
        assert got["ellipsis_line_frac"] == pytest.approx(2 / 3)
        assert got["gopher_fail_mask"] & (1 << 4)

    def test_symbol_ratio(self, spark):
        t = "word " * 10 + "# # # ..."  # 4 symbols (3 '#' + 1 '...')
        got = _score(spark, [t])[0]
        # tokens: 10 words + '#','#','#','...' = 14
        assert got["sym_word_ratio"] == pytest.approx(4 / 14)
        assert got["gopher_fail_mask"] & (1 << 2)

    def test_alpha_word_fraction(self, spark):
        t = "abc 123 456 789"
        got = _score(spark, [t])[0]
        assert got["alpha_word_frac"] == pytest.approx(0.25)
        assert got["gopher_fail_mask"] & (1 << 5)

    def test_mean_word_length_bounds(self, spark):
        long_words = "supercalifragilistic " * 60
        got = _score(spark, [long_words])[0]
        assert got["mean_word_len"] > 10
        assert got["gopher_fail_mask"] & (1 << 1)

    def test_stopword_count_distinct_case_insensitive(self, spark):
        t = "The THE the Of OF words words words"
        got = _score(spark, [t])[0]
        assert got["n_req_stop"] == 2  # {the, of} — distinct, case-folded
        assert set(GOPHER_STOPWORDS) >= {"the", "of"}

    def test_empty_and_whitespace_docs_never_divide_by_zero(self, spark):
        # "" and "   " tokenize to zero words (single-space split, the
        # repo-wide convention) -> all ratios take the 0.0 guard branch;
        # "\n\n\n" is ONE 3-char "word" under that convention but zero
        # non-empty lines -> the line ratios take the guard branch
        for t in ["", "   "]:
            got = _score(spark, [t])[0]
            assert got["gopher_pass"] is False
            assert got["mean_word_len"] == 0.0
            assert got["bullet_line_frac"] == 0.0
        got = _score(spark, ["\n\n\n"])[0]
        assert got["gopher_pass"] is False
        assert got["bullet_line_frac"] == 0.0 == got["ellipsis_line_frac"]

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame([(1, GOOD)], "doc_id int, text string")
        plan = (
            add_gopher_quality(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "Python" not in plan

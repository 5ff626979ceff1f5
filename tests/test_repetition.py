"""Repetition quality metrics (operators/repetition.py)."""

from pyspark.sql import functions as F

from seafowl_spark.operators.repetition import repetition_metrics


def _m(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return repetition_metrics(df).collect()[0]


class TestRepetitionMetrics:
    def test_unique_text_scores_zero(self, spark):
        r = _m(spark, "a b c d e f g h")
        assert r.dup_token_frac == 0.0
        assert r.dup_ngram_frac == 0.0
        assert r.max_run_len == 1

    def test_pure_spam_scores_high(self, spark):
        r = _m(spark, "buy buy buy buy buy buy")
        assert r.dup_token_frac > 0.8
        assert r.dup_ngram_frac > 0.7
        assert r.top_ngram_frac == 1.0
        assert r.max_run_len == 6

    def test_boilerplate_top_ngram_mass(self, spark):
        # the phrase "click here now" dominates
        text = " ".join(["click here now"] * 5 + ["real content words once"])
        r = _m(spark, text)
        assert r.top_ngram_frac > 0.2
        assert 0.0 < r.dup_ngram_frac < 1.0

    def test_empty_and_short_docs(self, spark):
        r = _m(spark, "")
        assert (r.dup_token_frac, r.dup_ngram_frac, r.max_run_len) == (0.0, 0.0, 0)
        r2 = _m(spark, "ab")
        assert r2.dup_ngram_frac == 0.0  # shorter than the n-gram window
        assert r2.max_run_len == 1

    def test_runs_on_documents_table(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = repetition_metrics(df.select("doc_id", "text"))
        rows = out.agg(
            F.max("dup_ngram_frac"), F.min("dup_ngram_frac"), F.max("max_run_len")
        ).collect()[0]
        assert 0.0 <= rows[1] <= rows[0] <= 1.0
        assert rows[2] >= 1
        # one Arrow-vectorized projection (r14, guide §4.2 — the old JVM
        # higher-order-function folds executed interpreted per element),
        # still no row-pickling Python and no exchanges
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") == 1

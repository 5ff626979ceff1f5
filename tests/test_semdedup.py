"""SemDeDup (operators/semdedup.py): survivor/dup_of parity with a numpy
mirror of the paper's algorithm on real testdata, synthetic known-duplicate
clusters, cap behavior, and the within-cluster join plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seafowl_spark.io import table
from seafowl_spark.operators.kmeans import fit_kmeans
from seafowl_spark.operators.semdedup import semdedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def _np_semdedup(ids, X, centroids, threshold):
    """The paper's algorithm, dense: normalize, assign, order each cluster
    by (centroid_sim, id) ascending, drop any row with an earlier
    same-cluster row at cosine >= threshold (dup_of = earliest)."""
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    Xn = X / n
    C = np.asarray(centroids)
    d2 = ((Xn[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cell = np.argmin(d2, axis=1)  # first-min-wins matches assign_cells
    cn = np.linalg.norm(C, axis=1)
    cs = np.array(
        [
            (Xn[i] @ C[cell[i]]) / cn[cell[i]] if cn[cell[i]] > 0 else 0.0
            for i in range(len(ids))
        ]
    )
    out = {}
    for c in set(cell.tolist()):
        idx = [i for i in range(len(ids)) if cell[i] == c]
        idx.sort(key=lambda i: (cs[i], ids[i]))
        for rank, i in enumerate(idx):
            dup = None
            for j in idx[:rank]:
                if Xn[i] @ Xn[j] >= threshold:
                    dup = ids[j]
                    break
            out[ids[i]] = (int(cell[i]), dup)
    return out


class TestParity:
    def test_matches_numpy_mirror_on_testdata(self, spark, emb):
        rows = emb.orderBy("vec_id").collect()
        ids = [r.vec_id for r in rows]
        X = np.stack([np.array(r.emb) for r in rows])
        # low threshold so the synthetic corpus (max pair cos ~0.5)
        # actually produces duplicate groups
        thr = 0.30
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0] = 1.0
        cents = fit_kmeans(
            spark.createDataFrame(
                [(i, (X / n)[j].tolist()) for j, i in enumerate(ids)],
                "vec_id long, emb array<double>",
            ),
            k=8,
            max_iter=3,
        )
        got = {
            r.vec_id: (r.cell, r.dup_of)
            for r in semdedup(emb, centroids=cents, threshold=thr).collect()
        }
        expect = _np_semdedup(ids, X, cents, thr)
        assert set(got) == set(expect)
        mismatches = {i: (got[i], expect[i]) for i in got if got[i] != expect[i]}
        assert not mismatches, dict(list(mismatches.items())[:5])
        # something actually deduplicated at this threshold
        assert any(d is not None for _, d in got.values())

    def test_known_duplicate_cluster(self, spark):
        """Two tight semantic groups + one singleton: exactly one survivor
        per group, and the survivor is the LOWEST-centroid-sim member
        (the paper's keep rule)."""
        base_a = np.array([1.0, 0.0, 0.0, 0.0])
        base_b = np.array([0.0, 1.0, 0.0, 0.0])
        rows = []
        for i, eps in enumerate([0.0, 0.01, 0.02]):  # group A: ids 0,1,2
            v = base_a + eps * np.array([0.0, 1.0, 1.0, 0.0])
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
        for i, eps in enumerate([0.0, 0.015]):  # group B: ids 10,11
            v = base_b + eps * np.array([1.0, 0.0, 0.0, 1.0])
            rows.append((10 + i, (v / np.linalg.norm(v)).tolist()))
        rows.append((20, [0.0, 0.0, 1.0, 0.0]))  # singleton
        df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        cents = [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
        ]
        out = {
            r.vec_id: r
            for r in semdedup(df, centroids=cents, threshold=0.99).collect()
        }
        kept = {i for i, r in out.items() if r.is_kept}
        assert 20 in kept
        assert len(kept & {0, 1, 2}) == 1 and len(kept & {10, 11}) == 1
        # every dropped row points at its group's survivor
        for i, r in out.items():
            if not r.is_kept:
                assert r.dup_of in kept
                assert (r.dup_of < 10) == (i < 10)

    def test_cap_rows_survive_unexamined(self, spark):
        """Rows past max_cluster_rows pass through as survivors —
        conservative, never over-drops."""
        rows = [(i, [1.0, 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        out = semdedup(
            df, centroids=[[1.0, 0.0]], threshold=0.9, max_cluster_rows=4
        ).collect()
        dropped = [r.vec_id for r in out if not r.is_kept]
        # 4 in play -> 1 survivor + 3 dropped; the 6 capped rows survive
        assert len(dropped) == 3
        assert len(out) == 10


class TestPlan:
    def test_cell_join_no_cartesian(self, spark, emb):
        out = semdedup(emb, centroids=[[0.0] * 64, [1.0] * 64], threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "cell" in plan


class TestIndexedAssignment:
    """r11: assignment riding a PERSISTED IVF-PQ index — the centroid
    codebook is fit once at index build time and reused by every dedup
    run (and by the ANN serving path), so corpus-scale k never refits
    per run. Same centroids => identical output to passing them
    explicitly."""

    def test_index_path_equals_explicit_centroids(self, spark, tmp_path):
        import random

        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.pq import (
            fit_pq_residual,
            normalized,
            write_ivfpq_index,
        )

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
        ]
        df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        cn = normalized(df)
        cents = fit_kmeans(cn, k=4, max_iter=2)
        books = fit_pq_residual(cn, cents, m=4, ksub=4, max_iter=1)
        path = str(tmp_path / "ivf")
        write_ivfpq_index(df, path, cents, books)

        via_index = semdedup(
            df, index_path=path, threshold=0.8,
            assign_mode="hierarchical",
        ).collect()
        explicit = semdedup(
            df, centroids=cents, threshold=0.8,
            assign_mode="hierarchical",
        ).collect()
        key = lambda r: r.vec_id  # noqa: E731
        assert sorted(via_index, key=key) == sorted(explicit, key=key)

    def test_explicit_centroids_take_precedence(self, spark, tmp_path):
        # centroids= wins over index_path= (explicit beats persisted)
        rows = [(i, [1.0, 0.0]) for i in range(4)]
        df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
        out = semdedup(
            df, centroids=[[1.0, 0.0]], threshold=0.9,
            index_path=str(tmp_path / "missing"),
        ).collect()
        assert len(out) == 4  # the missing index path was never read

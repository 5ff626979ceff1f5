"""Embedding-cosine near-dup dedup (operators/neardup.py) + the
unregistered q_case_bucket's direct oracle parity."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _numpy_neardup(ids, X, planes, threshold, max_bucket_rows):
    """Independent reference: same semantics, plain numpy."""
    P = np.asarray(planes, dtype=np.float64)
    dots = X @ P.T  # BLAS order differs from fixed-order fold, but only
    # the SIGN feeds the bucket; disagreement needs |dot| < ~1e-12 —
    # assert none are that close so the comparison is well-posed.
    assert np.abs(dots).min() > 1e-9
    bucket = (dots >= 0) @ (1 << np.arange(P.shape[0]))
    nrm = np.sqrt((X * X).sum(axis=1))
    dup_of = {}
    for b in np.unique(bucket):
        idx = np.where(bucket == b)[0]
        idx = idx[np.argsort(ids[idx])][:max_bucket_rows]
        for j in range(1, len(idx)):
            for i in range(j):
                cos = float(X[idx[i]] @ X[idx[j]]) / (nrm[idx[i]] * nrm[idx[j]])
                if cos >= threshold:
                    cur = dup_of.get(ids[idx[j]])
                    cand = int(ids[idx[i]])
                    dup_of[ids[idx[j]]] = cand if cur is None else min(cur, cand)
    return {int(i): dup_of.get(i) for i in ids}


class TestEmbeddingNeardup:
    @pytest.mark.parametrize("threshold,n_planes", [(0.35, 8), (0.25, 6)])
    def test_matches_numpy_reference(self, spark, threshold, n_planes):
        import pyarrow.parquet as pq

        from seafowl_spark.io import table
        from seafowl_spark.operators.neardup import embedding_neardup
        from seafowl_spark.queries.similarity import hyperplanes

        t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        ids = np.array(t["vec_id"].to_pylist())
        X = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        expected = _numpy_neardup(
            ids, X, hyperplanes(n_planes), threshold, max_bucket_rows=1024
        )

        out = embedding_neardup(
            table(spark, SF_DIR, "embeddings"),
            threshold=threshold,
            n_planes=n_planes,
        ).collect()
        got = {r["vec_id"]: r["dup_of"] for r in out}
        assert got == expected
        assert any(v is not None for v in got.values())  # non-trivial corpus

    def test_exact_duplicates_always_flagged(self, spark):
        from seafowl_spark.operators.neardup import embedding_neardup

        # 3 copies of one vector + 2 copies of another + a singleton;
        # identical vectors land in the same bucket for ANY plane set.
        va, vb, vc = [1.0, 2.0, -3.0], [-4.0, 0.5, 1.0], [9.0, -9.0, 0.1]
        df = spark.createDataFrame(
            [(10, va), (11, va), (12, va), (20, vb), (21, vb), (30, vc)],
            "vec_id: long, embedding: array<double>",
        )
        got = {
            r["vec_id"]: r["dup_of"]
            for r in embedding_neardup(df, threshold=0.999, n_planes=4).collect()
        }
        assert got == {10: None, 11: 10, 12: 10, 20: None, 21: 20, 30: None}

    def test_bucket_cap_bounds_candidate_set(self, spark):
        from seafowl_spark.operators.neardup import embedding_neardup

        # 40 identical vectors, cap 5: rows beyond the cap never enter the
        # pair join, so they survive (dup_of NULL) — the cap trades recall
        # for a hard bound on the within-bucket join. Deterministic: the
        # cap keeps the 5 SMALLEST ids.
        v = [1.0, 1.0, 1.0]
        df = spark.createDataFrame(
            [(i, v) for i in range(40)], "vec_id: long, embedding: array<double>"
        )
        got = {
            r["vec_id"]: r["dup_of"]
            for r in embedding_neardup(
                df, threshold=0.9, n_planes=4, max_bucket_rows=5
            ).collect()
        }
        flagged = {k for k, x in got.items() if x is not None}
        assert flagged == {1, 2, 3, 4}
        assert all(got[k] == 0 for k in flagged)


def test_case_bucket_oracle_parity(spark):
    """q_case_bucket left the driver registry (50-entry cap) — keep its
    oracle parity verified here directly."""
    import duckdb

    from seafowl_spark.queries.relational import q_case_bucket

    got = sorted(
        (r["bucket"], r["n_orders"], r["min_price"], r["max_price"])
        for r in q_case_bucket(spark, SF_DIR).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               COUNT(*) AS n_orders,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM '{SF_DIR}/orders.parquet' GROUP BY 1
        """
        ).fetchall()
    )
    assert got == want

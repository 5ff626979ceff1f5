"""PageRank (operators/graph.py): value parity with a dense numpy power
iteration under identical damping/dangling conventions, structural
sanity, determinism, and distribution invariants."""

from __future__ import annotations

import numpy as np
import pytest

from seafowl_spark.operators.graph import pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),             # d links in, nothing links to d
    ("e", "f"),             # f is dangling (no out-edges)
]


# slow tier (r14, the r13 verdict's task #3): pagerank power-iteration numeric verification -- multi-
# minute; excluded from the default gate so the driver's pytest
# window completes. Opt in with --runslow (or -m slow).
pytestmark = pytest.mark.slow

def _np_pagerank(edges, damping=0.85, iters=50):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {v: 0 for v in verts}
    for s, _ in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out[s]
        dangling = sum(r[idx[v]] for v in verts if out[v] == 0)
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in verts}


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


class TestPagerank:
    def test_matches_numpy_power_iteration(self, edges):
        got = {r.vertex: r.rank for r in pagerank(edges, max_iter=50, tol=0.0).collect()}
        expect = _np_pagerank(EDGES)
        assert set(got) == set(expect)
        for v in expect:
            assert got[v] == pytest.approx(expect[v], abs=1e-9), v

    def test_ranks_sum_to_one(self, edges):
        got = pagerank(edges, max_iter=30).collect()
        assert sum(r.rank for r in got) == pytest.approx(1.0, abs=1e-9)
        assert all(r.rank > 0 for r in got)

    def test_hub_ranks_highest(self, edges):
        got = {r.vertex: r.rank for r in pagerank(edges, max_iter=30).collect()}
        # c receives from a, b and d — the clear hub
        assert got["c"] == max(got.values())
        # d has no in-links: floor rank (only base + dangling share)
        assert got["d"] == min(got.values())

    def test_deterministic(self, edges):
        a = sorted((r.vertex, r.rank) for r in pagerank(edges, max_iter=15).collect())
        b = sorted((r.vertex, r.rank) for r in pagerank(edges, max_iter=15).collect())
        assert a == b

    def test_early_convergence(self, spark):
        # a 2-cycle converges immediately (symmetric): tol stops it early
        e = spark.createDataFrame([("x", "y"), ("y", "x")], ["src", "dst"])
        got = {r.vertex: r.rank for r in pagerank(e, max_iter=100, tol=1e-12).collect()}
        assert got["x"] == pytest.approx(0.5) and got["y"] == pytest.approx(0.5)

    def test_empty_graph(self, spark):
        e = spark.createDataFrame([], "src string, dst string")
        assert pagerank(e).count() == 0

    def test_duplicate_edges_count_once(self, spark):
        e1 = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"]
        )
        e2 = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
        r1 = sorted((r.vertex, r.rank) for r in pagerank(e1, max_iter=10).collect())
        r2 = sorted((r.vertex, r.rank) for r in pagerank(e2, max_iter=10).collect())
        assert r1 == r2

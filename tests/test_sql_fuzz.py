"""Cross-engine SQL differential fuzz (r8 session D): seeded-random
queries from a dialect-neutral grammar run VERBATIM through the
engine's SQL plane (SeafowlContext.execute -> name rewriting -> Spark)
AND through DuckDB over the same rows, results compared with the same
normalization the correctness gate uses (tools/check_correctness).

This generalizes the fixed 50-row registry the way the deltalite
conformance fuzz generalizes the golden log fixtures: the registry
proves 50 curated shapes; the fuzz proves the ENGINE agrees with an
independent SQL implementation on hundreds of arbitrary
projection/filter/aggregate/having compositions, and any future
regression in the rewrite/dialect/aggregation path fails here first.

Grammar constraints keep the SQL meaning identical on both engines:
integer/string columns only in predicates and groupings, decimal-cast
sums for the one double column, no division (ANSI Spark errors on /0
where DuckDB returns NULL), no ORDER BY (the comparator sorts).
"""

from __future__ import annotations

import random
import sys

import duckdb
import pytest

sys.path.insert(0, "tools")

from check_correctness import compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

INT_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]


# slow tier (r14, the r13 verdict's task #3): randomized SQL statement fuzz -- multi-
# minute; excluded from the default gate so the driver's pytest
# window completes. Opt in with --runslow (or -m slow).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="class")
def engines(spark, tmp_path_factory):
    from seafowl_spark.engine.context import SeafowlContext

    ctx = SeafowlContext(
        spark, str(tmp_path_factory.mktemp("sqlfuzz") / "data")
    )
    ctx.execute(
        "CREATE EXTERNAL TABLE orders_src STORED AS PARQUET "
        f"LOCATION '{SF_DIR}/orders.parquet'"
    )
    ctx.execute(
        "CREATE TABLE fz AS SELECT o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderpriority FROM staging.orders_src"
    )
    ctx.execute(
        "CREATE EXTERNAL TABLE customer_src STORED AS PARQUET "
        f"LOCATION '{SF_DIR}/customer.parquet'"
    )
    ctx.execute(
        "CREATE TABLE fzc AS SELECT c_custkey, c_nationkey, c_mktsegment "
        "FROM staging.customer_src"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW fz AS SELECT o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderpriority "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        "CREATE VIEW fzc AS SELECT c_custkey, c_nationkey, c_mktsegment "
        f"FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    # literal pools drawn from the data so predicates actually split it
    strs = {
        c: [r[0] for r in con.execute(f"SELECT DISTINCT {c} FROM fz").fetchall()]
        for c in STR_COLS
    }
    ints = {
        c: [
            int(v)
            for v in con.execute(
                f"SELECT quantile_disc({c}, [0.1, 0.5, 0.9]) FROM fz"
            ).fetchone()[0]
        ]
        for c in INT_COLS
    }
    return ctx, con, strs, ints


def _pred(rng: random.Random, strs, ints) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        c = rng.choice(INT_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c} {op} {rng.choice(ints[c])}"
    if kind == 1:
        c = rng.choice(INT_COLS)
        k = rng.randrange(2, 10)
        return f"{c} % {k} = {rng.randrange(k)}"
    if kind == 2:
        c = rng.choice(STR_COLS)
        vals = rng.sample(strs[c], k=min(len(strs[c]), rng.randrange(1, 4)))
        lits = ", ".join(f"'{v}'" for v in vals)
        return f"{c} IN ({lits})"
    return f"o_totalprice {rng.choice(['<', '>='])} {rng.randrange(1000, 300000)}"


def _where(rng: random.Random, strs, ints) -> str:
    n = rng.randrange(0, 4)
    if n == 0:
        return ""
    terms = [_pred(rng, strs, ints) for _ in range(n)]
    glue = f" {rng.choice(['AND', 'OR'])} "
    return " WHERE " + glue.join(terms)


def _agg_exprs(rng: random.Random) -> list[str]:
    pool = [
        "COUNT(*)",
        f"COUNT(DISTINCT {rng.choice(INT_COLS + STR_COLS)})",
        f"MIN({rng.choice(INT_COLS + STR_COLS)})",
        f"MAX({rng.choice(INT_COLS + STR_COLS)})",
        f"CAST(SUM({rng.choice(INT_COLS)}) AS BIGINT)",
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)",
        "MIN(o_totalprice)",
        "MAX(o_totalprice)",
    ]
    picks = rng.sample(pool, k=rng.randrange(1, 4))
    return [f"{e} AS a{i}" for i, e in enumerate(picks)]


def _scalar_exprs(rng: random.Random) -> list[str]:
    pool = [
        rng.choice(INT_COLS),
        rng.choice(STR_COLS),
        f"length({rng.choice(STR_COLS)})",
        f"upper({rng.choice(STR_COLS)})",
        f"{rng.choice(INT_COLS)} % {rng.randrange(2, 12)}",
        f"CASE WHEN {rng.choice(INT_COLS)} % 2 = 0 THEN 'even' ELSE 'odd' END",
        f"{rng.choice(STR_COLS)} || '_' || {rng.choice(STR_COLS)}",
        f"abs({rng.choice(INT_COLS)} - {rng.randrange(0, 5000)})",
    ]
    picks = rng.sample(pool, k=rng.randrange(2, 5))
    # keys keep rows distinguishable so the value-hash compare is strict
    return ["o_orderkey AS k"] + [f"{e} AS a{i}" for i, e in enumerate(picks)]


def gen_query(rng: random.Random, strs, ints) -> str:
    roll = rng.random()
    where = _where(rng, strs, ints)
    if roll < 0.2:
        # join path: orders x customer through the engine's rewrite plane
        jt = rng.choice(["JOIN", "LEFT JOIN"])
        group = rng.sample(
            ["o_orderpriority", "c_mktsegment", "c_nationkey"],
            k=rng.randrange(1, 3),
        )
        aggs = rng.sample(
            [
                "COUNT(*) AS a0",
                "COUNT(c.c_custkey) AS a1",
                "CAST(SUM(o.o_orderkey) AS BIGINT) AS a2",
                "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)"
                " AS a3",
                "MIN(o.o_orderstatus) AS a4",
            ],
            k=rng.randrange(1, 3),
        )
        # customer on the LEFT so LEFT JOIN actually null-extends
        # (customers with no orders exist; every order has a customer)
        return (
            f"SELECT {', '.join(group + aggs)} FROM fzc c {jt} fz o "
            f"ON o.o_custkey = c.c_custkey{where}"
            f" GROUP BY {', '.join(group)}"
        )
    if roll < 0.35:
        # deterministic top-k: ORDER BY the unique key, so LIMIT is
        # well-defined on both engines
        desc = rng.choice(["", " DESC"])
        n = rng.randrange(1, 40)
        return (
            f"SELECT {', '.join(_scalar_exprs(rng))} FROM fz{where}"
            f" ORDER BY o_orderkey{desc} LIMIT {n}"
        )
    if roll < 0.6:
        group = rng.sample(STR_COLS, k=rng.randrange(0, 3))
        aggs = _agg_exprs(rng)
        sel = ", ".join(group + aggs)
        sql = f"SELECT {sel} FROM fz{where}"
        if group:
            sql += " GROUP BY " + ", ".join(group)
            if rng.random() < 0.3:
                sql += f" HAVING COUNT(*) > {rng.randrange(0, 50)}"
        return sql
    return f"SELECT {', '.join(_scalar_exprs(rng))} FROM fz{where}"


class TestSqlDifferentialFuzz:
    @pytest.mark.parametrize("seed", [11, 23, 37, 59])
    def test_engine_matches_duckdb(self, engines, seed):
        ctx, con, strs, ints = engines
        rng = random.Random(seed)
        mismatches = []
        for i in range(12):
            sql = gen_query(rng, strs, ints)
            got = ctx.execute(sql).toPandas()
            want = con.execute(sql).df()
            problems = compare(got, want, f"seed{seed}_q{i}")
            if problems:
                mismatches.append((sql, problems))
        assert mismatches == []

"""Adapted TPC-H suite — all 22 query SHAPES vs a DuckDB value oracle.

The driver's testdata (TESTDATA.md) is TPC-H-ish but slimmed: no
``partsupp`` table and no ``l_commitdate`` / ``l_receiptdate`` / comment /
address / phone / container / shipmode columns.  Each query below keeps the
canonical TPC-H *relational shape* — the multi-way join topology, the
correlated scalar subqueries, EXISTS / NOT EXISTS, HAVING over a scalar
subquery, nested INs, disjunctive join predicates — while substituting
columns that exist.  Reference parity: seafowl runs arbitrary SQL through
DataFusion (reference tests/statements/query.rs); this suite proves the
same breadth of relational surface on the Spark engine, value-checked
against DuckDB running the *identical* SQL text.

Every query carries a deterministic ORDER BY (unique trailing key) so both
engines return rows in the same order; floats compare with a relative
tolerance since the two engines sum in different orders.
"""

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pytest

from seafowl_spark.io import register_views

# CI default is sf0.001 (~15 s); set SEAFOWL_TPCH_SF_DIR to re-run the
# whole suite against a bigger scale factor
SF_DIR = os.environ.get("SEAFOWL_TPCH_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


@pytest.fixture(scope="module")
def tpch_spark(spark):
    register_views(spark, SF_DIR, names=TABLES)
    return spark


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _cell_eq(s, d):
    if s is None or d is None:
        return s is None and d is None
    if isinstance(s, Decimal):
        s = float(s)
    if isinstance(d, Decimal):
        d = float(d)
    if isinstance(s, float) or isinstance(d, float):
        return math.isclose(float(s), float(d), rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(s, datetime.datetime) or isinstance(d, datetime.datetime):
        return s == d
    return s == d


def run_parity(spark, oracle, sql, min_rows=1, duck_sql=None):
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    drows = [tuple(r) for r in oracle.execute(duck_sql or sql).fetchall()]
    assert len(srows) == len(drows), f"row count {len(srows)} != oracle {len(drows)}"
    assert len(srows) >= min_rows, f"vacuous result ({len(srows)} rows)"
    for i, (sr, dr) in enumerate(zip(srows, drows)):
        assert len(sr) == len(dr), f"row {i} arity"
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            assert _cell_eq(sv, dv), f"row {i} col {j}: spark={sv!r} oracle={dv!r}"


# --- the 22 shapes -----------------------------------------------------------

Q = {}

# Q1: full-scan aggregation, many aggregates per group (verbatim shape).
Q["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                        AS sum_qty,
       sum(l_extendedprice)                                   AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
       avg(l_quantity)                                        AS avg_qty,
       avg(l_extendedprice)                                   AS avg_price,
       avg(l_discount)                                        AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# Q2: min-cost supplier — correlated scalar MIN subquery repeating the outer
# join topology (partsupp replaced by the lineitem part<->supplier pairing).
Q["q2_min_cost_supplier"] = """
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
FROM part p, supplier s, lineitem l, nation n, region r
WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
  AND p.p_type = 'PROMO' AND p.p_size <= 25
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (
      SELECT min(s2.s_acctbal)
      FROM supplier s2, lineitem l2, nation n2, region r2
      WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
        AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
"""

# Q3: shipping priority — 3-way join, group, float-desc top-k w/ tiebreak.
Q["q3_shipping_priority"] = """
SELECT l.l_orderkey,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
       o.o_orderdate
FROM customer c, orders o, lineitem l
WHERE c.c_mktsegment = 'BUILDING'
  AND c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate < DATE '1997-03-15' AND l.l_shipdate > DATE '1997-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

# Q4: order-priority check — correlated EXISTS with a non-equi predicate
# against the outer row (commitdate/receiptdate replaced by ship lag).
Q["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# Q5: local-supplier volume — 6-way join incl. the c/s same-nation constraint.
Q["q5_local_supplier"] = """
SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""

# Q6: forecast revenue — pure scan + range predicates, single row.
Q["q6_forecast_revenue"] = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24
"""

# Q7: volume shipping — self-joined nation pair with a symmetric OR.
Q["q7_volume_shipping"] = """
SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         extract(YEAR FROM l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
    AND c.c_custkey = o.o_custkey
    AND s.s_nationkey = n1.n_nationkey AND c.c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# Q8: market share — conditional-sum ratio over an 8-way join.
Q["q8_market_share"] = """
SELECT o_year,
       sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume)
         AS mkt_share
FROM (
  SELECT extract(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS nation
  FROM part p, supplier s, lineitem l, orders o, customer c,
       nation n1, nation n2, region r
  WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
    AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
    AND c.c_nationkey = n2.n_nationkey AND n2.n_regionkey = r.r_regionkey
    AND r.r_name = 'EUROPE' AND s.s_nationkey = n1.n_nationkey
    AND o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

# Q9: product-type profit (ps_supplycost replaced by a retail-price margin).
Q["q9_product_profit"] = """
SELECT nation, o_year, sum(amount) AS sum_profit
FROM (
  SELECT n.n_name AS nation, extract(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - p.p_retailprice * l.l_quantity * 0.1 AS amount
  FROM part p, supplier s, lineitem l, orders o, nation n
  WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
    AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
    AND p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

# Q10: returned-item reporting — top 20 customers by returned revenue.
Q["q10_returned_items"] = """
SELECT c.c_custkey, c.c_name,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-07-01'
  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# Q11: important stock — HAVING against a scalar subquery re-running the
# same aggregate globally (partsupp value -> lineitem extended value).
Q["q11_important_stock"] = """
SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
FROM lineitem l, supplier s, nation n
WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
  AND n.n_name = 'NATION_3'
GROUP BY l.l_partkey
HAVING sum(l.l_extendedprice * l.l_quantity) > (
    SELECT sum(l2.l_extendedprice * l2.l_quantity) * 3.0
           / count(DISTINCT l2.l_partkey)
    FROM lineitem l2, supplier s2, nation n2
    WHERE l2.l_suppkey = s2.s_suppkey AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_name = 'NATION_3')
ORDER BY value DESC, l_partkey
"""

# Q12: shipmode priority — join + dual conditional counts (shipmode
# replaced by returnflag buckets).
Q["q12_priority_counts"] = """
SELECT l.l_returnflag,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o, lineitem l
WHERE o.o_orderkey = l.l_orderkey
  AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# Q13: customer order-count distribution — LEFT JOIN with an extra ON
# predicate, then a second-level aggregation over the first.
Q["q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# Q14: promo revenue — conditional-sum ratio (p_type prefix match).
Q["q14_promo_revenue"] = """
SELECT 100.00 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0 END)
       / sum(l.l_extendedprice * (1 - l.l_discount)) AS promo_revenue
FROM lineitem l, part p
WHERE l.l_partkey = p.p_partkey
  AND l.l_shipdate >= DATE '1996-06-01' AND l.l_shipdate < DATE '1996-09-01'
"""

# Q15: top supplier — CTE reused twice, float-max scalar subquery.
Q["q15_top_supplier"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s, revenue r
WHERE s.s_suppkey = r.supplier_no
  AND r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

# Q16: parts/supplier relationship — NOT IN subquery + count(DISTINCT).
Q["q16_parts_suppliers"] = """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l, part p
WHERE p.p_partkey = l.l_partkey
  AND p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# Q17: small-quantity revenue — correlated AVG scalar subquery per part.
Q["q17_small_quantity"] = """
SELECT sum(l.l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem l, part p
WHERE p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
  AND l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey)
"""

# Q18: large-volume customer — IN over a grouped HAVING subquery.
Q["q18_large_volume"] = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       sum(l.l_quantity) AS total_qty
FROM customer c, orders o, lineitem l
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250)
  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""

# Q19: discounted revenue — disjunctive predicates that each embed the
# join condition (Catalyst must still extract the common equi-join).
Q["q19_disjunctive"] = """
SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM lineitem l, part p
WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
       AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 1 AND 30)
   OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#22'
       AND p.p_size BETWEEN 10 AND 40 AND l.l_quantity BETWEEN 5 AND 45)
"""

# Q20: potential promotion — nested IN subqueries with grouped HAVING.
Q["q20_potential_promotion"] = """
SELECT s.s_name, s.s_acctbal
FROM supplier s, nation n
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(l.l_quantity) > 40)
  AND s.s_nationkey = n.n_nationkey
ORDER BY s.s_name
"""

# Q21: waiting orders — EXISTS + NOT EXISTS, both correlated on the outer
# lineitem AND the outer order's date (multi-table outer references).
Q["q21_waiting_orders"] = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s, lineitem l1, orders o, nation n
WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
  AND s.s_nationkey = n.n_nationkey
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""

# Q22: global sales opportunity — substring bucketing, uncorrelated AVG
# scalar subquery, anti-join via NOT EXISTS (dated so it's non-vacuous:
# every test customer has at least one order).
Q["q22_sales_opportunity"] = """
SELECT cntrycode, count(*) AS numcust, sum(c_acctbal) AS totacctbal
FROM (
  SELECT substr(c.c_name, 16, 2) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


@pytest.mark.parametrize("name", list(Q))
def test_tpch_shape(tpch_spark, oracle, name):
    run_parity(tpch_spark, oracle, Q[name])


class TestTpchPlans:
    """Plan-shape gates on the TPC-H joins: the properties that keep these
    queries viable at 100 TB — dims broadcast, top-k without a global sort,
    subqueries decorrelated into joins rather than per-row re-execution,
    no cartesian blowups — asserted on the physical plans Catalyst emits."""

    def plan(self, spark, name):
        return spark.sql(Q[name])._jdf.queryExecution().executedPlan().toString()

    def test_q5_dims_broadcast(self, tpch_spark):
        # customer/supplier/nation/region are all broadcast-sized; lineitem
        # (the fact side) must never shuffle onto a dim.
        assert self.plan(tpch_spark, "q5_local_supplier").count("BroadcastHashJoin") >= 3

    def test_q3_topk_no_global_sort(self, tpch_spark):
        plan = self.plan(tpch_spark, "q3_shipping_priority")
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_q18_in_subquery_is_semi_join(self, tpch_spark):
        assert "Semi" in self.plan(tpch_spark, "q18_large_volume")

    def test_q2_correlated_min_decorrelates(self, tpch_spark):
        # the correlated MIN must plan as aggregate + join, not a per-row
        # re-execution (which would be O(n * subquery) at scale)
        plan = self.plan(tpch_spark, "q2_min_cost_supplier")
        assert "CartesianProduct" not in plan

    def test_q21_existence_joins_no_cartesian(self, tpch_spark):
        plan = self.plan(tpch_spark, "q21_waiting_orders")
        assert "CartesianProduct" not in plan

    def test_q19_disjunctive_join_not_nested_loop(self, tpch_spark):
        # each disjunct embeds p_partkey = l_partkey; Catalyst must extract
        # the common equi-key instead of falling back to a nested loop over
        # the full cross space
        plan = self.plan(tpch_spark, "q19_disjunctive")
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # equi-key extracted, OR residual

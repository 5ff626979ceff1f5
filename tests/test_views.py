"""Logical (non-materialized) views (engine/context.py VIEW_PROP, r8
session D — beyond the reference, which rejects CreateView outright:
src/context/physical.rs:573-575). The defining query is stored in the
catalog with zero data files and re-expanded at every statement, so
reads always track the live base tables with no refresh step."""

import pytest

from seafowl_spark.engine.context import ExecutionError
from tests.conftest import rows


def seed(ctx):
    ctx.execute("CREATE TABLE sales (region string, amount bigint)")
    ctx.execute(
        "INSERT INTO sales VALUES ('east', 10), ('east', 20), ('west', 5)"
    )


class TestViewLifecycle:
    def test_create_select_tracks_base_dml(self, ctx):
        seed(ctx)
        ctx.execute(
            "CREATE VIEW v AS SELECT region, SUM(amount) AS total "
            "FROM sales GROUP BY region"
        )
        assert rows(ctx.execute("SELECT * FROM v ORDER BY region")) == [
            ("east", 30), ("west", 5),
        ]
        # no refresh step: DML on the base is visible immediately
        ctx.execute("INSERT INTO sales VALUES ('west', 100)")
        ctx.execute("DELETE FROM sales WHERE amount = 10")
        assert rows(ctx.execute("SELECT * FROM v ORDER BY region")) == [
            ("east", 20), ("west", 105),
        ]

    def test_view_over_view_and_joins_back_to_base(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v1 AS SELECT region, amount FROM sales")
        ctx.execute(
            "CREATE VIEW v2 AS SELECT region, SUM(amount) AS t FROM v1 "
            "GROUP BY region"
        )
        got = rows(
            ctx.execute(
                "SELECT s.region, s.amount, v.t FROM sales s "
                "JOIN v2 v ON v.region = s.region WHERE s.amount > 9 "
                "ORDER BY s.amount"
            )
        )
        assert got == [("east", 10, 30), ("east", 20, 30)]

    def test_or_replace_changes_definition(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region FROM sales")
        with pytest.raises(ExecutionError, match="already exists"):
            ctx.execute("CREATE VIEW v AS SELECT amount FROM sales")
        ctx.execute(
            "CREATE OR REPLACE VIEW v AS SELECT COUNT(*) AS n FROM sales"
        )
        assert rows(ctx.execute("SELECT n FROM v")) == [(3,)]

    def test_or_replace_refuses_tables(self, ctx):
        seed(ctx)
        with pytest.raises(ExecutionError, match="cannot replace a table"):
            ctx.execute(
                "CREATE OR REPLACE VIEW sales AS SELECT 1 AS x FROM sales"
            )

    def test_drop_view(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region FROM sales")
        ctx.execute("DROP VIEW v")
        with pytest.raises(Exception):
            ctx.execute("SELECT * FROM v")
        ctx.execute("DROP VIEW IF EXISTS v")  # no error
        with pytest.raises(ExecutionError, match="does not exist"):
            ctx.execute("DROP VIEW v")
        with pytest.raises(ExecutionError, match="is not a view"):
            ctx.execute("DROP VIEW sales")

    def test_broken_view_only_fails_statements_referencing_it(self, ctx):
        seed(ctx)
        ctx.execute("CREATE TABLE doomed (x bigint)")
        ctx.execute("CREATE VIEW v AS SELECT x FROM doomed")
        ctx.execute("DROP TABLE doomed")
        # other statements keep working
        assert rows(ctx.execute("SELECT COUNT(*) AS n FROM sales")) == [(3,)]
        with pytest.raises(Exception):
            ctx.execute("SELECT * FROM v")


class TestViewGuards:
    def test_dml_rejected(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region, amount FROM sales")
        for sql, what in [
            ("INSERT INTO v VALUES ('x', 1)", "INSERT"),
            ("UPDATE v SET amount = 1 WHERE region = 'east'", "UPDATE"),
            ("DELETE FROM v WHERE amount > 0", "DELETE"),
        ]:
            with pytest.raises(ExecutionError, match="not allowed on a view"):
                ctx.execute(sql)

    def test_refresh_rejected(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region FROM sales")
        with pytest.raises(ExecutionError, match="not a materialized view"):
            ctx.execute("REFRESH MATERIALIZED VIEW v")

    def test_staging_base_rejected(self, ctx):
        seed(ctx)
        with pytest.raises(ExecutionError, match="staging"):
            ctx.execute(
                "CREATE VIEW v AS SELECT * FROM staging.anything"
            )

    def test_time_travel_rejected(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region FROM sales")
        with pytest.raises(ExecutionError, match="time travel over a view"):
            ctx.execute("SELECT * FROM v FOR VERSION AS OF 0")

    def test_matview_over_view_rejected(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region, amount FROM sales")
        with pytest.raises(ExecutionError, match="base table"):
            ctx.execute(
                "CREATE MATERIALIZED VIEW mv AS "
                "SELECT region, SUM(amount) AS t FROM v GROUP BY region"
            )


class TestViewMetadata:
    def test_show_create_round_trips(self, ctx):
        seed(ctx)
        ctx.execute(
            "CREATE VIEW v AS SELECT region, SUM(amount) AS total "
            "FROM sales GROUP BY region"
        )
        ddl = ctx.execute("SHOW CREATE TABLE v").collect()[0][0]
        assert ddl.startswith("CREATE VIEW public.v AS SELECT")
        ctx.execute("DROP VIEW v")
        ctx.execute(ddl.replace("public.v", "v2"))
        assert rows(ctx.execute("SELECT * FROM v2 ORDER BY region")) == [
            ("east", 30), ("west", 5),
        ]

    def test_information_schema_table_type(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW v AS SELECT region FROM sales")
        got = dict(
            rows(
                ctx.execute(
                    "SELECT table_name, table_type FROM "
                    "information_schema.tables "
                    "WHERE table_name IN ('sales', 'v')"
                )
            )
        )
        assert got == {"sales": "BASE TABLE", "v": "VIEW"}

    def test_ctas_and_insert_select_from_view(self, ctx):
        seed(ctx)
        ctx.execute(
            "CREATE VIEW v AS SELECT region, SUM(amount) AS total "
            "FROM sales GROUP BY region"
        )
        ctx.execute("CREATE TABLE snap AS SELECT * FROM v")
        ctx.execute("INSERT INTO snap SELECT * FROM v")
        assert rows(
            ctx.execute("SELECT COUNT(*) AS n FROM snap")
        ) == [(4,)]


class TestViewDmlFuzz:
    """Seeded DML churn: after EVERY engine mutation of the base, the
    view must equal direct recomputation of its defining query — guards
    the reload/expansion path (deferred registration, name rewriting)
    under the same churn the matview refresh fuzz applies."""

    def test_view_tracks_base_under_random_dml(self, ctx):
        import random

        rng = random.Random(43)
        ctx.execute("CREATE TABLE fz (g string, v bigint)")
        ctx.execute(
            "INSERT INTO fz VALUES ('a', 1), ('b', 2), ('c', 3), ('a', 4)"
        )
        ctx.execute(
            "CREATE VIEW vz AS SELECT g, COUNT(*) AS n, SUM(v) AS s, "
            "MIN(v) AS mn, MAX(v) AS mx FROM fz GROUP BY g"
        )
        groups = ["a", "b", "c", "d", "e"]
        for step in range(12):
            op = rng.randrange(3)
            g = rng.choice(groups)
            if op == 0:
                ctx.execute(
                    f"INSERT INTO fz VALUES ('{g}', {rng.randrange(100)})"
                )
            elif op == 1:
                ctx.execute(
                    f"UPDATE fz SET v = v + {rng.randrange(10)} "
                    f"WHERE g = '{g}'"
                )
            else:
                ctx.execute(
                    f"DELETE FROM fz WHERE g = '{g}' AND v % 3 = {step % 3}"
                )
            got = sorted(rows(ctx.execute("SELECT * FROM vz")))
            want = sorted(
                rows(
                    ctx.execute(
                        "SELECT g, COUNT(*) AS n, SUM(v) AS s, "
                        "MIN(v) AS mn, MAX(v) AS mx FROM fz GROUP BY g"
                    )
                )
            )
            assert got == want, f"step {step}"


class TestBrokenViewStaleness:
    def test_unqualified_reference_never_reads_stale_plan(self, ctx):
        """If a view's re-expansion breaks (here: the base drops a column
        the view selects), an unqualified reference must FAIL — not
        silently serve the temp view left by the last healthy reload."""
        ctx.execute("CREATE TABLE bt (x bigint, y bigint)")
        ctx.execute("INSERT INTO bt VALUES (1, 2)")
        ctx.execute("CREATE VIEW bv AS SELECT x, y FROM bt")
        assert rows(ctx.execute("SELECT * FROM bv")) == [(1, 2)]  # healthy
        ctx.execute("ALTER TABLE bt DROP COLUMN y")
        # other statements keep working
        assert rows(ctx.execute("SELECT x FROM bt")) == [(1,)]
        for sql in ("SELECT * FROM bv", "SELECT * FROM public.bv"):
            with pytest.raises(Exception):
                ctx.execute(sql)


class TestViewDependencyOrder:
    """Catalog order is (schema, name), not creation order — expansion
    must reach a fixpoint so a view alphabetically BEFORE its dependency
    still binds the current snapshot (review finding, r8 session D)."""

    def test_dependent_sorting_first_sees_fresh_base(self, ctx):
        ctx.execute("CREATE TABLE zt (x bigint)")
        ctx.execute("INSERT INTO zt VALUES (1)")
        ctx.execute("CREATE VIEW z_view AS SELECT x FROM zt")
        # 'a_view' sorts BEFORE 'z_view' but depends on it
        ctx.execute("CREATE VIEW a_view AS SELECT x + 1 AS y FROM z_view")
        assert rows(ctx.execute("SELECT y FROM a_view")) == [(2,)]
        ctx.execute("INSERT INTO zt VALUES (10)")
        # the dependent must see the INSERT in the SAME statement's
        # reload — a name-ordered expansion binds the stale z_view plan
        assert sorted(rows(ctx.execute("SELECT y FROM a_view"))) == [
            (2,), (11,),
        ]

    def test_dependent_of_broken_view_breaks_too(self, ctx):
        ctx.execute("CREATE TABLE bt2 (x bigint)")
        ctx.execute("CREATE VIEW z2 AS SELECT x FROM bt2")
        ctx.execute("CREATE VIEW a2 AS SELECT x FROM z2")
        ctx.execute("DROP TABLE bt2")
        for sql in ("SELECT * FROM a2", "SELECT * FROM z2"):
            with pytest.raises(Exception):
                ctx.execute(sql)


class TestViewRenameChurn:
    """Views bind their defining query by NAME at every re-expansion
    (text-based views, not OID-based): renaming the base breaks the view
    until the name resolves again — either by renaming back or by a new
    table taking the old name. Pinned contracts + a seeded churn loop
    (r8 verdict task: rename-under-live-view and replace races)."""

    def test_rename_base_breaks_view_rename_back_heals(self, ctx):
        ctx.execute("CREATE TABLE rb (x bigint)")
        ctx.execute("INSERT INTO rb VALUES (1), (2)")
        ctx.execute("CREATE VIEW rv AS SELECT SUM(x) AS s FROM rb")
        assert rows(ctx.execute("SELECT s FROM rv")) == [(3,)]
        ctx.execute("ALTER TABLE rb RENAME TO rb2")
        # the view is broken: referencing it fails, other statements work
        with pytest.raises(Exception):
            ctx.execute("SELECT s FROM rv")
        assert rows(ctx.execute("SELECT COUNT(*) AS n FROM rb2")) == [(2,)]
        ctx.execute("ALTER TABLE rb2 RENAME TO rb")
        assert rows(ctx.execute("SELECT s FROM rv")) == [(3,)]

    def test_new_table_taking_old_name_rebinds_view(self, ctx):
        # textual semantics: the view follows the NAME, so a fresh table
        # under the old name rebinds it (PG would follow the renamed
        # table; this engine's views are stored text, re-expanded)
        ctx.execute("CREATE TABLE nt (x bigint)")
        ctx.execute("INSERT INTO nt VALUES (5)")
        ctx.execute("CREATE VIEW nv AS SELECT SUM(x) AS s FROM nt")
        ctx.execute("ALTER TABLE nt RENAME TO nt_old")
        ctx.execute("CREATE TABLE nt (x bigint)")
        ctx.execute("INSERT INTO nt VALUES (100)")
        assert rows(ctx.execute("SELECT s FROM nv")) == [(100,)]

    def test_rename_view_itself_keeps_it_working(self, ctx):
        ctx.execute("CREATE TABLE vb (x bigint)")
        ctx.execute("INSERT INTO vb VALUES (4)")
        ctx.execute("CREATE VIEW old_v AS SELECT x FROM vb")
        ctx.execute("ALTER TABLE old_v RENAME TO new_v")
        assert rows(ctx.execute("SELECT x FROM new_v")) == [(4,)]
        with pytest.raises(Exception):
            ctx.execute("SELECT x FROM old_v")

    def test_replace_while_dependent_exists(self, ctx):
        # replacing a view another view reads must propagate on the next
        # expansion, and a replacement that breaks the dependent leaves
        # only the DEPENDENT failing
        ctx.execute("CREATE TABLE db1 (x bigint)")
        ctx.execute("INSERT INTO db1 VALUES (1)")
        ctx.execute("CREATE VIEW inner_v AS SELECT x FROM db1")
        ctx.execute("CREATE VIEW outer_v AS SELECT x + 1 AS y FROM inner_v")
        assert rows(ctx.execute("SELECT y FROM outer_v")) == [(2,)]
        ctx.execute(
            "CREATE OR REPLACE VIEW inner_v AS SELECT x * 10 AS x FROM db1"
        )
        assert rows(ctx.execute("SELECT y FROM outer_v")) == [(11,)]
        # now break the contract: drop the column the dependent needs
        ctx.execute(
            "CREATE OR REPLACE VIEW inner_v AS SELECT x AS z FROM db1"
        )
        with pytest.raises(Exception):
            ctx.execute("SELECT y FROM outer_v")
        assert rows(ctx.execute("SELECT z FROM inner_v")) == [(1,)]

    def test_seeded_rename_replace_churn(self, ctx):
        """Random rename/rename-back/replace/DML churn with a live view:
        after every step the view either equals direct recomputation (its
        base resolves) or errors cleanly (it does not) — never a stale
        or wrong answer."""
        import random

        rng = random.Random(71)
        ctx.execute("CREATE TABLE ct (g string, v bigint)")
        ctx.execute("INSERT INTO ct VALUES ('a', 1), ('b', 2)")
        ctx.execute(
            "CREATE VIEW cv AS SELECT g, SUM(v) AS s FROM ct GROUP BY g"
        )
        present = True  # is the name `ct` currently bound?
        for step in range(12):
            op = rng.randrange(4)
            if op == 0 and present:
                ctx.execute("ALTER TABLE ct RENAME TO ct_x")
                present = False
            elif op == 0:
                ctx.execute("ALTER TABLE ct_x RENAME TO ct")
                present = True
            elif op == 1 and present:
                ctx.execute(
                    f"INSERT INTO ct VALUES ('{rng.choice('abc')}', "
                    f"{rng.randrange(50)})"
                )
            elif op == 2 and present:
                ctx.execute(
                    "CREATE OR REPLACE VIEW cv AS "
                    "SELECT g, SUM(v) AS s FROM ct GROUP BY g"
                )
            if present:
                got = sorted(rows(ctx.execute("SELECT g, s FROM cv")))
                want = sorted(
                    rows(
                        ctx.execute(
                            "SELECT g, SUM(v) AS s FROM ct GROUP BY g"
                        )
                    )
                )
                assert got == want, f"step {step}"
            else:
                with pytest.raises(Exception):
                    ctx.execute("SELECT g, s FROM cv")


class TestViewDdlGuards:
    def test_storage_ddl_rejected_on_views(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW gv AS SELECT region, amount FROM sales")
        for sql in (
            "TRUNCATE gv",
            "ALTER TABLE gv ADD COLUMN zz BIGINT",
            "ALTER TABLE gv DROP COLUMN amount",
            "OPTIMIZE gv",
        ):
            with pytest.raises(ExecutionError, match="not allowed on a view"):
                ctx.execute(sql)
        with pytest.raises(ExecutionError, match="use DROP VIEW"):
            ctx.execute("DROP TABLE gv")

    def test_bare_staging_name_rejected(self, ctx):
        seed(ctx)
        ctx.execute(
            "CREATE EXTERNAL TABLE ext_docs STORED AS PARQUET "
            "LOCATION '/root/testdata/sf0.001/documents.parquet'"
        )
        with pytest.raises(ExecutionError, match="staging"):
            ctx.execute("CREATE VIEW sv AS SELECT doc_id FROM ext_docs")

    def test_time_travel_in_definition_rejected(self, ctx):
        seed(ctx)
        with pytest.raises(ExecutionError, match="time travel"):
            ctx.execute(
                "CREATE VIEW tv AS SELECT * FROM sales "
                "FOR VERSION AS OF 0"
            )

    def test_replace_view_with_self_reference_rejected(self, ctx):
        # the replacement would VALIDATE against the old view's temp
        # registration then persist a query reload_views can never
        # re-expand, silently destroying the view (r8 review finding)
        seed(ctx)
        ctx.execute("CREATE VIEW sr AS SELECT region, amount FROM sales")
        for q in (
            "SELECT region FROM sr",
            "SELECT region FROM public.sr",
            'SELECT region FROM "sr"',
        ):
            with pytest.raises(ExecutionError, match="terms of itself"):
                ctx.execute(f"CREATE OR REPLACE VIEW sr AS {q}")
        # the original view is intact after the rejections
        assert rows(ctx.execute("SELECT COUNT(*) AS n FROM sr")) == [(3,)]
        # and a legitimate replacement still works
        ctx.execute("CREATE OR REPLACE VIEW sr AS SELECT region FROM sales")
        assert rows(ctx.execute("SELECT COUNT(*) AS n FROM sr")) == [(3,)]


class TestViewCloneGuard:
    def test_shallow_clone_of_view_refused(self, ctx):
        seed(ctx)
        ctx.execute("CREATE VIEW cv AS SELECT region FROM sales")
        with pytest.raises(ExecutionError, match="SHALLOW CLONE of a view"):
            ctx.execute("CREATE TABLE cc SHALLOW CLONE cv")
        # CTAS is the supported materialization
        ctx.execute("CREATE TABLE cc AS SELECT * FROM cv")
        assert rows(ctx.execute("SELECT COUNT(*) AS n FROM cc")) == [(3,)]

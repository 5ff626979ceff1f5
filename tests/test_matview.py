"""Incremental materialized views (engine/matview.py, r8 — beyond the
reference, which has no view machinery): create materializes the group
aggregate; refresh recomputes ONLY the groups whose base files changed
(endpoint file-set diff incl. deletion-vector identity), merges them in
and deletes vanished groups; fallbacks downgrade to a full overwrite."""

import os

import pytest

from seafowl_spark.engine.context import ExecutionError
from seafowl_spark.engine.deltalite import DeltaLiteTable
from seafowl_spark.engine.matview import (
    MatViewError,
    group_predicate,
    parse_mv_select,
    query_at_version,
)
from tests.conftest import rows


def _mv_table(ctx, name="mv"):
    e = next(
        e for e in ctx.catalog.tables(ctx.database) if e.name == name
    )
    return DeltaLiteTable(ctx.spark, ctx.table_root(e))


def seed_base(ctx):
    ctx.execute("CREATE TABLE sales (region string, amount bigint, qty bigint)")
    ctx.execute(
        "INSERT INTO sales VALUES "
        "('east', 10, 1), ('east', 20, 2), ('west', 5, 1), ('north', 7, 3)"
    )


MV_SQL = (
    "CREATE MATERIALIZED VIEW mv AS "
    "SELECT region, SUM(amount) AS total, COUNT(*) AS n, MAX(qty) AS mx "
    "FROM sales GROUP BY region"
)


class TestMvSpecParsing:
    def test_parse_extracts_base_and_groups(self):
        base, cols = parse_mv_select(
            "SELECT a, b, SUM(x) AS s FROM sch.tbl GROUP BY a, b"
        )
        assert base == "sch.tbl" and cols == ["a", "b"]

    def test_rejects_subqueries_setops_outer_joins(self):
        with pytest.raises(MatViewError, match="one SELECT"):
            parse_mv_select(
                "SELECT a, SUM(x) FROM (SELECT * FROM t) GROUP BY a"
            )
        with pytest.raises(MatViewError, match="GROUP BY"):
            parse_mv_select("SELECT SUM(x) FROM t")
        with pytest.raises(MatViewError, match="unaliased"):
            parse_mv_select("SELECT upper(a) AS u, SUM(x) FROM t GROUP BY a")
        with pytest.raises(MatViewError, match="set operations"):
            parse_mv_select(
                "SELECT a, SUM(x) FROM t GROUP BY a "
                "UNION ALL SELECT a, SUM(x) FROM u GROUP BY a"
            )
        for jk in ("RIGHT JOIN", "FULL OUTER JOIN", "CROSS JOIN"):
            with pytest.raises(MatViewError, match="INNER/LEFT"):
                parse_mv_select(
                    f"SELECT a, SUM(x) FROM t {jk} u ON t.a = u.a GROUP BY a"
                )

    def test_comma_join_rejected(self):
        # an implicit cross join would slip past dimension version
        # tracking (review finding, r9): the dim could mutate with the
        # view silently reporting fresh
        with pytest.raises(MatViewError, match="explicit JOIN"):
            parse_mv_select(
                "SELECT r_name, SUM(amount) AS s FROM fact f, dim d "
                "WHERE f.k = d.k GROUP BY r_name"
            )
        # commas inside parens (USING lists, function args) are fine
        from seafowl_spark.engine.matview import parse_mv_query

        shape = parse_mv_query(
            "SELECT a, SUM(coalesce(x, y)) AS s FROM t "
            "JOIN u USING (a, b) GROUP BY a"
        )
        assert shape.dims == ["u"]

    def test_parse_join_shape(self):
        from seafowl_spark.engine.matview import parse_mv_query

        shape = parse_mv_query(
            "SELECT r_name, SUM(amount) AS total FROM sales s "
            "JOIN region r ON s.rkey = r.r_key "
            "LEFT JOIN nation n ON s.nkey = n.n_key "
            "WHERE amount > 0 GROUP BY r_name"
        )
        assert shape.base == "sales" and shape.base_alias == "s"
        assert shape.dims == ["region", "nation"]
        assert shape.group_cols == ["r_name"]
        assert shape.from_sql.startswith("FROM sales s")
        assert shape.from_sql.rstrip().endswith("WHERE amount > 0")
        a, b = shape.base_span
        assert shape.from_sql[a:b] == "sales"

    def test_parse_unaliased_base_keeps_no_alias(self):
        from seafowl_spark.engine.matview import parse_mv_query

        shape = parse_mv_query(
            "SELECT g, SUM(x) AS s FROM t JOIN d ON g = d.k GROUP BY g"
        )
        assert shape.base == "t" and shape.base_alias is None
        assert shape.dims == ["d"]

    def test_query_at_version_pins_the_from(self):
        q = query_at_version("SELECT a, SUM(x) AS s FROM t GROUP BY a", "t", 7)
        assert "FROM t FOR VERSION AS OF 7" in q

    def test_group_predicate_literals(self):
        assert group_predicate(["g"], [("a'b",), (5,)]) == "g IN ('a''b', 5)"
        two = group_predicate(["g", "h"], [("x", 1)])
        assert two == "(g = 'x' AND h = 1)"

    def test_group_predicate_escapes_backslashes(self):
        # Spark string literals process backslash escapes: an unescaped
        # 'C:\new' would denote 'C:<LF>ew' and the refresh would silently
        # drop the real group (r8 review finding)
        assert group_predicate(["g"], [("C:\\new",)]) == "g IN ('C:\\\\new')"


class TestMatViewLifecycle:
    def test_create_materializes_initial_state(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        got = rows(
            ctx.execute("SELECT region, total, n, mx FROM mv ORDER BY region")
        )
        assert got == [("east", 30, 2, 2), ("north", 7, 1, 3), ("west", 5, 1, 1)]

    def test_incremental_refresh_after_inserts(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        mv = _mv_table(ctx)
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO sales VALUES ('east', 100, 9), ('south', 1, 1)")
        # stale until refreshed
        assert rows(
            ctx.execute("SELECT total FROM mv WHERE region = 'east'")
        ) == [(30,)]
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        got = rows(
            ctx.execute("SELECT region, total, n, mx FROM mv ORDER BY region")
        )
        assert got == [
            ("east", 130, 3, 9),
            ("north", 7, 1, 3),
            ("south", 1, 1, 1),
            ("west", 5, 1, 1),
        ]
        # incremental: the refresh MERGEd (no overwrite commit), and the
        # untouched groups' history shows no rewrite of their rows
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops
        assert "REFRESH MATERIALIZED VIEW" not in ops  # that op = full path

    def test_refresh_handles_update_delete_and_vanished_groups(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ctx.execute("UPDATE sales SET amount = 1000 WHERE region = 'west'")
        ctx.execute("DELETE FROM sales WHERE region = 'north'")
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        got = rows(
            ctx.execute("SELECT region, total, n FROM mv ORDER BY region")
        )
        assert got == [("east", 30, 2), ("west", 1000, 1)]

    def test_refresh_noop_when_current(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        mv = _mv_table(ctx)
        v = mv.latest_version()
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        assert _mv_table(ctx).latest_version() == v  # no commit at all

    def test_non_self_maintainable_aggregate_max_shrinks(self, ctx):
        """MAX must be correct when the max row is DELETED — recompute
        semantics handle what algebraic maintenance cannot."""
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ctx.execute("DELETE FROM sales WHERE region = 'east' AND qty = 2")
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        assert rows(
            ctx.execute("SELECT total, n, mx FROM mv WHERE region = 'east'")
        ) == [(10, 1, 1)]

    def test_mv_is_write_protected(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        for stmt in (
            "INSERT INTO mv VALUES ('x', 1, 1, 1)",
            "UPDATE mv SET total = 0 WHERE region = 'east'",
            "DELETE FROM mv WHERE region = 'east'",
        ):
            with pytest.raises(ExecutionError, match="materialized view"):
                ctx.execute(stmt)

    def test_drop_materialized_view(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ctx.execute("DROP MATERIALIZED VIEW mv")
        with pytest.raises(
            Exception, match="does not exist|not found|cannot be found"
        ):
            ctx.execute("SELECT * FROM mv").collect()

    def test_refresh_plain_table_rejected(self, ctx):
        seed_base(ctx)
        with pytest.raises(ExecutionError, match="not a materialized view"):
            ctx.execute("REFRESH MATERIALIZED VIEW sales")

    def test_backslash_group_value_survives_refresh(self, ctx):
        # the predicate literal must escape backslashes or the recompute
        # WHERE misses the group and wrongly deletes it from the view
        ctx.execute(
            "CREATE TABLE sales (region string, amount bigint, qty bigint)"
        )
        ctx.execute(
            r"INSERT INTO sales VALUES ('C:\\new', 10, 1), ('east', 20, 2)"
        )
        ctx.execute(MV_SQL)
        ctx.execute(r"INSERT INTO sales VALUES ('C:\\new', 5, 1)")
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        got = rows(
            ctx.execute("SELECT region, total, n FROM mv ORDER BY region")
        )
        assert got == [("C:\\new", 15, 2), ("east", 20, 1)]

    def test_consecutive_refreshes(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        for k in range(3):
            ctx.execute(f"INSERT INTO sales VALUES ('east', {k + 1}, 1)")
            ctx.execute("REFRESH MATERIALIZED VIEW mv")
        assert rows(
            ctx.execute("SELECT total, n FROM mv WHERE region = 'east'")
        ) == [(36, 5)]


class TestMatViewScale:
    def test_refresh_scans_only_affected_partitions(self, ctx):
        """The incremental path's base re-scan carries the static group
        predicate, so file pruning applies: with group-correlated file
        layout, the recompute reads fewer files than the base has."""
        ctx.execute("CREATE TABLE big (g string, v bigint)")
        # one file per insert, each a single group
        for g, lo in (("a", 0), ("b", 100), ("c", 200), ("d", 300)):
            ctx.execute(
                f"INSERT INTO big SELECT '{g}', id FROM range({lo}, {lo + 50})"
            )
        ctx.execute(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, SUM(v) AS s, COUNT(*) AS n FROM big GROUP BY g"
        )
        ctx.execute("INSERT INTO big VALUES ('d', 1)")
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        assert rows(
            ctx.execute("SELECT s, n FROM mv WHERE g = 'd'")
        ) == [(sum(range(300, 350)) + 1, 51)]
        # untouched groups intact
        assert rows(ctx.execute("SELECT s FROM mv WHERE g = 'a'")) == [
            (sum(range(0, 50)),)
        ]

    def test_null_group_falls_back_to_full_refresh(self, ctx):
        ctx.execute("CREATE TABLE nb (g string, v bigint)")
        ctx.execute("INSERT INTO nb VALUES ('a', 1), (NULL, 5)")
        ctx.execute(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, SUM(v) AS s FROM nb GROUP BY g"
        )
        ctx.execute("INSERT INTO nb VALUES (NULL, 7), ('a', 2)")
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        got = sorted(
            rows(ctx.execute("SELECT g, s FROM mv")),
            key=lambda r: (r[0] is not None, r[0]),
        )
        assert got == [(None, 12), ("a", 3)]
        # the NULL-group path had to take the full-overwrite fallback
        mv = _mv_table(ctx)
        assert any(
            c.operation == "REFRESH MATERIALIZED VIEW" for c in mv.history()
        )


def seed_join_base(ctx):
    ctx.execute("CREATE TABLE fsales (rkey bigint, amount bigint)")
    ctx.execute(
        "INSERT INTO fsales VALUES (1, 10), (1, 20), (2, 5), (3, 7)"
    )
    ctx.execute("CREATE TABLE fregion (r_key bigint, r_name string)")
    ctx.execute(
        "INSERT INTO fregion VALUES (1, 'east'), (2, 'west'), (3, 'north')"
    )


JOIN_MV_SQL = (
    "CREATE MATERIALIZED VIEW jmv AS "
    "SELECT r_name, SUM(amount) AS total, COUNT(*) AS n "
    "FROM fsales s JOIN fregion r ON s.rkey = r.r_key "
    "GROUP BY r_name"
)


class TestMatViewJoinDimensions:
    """r9: the q05 shape — fact joined to a dimension, grouped by a DIM
    attribute. Incremental refresh still diffs only the fact's files;
    affected groups come from joining the changed fact rows to the
    (version-gated, unchanged) dimension."""

    def test_create_materializes_join_aggregate(self, ctx):
        seed_join_base(ctx)
        ctx.execute(JOIN_MV_SQL)
        got = rows(ctx.execute("SELECT r_name, total, n FROM jmv"))
        assert sorted(got) == [("east", 30, 2), ("north", 7, 1), ("west", 5, 1)]

    def test_fact_insert_refreshes_incrementally(self, ctx):
        seed_join_base(ctx)
        ctx.execute(JOIN_MV_SQL)
        mv = _mv_table(ctx, "jmv")
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO fsales VALUES (2, 100)")
        ctx.execute("REFRESH MATERIALIZED VIEW jmv")
        got = rows(ctx.execute("SELECT r_name, total, n FROM jmv"))
        assert sorted(got) == [
            ("east", 30, 2), ("north", 7, 1), ("west", 105, 2),
        ]
        # incremental: MERGE, not overwrite — the dim was unchanged and
        # the changed fact rows named their group through the join
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops
        assert "REFRESH MATERIALIZED VIEW" not in ops

    def test_fact_delete_vanishes_group(self, ctx):
        seed_join_base(ctx)
        ctx.execute(JOIN_MV_SQL)
        ctx.execute("DELETE FROM fsales WHERE rkey = 3")
        ctx.execute("REFRESH MATERIALIZED VIEW jmv")
        got = rows(ctx.execute("SELECT r_name, total FROM jmv"))
        assert sorted(got) == [("east", 30), ("west", 5)]

    def test_dim_change_downgrades_to_full_refresh(self, ctx):
        seed_join_base(ctx)
        ctx.execute(JOIN_MV_SQL)
        mv = _mv_table(ctx, "jmv")
        v_created = mv.latest_version()
        # renaming a region moves EVERY east row to a new group — the
        # fact diff alone cannot see it, so the refresh must go full
        ctx.execute("UPDATE fregion SET r_name = 'orient' WHERE r_key = 1")
        ctx.execute("REFRESH MATERIALIZED VIEW jmv")
        got = rows(ctx.execute("SELECT r_name, total, n FROM jmv"))
        assert sorted(got) == [
            ("north", 7, 1), ("orient", 30, 2), ("west", 5, 1),
        ]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "REFRESH MATERIALIZED VIEW" in ops  # the full-overwrite op

    def test_dim_and_fact_change_together_full_refresh_correct(self, ctx):
        seed_join_base(ctx)
        ctx.execute(JOIN_MV_SQL)
        ctx.execute("INSERT INTO fsales VALUES (2, 11)")
        ctx.execute("INSERT INTO fregion VALUES (4, 'south')")
        ctx.execute("INSERT INTO fsales VALUES (4, 3)")
        ctx.execute("REFRESH MATERIALIZED VIEW jmv")
        got = rows(ctx.execute("SELECT r_name, total, n FROM jmv"))
        assert sorted(got) == [
            ("east", 30, 2), ("north", 7, 1), ("south", 3, 1), ("west", 16, 2),
        ]

    def test_left_join_null_group_falls_back_full(self, ctx):
        seed_join_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW ljmv AS "
            "SELECT r_name, SUM(amount) AS total "
            "FROM fsales s LEFT JOIN fregion r ON s.rkey = r.r_key "
            "GROUP BY r_name"
        )
        # rkey 9 has no dim match: its group is NULL -> full fallback,
        # values still correct
        ctx.execute("INSERT INTO fsales VALUES (9, 42)")
        ctx.execute("REFRESH MATERIALIZED VIEW ljmv")
        got = sorted(
            rows(ctx.execute("SELECT r_name, total FROM ljmv")),
            key=lambda r: (r[0] is not None, r[0]),
        )
        assert got == [(None, 42), ("east", 30), ("north", 7), ("west", 5)]

    def test_unaliased_fact_join_works(self, ctx):
        seed_join_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW umv AS "
            "SELECT r_name, SUM(amount) AS total "
            "FROM fsales JOIN fregion ON rkey = r_key GROUP BY r_name"
        )
        ctx.execute("INSERT INTO fsales VALUES (1, 1)")
        ctx.execute("REFRESH MATERIALIZED VIEW umv")
        got = rows(ctx.execute("SELECT r_name, total FROM umv"))
        assert sorted(got) == [("east", 31), ("north", 7), ("west", 5)]

    def test_dim_must_be_managed_table(self, ctx):
        seed_join_base(ctx)
        ctx.execute("CREATE VIEW vdim AS SELECT r_key, r_name FROM fregion")
        with pytest.raises(ExecutionError, match="logical view"):
            ctx.execute(
                "CREATE MATERIALIZED VIEW bad AS "
                "SELECT r_name, SUM(amount) AS total "
                "FROM fsales s JOIN vdim v ON s.rkey = v.r_key "
                "GROUP BY r_name"
            )


class TestMatViewIntrospection:
    def test_show_create_emits_view_ddl_and_round_trips(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ddl = ctx.execute("SHOW CREATE TABLE mv").collect()[0][0]
        assert ddl.startswith("CREATE MATERIALIZED VIEW public.mv AS SELECT")
        ctx.execute("DROP MATERIALIZED VIEW mv")
        ctx.execute(ddl.replace("public.mv", "mv"))
        assert rows(
            ctx.execute("SELECT total FROM mv WHERE region = 'east'")
        ) == [(30,)]


class TestStreamingRefreshComposition:
    def test_stream_merge_then_refresh_join_view(self, ctx, tmp_path):
        """r9: the CDC composition over a JOIN matview — the stream
        merges into the FACT, the dimension stays put, and per-batch
        REFRESH takes the incremental path (dims version-gated
        unchanged) while the view groups by a DIM attribute."""
        import json as _json

        from seafowl_spark.streaming.sync import foreach_batch_merge

        ctx.execute("CREATE TABLE jev (pk BIGINT, dk BIGINT, amt BIGINT)")
        ctx.execute("INSERT INTO jev VALUES (1, 1, 10), (2, 2, 5)")
        ctx.execute("CREATE TABLE jdim (dk BIGINT, label STRING)")
        ctx.execute("INSERT INTO jdim VALUES (1, 'x'), (2, 'y'), (3, 'z')")
        ctx.execute(
            "CREATE MATERIALIZED VIEW jagg AS "
            "SELECT label, SUM(amt) AS total, COUNT(*) AS n "
            "FROM jev f JOIN jdim d ON f.dk = d.dk GROUP BY label"
        )
        root = ctx.table_root(
            ctx.catalog.get_table("default", "public", "jev")
        )
        src = tmp_path / "jfeed"
        src.mkdir()
        (src / "b0.json").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"pk": 1, "dk": 1, "amt": 100},  # update in group x
                    {"pk": 3, "dk": 3, "amt": 7},    # new group z
                ]
            )
        )

        def apply(batch_df, batch_id):
            foreach_batch_merge(root, ["pk"])(batch_df, batch_id)
            ctx.execute("REFRESH MATERIALIZED VIEW jagg")

        q = (
            ctx.spark.readStream.schema("pk bigint, dk bigint, amt bigint")
            .json(str(src))
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / "jckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = rows(
            ctx.execute("SELECT label, total, n FROM jagg ORDER BY label")
        )
        assert got == [("x", 100, 1), ("y", 5, 1), ("z", 7, 1)]

    def test_stream_merge_then_refresh_keeps_view_current(self, ctx, tmp_path):
        """The CDC composition: a file stream merges into the base via
        foreachBatch, REFRESH runs per batch, and the view tracks the
        stream's end state — the materialized-serving pipeline shape."""
        import json as _json

        from seafowl_spark.streaming.sync import foreach_batch_merge

        ctx.execute("CREATE TABLE ev (pk BIGINT, g STRING, amt BIGINT)")
        ctx.execute("INSERT INTO ev VALUES (1, 'a', 10), (2, 'b', 5)")
        ctx.execute(
            "CREATE MATERIALIZED VIEW agg AS "
            "SELECT g, SUM(amt) AS total, COUNT(*) AS n FROM ev GROUP BY g"
        )
        root = ctx.table_root(
            ctx.catalog.get_table("default", "public", "ev")
        )
        src = tmp_path / "feed"
        src.mkdir()
        (src / "b0.json").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"pk": 1, "g": "a", "amt": 100},   # update
                    {"pk": 3, "g": "c", "amt": 7},     # new group
                ]
            )
        )

        def apply(batch_df, batch_id):
            foreach_batch_merge(root, ["pk"])(batch_df, batch_id)
            ctx.execute("REFRESH MATERIALIZED VIEW agg")

        q = (
            ctx.spark.readStream.schema("pk bigint, g string, amt bigint")
            .json(str(src))
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = rows(ctx.execute("SELECT g, total, n FROM agg ORDER BY g"))
        assert got == [("a", 100, 1), ("b", 5, 1), ("c", 7, 1)]


# slow tier (r14): multi-minute stress/matrix class, excluded
# from the default gate (opt in with --runslow / -m slow)
@pytest.mark.slow
class TestMatViewFuzz:
    @pytest.mark.parametrize("seed", [13, 47])
    def test_random_dml_sequence_refresh_equals_recompute(self, ctx, seed):
        """Seeded-random INSERT/UPDATE/DELETE sequences on the base with a
        refresh after every step: the view must always equal the direct
        aggregate — the snapshot-replay fuzz discipline applied to
        incremental view maintenance."""
        import random

        rng = random.Random(seed)
        ctx.execute("CREATE TABLE fz (pk BIGINT, g STRING, v BIGINT)")
        groups = ["a", "b", "c", "d"]
        nxt = 0

        def ins():
            nonlocal nxt
            vals = ", ".join(
                f"({nxt + i}, '{rng.choice(groups)}', {rng.randint(-5, 20)})"
                for i in range(rng.randint(1, 6))
            )
            nxt += 6
            ctx.execute(f"INSERT INTO fz VALUES {vals}")

        def upd():
            g = rng.choice(groups)
            ctx.execute(
                f"UPDATE fz SET v = v + {rng.randint(1, 9)} WHERE g = '{g}'"
            )

        def dele():
            m = rng.choice([3, 5])
            ctx.execute(f"DELETE FROM fz WHERE pk % {m} = {rng.randrange(m)}")

        def rename_churn():
            # r10 identity contract under churn: a renamed-away base
            # breaks refresh (name binding), a DECOY under the old name
            # is refused by UUID (never silently refreshed from), and
            # renaming back heals — the view itself stays untouched
            ctx.execute("ALTER TABLE fz RENAME TO fz_hidden")
            if rng.random() < 0.5:
                ctx.execute(
                    "CREATE TABLE fz (pk BIGINT, g STRING, v BIGINT)"
                )
                ctx.execute("INSERT INTO fz VALUES (0, 'a', 1)")
                with pytest.raises(ExecutionError, match="different table"):
                    ctx.execute("REFRESH MATERIALIZED VIEW fmv")
                ctx.execute("DROP TABLE fz")
            else:
                with pytest.raises(ExecutionError, match="does not exist"):
                    ctx.execute("REFRESH MATERIALIZED VIEW fmv")
            ctx.execute("ALTER TABLE fz_hidden RENAME TO fz")

        ins()
        ctx.execute(
            "CREATE MATERIALIZED VIEW fmv AS "
            "SELECT g, SUM(v) AS s, COUNT(*) AS n, MIN(v) AS mn, MAX(v) AS mx "
            "FROM fz GROUP BY g"
        )
        # r10: an expression-grouped sibling over the same base — the
        # multi-column group expression exercises the affected-groups
        # scan's expression evaluation under the same churn
        ctx.execute(
            "CREATE MATERIALIZED VIEW fmv2 AS "
            "SELECT concat(g, '-', CAST(pk % 2 AS STRING)) AS gk, "
            "SUM(v) AS s, COUNT(*) AS n "
            "FROM fz GROUP BY concat(g, '-', CAST(pk % 2 AS STRING))"
        )
        for _ in range(8):
            rng.choice([ins, ins, upd, dele, rename_churn])()
            ctx.execute("REFRESH MATERIALIZED VIEW fmv")
            got = sorted(
                rows(ctx.execute("SELECT g, s, n, mn, mx FROM fmv"))
            )
            want = sorted(
                rows(
                    ctx.execute(
                        "SELECT g, SUM(v) AS s, COUNT(*) AS n, "
                        "MIN(v) AS mn, MAX(v) AS mx FROM fz GROUP BY g"
                    )
                )
            )
            assert got == want
            ctx.execute("REFRESH MATERIALIZED VIEW fmv2")
            got2 = sorted(rows(ctx.execute("SELECT gk, s, n FROM fmv2")))
            want2 = sorted(
                rows(
                    ctx.execute(
                        "SELECT concat(g, '-', CAST(pk % 2 AS STRING)) "
                        "AS gk, SUM(v) AS s, COUNT(*) AS n "
                        "FROM fz GROUP BY gk"
                    )
                )
            )
            assert got2 == want2


    @pytest.mark.parametrize("seed", [29])
    def test_join_view_random_fact_and_dim_churn(self, ctx, seed):
        """The join-view variant: random fact DML (incremental path) mixed
        with occasional DIM updates (full-refresh path) — after every
        refresh the view must equal the direct join-aggregate."""
        import random

        rng = random.Random(seed)
        ctx.execute("CREATE TABLE jf (pk BIGINT, dk BIGINT, v BIGINT)")
        ctx.execute("CREATE TABLE jd (dk BIGINT, label STRING)")
        ctx.execute(
            "INSERT INTO jd VALUES (1, 'x'), (2, 'y'), (3, 'z'), (4, 'w')"
        )
        nxt = 0

        def ins():
            nonlocal nxt
            vals = ", ".join(
                f"({nxt + i}, {rng.randint(1, 4)}, {rng.randint(-5, 20)})"
                for i in range(rng.randint(1, 5))
            )
            nxt += 5
            ctx.execute(f"INSERT INTO jf VALUES {vals}")

        def upd_fact():
            ctx.execute(
                f"UPDATE jf SET v = v + {rng.randint(1, 9)} "
                f"WHERE dk = {rng.randint(1, 4)}"
            )

        def dele():
            m = rng.choice([3, 5])
            ctx.execute(f"DELETE FROM jf WHERE pk % {m} = {rng.randrange(m)}")

        def upd_dim():
            k = rng.randint(1, 4)
            ctx.execute(
                f"UPDATE jd SET label = label || '{k}' WHERE dk = {k}"
            )

        ins()
        ctx.execute(
            "CREATE MATERIALIZED VIEW jfmv AS "
            "SELECT label, SUM(v) AS s, COUNT(*) AS n "
            "FROM jf f JOIN jd d ON f.dk = d.dk GROUP BY label"
        )
        for _ in range(8):
            rng.choice([ins, ins, upd_fact, dele, upd_dim])()
            ctx.execute("REFRESH MATERIALIZED VIEW jfmv")
            got = sorted(rows(ctx.execute("SELECT label, s, n FROM jfmv")))
            want = sorted(
                rows(
                    ctx.execute(
                        "SELECT label, SUM(v) AS s, COUNT(*) AS n "
                        "FROM jf f JOIN jd d ON f.dk = d.dk GROUP BY label"
                    )
                )
            )
            assert got == want


class TestSystemMatviews:
    def test_staleness_tracking(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        got = rows(
            ctx.execute(
                "SELECT view_name, base_table, group_columns, is_stale "
                "FROM system.matviews"
            )
        )
        assert got == [("mv", "sales", "region", False)]
        ctx.execute("INSERT INTO sales VALUES ('east', 1, 1)")
        assert rows(
            ctx.execute("SELECT is_stale FROM system.matviews")
        ) == [(True,)]
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        assert rows(
            ctx.execute("SELECT is_stale FROM system.matviews")
        ) == [(False,)]


class TestGradedMatviewRow:
    """The graded q_matview_refresh registry row must take the
    INCREMENTAL refresh path (MERGE, not overwrite) and land on the
    direct recomputation of its final base state — the registry oracle
    checks end-state values vs DuckDB; this pins the path."""

    def test_refresh_is_incremental_and_exact(self, spark, tmp_path):
        from seafowl_spark.engine.context import SeafowlContext
        from seafowl_spark.queries import load_all

        work = str(tmp_path / "mvrow")
        out = load_all()["q_matview_refresh"].fn(
            spark, "/root/testdata/sf0.001", work_dir=work
        )
        got = sorted(rows(out))

        # replay the same deterministic feed directly (no view machinery)
        import pyspark.sql.functions as F

        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        live = (
            o.where((F.col("o_orderkey") % 3 <= 1) & (F.col("o_orderkey") % 7 != 0))
            .select(
                F.col("o_orderpriority").alias("pri"),
                F.when(
                    F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
                ).otherwise(F.col("o_totalprice")).alias("price"),
            )
        )
        want = sorted(
            rows(
                live.groupBy("pri").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("price").cast("decimal(25,6)"))
                    .cast("double")
                    .alias("total"),
                    F.min("price").alias("lo"),
                    F.max("price").alias("hi"),
                )
            )
        )
        assert got == want

        # the row's REFRESH took the incremental path: the view's history
        # after creation shows MERGE commits, never a full overwrite
        ctx = SeafowlContext(spark, os.path.join(work, "data"))
        mv = _mv_table(ctx)
        ops = [c.operation for c in mv.history()]
        assert "MERGE" in ops
        assert "OVERWRITE" not in ops and "REFRESH MATERIALIZED VIEW" not in ops


class TestNanGroupFallback:
    def test_nan_group_value_downgrades_to_full_refresh(self, ctx):
        """A NaN group value cannot render as a SQL literal — refresh
        must fall back to the full-overwrite path, not error forever
        (review finding, r8 session D)."""
        ctx.execute("CREATE TABLE nb (g double, v bigint)")
        ctx.execute("INSERT INTO nb VALUES (1.0, 10), (2.0, 20)")
        ctx.execute(
            "CREATE MATERIALIZED VIEW nmv AS "
            "SELECT g, SUM(v) AS s FROM nb GROUP BY g"
        )
        ctx.execute(
            "INSERT INTO nb SELECT CAST('NaN' AS DOUBLE), 30"
        )
        ctx.execute("REFRESH MATERIALIZED VIEW nmv")  # must not raise
        got = rows(ctx.execute("SELECT s FROM nmv ORDER BY s"))
        assert got == [(10,), (20,), (30,)]
        # and refresh keeps working afterwards
        ctx.execute("INSERT INTO nb VALUES (1.0, 5)")
        ctx.execute("REFRESH MATERIALIZED VIEW nmv")
        assert rows(
            ctx.execute("SELECT s FROM nmv ORDER BY s")
        ) == [(15,), (20,), (30,)]


class TestMatViewExpressionGroups:
    """r10 (the r9 verdict's task #4): GROUP BY expressions with aliases
    — `SELECT <expr> AS name ... GROUP BY <expr>` (or GROUP BY name).
    The view's output/merge PK is the alias; the affected-groups scans
    evaluate the EXPRESSION over the changed rows."""

    EXPR_MV = (
        "CREATE MATERIALIZED VIEW emv AS "
        "SELECT substr(region, 1, 1) AS pfx, SUM(amount) AS total, "
        "COUNT(*) AS n FROM sales GROUP BY substr(region, 1, 1)"
    )

    def test_create_and_incremental_refresh(self, ctx):
        seed_base(ctx)
        ctx.execute(self.EXPR_MV)
        got = rows(ctx.execute("SELECT pfx, total, n FROM emv"))
        assert sorted(got) == [("e", 30, 2), ("n", 7, 1), ("w", 5, 1)]
        mv = _mv_table(ctx, "emv")
        v_created = mv.latest_version()
        ctx.execute(
            "INSERT INTO sales VALUES ('east', 100, 9), ('south', 1, 1)"
        )
        ctx.execute("REFRESH MATERIALIZED VIEW emv")
        got = rows(ctx.execute("SELECT pfx, total, n FROM emv"))
        assert sorted(got) == [
            ("e", 130, 3), ("n", 7, 1), ("s", 1, 1), ("w", 5, 1),
        ]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops

    def test_group_by_alias_form(self, ctx):
        seed_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW amv AS "
            "SELECT substr(region, 1, 1) AS pfx, COUNT(*) AS n "
            "FROM sales GROUP BY pfx"
        )
        ctx.execute("INSERT INTO sales VALUES ('nowhere', 1, 1)")
        ctx.execute("REFRESH MATERIALIZED VIEW amv")
        got = rows(ctx.execute("SELECT pfx, n FROM amv"))
        assert sorted(got) == [("e", 2), ("n", 2), ("w", 1)]

    def test_expression_grouped_join_view_merges(self, ctx):
        # expression over a DIM attribute on a fact-to-dim join: the
        # affected-groups swap scan must evaluate the expression too,
        # and the refresh must stay a MERGE (never overwrite)
        seed_join_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW ejmv AS "
            "SELECT upper(r_name) AS big, SUM(amount) AS total "
            "FROM fsales s JOIN fregion r ON s.rkey = r.r_key "
            "GROUP BY upper(r_name)"
        )
        got = rows(ctx.execute("SELECT big, total FROM ejmv"))
        assert sorted(got) == [("EAST", 30), ("NORTH", 7), ("WEST", 5)]
        mv = _mv_table(ctx, "ejmv")
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO fsales VALUES (2, 50)")
        ctx.execute("REFRESH MATERIALIZED VIEW ejmv")
        got = rows(ctx.execute("SELECT big, total FROM ejmv"))
        assert sorted(got) == [("EAST", 30), ("NORTH", 7), ("WEST", 55)]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops
        assert "REFRESH MATERIALIZED VIEW" not in ops

    def test_vanished_expression_group_deleted(self, ctx):
        seed_base(ctx)
        ctx.execute(self.EXPR_MV)
        ctx.execute("DELETE FROM sales WHERE region = 'north'")
        ctx.execute("REFRESH MATERIALIZED VIEW emv")
        got = rows(ctx.execute("SELECT pfx, total, n FROM emv"))
        assert sorted(got) == [("e", 30, 2), ("w", 5, 1)]

    def test_unmatched_group_expression_rejected(self, ctx):
        seed_base(ctx)
        with pytest.raises((ExecutionError, MatViewError), match="alias"):
            ctx.execute(
                "CREATE MATERIALIZED VIEW bad AS "
                "SELECT region, COUNT(*) AS n "
                "FROM sales GROUP BY substr(region, 1, 1)"
            )

    def test_alias_shadowing_base_column_rejected(self, ctx):
        # Spark resolves GROUP BY region to the BASE column while the
        # parser would track the aliased substr — the two can collapse
        # distinct groups onto one merge key. Rejection is DATA-
        # INDEPENDENT (schema check at CREATE), so it fires even when
        # the create-time rows happen not to collide.
        ctx.execute("CREATE TABLE ssales (region string, amount bigint)")
        ctx.execute(
            "INSERT INTO ssales VALUES ('east', 1), ('west', 3)"
        )  # no substr collision at CREATE time — the guard must not
        # depend on one
        with pytest.raises(ExecutionError, match="ambiguous"):
            ctx.execute(
                "CREATE MATERIALIZED VIEW smv AS "
                "SELECT substr(region, 1, 1) AS region, COUNT(*) AS n "
                "FROM ssales GROUP BY region"
            )

    def test_bare_alias_form_accepted(self, ctx):
        # `<expr> <name>` without AS is the same alias in Spark SQL
        seed_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW bmv AS "
            "SELECT substr(region, 1, 1) pfx, COUNT(*) AS n "
            "FROM sales GROUP BY pfx"
        )
        mv = _mv_table(ctx, "bmv")
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO sales VALUES ('everest', 2, 2)")
        ctx.execute("REFRESH MATERIALIZED VIEW bmv")
        got = rows(ctx.execute("SELECT pfx, n FROM bmv"))
        assert sorted(got) == [("e", 3), ("n", 1), ("w", 1)]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops

    def test_alias_qualified_expression_stays_incremental(self, ctx):
        # group expression qualified with the FACT alias on a single-
        # table view: the affected-groups scan must re-alias the
        # changed-files view (the FROM-swap path), not silently
        # downgrade every refresh to a full overwrite
        seed_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW qmv AS "
            "SELECT substr(t.region, 1, 1) AS pfx, COUNT(*) AS n "
            "FROM sales t GROUP BY substr(t.region, 1, 1)"
        )
        mv = _mv_table(ctx, "qmv")
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO sales VALUES ('everest', 2, 2)")
        ctx.execute("REFRESH MATERIALIZED VIEW qmv")
        got = rows(ctx.execute("SELECT pfx, n FROM qmv"))
        assert sorted(got) == [("e", 3), ("n", 1), ("w", 1)]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops
        assert "REFRESH MATERIALIZED VIEW" not in ops  # = full path

    def test_group_column_named_count(self, ctx):
        # the CREATE-time uniqueness check aggregates under a reserved
        # name, so a group column literally named `count` cannot
        # collide with the check's own output
        ctx.execute("CREATE TABLE csales (count string, amount bigint)")
        ctx.execute("INSERT INTO csales VALUES ('a', 1), ('b', 2)")
        ctx.execute(
            "CREATE MATERIALIZED VIEW cmv AS "
            "SELECT count, SUM(amount) AS s FROM csales GROUP BY count"
        )
        got = rows(ctx.execute("SELECT count, s FROM cmv"))
        assert sorted(got) == [("a", 1), ("b", 2)]


class TestMatViewIdentity:
    """Matviews bind their base/dims by NAME (rename-back heals, the
    logical-view contract) but record catalog UUIDs at CREATE: a
    DIFFERENT table under the recorded name (drop-and-recreate, or a
    rename that frees the name for a new table) must fail REFRESH
    loudly — its data is unrelated and its version history doesn't
    contain the spec's recorded versions, so refreshing from it would
    silently corrupt the view."""

    def test_rename_base_breaks_rename_back_heals(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ctx.execute("ALTER TABLE sales RENAME TO sales2")
        with pytest.raises(ExecutionError, match="does not exist"):
            ctx.execute("REFRESH MATERIALIZED VIEW mv")
        ctx.execute("ALTER TABLE sales2 RENAME TO sales")
        ctx.execute("INSERT INTO sales VALUES ('east', 5, 1)")
        mv = _mv_table(ctx)
        v0 = mv.latest_version()
        ctx.execute("REFRESH MATERIALIZED VIEW mv")
        got = rows(ctx.execute("SELECT region, total FROM mv"))
        assert sorted(got) == [("east", 35), ("north", 7), ("west", 5)]
        ops = [c.operation for c in mv.history() if c.version > v0]
        assert "MERGE" in ops  # healed AND still incremental

    def test_recreated_base_under_same_name_refused(self, ctx):
        seed_base(ctx)
        ctx.execute(MV_SQL)
        ctx.execute("ALTER TABLE sales RENAME TO sales_archive")
        ctx.execute(
            "CREATE TABLE sales (region string, amount bigint, qty bigint)"
        )
        ctx.execute("INSERT INTO sales VALUES ('mars', 999, 9)")
        with pytest.raises(ExecutionError, match="different table"):
            ctx.execute("REFRESH MATERIALIZED VIEW mv")
        # the view's contents are untouched by the refused refresh
        got = rows(ctx.execute("SELECT region, total FROM mv"))
        assert sorted(got) == [("east", 30), ("north", 7), ("west", 5)]
        # the staleness board treats it like a dropped base
        board = rows(
            ctx.execute(
                "SELECT base_latest_version, is_stale FROM system.matviews "
                "WHERE view_name = 'mv'"
            )
        )
        assert board == [(None, True)]

    def test_recreated_dimension_refused(self, ctx):
        ctx.execute("CREATE TABLE fact (k bigint, amount bigint)")
        ctx.execute("CREATE TABLE dim (k bigint, grp string)")
        ctx.execute("INSERT INTO fact VALUES (1, 10), (2, 20)")
        ctx.execute("INSERT INTO dim VALUES (1, 'a'), (2, 'b')")
        ctx.execute(
            "CREATE MATERIALIZED VIEW jmv AS "
            "SELECT grp, SUM(amount) AS total FROM fact "
            "JOIN dim ON fact.k = dim.k GROUP BY grp"
        )
        ctx.execute("DROP TABLE dim")
        ctx.execute("CREATE TABLE dim (k bigint, grp string)")
        ctx.execute("INSERT INTO dim VALUES (1, 'z')")
        with pytest.raises(ExecutionError, match="different table"):
            ctx.execute("REFRESH MATERIALIZED VIEW jmv")


class TestMatViewHaving:
    """HAVING falls out of the recompute design for free: the refresh
    re-runs the view query (HAVING included) restricted to the affected
    groups, so a group whose aggregate newly satisfies HAVING appears in
    the recompute (MERGE insert) and a group that stops satisfying it is
    absent (vanished-group DELETE) — no algebraic patching, same as
    MIN/MAX. These tests pin that contract."""

    def test_group_enters_having_incrementally(self, ctx):
        seed_base(ctx)  # east n=2; west n=1; north n=1
        ctx.execute(
            "CREATE MATERIALIZED VIEW hmv AS "
            "SELECT region, COUNT(*) AS n, SUM(amount) AS total "
            "FROM sales GROUP BY region HAVING COUNT(*) >= 2"
        )
        assert rows(ctx.execute("SELECT region, n, total FROM hmv")) == [
            ("east", 2, 30)
        ]
        mv = _mv_table(ctx, "hmv")
        v_created = mv.latest_version()
        # west crosses the threshold; north stays below it
        ctx.execute("INSERT INTO sales VALUES ('west', 11, 4)")
        ctx.execute("REFRESH MATERIALIZED VIEW hmv")
        got = rows(ctx.execute("SELECT region, n, total FROM hmv"))
        assert sorted(got) == [("east", 2, 30), ("west", 2, 16)]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops

    def test_group_leaves_having_via_vanished_delete(self, ctx):
        seed_base(ctx)  # east total=30 (out); west 5, north 7 (in)
        ctx.execute(
            "CREATE MATERIALIZED VIEW hmv AS "
            "SELECT region, SUM(amount) AS total "
            "FROM sales GROUP BY region HAVING SUM(amount) < 25"
        )
        assert sorted(
            rows(ctx.execute("SELECT region, total FROM hmv"))
        ) == [("north", 7), ("west", 5)]
        mv = _mv_table(ctx, "hmv")
        v_created = mv.latest_version()
        # west blows past the threshold: affected group present in the
        # changed files but ABSENT from the HAVING-filtered recompute →
        # the vanished-group DELETE arm, not a stale survivor
        ctx.execute("INSERT INTO sales VALUES ('west', 100, 9)")
        ctx.execute("REFRESH MATERIALIZED VIEW hmv")
        assert rows(ctx.execute("SELECT region, total FROM hmv")) == [
            ("north", 7)
        ]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops

    def test_group_reenters_after_delete(self, ctx):
        seed_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW hmv AS "
            "SELECT region, SUM(amount) AS total "
            "FROM sales GROUP BY region HAVING SUM(amount) < 25"
        )
        # east re-enters once its big row is DELETEd from the base (the
        # CoW rewrite changes east's files → east is an affected group)
        ctx.execute("DELETE FROM sales WHERE amount = 20")
        ctx.execute("REFRESH MATERIALIZED VIEW hmv")
        got = rows(ctx.execute("SELECT region, total FROM hmv"))
        assert sorted(got) == [("east", 10), ("north", 7), ("west", 5)]

    def test_having_on_expression_group(self, ctx):
        seed_base(ctx)
        ctx.execute(
            "CREATE MATERIALIZED VIEW hemv AS "
            "SELECT substr(region, 1, 1) AS pfx, COUNT(*) AS n "
            "FROM sales GROUP BY substr(region, 1, 1) "
            "HAVING COUNT(*) >= 2"
        )
        assert rows(ctx.execute("SELECT pfx, n FROM hemv")) == [("e", 2)]
        mv = _mv_table(ctx, "hemv")
        v_created = mv.latest_version()
        ctx.execute("INSERT INTO sales VALUES ('wilds', 3, 1)")
        ctx.execute("REFRESH MATERIALIZED VIEW hemv")
        got = rows(ctx.execute("SELECT pfx, n FROM hemv"))
        assert sorted(got) == [("e", 2), ("w", 2)]
        ops = [c.operation for c in mv.history() if c.version > v_created]
        assert "MERGE" in ops and "OVERWRITE" not in ops

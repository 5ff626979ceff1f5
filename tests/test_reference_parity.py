"""Direct parity with the reference's own integration tests: the exact
fixture tables and queries from reference tests/statements/mod.rs
(create_table_and_insert, create_table_and_some_partitions) and the golden
outputs its tests assert (query.rs test_create_table_and_insert,
dml.rs test_update_statement / test_delete_with_string_filter_exact_match).
A seafowl user running these statements gets the same answers here."""

import datetime as dt
from decimal import Decimal

import pytest

from tests.conftest import rows


def create_table_and_insert(ctx, name="test_table"):
    """reference tests/statements/mod.rs:180-210 (same SQL verbatim)."""
    ctx.execute(
        f"""CREATE TABLE {name} (
            some_time TIMESTAMP,
            some_value REAL,
            some_other_value NUMERIC,
            some_bool_value BOOLEAN,
            some_int_value BIGINT)"""
    )
    ctx.execute(
        f"""INSERT INTO {name} (some_int_value, some_other_value, some_time, some_value) VALUES
            (1111, 1.0, '2022-01-01T20:01:01Z', 42),
            (2222, 1.0, '2022-01-01T20:02:02Z', 43),
            (3333, 1.0, '2022-01-01T20:03:03Z', 44)"""
    )


def create_table_and_some_partitions(ctx, name="test_table"):
    """reference tests/statements/mod.rs:212-311: 4 versions x 3 rows."""
    create_table_and_insert(ctx, name)
    ctx.execute(
        f"INSERT INTO {name} (some_value, some_other_value) VALUES (45, 2.0), (46, 2.0), (47, 2.0)"
    )
    ctx.execute(
        f"INSERT INTO {name} (some_value, some_other_value) VALUES (46, 3.0), (47, 3.0), (48, 3.0)"
    )
    ctx.execute(
        f"INSERT INTO {name} (some_value, some_other_value) VALUES (42, 4.0), (41, 4.0), (40, 4.0)"
    )


TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
D = lambda s: Decimal(s)  # noqa: E731


class TestQueryParity:
    def test_insert_pads_missing_columns(self, ctx):
        """query.rs:66-90: missing some_bool_value scans as NULL; column
        order/values match the reference's golden batch."""
        create_table_and_insert(ctx)
        out = ctx.execute("SELECT * FROM test_table ORDER BY some_time")
        assert rows(out) == [
            (TS("2022-01-01 20:01:01"), 42.0, D("1.0000000000"), None, 1111),
            (TS("2022-01-01 20:02:02"), 43.0, D("1.0000000000"), None, 2222),
            (TS("2022-01-01 20:03:03"), 44.0, D("1.0000000000"), None, 3333),
        ]

    def test_max_time(self, ctx):
        """query.rs:92-106."""
        create_table_and_insert(ctx)
        out = ctx.execute("SELECT MAX(some_time) AS m FROM test_table")
        assert rows(out) == [(TS("2022-01-01 20:03:03"),)]

    def test_mixed_aggregate(self, ctx):
        """query.rs:108-120: count distinct over an all-NULL column is 0."""
        create_table_and_insert(ctx)
        out = ctx.execute(
            "SELECT MAX(some_int_value) AS a, COUNT(DISTINCT some_bool_value) AS b, "
            "MAX(some_value) AS c FROM test_table"
        )
        assert rows(out) == [(3333, 0, 44.0)]


class TestDmlParity:
    def test_update_statement(self, ctx):
        """dml.rs test_update_statement: selective UPDATE rewrites only the
        partitions containing matching rows and produces the reference's
        exact 12-row result."""
        create_table_and_some_partitions(ctx)
        t = ctx.delta_table("test_table")
        assert len(t.snapshot().files) == 4

        ctx.execute(
            "UPDATE test_table "
            "SET some_time = '2022-01-01 21:21:21Z', some_int_value = 5555, "
            "some_value = some_value - 10 "
            "WHERE some_value IN (41, 42, 43)"
        )
        out = ctx.execute(
            "SELECT * FROM test_table ORDER BY some_value, some_other_value"
        )
        expected = [
            (TS("2022-01-01 21:21:21"), 31.0, D("4.0000000000"), None, 5555),
            (TS("2022-01-01 21:21:21"), 32.0, D("1.0000000000"), None, 5555),
            (TS("2022-01-01 21:21:21"), 32.0, D("4.0000000000"), None, 5555),
            (TS("2022-01-01 21:21:21"), 33.0, D("1.0000000000"), None, 5555),
            (None, 40.0, D("4.0000000000"), None, None),
            (TS("2022-01-01 20:03:03"), 44.0, D("1.0000000000"), None, 3333),
            (None, 45.0, D("2.0000000000"), None, None),
            (None, 46.0, D("2.0000000000"), None, None),
            (None, 46.0, D("3.0000000000"), None, None),
            (None, 47.0, D("2.0000000000"), None, None),
            (None, 47.0, D("3.0000000000"), None, None),
            (None, 48.0, D("3.0000000000"), None, None),
        ]
        assert sorted(rows(out), key=str) == sorted(expected, key=str)

        # partitions 2 and 3 (46,47,48 / 45,46,47) untouched: the update hit
        # only the v1 (42,43,44) and v4 (40,41,42) files (dml.rs:400-412)
        t = ctx.delta_table("test_table")
        commit = t.read_commit(t.latest_version())
        assert len(commit.removes) == 2

        # UPDATE matching nothing keeps all partitions (dml.rs:416-434)
        ctx.execute("UPDATE test_table SET some_bool_value = TRUE WHERE some_value = 200")
        t = ctx.delta_table("test_table")
        commit = t.read_commit(t.latest_version())
        assert commit.adds == [] and commit.removes == []

        # bad cast fails and leaves the table usable (dml.rs:437-446)
        with pytest.raises(Exception):
            ctx.execute("UPDATE test_table SET some_other_value = 'nope'")
        out = ctx.execute("SELECT count(*) AS n FROM test_table")
        assert rows(out) == [(12,)]

        # complex UPDATE: case assignment without a selection (dml.rs:449-455)
        ctx.execute(
            "UPDATE test_table SET some_bool_value = (some_int_value = 5555), some_value = 42, "
            "some_other_value = CASE WHEN some_int_value = 5555 THEN 5.555 "
            "WHEN some_int_value = 3333 THEN 3.333 ELSE 0 END"
        )
        out = ctx.execute(
            "SELECT DISTINCT some_value, some_other_value, some_bool_value "
            "FROM test_table ORDER BY some_other_value"
        )
        assert rows(out) == [
            (42.0, D("0.0000000000"), None),  # NULL int: NULL = 5555 -> NULL
            (42.0, D("3.3330000000"), False),
            (42.0, D("5.5550000000"), True),
        ]

    def test_delete_with_string_filter_exact_match(self, ctx):
        """dml.rs:260-326 verbatim."""
        ctx.execute("CREATE TABLE test_table(partition TEXT, value INTEGER)")
        ctx.execute("INSERT INTO test_table VALUES('one', 1)")
        ctx.execute("INSERT INTO test_table VALUES('two', 2)")
        ctx.execute("INSERT INTO test_table VALUES('three', 3)")
        ctx.execute("DELETE FROM test_table WHERE partition = 'two'")
        out = ctx.execute("SELECT * FROM test_table ORDER BY value ASC")
        assert rows(out) == [("one", 1), ("three", 3)]
        # string-stats pruning: only the 'two' file was touched
        t = ctx.delta_table("test_table")
        commit = t.read_commit(t.latest_version())
        assert len(commit.removes) == 1 and commit.adds == []


class TestDmlErrorParity:
    def test_update_nonexistent_assignment_column(self, ctx):
        """dml.rs test_update_statement_errors: SET on an unknown column is
        a schema error even when the predicate matches nothing."""
        create_table_and_insert(ctx)
        with pytest.raises(Exception, match="nonexistent"):
            ctx.execute("UPDATE test_table SET nonexistent = 42 WHERE some_value = 32")

    def test_update_nonexistent_filter_column(self, ctx):
        create_table_and_insert(ctx)
        with pytest.raises(Exception, match="nonexistent"):
            ctx.execute("UPDATE test_table SET some_value = 42 WHERE nonexistent = 32")

    def test_update_uncastable_literal(self, ctx):
        """dml.rs:522-529: assigning a non-numeric string to BIGINT errors
        (ANSI cast), not silently NULLs."""
        create_table_and_insert(ctx)
        with pytest.raises(Exception, match="(?i)cast"):
            ctx.execute("UPDATE test_table SET some_int_value = 'nope'")

    def test_insert_second_shape_golden_rows(self, ctx):
        """dml.rs test_insert_two_different_schemas: a second INSERT with a
        different column subset pads the rest with NULLs; golden 6-row
        result."""
        create_table_and_insert(ctx)
        ctx.execute(
            "INSERT INTO test_table (some_value, some_bool_value, some_other_value) VALUES "
            "(41, FALSE, 2.15), (45, TRUE, 9.12), (NULL, FALSE, 44.34)"
        )
        out = ctx.execute("SELECT * FROM test_table ORDER BY some_other_value")
        assert rows(out) == [
            (TS("2022-01-01 20:01:01"), 42.0, D("1.0000000000"), None, 1111),
            (TS("2022-01-01 20:02:02"), 43.0, D("1.0000000000"), None, 2222),
            (TS("2022-01-01 20:03:03"), 44.0, D("1.0000000000"), None, 3333),
            (None, 41.0, D("2.1500000000"), False, None),
            (None, 45.0, D("9.1200000000"), True, None),
            (None, None, D("44.3400000000"), False, None),
        ]


class TestNsColumnParity:
    def test_ctas_from_ns_column(self, ctx, tmp_path):
        """ddl.rs test_create_table_as_from_ns_column: an external parquet
        with TIMESTAMP(NANOS) surfaces as a timestamp in staging and CTAS
        coerces to microseconds (truncating), staying queryable."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / "ns.parquet")
        pq.write_table(
            pa.table(
                {
                    "some_int_value": pa.array([1, 2, 3], pa.int64()),
                    "some_time": pa.array(
                        [1640995200_000_000_000 + i * 1_500 for i in range(3)],
                        pa.timestamp("ns"),
                    ),
                    "some_value": pa.array([1.0, 2.0, 3.0], pa.float32()),
                }
            ),
            p,
        )
        ctx.execute(f"CREATE EXTERNAL TABLE ns_t STORED AS PARQUET LOCATION '{p}'")
        staged = ctx.execute("SELECT * FROM staging.ns_t")
        assert dict(staged.dtypes)["some_time"] == "timestamp"
        ctx.execute("CREATE TABLE us_t AS (SELECT * FROM staging.ns_t)")
        out = ctx.execute("SELECT * FROM us_t ORDER BY some_int_value")
        assert dict(out.dtypes)["some_time"] == "timestamp"
        got = rows(out)
        # 1500ns increments truncate to 1us steps: 0ns->+0us, 1500ns->+1us, 3000ns->+3us
        assert [r[1].microsecond for r in got] == [0, 1, 3]
        assert [r[0] for r in got] == [1, 2, 3]

"""RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF (engine/deltalite.py
restore): rewind a table's live state to an earlier snapshot via one
metadata-only commit, preserving history. Delta-parity surface beyond
the reference (its planner has no RESTORE)."""

import pytest

from seafowl_spark.engine.deltalite import DeltaLiteError, DeltaLiteTable


def _t(ctx, name) -> DeltaLiteTable:
    e = next(e for e in ctx.catalog.tables(ctx.database) if e.name == name)
    return DeltaLiteTable(ctx.spark, ctx.table_root(e))


def _rows(ctx, name):
    return sorted(
        tuple(r) for r in ctx.execute(f"SELECT * FROM {name}").collect()
    )


class TestRestore:
    def test_restore_rewinds_data_keeps_history(self, ctx):
        ctx.execute("CREATE TABLE r1 (k BIGINT, v STRING)")
        ctx.execute("INSERT INTO r1 VALUES (1, 'a'), (2, 'b')")
        want = _rows(ctx, "r1")
        v1 = _t(ctx, "r1").latest_version()
        ctx.execute("INSERT INTO r1 VALUES (3, 'c')")
        ctx.execute("DELETE FROM r1 WHERE k = 1")
        assert _rows(ctx, "r1") != want
        ctx.execute(f"RESTORE TABLE r1 TO VERSION AS OF {v1}")
        assert _rows(ctx, "r1") == want
        # history preserved: the undone versions still travel
        t = _t(ctx, "r1")
        assert t.latest_version() > v1 + 2
        assert t.snapshot(version=v1 + 1).num_rows == 3  # the insert of 3
        # and the restore commit records what it did
        assert t.read_commit(t.latest_version()).operation == (
            f"RESTORE VERSION {v1}"
        )

    def test_restore_is_metadata_only(self, ctx):
        ctx.execute("CREATE TABLE r2 (k BIGINT)")
        ctx.execute("INSERT INTO r2 VALUES (1), (2)")
        v1 = _t(ctx, "r2").latest_version()
        files_v1 = {f.path for f in _t(ctx, "r2").snapshot(version=v1).files}
        ctx.execute("INSERT INTO r2 VALUES (3)")
        ctx.execute(f"RESTORE TABLE r2 TO VERSION AS OF {v1}")
        t = _t(ctx, "r2")
        # live files are exactly v1's physical files — nothing rewritten
        assert {f.path for f in t.snapshot().files} == files_v1

    def test_restore_across_schema_evolution_resyncs_catalog(self, ctx):
        ctx.execute("CREATE TABLE r3 (k BIGINT)")
        ctx.execute("INSERT INTO r3 VALUES (1)")
        v1 = _t(ctx, "r3").latest_version()
        ctx.execute("ALTER TABLE r3 ADD COLUMN extra STRING")
        ctx.execute("INSERT INTO r3 (k, extra) VALUES (2, 'x')")
        ctx.execute(f"RESTORE TABLE r3 TO VERSION AS OF {v1}")
        df = ctx.execute("SELECT * FROM r3")
        assert df.columns == ["k"]
        cols = [
            r[0]
            for r in ctx.execute("SHOW COLUMNS IN r3").collect()
        ]
        assert cols == ["k"]

    def test_restore_rejects_vacuumed_target(self, ctx):
        ctx.execute("CREATE TABLE r4 (k BIGINT)")
        ctx.execute("INSERT INTO r4 VALUES (1)")
        v1 = _t(ctx, "r4").latest_version()
        # overwrite retires v1's file; vacuum GCs it
        ctx.execute("INSERT INTO r4 (k) SELECT 9")
        ctx.execute("DELETE FROM r4")  # no predicate: remove-only commit
        ctx.execute("VACUUM TABLE r4")
        with pytest.raises(DeltaLiteError, match="vacuumed"):
            _t(ctx, "r4").restore(version=v1)

    def test_restore_by_timestamp_and_undo_of_restore(self, ctx):
        ctx.execute("CREATE TABLE r5 (k BIGINT)")
        ctx.execute("INSERT INTO r5 VALUES (1)")
        t = _t(ctx, "r5")
        v1 = t.latest_version()
        ts1 = t.read_commit(v1).timestamp_ms
        ctx.execute("INSERT INTO r5 VALUES (2)")
        import datetime as dt

        iso = (
            dt.datetime.fromtimestamp(ts1 / 1000, dt.timezone.utc)
            .isoformat()
            .replace("+00:00", "Z")
        )
        ctx.execute(f"RESTORE TABLE r5 TO TIMESTAMP AS OF '{iso}'")
        assert _rows(ctx, "r5") == [(1,)]
        # a restore is itself undoable: restore to the pre-restore version
        ctx.execute("RESTORE TABLE r5 TO VERSION AS OF 2")
        assert _rows(ctx, "r5") == [(1,), (2,)]

    def test_restore_resets_later_properties(self, ctx):
        ctx.execute("CREATE TABLE r6 (k BIGINT)")
        ctx.execute("INSERT INTO r6 VALUES (1)")
        v1 = _t(ctx, "r6").latest_version()
        ctx.execute(
            "ALTER TABLE r6 ADD CONSTRAINT pos CHECK (k > 0)"
        )
        assert _t(ctx, "r6").snapshot().properties  # constraint recorded
        ctx.execute(f"RESTORE TABLE r6 TO VERSION AS OF {v1}")
        assert _t(ctx, "r6").snapshot().properties == {}
        # constraint gone: negative insert passes again
        ctx.execute("INSERT INTO r6 VALUES (-5)")
        assert (-5,) in _rows(ctx, "r6")


class TestShowCreate:
    """SHOW CREATE TABLE: re-executable DDL from the live snapshot —
    schema (post-evolution), WITH properties, and constraints as
    follow-up ALTER statements."""

    def test_round_trip(self, ctx):
        ctx.execute(
            "CREATE TABLE sc1 (k BIGINT, v STRING) "
            "WITH ('bucket_by' = 'k', 'buckets' = '4')"
        )
        ctx.execute("ALTER TABLE sc1 ADD COLUMN w DOUBLE")
        ctx.execute("ALTER TABLE sc1 ADD CONSTRAINT pos CHECK (k > 0)")
        ddl = ctx.execute("SHOW CREATE TABLE sc1").collect()[0][0]
        assert "k BIGINT" in ddl and "w DOUBLE" in ddl
        assert "'bucket_by' = 'k'" in ddl and "'buckets' = '4'" in ddl
        assert "ADD CONSTRAINT pos CHECK (k > 0)" in ddl
        # the emitted statements execute and reproduce the table shape
        for stmt in ddl.replace("sc1", "sc2").split(";"):
            ctx.execute(stmt)
        orig = ctx.execute("SHOW COLUMNS IN sc1").collect()
        twin = ctx.execute("SHOW COLUMNS IN sc2").collect()
        assert orig == twin
        # twin enforces the constraint too
        import pytest as _pt

        from seafowl_spark.engine.deltalite import DeltaLiteError

        with _pt.raises(DeltaLiteError, match="constraint"):
            ctx.execute("INSERT INTO sc2 VALUES (-1, 'x', 0.0)")


class TestInformationSchemaConstraints:
    def test_constraints_surface_and_track_drops(self, ctx):
        ctx.execute("CREATE TABLE ic1 (k BIGINT)")
        ctx.execute("ALTER TABLE ic1 ADD CONSTRAINT pos CHECK (k > 0)")
        tc = ctx.execute(
            "SELECT table_name, constraint_name, constraint_type "
            "FROM information_schema.table_constraints"
        ).collect()
        assert ("ic1", "pos", "CHECK") in [tuple(r) for r in tc]
        cc = ctx.execute(
            "SELECT constraint_name, check_clause "
            "FROM information_schema.check_constraints"
        ).collect()
        assert ("pos", "k > 0") in [tuple(r) for r in cc]
        ctx.execute("ALTER TABLE ic1 DROP CONSTRAINT pos")
        tc2 = ctx.execute(
            "SELECT constraint_name "
            "FROM information_schema.table_constraints "
            "WHERE table_name = 'ic1'"
        ).collect()
        assert tc2 == []


class TestExternalOnError:
    """Malformed-row contract for text external tables (sources/
    external.py on_error): permissive surfaces NULLs + _corrupt_record,
    skip drops, fail raises — a declared choice, not a reader default."""

    def _write_bad_ndjson(self, tmp_path):
        p = tmp_path / "bad.ndjson"
        p.write_text(
            '{"k": 1, "v": "a"}\n'
            "this is not json\n"
            '{"k": 3, "v": "c"}\n'
        )
        return str(p)

    def test_permissive_captures_corrupt_record(self, spark, tmp_path):
        from seafowl_spark.sources.external import read_external

        loc = self._write_bad_ndjson(tmp_path)
        df = read_external(
            spark,
            "ndjson",
            loc,
            columns=[("k", "bigint"), ("v", "string"),
                     ("_corrupt_record", "string")],
            options={"on_error": "permissive"},
        ).cache()  # Spark requires materialization before _corrupt_record filters
        try:
            assert df.count() == 3
            bad = df.where("_corrupt_record IS NOT NULL").collect()
            assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("this is")
        finally:
            df.unpersist()

    def test_skip_drops_malformed(self, spark, tmp_path):
        from seafowl_spark.sources.external import read_external

        loc = self._write_bad_ndjson(tmp_path)
        df = read_external(
            spark, "ndjson", loc,
            columns=[("k", "bigint"), ("v", "string")],
            options={"on_error": "skip"},
        )
        assert sorted(r["k"] for r in df.collect()) == [1, 3]

    def test_fail_raises_on_first_bad_row(self, spark, tmp_path):
        from seafowl_spark.sources.external import read_external

        loc = self._write_bad_ndjson(tmp_path)
        df = read_external(
            spark, "ndjson", loc,
            columns=[("k", "bigint"), ("v", "string")],
            options={"on_error": "fail"},
        )
        import pytest as _pt

        with _pt.raises(Exception, match="(?i)malformed|FAILFAST"):
            df.collect()

    def test_unknown_choice_rejected(self, spark, tmp_path):
        from seafowl_spark.sources.external import (
            ExternalTableError,
            read_external,
        )

        loc = self._write_bad_ndjson(tmp_path)
        import pytest as _pt

        with _pt.raises(ExternalTableError, match="on_error"):
            read_external(
                spark, "ndjson", loc,
                columns=[("k", "bigint")],
                options={"on_error": "explode"},
            )

    def test_csv_skip(self, spark, tmp_path):
        from seafowl_spark.sources.external import read_external

        p = tmp_path / "bad.csv"
        p.write_text("k,v\n1,a\nthis,line,has,too,many,fields\n3,c\n")
        df = read_external(
            spark, "csv", str(p),
            columns=[("k", "bigint"), ("v", "string")],
            options={"on_error": "skip"},
        )
        assert sorted(r["k"] for r in df.collect()) == [1, 3]


class TestDescribeDetail:
    def test_one_row_summary_tracks_state(self, ctx):
        ctx.execute("CREATE TABLE dd1 (k BIGINT)")
        ctx.execute("INSERT INTO dd1 VALUES (1), (2), (3)")
        r = ctx.execute("DESCRIBE DETAIL dd1").collect()[0]
        assert r["format"] == "deltalite"
        assert r["num_rows"] == 3 and r["num_files"] >= 1
        assert r["version"] >= 1 and r["size_bytes"] > 0
        ctx.execute("DELETE FROM dd1 WHERE k = 2")
        r2 = ctx.execute("DESCRIBE DETAIL dd1").collect()[0]
        assert r2["num_rows"] == 2 and r2["version"] > r["version"]

    def test_on_error_via_sql_surface(self, ctx, tmp_path):
        p = tmp_path / "bad.ndjson"
        p.write_text('{"k": 1}\nnot json\n{"k": 3}\n')
        ctx.execute(
            f"CREATE EXTERNAL TABLE exterr (k BIGINT) STORED AS NDJSON "
            f"OPTIONS ('on_error' 'skip') LOCATION '{p}'"
        )
        got = [
            r.k
            for r in ctx.execute(
                "SELECT k FROM staging.exterr ORDER BY k"
            ).collect()
        ]
        assert got == [1, 3]


class TestInsertOverwrite:
    def test_replaces_contents_atomically(self, ctx):
        ctx.execute("CREATE TABLE io1 (k BIGINT, v STRING)")
        ctx.execute("INSERT INTO io1 VALUES (1, 'a'), (2, 'b')")
        v_before = _t(ctx, "io1").latest_version()
        ctx.execute("INSERT OVERWRITE io1 VALUES (9, 'z')")
        assert _rows(ctx, "io1") == [(9, "z")]
        t = _t(ctx, "io1")
        assert t.latest_version() == v_before + 1  # ONE commit
        # the old contents still time-travel
        assert t.snapshot(version=v_before).num_rows == 2

    def test_overwrite_table_keyword_and_select(self, ctx):
        ctx.execute("CREATE TABLE io2 (k BIGINT)")
        ctx.execute("INSERT INTO io2 VALUES (1), (2), (3)")
        ctx.execute(
            "INSERT OVERWRITE TABLE io2 SELECT k * 10 FROM io2 WHERE k <= 2"
        )
        assert _rows(ctx, "io2") == [(10,), (20,)]

    def test_overwrite_enforces_constraints(self, ctx):
        ctx.execute("CREATE TABLE io3 (k BIGINT)")
        ctx.execute("ALTER TABLE io3 ADD CONSTRAINT pos CHECK (k > 0)")
        ctx.execute("INSERT INTO io3 VALUES (5)")
        with pytest.raises(DeltaLiteError, match="constraint"):
            ctx.execute("INSERT OVERWRITE io3 VALUES (-1)")
        assert _rows(ctx, "io3") == [(5,)]  # nothing replaced


class TestExplainAnalyze:
    def test_runs_query_and_reports_final_plan(self, ctx):
        ctx.execute("CREATE TABLE ea (k BIGINT)")
        ctx.execute("INSERT INTO ea SELECT id FROM range(100)")
        out = [
            r["plan_line"]
            for r in ctx.execute(
                "EXPLAIN ANALYZE SELECT k % 3 AS g, count(*) AS n "
                "FROM ea GROUP BY k % 3"
            ).collect()
        ]
        assert out[0] == "rows: 3"
        assert out[1].startswith("elapsed_ms: ")
        body = "\n".join(out)
        assert "HashAggregate" in body  # the real executed plan is shown
        # plain EXPLAIN still passes through to Spark untouched
        plain = ctx.execute("EXPLAIN SELECT * FROM ea").collect()
        assert plain and "plan" in plain[0].asDict() or plain

    def test_reports_finalized_adaptive_plan(self, ctx):
        ctx.execute("CREATE TABLE ea2 (k BIGINT)")
        ctx.execute("INSERT INTO ea2 SELECT id FROM range(50)")
        body = "\n".join(
            r["plan_line"]
            for r in ctx.execute(
                "EXPLAIN ANALYZE SELECT k, count(*) FROM ea2 GROUP BY k"
            ).collect()
        )
        # the whole point vs plain EXPLAIN: the plan shown is the
        # post-execution FINAL adaptive plan
        assert "isFinalPlan=true" in body
        assert "rows: 50" in body


class TestDvSidecarRetirement:
    """Superseded deletion-vector sidecars must enter remove lists so
    VACUUM can GC them (review finding: overwrite and restore leaked
    .bin files forever)."""

    def _dv_files(self, ctx, name):
        import glob

        e = next(
            x for x in ctx.catalog.tables(ctx.database) if x.name == name
        )
        return glob.glob(f"{ctx.table_root(e)}/**/*.bin", recursive=True)

    def test_insert_overwrite_retires_dvs(self, ctx):
        ctx.execute(
            "CREATE TABLE dvr (k BIGINT) WITH ('delete_mode' = 'mor')"
        )
        ctx.execute("INSERT INTO dvr SELECT id FROM range(100)")
        ctx.execute("DELETE FROM dvr WHERE k % 2 = 0")  # MoR -> DV sidecar
        assert self._dv_files(ctx, "dvr")
        ctx.execute("INSERT OVERWRITE dvr VALUES (1)")
        ctx.execute("VACUUM TABLE dvr")
        assert self._dv_files(ctx, "dvr") == []  # GC'd, not leaked

    def test_restore_across_dv_retires_superseded_sidecar(self, ctx):
        ctx.execute(
            "CREATE TABLE dvs (k BIGINT) WITH ('delete_mode' = 'mor')"
        )
        ctx.execute("INSERT INTO dvs SELECT id FROM range(100)")
        v_clean = _t(ctx, "dvs").latest_version()
        ctx.execute("DELETE FROM dvs WHERE k % 2 = 0")  # DV on the file
        assert self._dv_files(ctx, "dvs")
        # restore to the pre-delete version: same data file path survives,
        # its DV is superseded and must be vacuumable
        ctx.execute(f"RESTORE TABLE dvs TO VERSION AS OF {v_clean}")
        assert _t(ctx, "dvs").snapshot().num_rows == 100
        ctx.execute("VACUUM TABLE dvs")
        assert self._dv_files(ctx, "dvs") == []
        # and the restored table still reads all rows
        n = ctx.execute("SELECT count(*) AS n FROM dvs").collect()[0]["n"]
        assert n == 100

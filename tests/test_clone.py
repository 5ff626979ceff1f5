"""SHALLOW CLONE (r8, Delta-parity, beyond the reference): metadata-only
table copies referencing the source's files by absolute path — zero data
movement, independent lifecycle afterwards."""

import os

import pytest

from seafowl_spark.engine.deltalite import DeltaLiteTable
from tests.conftest import rows


def _t(ctx, name):
    e = next(e for e in ctx.catalog.tables(ctx.database) if e.name == name)
    return DeltaLiteTable(ctx.spark, ctx.table_root(e))


def seed(ctx):
    ctx.execute("CREATE TABLE src (k BIGINT, v STRING)")
    ctx.execute("INSERT INTO src SELECT id, CAST(id AS STRING) FROM range(0, 50)")
    ctx.execute("INSERT INTO src SELECT id, CAST(id AS STRING) FROM range(50, 100)")


class TestShallowClone:
    def test_clone_reads_source_data_zero_copy(self, ctx):
        seed(ctx)
        ctx.execute("CREATE TABLE c1 SHALLOW CLONE src")
        assert rows(ctx.execute("SELECT count(*) AS n FROM c1")) == [(100,)]
        t = _t(ctx, "c1")
        # every referenced file is absolute and lives under the SOURCE
        src_root = _t(ctx, "src").root
        for f in t.snapshot().files:
            assert os.path.isabs(f.path) and f.path.startswith(src_root)
        # the clone's own data dir holds nothing
        assert not os.path.exists(os.path.join(t.root, "data")) or not [
            x for x in os.listdir(os.path.join(t.root, "data"))
        ]

    def test_clone_of_past_version(self, ctx):
        seed(ctx)  # version 2 after two inserts
        ctx.execute("INSERT INTO src VALUES (999, 'late')")
        ctx.execute(
            "CREATE TABLE c2 SHALLOW CLONE src FOR VERSION AS OF 2"
        )
        assert rows(ctx.execute("SELECT count(*) AS n FROM c2")) == [(100,)]
        assert rows(ctx.execute("SELECT count(*) AS n FROM src")) == [(101,)]

    def test_clone_and_source_diverge_independently(self, ctx):
        seed(ctx)
        ctx.execute("CREATE TABLE c3 SHALLOW CLONE src")
        ctx.execute("UPDATE c3 SET v = 'clone' WHERE k < 10")
        ctx.execute("DELETE FROM src WHERE k >= 90")
        # clone unaffected by source DML, source unaffected by clone DML
        assert rows(ctx.execute("SELECT count(*) AS n FROM c3")) == [(100,)]
        assert rows(
            ctx.execute("SELECT count(*) AS n FROM c3 WHERE v = 'clone'")
        ) == [(10,)]
        assert rows(ctx.execute("SELECT count(*) AS n FROM src")) == [(90,)]
        assert rows(
            ctx.execute("SELECT count(*) AS n FROM src WHERE v = 'clone'")
        ) == [(0,)]

    def test_clone_vacuum_never_deletes_borrowed_files(self, ctx):
        seed(ctx)
        ctx.execute("CREATE TABLE c4 SHALLOW CLONE src")
        # rewrite EVERYTHING in the clone, then vacuum it
        ctx.execute("UPDATE c4 SET v = 'x'")
        dead = _t(ctx, "c4").vacuum()
        assert all(not os.path.isabs(p) for p in dead)
        # the source still reads perfectly
        assert rows(ctx.execute("SELECT count(*) AS n FROM src")) == [(100,)]

    def test_clone_carries_mor_deletion_vectors(self, ctx):
        ctx.execute(
            "CREATE TABLE msrc (k BIGINT, v STRING) WITH ('delete_mode' = 'mor')"
        )
        ctx.execute(
            "INSERT INTO msrc SELECT id, CAST(id AS STRING) FROM range(0, 40)"
        )
        ctx.execute("DELETE FROM msrc WHERE k % 4 = 0")
        ctx.execute("CREATE TABLE c5 SHALLOW CLONE msrc")
        assert rows(ctx.execute("SELECT count(*) AS n FROM c5")) == [(30,)]
        t = _t(ctx, "c5")
        assert any(f.dv for f in t.snapshot().files)
        for f in t.snapshot().files:
            if f.dv:
                assert os.path.isabs(f.dv["path"])

    def test_clone_keeps_bloom_and_constraint_properties(self, ctx):
        ctx.execute(
            "CREATE TABLE bsrc (k BIGINT, v STRING) WITH ('bloom_by' = 'v')"
        )
        ctx.execute(
            "INSERT INTO bsrc SELECT id, md5(CAST(id AS STRING)) FROM range(0, 20)"
        )
        ctx.execute("ALTER TABLE bsrc ADD CONSTRAINT pos CHECK (k >= 0)")
        ctx.execute("CREATE TABLE c6 SHALLOW CLONE bsrc")
        snap = _t(ctx, "c6").snapshot()
        assert snap.properties.get("bloom_by") == ["v"]
        assert "pos" in (snap.properties.get("constraints") or {})
        # constraint enforces on the clone's own writes
        with pytest.raises(Exception, match="pos|CHECK|constraint"):
            ctx.execute("INSERT INTO c6 VALUES (-1, 'bad')")
        # inherited blooms still prune on the clone
        import hashlib

        probe = hashlib.md5(b"5").hexdigest()
        q = ctx.execute(f"SELECT k FROM c6 WHERE v = '{probe}'")
        assert [r.k for r in q.collect()] == [5]

    def test_clone_of_matview_is_plain_table(self, ctx):
        ctx.execute("CREATE TABLE base (g STRING, x BIGINT)")
        ctx.execute("INSERT INTO base VALUES ('a', 1), ('a', 2), ('b', 3)")
        ctx.execute(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, SUM(x) AS s FROM base GROUP BY g"
        )
        ctx.execute("CREATE TABLE c7 SHALLOW CLONE mv")
        # the clone is writable (not view-protected) and frozen-in-time
        ctx.execute("INSERT INTO c7 VALUES ('z', 99)")
        got = rows(ctx.execute("SELECT g, s FROM c7 ORDER BY g"))
        assert got == [("a", 3), ("b", 3), ("z", 99)]

"""OPTIMIZE ... ZORDER BY — multi-column clustering for stats pruning.

Our extension beyond the reference (which re-chunks on write only,
delta.rs:106-148): rewrite the table ordered by the interleaved-bit
z-value of the listed columns so the per-file min/max footer stats become
tight on EVERY listed column, making file-level pruning effective for
predicates on any of them. The rewrite is repartitionByRange +
sortWithinPartitions — a range shuffle, never a single-partition global
sort, so it holds at 100 TB.
"""

import pytest

from seafowl_spark.engine.deltalite import DeltaLiteError
from seafowl_spark.engine.pruning import prune_files

from tests.conftest import rows


def _scattered_table(ctx, name, n=4000, files=8):
    """x and y are independent and both uncorrelated with insertion order,
    so every pre-optimize file spans nearly the full x and y domains."""
    ctx.execute(f"CREATE TABLE {name} (i INT, x INT, y INT, s STRING)")
    per = n // files
    for f in range(files):
        vals = ", ".join(
            f"({i}, {(i * 37) % 100}, {(i * 59) % 100}, 'k{i % 97:02d}')"
            for i in range(f * per, (f + 1) * per)
        )
        ctx.execute(f"INSERT INTO {name} VALUES {vals}")
    return ctx.delta_table(name)


class TestZorder:
    def test_zorder_tightens_pruning_on_both_columns(self, ctx):
        t = _scattered_table(ctx, "pts")
        snap = t.snapshot()
        assert len(snap.files) == 8
        before = rows(ctx.execute("SELECT i, x, y, s FROM pts"))
        # scattered layout: a point predicate on x or y prunes nothing
        assert len(prune_files(snap.files, "x = 5")) == 8
        assert len(prune_files(snap.files, "y = 5")) == 8

        t.optimize(target_rows=500, zorder_by=["x", "y"])
        snap = t.snapshot()
        assert len(snap.files) == 8
        # clustered layout: both columns prune to a fraction of the files
        kept_x = len(prune_files(snap.files, "x = 5"))
        kept_y = len(prune_files(snap.files, "y = 5"))
        assert kept_x <= 4, f"x=5 kept {kept_x}/8 files"
        assert kept_y <= 4, f"y=5 kept {kept_y}/8 files"
        # and the data is bit-identical
        assert rows(ctx.execute("SELECT i, x, y, s FROM pts")) == before

    def test_zorder_string_column(self, ctx):
        t = _scattered_table(ctx, "pts_s")
        t.optimize(target_rows=500, zorder_by=["s"])
        snap = t.snapshot()
        # single-column z-order degenerates to a plain sort: point predicate
        # on the string hits few files
        assert len(prune_files(snap.files, "s = 'k42'")) <= 2

    def test_zorder_sql_statement(self, ctx):
        t = _scattered_table(ctx, "pts_sql", n=400, files=4)
        v0 = t.latest_version()
        before = rows(ctx.execute("SELECT i, x, y, s FROM pts_sql"))
        ctx.execute("OPTIMIZE pts_sql ZORDER BY (x, y)")
        t = ctx.delta_table("pts_sql")
        assert t.latest_version() == v0 + 1
        assert t.history()[-1].operation == "OPTIMIZE"
        assert rows(ctx.execute("SELECT i, x, y, s FROM pts_sql")) == before

    def test_zorder_unknown_column_errors(self, ctx):
        t = _scattered_table(ctx, "pts_bad", n=100, files=1)
        with pytest.raises(DeltaLiteError, match="nope"):
            t.optimize(zorder_by=["nope"])

    def test_zorder_rejects_bucketed_table(self, ctx):
        ctx.execute(
            "CREATE TABLE pts_b (x INT, y INT) WITH ('bucket_by'='x', 'buckets'='4')"
        )
        ctx.execute("INSERT INTO pts_b VALUES (1, 2), (3, 4)")
        with pytest.raises(DeltaLiteError, match="mutually exclusive"):
            ctx.delta_table("pts_b").optimize(zorder_by=["x"])

    def test_plain_optimize_unchanged(self, ctx):
        t = _scattered_table(ctx, "pts_plain", n=400, files=4)
        t.optimize()
        assert len(t.snapshot().files) == 1


class TestZorderPersistence:
    def test_compaction_preserves_clustering(self, ctx):
        """ZORDER BY records a table property; later plain OPTIMIZE
        re-clusters the compacted files instead of un-sorting them."""
        t = _scattered_table(ctx, "pts_keep")
        t.optimize(target_rows=500, zorder_by=["x", "y"])
        assert t.snapshot().properties.get("zorder_by") == "x,y"
        # new small scattered appends, then a small-file compaction that
        # touches ONLY them (the 500-row clustered files are not "small"
        # at target 500)
        per = 40
        for f in range(3):
            vals = ", ".join(
                f"({i}, {(i * 37) % 100}, {(i * 59) % 100}, 'k{i % 97:02d}')"
                for i in range(f * per, (f + 1) * per)
            )
            ctx.execute(f"INSERT INTO pts_keep VALUES {vals}")
        t = ctx.delta_table("pts_keep")
        t.optimize(target_rows=500)
        snap = t.snapshot()
        # property survived the compaction commit
        assert snap.properties.get("zorder_by") == "x,y"
        assert snap.num_rows == 4120
        # the 8 clustered files were untouched, so file-level pruning on
        # x still holds (only the one compacted file can span fully)
        kept = len(prune_files(snap.files, "x = 5"))
        assert len(snap.files) == 9 and kept <= 5

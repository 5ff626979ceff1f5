"""Merge-on-read DELETE (deltalite deletion vectors): a DELETE writes a
per-file roaring bitmap sidecar instead of rewriting data files; reads,
DML, OPTIMIZE, time travel and vacuum all stay exact."""

import os

from pyspark.sql import functions as F

from seafowl_spark.engine.deltalite import DeltaLiteTable


def _table(ctx, name, mode="mor"):
    ctx.execute(
        f"CREATE TABLE {name} (k BIGINT, v STRING) "
        f"WITH ('delete_mode' = '{mode}')"
    )
    ctx.execute(
        f"INSERT INTO {name} SELECT id, CAST(id AS STRING) FROM range(0, 100)"
    )
    return ctx


def _tbl(ctx, name) -> DeltaLiteTable:
    e = next(e for e in ctx.catalog.tables(ctx.database) if e.name == name)
    return DeltaLiteTable(ctx.spark, ctx.table_root(e))


class TestMorDelete:
    def test_delete_writes_dv_not_rewrite(self, ctx):
        _table(ctx, "m1")
        t = _tbl(ctx, "m1")
        before = {f.path for f in t.snapshot().files}
        ctx.execute("DELETE FROM m1 WHERE k % 10 = 0")
        snap = t.snapshot()
        after = {f.path for f in snap.files}
        assert after == before  # same data files, no rewrite
        dvs = [f.dv for f in snap.files if f.dv]
        assert dvs and sum(d["cardinality"] for d in dvs) == 10
        assert all(
            os.path.exists(os.path.join(t.root, d["path"])) for d in dvs
        )
        out = ctx.execute("SELECT COUNT(*) AS n FROM m1").collect()[0].n
        assert out == 90
        assert ctx.execute("SELECT * FROM m1 WHERE k = 20").count() == 0
        assert snap.num_rows == 90

    def test_second_delete_merges_dvs(self, ctx):
        _table(ctx, "m2")
        ctx.execute("DELETE FROM m2 WHERE k < 5")
        ctx.execute("DELETE FROM m2 WHERE k >= 95")
        t = _tbl(ctx, "m2")
        assert ctx.execute("SELECT COUNT(*) AS n FROM m2").collect()[0].n == 90
        ks = [r.k for r in ctx.execute("SELECT k FROM m2 ORDER BY k").collect()]
        assert ks == list(range(5, 95))
        # per file at most one DV sidecar (merged, not stacked)
        for f in t.snapshot().files:
            assert f.dv is None or f.dv["cardinality"] >= 1

    def test_full_file_dv_drops_file(self, ctx):
        _table(ctx, "m3")
        t = _tbl(ctx, "m3")
        n_before = len(t.snapshot().files)
        ctx.execute("DELETE FROM m3 WHERE k >= 0")  # everything
        snap = t.snapshot()
        assert snap.files == [] or len(snap.files) < n_before
        assert ctx.execute("SELECT COUNT(*) AS n FROM m3").collect()[0].n == 0

    def test_time_travel_sees_pre_delete_rows(self, ctx):
        _table(ctx, "m4")
        t = _tbl(ctx, "m4")
        v_before = t.snapshot().version
        ctx.execute("DELETE FROM m4 WHERE k < 50")
        assert ctx.execute("SELECT COUNT(*) AS n FROM m4").collect()[0].n == 50
        old = t.to_df(version=v_before)
        assert old.count() == 100

    def test_update_after_mor_delete_no_resurrection(self, ctx):
        _table(ctx, "m5")
        ctx.execute("DELETE FROM m5 WHERE k < 10")
        ctx.execute("UPDATE m5 SET v = 'x' WHERE k < 20")
        out = ctx.execute("SELECT k, v FROM m5 ORDER BY k").collect()
        assert [r.k for r in out][:5] == [10, 11, 12, 13, 14]
        assert all(r.v == "x" for r in out if r.k < 20)
        assert len(out) == 90
        # the rewrite folded the DV away for the rewritten files
        t = _tbl(ctx, "m5")
        assert ctx.execute("SELECT COUNT(*) AS n FROM m5").collect()[0].n == 90

    def test_optimize_folds_dvs_into_clean_files(self, ctx):
        _table(ctx, "m6")
        ctx.execute("DELETE FROM m6 WHERE k % 2 = 0")
        t = _tbl(ctx, "m6")
        assert any(f.dv for f in t.snapshot().files)
        t.optimize()
        snap = t.snapshot()
        assert all(f.dv is None for f in snap.files)
        ks = [r.k for r in ctx.execute("SELECT k FROM m6 ORDER BY k").collect()]
        assert ks == list(range(1, 100, 2))

    def test_vacuum_keeps_live_dv_and_gcs_superseded(self, ctx):
        _table(ctx, "m7")
        ctx.execute("DELETE FROM m7 WHERE k = 1")
        t = _tbl(ctx, "m7")
        dv1 = next(f.dv["path"] for f in t.snapshot().files if f.dv)
        ctx.execute("DELETE FROM m7 WHERE k = 2")  # supersedes dv1
        dv2 = next(f.dv["path"] for f in t.snapshot().files if f.dv)
        assert dv1 != dv2
        t.vacuum(retention_ms=0)
        assert not os.path.exists(os.path.join(t.root, dv1))
        assert os.path.exists(os.path.join(t.root, dv2))
        assert ctx.execute("SELECT COUNT(*) AS n FROM m7").collect()[0].n == 98

    def test_cow_default_still_rewrites(self, ctx):
        ctx.execute("CREATE TABLE c1 (k BIGINT, v STRING)")
        ctx.execute(
            "INSERT INTO c1 SELECT id, CAST(id AS STRING) FROM range(0, 50)"
        )
        t = _tbl(ctx, "c1")
        before = {f.path for f in t.snapshot().files}
        ctx.execute("DELETE FROM c1 WHERE k < 10")
        snap = t.snapshot()
        assert {f.path for f in snap.files} != before  # rewritten
        assert all(f.dv is None for f in snap.files)
        assert ctx.execute("SELECT COUNT(*) AS n FROM c1").collect()[0].n == 40

    def test_merge_over_mor_table(self, ctx):
        _table(ctx, "m8")
        ctx.execute("DELETE FROM m8 WHERE k < 10")
        t = _tbl(ctx, "m8")
        ch = ctx.spark.createDataFrame(
            [(5, "resurrect?"), (50, "updated")], "k long, v string"
        )
        t.merge(ch, ["k"])
        out = {r.k: r.v for r in t.to_df().collect()}
        # k=5 re-inserted via merge (an upsert), k=50 updated, the other
        # MoR-deleted keys stay gone
        assert out[5] == "resurrect?"
        assert out[50] == "updated"
        assert 3 not in out
        assert len(out) == 91

    def test_table_files_shows_dv_cardinality(self, ctx):
        _table(ctx, "m9")
        # k % 10 = 3 touches at most one row per (consecutive-id) file, so
        # no file goes fully dead — all 10 deletions live in DVs
        ctx.execute("DELETE FROM m9 WHERE k % 10 = 3")
        out = ctx.execute(
            "SELECT sum(dv_deleted_rows) AS dv FROM system.table_files "
            "WHERE table_name = 'm9'"
        ).collect()
        assert out[0].dv == 10


class TestMorUpdate:
    def test_update_appends_rows_keeps_files(self, ctx):
        _table(ctx, "u1")  # delete_mode=mor governs updates too
        t = _tbl(ctx, "u1")
        before = {f.path for f in t.snapshot().files}
        ctx.execute("UPDATE u1 SET v = 'X' WHERE k % 10 = 3")
        snap = t.snapshot()
        # original files survive (with DVs); updated rows live in new files
        assert before <= {f.path for f in snap.files} | set()
        assert any(f.dv for f in snap.files)
        assert len({f.path for f in snap.files} - before) >= 1
        out = {r.k: r.v for r in ctx.execute("SELECT k, v FROM u1").collect()}
        assert len(out) == 100
        for k in range(100):
            assert out[k] == ("X" if k % 10 == 3 else str(k))

    def test_update_after_delete_no_resurrection(self, ctx):
        _table(ctx, "u2")
        ctx.execute("DELETE FROM u2 WHERE k < 10")
        ctx.execute("UPDATE u2 SET v = 'y' WHERE k < 30")
        out = {r.k: r.v for r in ctx.execute("SELECT k, v FROM u2").collect()}
        assert len(out) == 90
        assert min(out) == 10
        assert all(out[k] == "y" for k in range(10, 30))
        assert all(out[k] == str(k) for k in range(30, 100))

    def test_repeated_updates_compose(self, ctx):
        _table(ctx, "u3")
        ctx.execute("UPDATE u3 SET v = 'a1' WHERE k = 7")
        ctx.execute("UPDATE u3 SET v = 'a2' WHERE k = 7")
        out = {r.k: r.v for r in ctx.execute("SELECT k, v FROM u3").collect()}
        assert out[7] == "a2"
        assert len(out) == 100

    def test_matches_cow_results(self, ctx):
        # same statements on a CoW twin produce identical table contents
        _table(ctx, "u4m", mode="mor")
        _table(ctx, "u4c", mode="cow")
        for name in ("u4m", "u4c"):
            ctx.execute(f"UPDATE {name} SET v = concat(v, '!') WHERE k % 7 = 0")
            ctx.execute(f"DELETE FROM {name} WHERE k % 13 = 0")
        a = rows(ctx.execute("SELECT k, v FROM u4m"))
        b = rows(ctx.execute("SELECT k, v FROM u4c"))
        assert a == b


from tests.conftest import rows  # noqa: E402


class TestMorConcurrency:
    def test_concurrent_mor_deletes_all_land(self, ctx):
        """Racing MoR deletes on disjoint keys: snapshot-based OCC +
        statement retry must land both (the loser re-plans its DVs against
        the winner's commit instead of clobbering it)."""
        import threading

        _table(ctx, "cc1")
        errs = []

        def dele(pred):
            try:
                ctx.execute(f"DELETE FROM cc1 WHERE {pred}")
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=dele, args=(p,))
            for p in ("k < 5", "k >= 95", "k = 50")
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert errs == []
        ks = [r.k for r in ctx.execute("SELECT k FROM cc1 ORDER BY k").collect()]
        assert ks == [k for k in range(5, 95) if k != 50]

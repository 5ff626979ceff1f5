"""CDC sync tests (reference tests/flight/sync.rs matrix): schema
validation, insert/update/delete/pk-change squash, partial-column CHANGED
semantics, exactly-once sequences, merge pruning."""

import os

import pandas as pd
import pytest

from seafowl_spark.streaming.sync import (
    ColumnDescriptor as CD,
    SyncError,
    SyncSchema,
    SyncWriter,
)
from tests.conftest import rows


@pytest.fixture()
def target(ctx):
    ctx.execute("CREATE TABLE s (pk bigint, a varchar, b double)")
    ctx.execute("INSERT INTO s VALUES (1, 'one', 1.0), (2, 'two', 2.0)")
    return ctx


def full_schema():
    return SyncSchema(
        [
            CD("old_pk", "old_pk", "pk"),
            CD("new_pk", "new_pk", "pk"),
            CD("a", "value", "a"),
            CD("b", "value", "b"),
        ]
    )


class TestSyncSchema:
    def test_pk_sets_must_match(self):
        with pytest.raises(SyncError, match="must match"):
            SyncSchema([CD("o", "old_pk", "x"), CD("n", "new_pk", "y")])

    def test_changed_must_point_at_value(self):
        with pytest.raises(SyncError, match="value column"):
            SyncSchema(
                [
                    CD("o", "old_pk", "pk"),
                    CD("n", "new_pk", "pk"),
                    CD("c", "changed", "missing"),
                ]
            )

    def test_needs_pk(self):
        with pytest.raises(SyncError, match="new_pk"):
            SyncSchema([CD("a", "value", "a")])


class TestSyncApply:
    def _writer(self, ctx):
        return SyncWriter(ctx.spark, max_rows=10_000)

    def _root(self, ctx):
        return ctx.table_root(ctx.catalog.get_table("default", "public", "s"))

    def test_insert_update_delete(self, target):
        ctx = target
        w = self._writer(ctx)
        batch = pd.DataFrame(
            {
                "old_pk": [None, 1, 2],
                "new_pk": [3, 1, None],
                "a": ["three", "ONE", None],
                "b": [3.0, 1.5, None],
            }
        )
        w.enqueue(self._root(ctx), full_schema(), batch, origin="o1", sequence=1)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")
        assert rows(out) == [(1, "ONE", 1.5), (3, "three", 3.0)]

    def test_pk_chain_squash(self, target):
        """A->B rename then B update collapses to one net change."""
        ctx = target
        w = self._writer(ctx)
        b1 = pd.DataFrame({"old_pk": [1], "new_pk": [10], "a": ["moved"], "b": [1.0]})
        b2 = pd.DataFrame({"old_pk": [10], "new_pk": [10], "a": ["moved2"], "b": [9.9]})
        w.enqueue(self._root(ctx), full_schema(), b1, origin="o1", sequence=1)
        w.enqueue(self._root(ctx), full_schema(), b2, origin="o1", sequence=2)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")
        assert rows(out) == [(2, "two", 2.0), (10, "moved2", 9.9)]

    def test_changed_flag_preserves_columns(self, target):
        """CHANGED=false VALUE columns must not clobber existing data."""
        ctx = target
        w = self._writer(ctx)
        schema = SyncSchema(
            [
                CD("old_pk", "old_pk", "pk"),
                CD("new_pk", "new_pk", "pk"),
                CD("a", "value", "a"),
                CD("a_changed", "changed", "a"),
                CD("b", "value", "b"),
                CD("b_changed", "changed", "b"),
            ]
        )
        batch = pd.DataFrame(
            {
                "old_pk": [1],
                "new_pk": [1],
                "a": [None],
                "a_changed": [False],  # a untouched
                "b": [42.0],
                "b_changed": [True],
            }
        )
        w.enqueue(self._root(ctx), schema, batch, origin="o1", sequence=1)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s WHERE pk = 1")
        assert rows(out) == [(1, "one", 42.0)]  # 'one' survived

    def test_exactly_once_sequence_skip(self, target):
        ctx = target
        w = self._writer(ctx)
        batch = pd.DataFrame({"old_pk": [1], "new_pk": [1], "a": ["x"], "b": [0.0]})
        w.enqueue(self._root(ctx), full_schema(), batch, origin="o1", sequence=5)
        w.flush_all()
        # redelivery of sequence 5 (and below) must be a no-op
        batch2 = pd.DataFrame({"old_pk": [1], "new_pk": [1], "a": ["dup"], "b": [-1.0]})
        flushed = w.enqueue(self._root(ctx), full_schema(), batch2, origin="o1", sequence=5)
        assert flushed is False
        w.flush_all()
        out = ctx.execute("SELECT a FROM s WHERE pk = 1")
        assert rows(out) == [("x",)]

    def test_merge_prunes_untouched_files(self, target):
        """Only files whose PK range intersects the change set rewrite."""
        ctx = target
        ctx.execute("INSERT INTO s VALUES (1000, 'far', 0.0)")
        w = self._writer(ctx)
        batch = pd.DataFrame({"old_pk": [1], "new_pk": [1], "a": ["hit"], "b": [0.1]})
        w.enqueue(self._root(ctx), full_schema(), batch, origin="o1", sequence=1)
        w.flush_all()
        t = ctx.delta_table("s")
        commit = t.read_commit(t.latest_version())
        assert commit.operation == "MERGE"
        # the (1000) file is out of the [1,1] PK range: not rewritten
        assert len(commit.removes) == 1
        out = ctx.execute("SELECT pk, a FROM s ORDER BY pk")
        assert rows(out) == [(1, "hit"), (2, "two"), (1000, "far")]

    def test_row_threshold_triggers_flush(self, target):
        ctx = target
        w = SyncWriter(ctx.spark, max_rows=2)
        b = pd.DataFrame({"old_pk": [None], "new_pk": [50], "a": ["n"], "b": [5.0]})
        assert w.enqueue(self._root(ctx), full_schema(), b, origin="o1", sequence=1) is False
        b2 = pd.DataFrame({"old_pk": [None], "new_pk": [51], "a": ["m"], "b": [6.0]})
        assert w.enqueue(self._root(ctx), full_schema(), b2, origin="o1", sequence=2) is True
        out = ctx.execute("SELECT count(*) AS n FROM s")
        assert rows(out) == [(4,)]


class TestSparkSquash:
    """The distributed flush path (spark_squash_min_rows=0 forces it):
    identical semantics to the pandas squash for chain-free buffers, and
    automatic fallback to the arrival-order pandas pass for PK chains."""

    def _root(self, ctx):
        return ctx.table_root(ctx.catalog.get_table("default", "public", "s"))

    def _writer(self, ctx):
        return SyncWriter(ctx.spark, max_rows=10_000, spark_squash_min_rows=0)

    def test_insert_update_delete_spark_path(self, target):
        ctx = target
        w = self._writer(ctx)
        batch = pd.DataFrame(
            {
                "old_pk": [None, 1, 2],
                "new_pk": [3, 1, None],
                "a": ["three", "ONE", None],
                "b": [3.0, 1.5, None],
            }
        )
        w.enqueue(self._root(ctx), full_schema(), batch, origin="o1", sequence=1)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")
        assert rows(out) == [(1, "ONE", 1.5), (3, "three", 3.0)]

    def test_changed_flag_spark_path(self, target):
        ctx = target
        w = self._writer(ctx)
        schema = SyncSchema(
            [
                CD("old_pk", "old_pk", "pk"),
                CD("new_pk", "new_pk", "pk"),
                CD("a", "value", "a"),
                CD("a_changed", "changed", "a"),
                CD("b", "value", "b"),
                CD("b_changed", "changed", "b"),
            ]
        )
        batch = pd.DataFrame(
            {
                "old_pk": [1],
                "new_pk": [1],
                "a": [None],
                "a_changed": [False],
                "b": [42.0],
                "b_changed": [True],
            }
        )
        w.enqueue(self._root(ctx), schema, batch, origin="o1", sequence=1)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s WHERE pk = 1")
        assert rows(out) == [(1, "one", 42.0)]

    def test_last_write_wins_across_batches(self, target):
        """Two updates to the same PK in separate batches: the later one
        wins, exactly as arrival-order application would have it."""
        ctx = target
        w = self._writer(ctx)
        b1 = pd.DataFrame({"old_pk": [1], "new_pk": [1], "a": ["first"], "b": [1.1]})
        b2 = pd.DataFrame({"old_pk": [1], "new_pk": [1], "a": ["second"], "b": [2.2]})
        root = self._root(ctx)
        w.enqueue(root, full_schema(), b1, origin="o1", sequence=1)
        w.enqueue(root, full_schema(), b2, origin="o1", sequence=2)
        w.flush_all()
        out = ctx.execute("SELECT a, b FROM s WHERE pk = 1")
        assert rows(out) == [("second", 2.2)]

    def test_delete_then_reinsert(self, target):
        """delete(1) then insert(1) within one buffer: values from before
        the delete must not leak into the re-inserted row."""
        ctx = target
        w = self._writer(ctx)
        b = pd.DataFrame(
            {
                "old_pk": [1, 1, None],
                "new_pk": [1, None, 1],
                "a": ["stale", None, "fresh"],
                "b": [9.9, None, 7.0],
            }
        )
        w.enqueue(self._root(ctx), full_schema(), b, origin="o1", sequence=1)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s WHERE pk = 1")
        assert rows(out) == [(1, "fresh", 7.0)]

    def test_pk_chain_falls_back_to_pandas(self, target):
        """Renames force the sequential path even at threshold 0; the
        result matches the chain-squash semantics."""
        ctx = target
        w = self._writer(ctx)
        b1 = pd.DataFrame({"old_pk": [1], "new_pk": [10], "a": ["moved"], "b": [1.0]})
        b2 = pd.DataFrame({"old_pk": [10], "new_pk": [10], "a": ["moved2"], "b": [9.9]})
        root = self._root(ctx)
        w.enqueue(root, full_schema(), b1, origin="o1", sequence=1)
        w.enqueue(root, full_schema(), b2, origin="o1", sequence=2)
        w.flush_all()
        out = ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")
        assert rows(out) == [(2, "two", 2.0), (10, "moved2", 9.9)]

    def test_equivalent_to_pandas_squash(self, ctx):
        """Randomized chain-free buffers produce identical tables through
        both flush paths."""
        import random as _random

        rng = _random.Random(123)
        ops = []
        for _ in range(60):
            pk = rng.randrange(0, 12)
            kind = rng.choice(["ins", "upd", "del"])
            if kind == "del":
                ops.append((pk, None, None, None))
            elif kind == "ins":
                ops.append((None, pk, f"v{rng.randrange(100)}", rng.random()))
            else:
                ops.append((pk, pk, f"u{rng.randrange(100)}", rng.random()))
        pdf = pd.DataFrame(ops, columns=["old_pk", "new_pk", "a", "b"])

        outs = {}
        for mode, threshold in (("pandas", 10**9), ("spark", 0)):
            ctx.execute(f"DROP TABLE IF EXISTS sq_{mode}")
            ctx.execute(f"CREATE TABLE sq_{mode} (pk bigint, a varchar, b double)")
            ctx.execute(f"INSERT INTO sq_{mode} VALUES (0, 'base', 0.0), (5, 'five', 5.0)")
            w = SyncWriter(ctx.spark, max_rows=10_000, spark_squash_min_rows=threshold)
            root = ctx.table_root(ctx.catalog.get_table("default", "public", f"sq_{mode}"))
            half = len(pdf) // 2
            w.enqueue(root, full_schema(), pdf.iloc[:half], origin="o1", sequence=1)
            w.enqueue(root, full_schema(), pdf.iloc[half:], origin="o1", sequence=2)
            w.flush_all()
            outs[mode] = rows(ctx.execute(f"SELECT pk, a, b FROM sq_{mode} ORDER BY pk"))
        assert outs["pandas"] == outs["spark"]


class TestFineGrainedPruning:
    def test_file_between_clusters_dropped(self, ctx):
        """Coarse [min,max] keeps a file that sits between two change
        clusters; fine-grained PK membership drops it (reference
        planner.rs:552-628 two-stage pruning), with identical results."""
        ctx.execute("CREATE TABLE fg (pk bigint, v varchar)")
        # three files with disjoint PK ranges
        ctx.execute("INSERT INTO fg VALUES (1, 'lo'), (5, 'lo2')")
        ctx.execute("INSERT INTO fg VALUES (50, 'mid')")
        ctx.execute("INSERT INTO fg VALUES (95, 'hi'), (100, 'hi2')")
        root = ctx.table_root(ctx.catalog.get_table("default", "public", "fg"))
        from seafowl_spark.engine.deltalite import DeltaLiteTable

        t = DeltaLiteTable(ctx.spark, root)
        changes = ctx.spark.createDataFrame(
            [(1, "LO", False), (95, "HI", False)],
            "pk bigint, v string, __delete__ boolean",
        )
        # force the fine-grained stage (threshold 0)
        commit = t.merge(changes, ["pk"], delete_col="__delete__", fine_grained_rows=0)
        # coarse range [1,95] would rewrite all 3 files; fine-grained
        # drops the middle one (50 is not in the change set)
        assert len(commit.removes) == 2
        out = ctx.execute("SELECT pk, v FROM fg ORDER BY pk")
        assert rows(out) == [
            (1, "LO"), (5, "lo2"), (50, "mid"), (95, "HI"), (100, "hi2"),
        ]

    def test_fine_grained_keeps_results_identical(self, ctx):
        ctx.execute("CREATE TABLE fg2 (pk bigint, v double)")
        ctx.execute("INSERT INTO fg2 SELECT id, id * 1.0 FROM range(0, 200)")
        root = ctx.table_root(ctx.catalog.get_table("default", "public", "fg2"))
        from seafowl_spark.engine.deltalite import DeltaLiteTable

        t = DeltaLiteTable(ctx.spark, root)
        changes = ctx.spark.createDataFrame(
            [(10, -1.0, False), (190, -2.0, False), (500, -3.0, False)],
            "pk bigint, v double, __delete__ boolean",
        )
        t.merge(changes, ["pk"], delete_col="__delete__", fine_grained_rows=0)
        out = rows(ctx.execute("SELECT pk, v FROM fg2 WHERE pk IN (10, 190, 500)"))
        assert out == [(10, -1.0), (190, -2.0), (500, -3.0)]


class TestAppTxnCheckpoint:
    """last_app_txn_version must seed from the checkpoint's app_txns map:
    an idempotence check after 20+ commits still sees pre-checkpoint
    sequence numbers."""

    def test_last_app_txn_across_checkpoint(self, ctx):
        from seafowl_spark.engine.deltalite import DeltaLiteTable

        ctx.execute("CREATE TABLE atx (x int)")
        root = ctx.table_root(ctx.catalog.get_table("default", "public", "atx"))
        t = DeltaLiteTable(ctx.spark, root)
        df = ctx.spark.createDataFrame([(0,)], "x int")
        t.append(df, app_txn={"app_id": "origin-a", "version": 7})
        # push past CHECKPOINT_INTERVAL with unrelated commits
        for i in range(22):
            ctx.execute(f"INSERT INTO atx VALUES ({i})")
        t2 = DeltaLiteTable(ctx.spark, root)
        assert t2.latest_version() >= t2.CHECKPOINT_INTERVAL
        assert t2.last_app_txn_version("origin-a") == 7
        t2.append(df, app_txn={"app_id": "origin-a", "version": 9})
        assert DeltaLiteTable(ctx.spark, root).last_app_txn_version("origin-a") == 9
        assert DeltaLiteTable(ctx.spark, root).last_app_txn_version("other") is None


class TestSyncFailure:
    """Mid-flush failure injection (reference tests/flight/sync_fail.rs):
    a flush dies between the data/DV write and the log commit; the client
    redelivers, and the origin/sequence bookkeeping must keep the apply
    exactly-once while VACUUM collects the orphan files the dead attempt
    left behind."""

    def _writer(self, ctx):
        return SyncWriter(ctx.spark, max_rows=10_000)

    def _root(self, ctx):
        return ctx.table_root(ctx.catalog.get_table("default", "public", "s"))

    def _batch(self):
        return pd.DataFrame(
            {
                "old_pk": [None, 1],
                "new_pk": [3, 1],
                "a": ["three", "ONE"],
                "b": [3.0, 1.5],
            }
        )

    def test_crash_before_commit_redelivery_applies_once(
        self, target, monkeypatch
    ):
        """Data files land, the commit does not: the sequence is NOT
        recorded, so redelivery must re-apply (not skip), and the dead
        attempt's files are orphans for VACUUM."""
        from seafowl_spark.engine import deltalite as dl

        ctx = target
        w = self._writer(ctx)
        root = self._root(ctx)
        t = dl.DeltaLiteTable(ctx.spark, root)
        files_before = set(t.store.list_recursive(t.root))

        real = dl.DeltaLiteTable._write_commit
        boom = {"armed": True}

        def dying(self_t, commit):
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("injected crash before commit")
            return real(self_t, commit)

        monkeypatch.setattr(dl.DeltaLiteTable, "_write_commit", dying)
        w.enqueue(root, full_schema(), self._batch(), origin="o1", sequence=7)
        with pytest.raises(RuntimeError, match="injected"):
            w.flush_all()

        # nothing committed: table unchanged, sequence unrecorded
        assert t.last_app_txn_version("o1") is None
        assert rows(ctx.execute("SELECT pk, a FROM s ORDER BY pk")) == [
            (1, "one"), (2, "two"),
        ]
        orphans = set(t.store.list_recursive(t.root)) - files_before
        assert any(p.endswith(".parquet") for p in orphans)

        # client redelivers the SAME (origin, sequence): must apply
        assert w.enqueue(
            root, full_schema(), self._batch(), origin="o1", sequence=7
        ) is False  # buffered, not skipped
        w.flush_all()
        assert t.last_app_txn_version("o1") == 7
        assert rows(ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")) == [
            (1, "ONE", 1.5), (2, "two", 2.0), (3, "three", 3.0),
        ]

        # VACUUM collects the dead attempt's files; results unaffected
        dead = t.vacuum(retention_ms=0)
        live = set(t.store.list_recursive(t.root))
        assert orphans & live == set()
        assert any(p.endswith(".parquet") for p in dead)
        assert rows(ctx.execute("SELECT count(*) AS n FROM s")) == [(3,)]

    def test_crash_after_commit_redelivery_skips(self, target, monkeypatch):
        """The commit lands but the ack is lost: redelivery of the same
        (origin, sequence) must be a no-op — exactly-once, no double
        apply."""
        from seafowl_spark.engine import deltalite as dl

        ctx = target
        w = self._writer(ctx)
        root = self._root(ctx)
        t = dl.DeltaLiteTable(ctx.spark, root)

        real = dl.DeltaLiteTable._write_commit
        boom = {"armed": True}

        def ack_lost(self_t, commit):
            real(self_t, commit)
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("injected crash after commit")

        monkeypatch.setattr(dl.DeltaLiteTable, "_write_commit", ack_lost)
        w.enqueue(root, full_schema(), self._batch(), origin="o1", sequence=9)
        with pytest.raises(RuntimeError, match="injected"):
            w.flush_all()

        # the commit IS durable; redelivery skips via sequence high-water
        assert t.last_app_txn_version("o1") == 9
        assert w.enqueue(
            root, full_schema(), self._batch(), origin="o1", sequence=9
        ) is False
        w.flush_all()  # empty buffer: nothing to do
        assert rows(ctx.execute("SELECT pk, a, b FROM s ORDER BY pk")) == [
            (1, "ONE", 1.5), (2, "two", 2.0), (3, "three", 3.0),
        ]

    def test_crash_between_dv_write_and_commit(self, ctx, monkeypatch):
        """Merge-on-read DELETE dies after the DV sidecars are written but
        before the commit: reads see no deletes, the retry lands, and
        VACUUM collects the orphaned first-attempt DVs."""
        from seafowl_spark.engine import deltalite as dl

        ctx.execute(
            "CREATE TABLE mf (k BIGINT, v STRING) WITH ('delete_mode' = 'mor')"
        )
        ctx.execute(
            "INSERT INTO mf SELECT id, CAST(id AS STRING) FROM range(0, 100)"
        )
        e = next(e for e in ctx.catalog.tables(ctx.database) if e.name == "mf")
        t = dl.DeltaLiteTable(ctx.spark, ctx.table_root(e))
        files_before = set(t.store.list_recursive(t.root))

        real = dl.DeltaLiteTable._write_commit
        boom = {"armed": True}

        def dying(self_t, commit):
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("injected crash before commit")
            return real(self_t, commit)

        monkeypatch.setattr(dl.DeltaLiteTable, "_write_commit", dying)
        with pytest.raises(RuntimeError, match="injected"):
            ctx.execute("DELETE FROM mf WHERE k < 10")

        # commit never landed: full table still visible, DVs orphaned
        assert rows(ctx.execute("SELECT count(*) AS n FROM mf")) == [(100,)]
        orphan_dvs = {
            p for p in set(t.store.list_recursive(t.root)) - files_before
            if p.endswith(".bin")
        }
        assert orphan_dvs

        # retry succeeds and is the only apply
        ctx.execute("DELETE FROM mf WHERE k < 10")
        assert rows(ctx.execute("SELECT count(*) AS n FROM mf")) == [(90,)]
        t.vacuum(retention_ms=0)
        assert set(t.store.list_recursive(t.root)).isdisjoint(orphan_dvs)
        assert rows(ctx.execute("SELECT count(*) AS n FROM mf")) == [(90,)]

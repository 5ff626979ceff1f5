"""CDC sync tests (reference tests/flight/sync.rs matrix): schema
validation, insert/update/delete/pk-change squash, partial-column CHANGED
semantics, exactly-once sequences, merge pruning."""

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

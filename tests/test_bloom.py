"""Per-file bloom-filter point-lookup pruning (engine/deltalite.py,
r8 — the r7 verdict's task #7): tables created WITH ('bloom_by' 'col')
carry a compact md5-bloom bitmap per (file, column) in the Add entry;
equality predicates prune files that min/max stats cannot (hex digests
span the full range in every file)."""

import hashlib

import pytest

from seafowl_spark.engine.deltalite import (
    BLOOM_BITS_DEFAULT,
    DeltaLiteError,
    DeltaLiteTable,
    _bloom_may_contain,
    _bloom_positions,
)


class TestBloomPrimitives:
    def test_positions_deterministic_and_bounded(self):
        m = 4096
        p1 = _bloom_positions("hello", m)
        assert p1 == _bloom_positions("hello", m)
        assert len(p1) == 4 and all(0 <= p < m for p in p1)
        assert p1 != _bloom_positions("hellp", m)

    def test_membership(self):
        import base64

        m = 512
        bits = bytearray(m // 8)
        for p in _bloom_positions("present", m):
            bits[p // 8] |= 1 << (p % 8)
        b64 = base64.b64encode(bytes(bits)).decode()
        assert _bloom_may_contain(b64, "present", m)
        assert not _bloom_may_contain(b64, "absent-value", m)


def _md5(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


class TestBloomPruning:
    def _seed(self, ctx):
        ctx.execute(
            "CREATE TABLE bt (k BIGINT, v STRING) WITH ('bloom_by' = 'v')"
        )
        # two files whose v (hex digests) SPAN THE SAME RANGE — min/max
        # stats cannot separate them, only the bloom can
        ctx.execute(
            "INSERT INTO bt SELECT id, md5(CAST(id AS STRING)) FROM range(0, 100)"
        )
        ctx.execute(
            "INSERT INTO bt SELECT id, md5(CAST(id AS STRING)) FROM range(100, 200)"
        )

    def test_equality_scans_fewer_files(self, ctx):
        self._seed(ctx)
        full = ctx.execute("SELECT * FROM bt")
        assert len(full.inputFiles()) >= 2
        probe = _md5(5)  # lives in the first file only
        hitq = ctx.execute(f"SELECT k FROM bt WHERE v = '{probe}'")
        assert [r.k for r in hitq.collect()] == [5]  # results identical
        assert len(hitq.inputFiles()) < len(full.inputFiles())
        # a value in NO file prunes everything
        missq = ctx.execute("SELECT k FROM bt WHERE v = 'not-a-digest'")
        assert missq.count() == 0
        assert len(missq.inputFiles()) == 0

    def test_dml_rewrites_only_bloom_hit_files(self, ctx):
        self._seed(ctx)
        t = DeltaLiteTable(
            ctx.spark,
            ctx.table_root(ctx.catalog.get_table("default", "public", "bt")),
        )
        snap = t.snapshot()
        assert len(snap.files) >= 2
        assert all(f.blooms and "v" in f.blooms for f in snap.files)
        hit = t._prune(snap, f"v = '{_md5(150)}'")
        assert len(hit) < len(snap.files)
        ctx.execute(f"DELETE FROM bt WHERE v = '{_md5(150)}'")
        got = ctx.execute("SELECT count(*) AS n FROM bt").collect()[0]["n"]
        assert got == 199

    def test_conjunct_with_or_branch_never_uses_bloom(self, ctx):
        """Equality under OR is not an obligation — both files stay."""
        self._seed(ctx)
        q = ctx.execute(
            f"SELECT k FROM bt WHERE v = '{_md5(5)}' OR v = '{_md5(150)}'"
        )
        assert sorted(r.k for r in q.collect()) == [5, 150]

    def test_integer_bloom_column(self, ctx):
        ctx.execute(
            "CREATE TABLE bi (k BIGINT, grp BIGINT) "
            "WITH ('bloom_by' = 'k', 'bloom_bits' = '2048')"
        )
        # interleaved ids: both files cover [0, 1000) by min/max
        ctx.execute("INSERT INTO bi SELECT id * 2, id % 7 FROM range(0, 500)")
        ctx.execute("INSERT INTO bi SELECT id * 2 + 1, id % 7 FROM range(0, 500)")
        full = ctx.execute("SELECT * FROM bi")
        q = ctx.execute("SELECT grp FROM bi WHERE k = 42")
        assert q.count() == 1
        assert len(q.inputFiles()) < len(full.inputFiles())

    def test_bloom_by_rejects_unsupported_types(self, ctx):
        with pytest.raises(Exception, match="integer/string"):
            ctx.execute(
                "CREATE TABLE bd (x DOUBLE) WITH ('bloom_by' = 'x')"
            )
        with pytest.raises(Exception, match="not in schema"):
            ctx.execute(
                "CREATE TABLE bm (x BIGINT) WITH ('bloom_by' = 'nope')"
            )

    def test_blooms_survive_log_roundtrip_and_updates(self, ctx):
        self._seed(ctx)
        t = DeltaLiteTable(
            ctx.spark,
            ctx.table_root(ctx.catalog.get_table("default", "public", "bt")),
        )
        # fresh handle replays the log: blooms persist in the add JSON
        snap2 = DeltaLiteTable(ctx.spark, t.root_url).snapshot()
        assert all(f.blooms for f in snap2.files)
        # UPDATE rewrites files; the rewritten files get fresh blooms
        ctx.execute(f"UPDATE bt SET v = 'rewritten' WHERE v = '{_md5(7)}'")
        snap3 = DeltaLiteTable(ctx.spark, t.root_url).snapshot()
        assert all(f.blooms and "v" in f.blooms for f in snap3.files)
        q = ctx.execute("SELECT k FROM bt WHERE v = 'rewritten'")
        assert [r.k for r in q.collect()] == [7]


class TestBloomMergePruning:
    """r9: the sync merge consumes blooms through _fine_prune — on a
    hashed/interleaved layout every file spans the full PK range, so
    stats keep everything and only bloom membership can drop files
    (reference planner.rs:552-628 two-stage pruning, bloom layer beyond
    it)."""

    def _twin(self, ctx, name, bloomed):
        props = " WITH ('bloom_by' = 'k')" if bloomed else ""
        ctx.execute(f"CREATE TABLE {name} (k BIGINT, v STRING){props}")
        # interleaved ids, ONE file per insert (range 4th arg = slices):
        # both files cover [0, 1000) by min/max, so stats cannot separate
        ctx.execute(
            f"INSERT INTO {name} SELECT id * 2, 'a' FROM range(0, 500, 1, 1)"
        )
        ctx.execute(
            f"INSERT INTO {name} SELECT id * 2 + 1, 'b' FROM range(0, 500, 1, 1)"
        )
        return DeltaLiteTable(
            ctx.spark,
            ctx.table_root(ctx.catalog.get_table("default", "public", name)),
        )

    def test_merge_rewrites_fewer_files_with_blooms(self, ctx):
        tb = self._twin(ctx, "msb", bloomed=True)
        tp = self._twin(ctx, "msp", bloomed=False)
        changes = ctx.spark.createDataFrame(
            [(4, "upd"), (10, "upd"), (42, "upd")], "k bigint, v string"
        )  # all EVEN ids: live in one file only
        n_files = len(tp.snapshot().files)
        cb = tb.merge(changes, ["k"], fine_grained_rows=0)
        cp = tp.merge(changes, ["k"], fine_grained_rows=0)
        # stats alone cannot separate the interleaved files (every file
        # spans the full range, so ALL rewrite); blooms drop the files
        # that provably lack every change key
        assert len(cp.removes) == n_files
        assert len(cb.removes) < len(cp.removes)
        for name in ("msb", "msp"):
            got = sorted(
                r.k
                for r in ctx.execute(
                    f"SELECT k FROM {name} WHERE v = 'upd'"
                ).collect()
            )
            assert got == [4, 10, 42]
            n = ctx.execute(
                f"SELECT COUNT(*) AS n FROM {name}"
            ).collect()[0]["n"]
            assert n == 1000

    def test_merge_bloom_insert_only_changeset_skips_all_files(self, ctx):
        tb = self._twin(ctx, "msi", bloomed=True)
        changes = ctx.spark.createDataFrame(
            [(5000, "new"), (5002, "new")], "k bigint, v string"
        )  # outside every bloom AND every stats range
        c = tb.merge(changes, ["k"], fine_grained_rows=0)
        assert len(c.removes) == 0  # pure insert: nothing rewrites
        n = ctx.execute("SELECT COUNT(*) AS n FROM msi").collect()[0]["n"]
        assert n == 1002

    def test_merge_bloom_delete_path_correct(self, ctx):
        tb = self._twin(ctx, "msd", bloomed=True)
        changes = ctx.spark.createDataFrame(
            [(4, None, True), (7, None, True)],
            "k bigint, v string, __del boolean",
        )
        n_files = len(tb.snapshot().files)
        c = tb.merge(changes, ["k"], delete_col="__del", fine_grained_rows=0)
        # one even + one odd key: only their bloom-hit files rewrite
        # (strict < is layout-dependent; the pruning claim is gated by
        # test_merge_rewrites_fewer_files_with_blooms)
        assert 0 < len(c.removes) <= n_files
        n = ctx.execute("SELECT COUNT(*) AS n FROM msd").collect()[0]["n"]
        assert n == 998


class TestBloomLifecycle:
    def test_show_create_round_trip(self, ctx):
        """bloom_by/bloom_bits survive SHOW CREATE TABLE -> re-execute,
        and the rebuilt table attaches blooms on insert."""
        ctx.execute(
            "CREATE TABLE bl (k BIGINT, v STRING) "
            "WITH ('bloom_by' = 'k,v', 'bloom_bits' = '1024')"
        )
        ddl = ctx.execute("SHOW CREATE TABLE bl").collect()[0][0]
        assert "'bloom_by' = 'k,v'" in ddl and "'bloom_bits' = '1024'" in ddl
        ctx.execute("DROP TABLE bl")
        ctx.execute(ddl)
        ctx.execute("INSERT INTO bl VALUES (1, 'x'), (2, 'y')")
        t = DeltaLiteTable(
            ctx.spark,
            ctx.table_root(ctx.catalog.get_table("default", "public", "bl")),
        )
        snap = t.snapshot()
        assert snap.properties["bloom_by"] == ["k", "v"]
        assert all(set(f.blooms) == {"k", "v"} for f in snap.files)

    def test_optimize_rewrites_keep_blooms(self, ctx):
        ctx.execute(
            "CREATE TABLE bo (k BIGINT, v STRING) WITH ('bloom_by' = 'v')"
        )
        for lo in (0, 50, 100, 150):
            ctx.execute(
                f"INSERT INTO bo SELECT id, md5(CAST(id AS STRING)) "
                f"FROM range({lo}, {lo + 50})"
            )
        t = DeltaLiteTable(
            ctx.spark,
            ctx.table_root(ctx.catalog.get_table("default", "public", "bo")),
        )
        before = len(t.snapshot().files)
        t.optimize(target_rows=100000)  # compacts into fewer files
        snap = t.snapshot()
        assert len(snap.files) < before
        assert all(f.blooms and "v" in f.blooms for f in snap.files)
        # the compacted blooms still answer lookups
        hit = t._prune(snap, f"v = '{_md5(175)}'")
        assert hit and len(hit) <= len(snap.files)
        probe = ctx.execute(
            f"SELECT k FROM bo WHERE v = '{_md5(175)}'"
        ).collect()
        assert [r.k for r in probe] == [175]


class TestBloomTypeSafety:
    """Cross-type equality literals must NOT bloom-prune (review finding,
    r8 session D): the bitmap hashes CAST(col AS STRING), so a
    numerically-equal but textually-different literal would wrongly drop
    files Spark's comparison would match."""

    def test_int_literal_on_string_column_not_pruned(self, ctx):
        ctx.execute(
            "CREATE TABLE bts (code string, v bigint) WITH ('bloom_by' 'code')"
        )
        ctx.execute("INSERT INTO bts VALUES ('05', 1), ('7', 2)")
        # Spark casts: code = 5 matches the row with code = '05'
        got = ctx.execute("SELECT v FROM bts WHERE code = 5").collect()
        assert [r["v"] for r in got] == [1]
        # same-family predicate still prunes and still answers correctly
        got = ctx.execute("SELECT v FROM bts WHERE code = '7'").collect()
        assert [r["v"] for r in got] == [2]

    def test_string_literal_on_int_column_not_pruned(self, ctx):
        ctx.execute(
            "CREATE TABLE bti (k bigint, v bigint) WITH ('bloom_by' 'k')"
        )
        ctx.execute("INSERT INTO bti VALUES (7, 1), (8, 2)")
        got = ctx.execute("SELECT v FROM bti WHERE k = '007'").collect()
        assert [r["v"] for r in got] == [1]

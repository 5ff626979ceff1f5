"""Delta protocol conformance sweep (r7 — the r6 verdict's task #6):
fuzz commit sequences across checkpoint boundaries, the way
test_wasm_interp fuzzes the wasm spec.

Two planes:

1. deltalite (engine/deltalite.py): seeded-random DML sequences
   (append / CoW + MoR DELETE / UPDATE / DV-folding OPTIMIZE) with the
   checkpoint interval shrunk to 4, then EVERY version's snapshot is
   resolved twice — through the checkpoint and by full-log replay — and
   must be identical (file set, DV descriptors, schema, properties), with
   the final table contents equal to a naive dict model.
2. the real-Delta writer (sources/delta_log.py write_delta_table):
   append sequences crossing the parquet-checkpoint cadence; asserts the
   checkpoint file's spec shape (exactly one protocol and one metaData
   row, schemaString parses, partitionValues present, stats JSON matches
   the parquet footers, _last_checkpoint.size exact), version-travel
   reads at every version, and that deleting every checkpoint artifact
   (forcing full JSON replay) resolves the identical snapshot.

An optional delta-rs cross-read runs when the `deltalake` package exists
(absent in this container — the checkpoint-shape asserts encode the same
reader contract).
"""

from __future__ import annotations

import json
import os
import random
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from seafowl_spark.engine.deltalite import DeltaLiteTable
from seafowl_spark.sources import delta_log


def _tbl(ctx, name) -> DeltaLiteTable:
    e = next(e for e in ctx.catalog.tables(ctx.database) if e.name == name)
    return DeltaLiteTable(ctx.spark, ctx.table_root(e))


def _file_key(a) -> tuple:
    d = a.to_json()
    dv = d.get("dv")
    return (
        d["path"],
        d.get("rows"),
        (dv or {}).get("path"),
        (dv or {}).get("cardinality"),
    )


class TestDeltaliteSnapshotReplay:
    @pytest.mark.parametrize("seed", [7, 23, 91])
    def test_random_sequence_checkpoint_equals_full_replay(
        self, ctx, seed, monkeypatch
    ):
        monkeypatch.setattr(DeltaLiteTable, "CHECKPOINT_INTERVAL", 4)
        rng = random.Random(seed)
        mode = rng.choice(["cow", "mor"])
        name = f"fz{seed}"
        ctx.execute(
            f"CREATE TABLE {name} (k BIGINT, v STRING) "
            f"WITH ('delete_mode' = '{mode}')"
        )
        model: dict[int, str] = {}
        nxt = 0

        def do_append():
            nonlocal nxt
            n = rng.randint(1, 20)
            lo, hi = nxt, nxt + n
            nxt = hi
            ctx.execute(
                f"INSERT INTO {name} "
                f"SELECT id, CAST(id AS STRING) FROM range({lo}, {hi})"
            )
            for k in range(lo, hi):
                model[k] = str(k)

        def do_delete():
            m = rng.choice([3, 5, 7])
            r = rng.randrange(m)
            ctx.execute(f"DELETE FROM {name} WHERE k % {m} = {r}")
            for k in [k for k in model if k % m == r]:
                del model[k]

        def do_update():
            m = rng.choice([4, 6])
            r = rng.randrange(m)
            ctx.execute(f"UPDATE {name} SET v = 'upd' WHERE k % {m} = {r}")
            for k in model:
                if k % m == r:
                    model[k] = "upd"

        def do_optimize():
            # target small so compaction actually rewrites; folds DVs back
            _tbl(ctx, name).optimize(target_rows=64)

        n_alters = [0]

        def do_alter():
            # metadata-only schema evolution mid-sequence: the column is
            # all-NULL so the (k, v) model is unaffected, but snapshot
            # replay must carry the per-version schema across checkpoints
            n_alters[0] += 1
            ctx.execute(
                f"ALTER TABLE {name} ADD COLUMN extra_{n_alters[0]} DOUBLE"
            )

        # per-version model snapshots so RESTORE can rewind the model too
        hist: dict[int, dict[int, str]] = {}

        def do_restore():
            nonlocal model
            target = rng.choice(sorted(hist))
            try:
                ctx.execute(
                    f"RESTORE TABLE {name} TO VERSION AS OF {target}"
                )
            except Exception as e:
                # a VACUUM in the sequence may have GC'd the target's
                # files — restore must REFUSE loudly and leave the live
                # state untouched. ONLY the vacuumed-target refusal is a
                # legitimate outcome here; any other error is a real
                # restore bug and must fail the fuzz, not be absorbed.
                assert "vacuumed" in str(e), e
                hist.pop(target, None)
                return
            model = dict(hist[target])

        def do_vacuum():
            # GC every unreferenced file: restore targets whose files die
            # here must be refused by do_restore, never half-applied
            _tbl(ctx, name).vacuum()

        do_append()
        hist[_tbl(ctx, name).latest_version()] = dict(model)
        for _ in range(11):
            rng.choice(
                [
                    do_append,
                    do_append,
                    do_delete,
                    do_update,
                    do_optimize,
                    do_alter,
                    do_restore,
                    do_vacuum,
                ]
            )()
            hist[_tbl(ctx, name).latest_version()] = dict(model)

        t = _tbl(ctx, name)
        vs = t.versions()
        # the sequence crossed at least one checkpoint boundary, and the
        # checkpoint artifacts exist on disk
        assert vs[-1] >= DeltaLiteTable.CHECKPOINT_INTERVAL
        log_files = t.store.list(t.log_dir)
        assert any(f.endswith(".checkpoint.json") for f in log_files), log_files

        for v in vs:
            via_ckpt = t.snapshot(version=v)
            with monkeypatch.context() as mp:
                mp.setattr(
                    DeltaLiteTable, "_load_checkpoint", lambda self, up: None
                )
                via_replay = t.snapshot(version=v)
            assert sorted(map(_file_key, via_ckpt.files)) == sorted(
                map(_file_key, via_replay.files)
            ), f"version {v}"
            assert via_ckpt.schema_ddl == via_replay.schema_ddl
            assert via_ckpt.properties == via_replay.properties
            assert via_ckpt.timestamp_ms == via_replay.timestamp_ms

        got = {
            r.k: r.v
            for r in ctx.execute(f"SELECT k, v FROM {name}").collect()
        }
        assert got == model


class TestRealDeltaWriterConformance:
    @pytest.mark.parametrize("seed", [3, 11])
    def test_append_sequence_spec_shape_and_replay(
        self, spark, tmp_path, monkeypatch, seed
    ):
        monkeypatch.setattr(delta_log, "CHECKPOINT_EVERY", 3)
        rng = random.Random(seed)
        d = str(tmp_path / "t")
        commits: list[tuple[int, int]] = []  # (version, cumulative hi)
        nxt = 0
        for _ in range(rng.randint(7, 9)):
            n = rng.randint(1, 10)
            lo, hi = nxt, nxt + n
            nxt = hi
            df = spark.range(lo, hi).select(
                F.col("id").alias("k"), F.col("id").cast("string").alias("v")
            )
            v = delta_log.write_delta_table(spark, df, d)
            commits.append((v, hi))

        log_dir = os.path.join(d, "_delta_log")
        cks = sorted(
            f for f in os.listdir(log_dir) if f.endswith(".checkpoint.parquet")
        )
        assert cks  # crossed the cadence

        # ---- checkpoint file spec shape (the delta-rs reader contract)
        lc = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
        ck = pq.read_table(
            os.path.join(log_dir, f"{lc['version']:020d}.checkpoint.parquet")
        )
        assert ck.num_rows == lc["size"]
        rows = ck.to_pylist()
        protos = [r["protocol"] for r in rows if r.get("protocol") is not None]
        metas = [r["metaData"] for r in rows if r.get("metaData") is not None]
        adds = [r["add"] for r in rows if r.get("add") is not None]
        assert len(protos) == 1  # spec: exactly one protocol action
        assert protos[0]["minReaderVersion"] == 1
        assert len(metas) == 1  # spec: exactly one metaData action
        schema_json = json.loads(metas[0]["schemaString"])
        assert schema_json["type"] == "struct"
        assert {f["name"] for f in schema_json["fields"]} == {"k", "v"}
        assert metas[0]["partitionColumns"] == []
        assert len(adds) >= 1
        for a in adds:
            # partitionValues must be PRESENT (empty map), not null — the
            # field is required by the protocol's add schema
            assert a["partitionValues"] is not None
            st = json.loads(a["stats"])
            pf = pq.ParquetFile(os.path.join(d, a["path"]))
            assert st["numRecords"] == pf.metadata.num_rows
            assert "minValues" in st and "maxValues" in st
            assert int(st["minValues"]["k"]) <= int(st["maxValues"]["k"])
            assert a["size"] == os.path.getsize(os.path.join(d, a["path"]))

        # ---- version travel: every version reads the cumulative prefix
        for v, hi in commits:
            got = sorted(
                r.k for r in delta_log.read_delta(spark, d, version=v).collect()
            )
            assert got == list(range(0, hi)), f"version {v}"

        # ---- checkpoint resolution == full JSON replay
        d2 = str(tmp_path / "replay")
        shutil.copytree(d, d2)
        for f in os.listdir(os.path.join(d2, "_delta_log")):
            if "checkpoint" in f or f == "_last_checkpoint":
                os.remove(os.path.join(d2, "_delta_log", f))
        a1, m1 = delta_log.delta_snapshot_adds(d)
        a2, m2 = delta_log.delta_snapshot_adds(d2)
        key1 = {
            os.path.relpath(p, d): (a["size"], a.get("stats"))
            for p, a in a1.items()
        }
        key2 = {
            os.path.relpath(p, d2): (a["size"], a.get("stats"))
            for p, a in a2.items()
        }
        assert key1 == key2
        assert m1.get("schemaString") == m2.get("schemaString")

        # ---- optional: real delta-rs cross-read when available
        try:
            from deltalake import DeltaTable  # noqa: F401
        except ImportError:
            return
        dt = DeltaTable(d)
        assert sorted(dt.to_pandas()["k"].tolist()) == list(range(0, commits[-1][1]))

"""Real Delta Lake log interop (sources/delta_log.py).

The reference stores tables via delta-rs, so its data directories are
standard Delta tables: JSON action log + optional parquet checkpoints.
These fixtures hand-write that exact layout (protocol/metaData/add/remove/
commitInfo actions; checkpoint + _last_checkpoint) and drive the reader
through current reads, version/timestamp travel, checkpointed logs,
partitioned tables, and the engine's STORED AS DELTA path."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from seafowl_spark.sources.delta_log import (
    DeltaLogError,
    delta_snapshot_files,
    read_delta,
)

SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_part(d, name, ks, vs):
    pq.write_table(pa.table({"k": pa.array(ks, pa.int32()), "v": vs}), os.path.join(d, name))


def _commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta(partition_cols=None):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STR,
            "partitionColumns": partition_cols or [],
            "configuration": {},
        }
    }


def _add(path, ts):
    return {
        "add": {
            "path": path,
            "partitionValues": {},
            "size": 100,
            "modificationTime": ts,
            "dataChange": True,
        }
    }


@pytest.fixture()
def delta_dir(tmp_path):
    """v0 adds f1, v1 adds f2, v2 removes f1 — delta-rs-shaped log."""
    d = str(tmp_path / "dl")
    log = os.path.join(d, "_delta_log")
    os.makedirs(log)
    _write_part(d, "f1.parquet", [1, 2], ["a", "b"])
    _write_part(d, "f2.parquet", [3], ["c"])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("f1.parquet", 1000),
        {"commitInfo": {"timestamp": 1000, "operation": "WRITE"}},
    ])
    _commit(log, 1, [
        _add("f2.parquet", 2000),
        {"commitInfo": {"timestamp": 2000, "operation": "WRITE"}},
    ])
    _commit(log, 2, [
        {"remove": {"path": "f1.parquet", "deletionTimestamp": 3000, "dataChange": True}},
        {"commitInfo": {"timestamp": 3000, "operation": "DELETE"}},
    ])
    return d


class TestDeltaLog:
    def test_current_snapshot_applies_removes(self, spark, delta_dir):
        out = read_delta(spark, delta_dir).collect()
        assert sorted(r["k"] for r in out) == [3]

    def test_version_travel(self, spark, delta_dir):
        assert sorted(r["k"] for r in read_delta(spark, delta_dir, version=1).collect()) == [1, 2, 3]
        assert sorted(r["k"] for r in read_delta(spark, delta_dir, version=0).collect()) == [1, 2]

    def test_timestamp_travel(self, spark, delta_dir):
        out = read_delta(spark, delta_dir, timestamp_ms=2500).collect()
        assert sorted(r["k"] for r in out) == [1, 2, 3]
        with pytest.raises(DeltaLogError, match="predates"):
            read_delta(spark, delta_dir, timestamp_ms=500)

    def test_missing_version_rejected(self, spark, delta_dir):
        with pytest.raises(DeltaLogError, match="not present"):
            read_delta(spark, delta_dir, version=9)

    def test_checkpoint_with_truncated_log(self, spark, delta_dir):
        """Logs compacted up to a checkpoint: only the checkpoint + later
        JSON commits remain (delta protocol's log-cleanup shape)."""
        log = os.path.join(delta_dir, "_delta_log")
        ckpt = pa.table({
            "add": [
                {"path": "f1.parquet", "size": 100},
                {"path": "f2.parquet", "size": 100},
                None,
            ]
        })
        pq.write_table(ckpt, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
        with open(os.path.join(log, "_last_checkpoint"), "w") as f:
            json.dump({"version": 1, "size": 2}, f)
        os.unlink(os.path.join(log, f"{0:020d}.json"))
        os.unlink(os.path.join(log, f"{1:020d}.json"))
        out = read_delta(spark, delta_dir).collect()
        assert sorted(r["k"] for r in out) == [3]  # checkpoint + v2 remove

    def test_partitioned_paths_rederive_columns(self, spark, tmp_path):
        d = str(tmp_path / "dlp")
        log = os.path.join(d, "_delta_log")
        os.makedirs(os.path.join(d, "part=a"))
        os.makedirs(os.path.join(d, "part=b"))
        os.makedirs(log)
        _write_part(d, "part=a/x.parquet", [1], ["a"])
        _write_part(d, "part=b/y.parquet", [2], ["b"])
        _commit(log, 0, [
            _meta(["part"]),
            _add("part=a/x.parquet", 1000),
            _add("part=b/y.parquet", 1000),
            {"commitInfo": {"timestamp": 1000}},
        ])
        out = read_delta(spark, d).select("k", "part").collect()
        assert sorted((r["k"], r["part"]) for r in out) == [(1, "a"), (2, "b")]

    def test_snapshot_files_listing(self, delta_dir):
        files, meta = delta_snapshot_files(delta_dir)
        assert [os.path.basename(f) for f in files] == ["f2.parquet"]
        assert meta["partitionColumns"] == []

    def test_external_table_and_travel_via_engine(self, ctx, delta_dir):
        ctx.execute(
            f"CREATE EXTERNAL TABLE real_dl STORED AS DELTA LOCATION '{delta_dir}'"
        )
        cur = ctx.execute("SELECT k FROM staging.real_dl ORDER BY k").collect()
        assert [r.k for r in cur] == [3]
        old = ctx.execute(
            "SELECT k FROM staging.real_dl FOR VERSION AS OF 1 ORDER BY k"
        ).collect()
        assert [r.k for r in old] == [1, 2, 3]

    def test_deletion_vector_file_applied(self, spark, delta_dir):
        # kill row index 0 of f2.parquet (value k=3) via a .bin DV
        from seafowl_spark.sources.delta_dv import write_dv_file

        log = os.path.join(delta_dir, "_delta_log")
        dv = write_dv_file(delta_dir, [0])
        a = _add("f2.parquet", 4000)
        a["add"]["deletionVector"] = dv
        _commit(log, 3, [a, {"commitInfo": {"timestamp": 4000}}])
        # delta_dir v2 removed f1, leaving only f2 = [3]; the DV kills it
        assert read_delta(spark, delta_dir).count() == 0
        # pre-DV version still sees the row
        assert [r.k for r in read_delta(spark, delta_dir, version=2).collect()] == [3]

    def test_deletion_vector_inline_applied(self, spark, delta_dir):
        from seafowl_spark.sources.delta_dv import encode_rbm_array, z85_encode

        log = os.path.join(delta_dir, "_delta_log")
        data = encode_rbm_array([0])
        padded = data + b"\x00" * (-len(data) % 4)
        a = _add("f2.parquet", 4000)
        a["add"]["deletionVector"] = {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(data),
            "cardinality": 1,
        }
        _commit(log, 3, [a, {"commitInfo": {"timestamp": 4000}}])
        assert read_delta(spark, delta_dir).count() == 0

    def test_column_mapping_name_mode(self, spark, tmp_path):
        # physical parquet columns col-1/col-2; logical schema k/v
        d = str(tmp_path / "cm")
        log = os.path.join(d, "_delta_log")
        os.makedirs(log)
        pq.write_table(
            pa.table({"col-1": pa.array([1, 2], pa.int32()), "col-2": ["a", "b"]}),
            os.path.join(d, "f1.parquet"),
        )
        schema = {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "col-1",
                              "delta.columnMapping.id": 1}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "col-2",
                              "delta.columnMapping.id": 2}},
            ],
        }
        m = _meta()
        m["metaData"]["schemaString"] = json.dumps(schema)
        m["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
        _commit(log, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            m, _add("f1.parquet", 1000),
            {"commitInfo": {"timestamp": 1000}},
        ])
        df = read_delta(spark, d)
        assert df.columns == ["k", "v"]
        assert sorted((r.k, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]

    def test_column_mapping_missing_physical_column_rejected(self, spark, tmp_path):
        d = str(tmp_path / "cm2")
        log = os.path.join(d, "_delta_log")
        os.makedirs(log)
        _write_part(d, "f1.parquet", [1], ["a"])  # plain k/v columns
        schema = {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "col-9"}},
            ],
        }
        m = _meta()
        m["metaData"]["schemaString"] = json.dumps(schema)
        m["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
        _commit(log, 0, [m, _add("f1.parquet", 1000),
                         {"commitInfo": {"timestamp": 1000}}])
        with pytest.raises(DeltaLogError, match="physical column"):
            read_delta(spark, d).collect()


class TestDeltaWriter:
    def test_write_read_roundtrip_and_append(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import write_delta_table

        d = str(tmp_path / "w")
        v0 = write_delta_table(
            spark, spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), d
        )
        assert v0 == 0
        v1 = write_delta_table(spark, spark.createDataFrame([(3, "c")], "k int, v string"), d)
        assert v1 == 1
        out = read_delta(spark, d).collect()
        assert sorted(r["k"] for r in out) == [1, 2, 3]
        # log carries a real delta action stream
        with open(os.path.join(d, "_delta_log", f"{0:020d}.json")) as f:
            kinds = [next(iter(json.loads(ln))) for ln in f if ln.strip()]
        assert kinds[0] == "protocol" and "metaData" in kinds and "add" in kinds
        # schemaString is Spark-schema JSON (what delta-rs expects)
        files, meta = delta_snapshot_files(d)
        assert len(files) >= 2

    def test_copy_to_delta_statement(self, ctx, tmp_path):
        ctx.execute("CREATE TABLE csrc (k int)")
        ctx.execute("INSERT INTO csrc VALUES (1), (2), (3)")
        dest = str(tmp_path / "copy_delta")
        ctx.execute(f"COPY csrc TO '{dest}' STORED AS DELTA")
        ctx.execute(f"CREATE EXTERNAL TABLE cdl STORED AS DELTA LOCATION '{dest}'")
        out = ctx.execute("SELECT k FROM staging.cdl ORDER BY k").collect()
        assert [r.k for r in out] == [1, 2, 3]
        # second COPY appends a commit readable at the new version
        ctx.execute(f"COPY csrc TO '{dest}' STORED AS DELTA")
        assert read_delta(spark=ctx.spark, table_dir=dest).count() == 6
        assert read_delta(ctx.spark, dest, version=0).count() == 3

    def test_convert_real_delta_uses_live_files_only(self, ctx, delta_dir):
        """CONVERT over a real Delta dir must respect the log: f1 was
        removed at v2, so its rows must not be resurrected."""
        ctx.execute(f"CONVERT '{delta_dir}' TO DELTA conv_dl")
        out = ctx.execute("SELECT k FROM conv_dl ORDER BY k").collect()
        assert [r.k for r in out] == [3]


class TestDeltaStatsPruning:
    """File skipping from per-add stats JSON (prune_adds + engine wiring)."""

    def _two_file_table(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import write_delta_table

        d = str(tmp_path / "pr")
        df1 = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        df2 = spark.range(1000, 1010).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        write_delta_table(spark, df1.coalesce(1), d)
        write_delta_table(spark, df2.coalesce(1), d)
        return d

    def test_writer_emits_stats(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import delta_snapshot_adds

        d = self._two_file_table(spark, tmp_path)
        adds, _ = delta_snapshot_adds(d)
        stats = [json.loads(a["stats"]) for a in adds.values()]
        assert sorted(s["minValues"]["k"] for s in stats) == [0, 1000]
        assert all(s["numRecords"] == 10 for s in stats)
        assert all(s["nullCount"]["k"] == 0 for s in stats)

    def test_prune_adds_conservative(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import delta_snapshot_adds, prune_adds

        d = self._two_file_table(spark, tmp_path)
        adds, _ = delta_snapshot_adds(d)
        assert len(prune_adds(adds, "k >= 1000")) == 1
        assert len(prune_adds(adds, "k = 5")) == 1
        assert len(prune_adds(adds, "k < 0")) == 0
        # unknown column / unparseable predicate / no stats keep everything
        assert len(prune_adds(adds, "zzz = 1")) == 2
        assert len(prune_adds(adds, "weird_func(k) = 1")) == 2
        stripped = {
            p: {k: v for k, v in a.items() if k != "stats"} for p, a in adds.items()
        }
        assert len(prune_adds(stripped, "k < 0")) == 2

    def test_pruned_read_and_empty_case(self, spark, tmp_path):
        d = self._two_file_table(spark, tmp_path)
        out = read_delta(spark, d, predicate_sql="k >= 1000")
        assert out.count() == 10
        assert len(out.inputFiles()) == 1
        empty = read_delta(spark, d, predicate_sql="k < 0")
        assert empty.count() == 0
        assert set(empty.columns) == {"k", "v"}

    def test_engine_query_prunes_files(self, ctx, spark, tmp_path):
        d = self._two_file_table(spark, tmp_path)
        ctx.execute(f"CREATE EXTERNAL TABLE dl STORED AS DELTA LOCATION '{d}'")
        full = ctx.execute("SELECT * FROM staging.dl")
        filtered = ctx.execute("SELECT k FROM staging.dl WHERE k >= 1000 ORDER BY k")
        assert [r.k for r in filtered.collect()] == list(range(1000, 1010))
        assert len(filtered.inputFiles()) < len(full.inputFiles())


class TestWriterCheckpoints:
    def test_checkpoint_written_and_usable(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import (
            CHECKPOINT_EVERY,
            write_delta_table,
        )

        d = str(tmp_path / "ck")
        for i in range(CHECKPOINT_EVERY + 2):  # versions 0..11
            write_delta_table(
                spark, spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"), d
            )
        log = os.path.join(d, "_delta_log")
        ckpt = os.path.join(log, f"{CHECKPOINT_EVERY:020d}.checkpoint.parquet")
        assert os.path.exists(ckpt)
        assert json.load(open(os.path.join(log, "_last_checkpoint")))[
            "version"
        ] == CHECKPOINT_EVERY
        # full read sees every append
        assert read_delta(spark, d).count() == (CHECKPOINT_EVERY + 2) * 10
        # truncate pre-checkpoint JSON commits: log-compacted table still
        # reads (checkpoint seeds adds AND metaData)
        for v in range(CHECKPOINT_EVERY):
            os.unlink(os.path.join(log, f"{v:020d}.json"))
        assert read_delta(spark, d).count() == (CHECKPOINT_EVERY + 2) * 10
        # travel to a pre-checkpoint version is gone with the truncated log
        with pytest.raises(DeltaLogError):
            read_delta(spark, d, version=2)

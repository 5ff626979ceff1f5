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

    def test_statsless_chunk_never_resurrected(self, monkeypatch):
        """r4 advice: a column chunk with statistics=None must drop the
        column from file-wide min/max (and nullCount) PERMANENTLY — a
        later row group with stats re-adding it would emit bounds that
        cover only some row groups, and prune_adds would wrongly skip the
        file. Per-row-group stats variance can't be produced by a single
        pyarrow writer, so stub the footer metadata."""
        import pyarrow.parquet as pq

        from seafowl_spark.sources.delta_log import _file_stats_json

        class St:
            def __init__(self, null_count, mn, mx):
                self.null_count = null_count
                self.has_min_max = mn is not None
                self.min, self.max = mn, mx

        class Col:
            def __init__(self, name, st):
                self.path_in_schema = name
                self.statistics = st

        class RG:
            def __init__(self, cols):
                self._c, self.num_columns = cols, len(cols)

            def column(self, i):
                return self._c[i]

        class MD:
            def __init__(self, rgs, rows):
                self._r, self.num_row_groups, self.num_rows = rgs, len(rgs), rows

            def row_group(self, i):
                return self._r[i]

        class PF:
            def __init__(self, md):
                self.metadata = md

        md = MD(
            [
                RG([Col("a", None), Col("b", St(0, 1, 5)), Col("c", St(None, 2, 3))]),
                RG([Col("a", St(0, 100, 200)), Col("b", St(1, 6, 9)), Col("c", St(0, 1, 4))]),
            ],
            20,
        )
        monkeypatch.setattr(pq, "ParquetFile", lambda path: PF(md))
        s = _file_stats_json("ignored")
        # 'a' had a stats-less chunk in rg0: rg1's [100, 200] must not
        # surface as file-wide bounds, nor its null count
        assert "a" not in s["minValues"] and "a" not in s["maxValues"]
        assert "a" not in s["nullCount"]
        # 'c' had min/max but an unknown null_count in rg0
        assert s["minValues"]["c"] == 1 and s["maxValues"]["c"] == 4
        assert "c" not in s["nullCount"]
        assert s["minValues"]["b"] == 1 and s["maxValues"]["b"] == 9
        assert s["nullCount"]["b"] == 1

    def test_pruned_empty_partitioned_keeps_partition_columns(self, spark, tmp_path):
        """r4 advice: the all-files-pruned branch must build the empty
        frame with basePath so directory-encoded partition columns stay
        in the schema."""
        d = str(tmp_path / "dlpe")
        log = os.path.join(d, "_delta_log")
        os.makedirs(os.path.join(d, "part=a"))
        os.makedirs(log)
        _write_part(d, "part=a/x.parquet", [1], ["a"])
        add = _add("part=a/x.parquet", 1000)
        add["add"]["stats"] = json.dumps(
            {"numRecords": 1, "minValues": {"k": 1}, "maxValues": {"k": 1},
             "nullCount": {"k": 0}}
        )
        _commit(log, 0, [
            _meta(["part"]),
            add,
            {"commitInfo": {"timestamp": 1000}},
        ])
        out = read_delta(spark, d, predicate_sql="k > 100")
        assert out.count() == 0
        assert "part" in out.columns

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

    def test_checkpoint_spec_shape(self, spark, tmp_path):
        """r4 advice: external delta readers require exactly one protocol
        row per checkpoint, and required-but-empty fields (e.g.
        add.partitionValues) stored as empty maps, not stripped."""
        from seafowl_spark.sources.delta_log import (
            CHECKPOINT_EVERY,
            write_delta_table,
        )

        d = str(tmp_path / "cks")
        for i in range(CHECKPOINT_EVERY + 1):
            write_delta_table(
                spark, spark.range(i * 10, i * 10 + 10).selectExpr("id AS k"), d
            )
        log = os.path.join(d, "_delta_log")
        t = pq.read_table(
            os.path.join(log, f"{CHECKPOINT_EVERY:020d}.checkpoint.parquet")
        )
        rows = t.to_pylist()
        protos = [r["protocol"] for r in rows if r.get("protocol") is not None]
        assert len(protos) == 1
        assert protos[0]["minReaderVersion"] == 1
        assert protos[0]["minWriterVersion"] == 2
        adds = [r["add"] for r in rows if r.get("add") is not None]
        assert adds and all(a["partitionValues"] == [] for a in adds)  # empty MAP
        metas = [r["metaData"] for r in rows if r.get("metaData") is not None]
        assert len(metas) == 1 and metas[0]["partitionColumns"] == []
        # arrow-level types: partitionValues/configuration are real maps
        add_t = t.schema.field("add").type
        pv = next(f for f in add_t if f.name == "partitionValues")
        assert pa.types.is_map(pv.type)

    def test_checkpoint_vetoed_for_unrepresentable_adds(self, spark, tmp_path, monkeypatch):
        """An add carrying a field outside the checkpoint schema (e.g.
        deletionVector) must veto the checkpoint rather than write a lossy
        one that would resurrect deleted rows for external readers."""
        from seafowl_spark.sources import delta_log as dl

        d = str(tmp_path / "ckv")
        log = os.path.join(d, "_delta_log")
        os.makedirs(log)
        _write_part(d, "f1.parquet", [1], ["a"])
        add = _add("f1.parquet", 1000)
        add["add"]["deletionVector"] = {"storageType": "u", "pathOrInlineDv": "x",
                                        "offset": 1, "sizeInBytes": 1, "cardinality": 1}
        _commit(log, 0, [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
            _meta(),
            add,
            {"commitInfo": {"timestamp": 1000}},
        ])
        dl._write_checkpoint(d, 0)
        assert not os.path.exists(os.path.join(log, f"{0:020d}.checkpoint.parquet"))
        assert not os.path.exists(os.path.join(log, "_last_checkpoint"))


class TestPartitionedDeltaWriter:
    """Partitioned delta writes (r7 session C): hive col=val layout,
    partitionValues in add actions, partitionColumns in metaData, reads
    re-derive the columns, and partition-column predicates prune whole
    directories from the file list."""

    def test_partitioned_roundtrip_and_log_shape(self, spark, tmp_path):
        import glob

        from seafowl_spark.sources.delta_log import write_delta_table

        d = str(tmp_path / "pw")
        df = spark.createDataFrame(
            [(1, "x", "a b"), (2, "y", "a b"), (3, "z", "c")],
            "k int, v string, part string",
        )
        assert write_delta_table(spark, df, d, partition_by=["part"]) == 0
        # hive layout on disk (Spark keeps the literal space in the dir
        # name; the LOG path is what gets percent-encoded)
        dirs = {
            os.path.basename(p)
            for p in glob.glob(os.path.join(d, "part=*"))
        }
        assert dirs == {"part=a b", "part=c"}
        # add actions carry decoded partitionValues + encoded paths
        with open(os.path.join(d, "_delta_log", f"{0:020d}.json")) as f:
            acts = [json.loads(ln) for ln in f if ln.strip()]
        adds = [a["add"] for a in acts if "add" in a]
        assert {a["partitionValues"]["part"] for a in adds} == {"a b", "c"}
        assert any(a["path"].startswith("part=a%20b/") for a in adds)
        assert all("part=" in a["path"] and " " not in a["path"] for a in adds)
        meta = next(a["metaData"] for a in acts if "metaData" in a)
        assert meta["partitionColumns"] == ["part"]
        # read back: partition column re-derived, all rows intact
        out = read_delta(spark, d).collect()
        assert sorted((r["k"], r["part"]) for r in out) == [
            (1, "a b"), (2, "a b"), (3, "c"),
        ]

    def test_append_must_keep_partitioning(self, spark, tmp_path):
        import pytest

        from seafowl_spark.sources.delta_log import (
            DeltaLogError,
            write_delta_table,
        )

        d = str(tmp_path / "pa")
        df = spark.createDataFrame([(1, "a")], "k int, part string")
        write_delta_table(spark, df, d, partition_by=["part"])
        with pytest.raises(DeltaLogError, match="partitioning"):
            write_delta_table(spark, df, d)  # unpartitioned append
        # matching append works and accumulates
        write_delta_table(spark, df, d, partition_by=["part"])
        assert read_delta(spark, d).count() == 2

    def test_partition_predicate_prunes_files(self, spark, tmp_path):
        from seafowl_spark.sources.delta_log import (
            delta_snapshot_adds,
            prune_adds,
            write_delta_table,
        )

        d = str(tmp_path / "pp")
        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(30)], "k int, part string"
        )
        write_delta_table(spark, df, d, partition_by=["part"])
        adds, _ = delta_snapshot_adds(d)
        assert len(adds) >= 3
        kept = prune_adds(adds, "part = 's1'")
        assert 0 < len(kept) < len(adds)
        assert all("part=s1" in p for p in kept)
        # numeric partition values prune with numeric comparisons
        d2 = str(tmp_path / "pp2")
        df2 = spark.createDataFrame(
            [(i, i % 4) for i in range(40)], "k int, bucket int"
        )
        write_delta_table(spark, df2, d2, partition_by=["bucket"])
        adds2, _ = delta_snapshot_adds(d2)
        kept2 = prune_adds(adds2, "bucket > 2")
        assert all("bucket=3" in p for p in kept2) and kept2

    def test_copy_statement_partitioned_delta(self, ctx, tmp_path):
        ctx.execute("CREATE TABLE psrc (k int, part text)")
        ctx.execute(
            "INSERT INTO psrc VALUES (1, 'a'), (2, 'a'), (3, 'b')"
        )
        dest = str(tmp_path / "copy_pd")
        ctx.execute(
            f"COPY psrc TO '{dest}' STORED AS DELTA PARTITIONED BY (part)"
        )
        ctx.execute(
            f"CREATE EXTERNAL TABLE pdl STORED AS DELTA LOCATION '{dest}'"
        )
        out = ctx.execute(
            "SELECT k, part FROM staging.pdl ORDER BY k"
        ).collect()
        assert [(r.k, r.part) for r in out] == [(1, "a"), (2, "a"), (3, "b")]


class TestPartitionValueEncoding:
    def test_special_partition_values_round_trip(self, spark, tmp_path):
        """The protocol's encoding corners: spaces, '/', ':', '%', '=',
        unicode, dots — Spark hive-escapes the DIRECTORY name, the log
        percent-encodes add.path on top (a literal '%2F' in a dir name
        logs as '%252F'), and the reader's unquote lands back on the
        real file. Empty-string partitions collapse to NULL (the hive
        __HIVE_DEFAULT_PARTITION__ convention, same as delta-spark)."""
        from seafowl_spark.sources.delta_log import write_delta_table

        vals = ["plain", "a b", "a/b", "a:b", "a%b", "a=b",
                "ünïcode", "", None, "dot.dot"]
        d = str(tmp_path / "pv")
        df = spark.createDataFrame(
            list(enumerate(vals)), "k int, part string"
        )
        write_delta_table(spark, df, d, partition_by=["part"])
        out = {r["k"]: r["part"] for r in read_delta(spark, d).collect()}
        for i, v in enumerate(vals):
            want = None if v in ("", None) else v
            assert out[i] == want, (v, out[i])
        # and the decoded partitionValues in the log match the reads
        from seafowl_spark.sources.delta_log import delta_snapshot_adds

        adds, _ = delta_snapshot_adds(d)
        logged = {a["partitionValues"]["part"] for a in adds.values()}
        assert logged == {v for v in vals if v not in ("", None)} | {None}


class TestFooterStatsSuppression:
    """engine.deltalite._footer_stats must drop a column's file-wide
    bounds when ANY row group lacks usable stats for it — partial bounds
    would let prune_files skip a file whose stats-less row group holds
    matches (same suppression contract as _file_stats_json above)."""

    def _write_two_row_groups(self, path, t1, t2):
        import pyarrow.parquet as pq

        with pq.ParquetWriter(path, t1.schema) as w:
            w.write_table(t1)
            w.write_table(t2)
        return pq.ParquetFile(path).metadata

    def test_undecodable_binary_rowgroup_suppresses_bounds(self, tmp_path):
        import pyarrow as pa

        from seafowl_spark.engine.deltalite import _footer_stats

        p = str(tmp_path / "two_rg.parquet")
        good = pa.table(
            {"k": pa.array([1, 2]), "b": pa.array([b"aa", b"bb"], pa.binary())}
        )
        # invalid UTF-8 min/max in the second row group
        bad = pa.table(
            {"k": pa.array([3, 4]), "b": pa.array([b"\xff\xfe", b"\xff\xff"], pa.binary())}
        )
        md = self._write_two_row_groups(p, good, bad)
        assert md.num_row_groups == 2
        stats = _footer_stats(md)
        # k aggregates across both row groups
        assert stats["k"]["min"] == 1 and stats["k"]["max"] == 4
        assert stats["k"]["nulls"] == 0
        # b's bounds are suppressed (rg2 min/max are not UTF-8), but its
        # null count — valid in both row groups — survives
        assert "min" not in stats.get("b", {}) and "max" not in stats.get("b", {})
        assert stats.get("b", {}).get("nulls") == 0

    def test_multi_rowgroup_bounds_aggregate(self, tmp_path):
        import pyarrow as pa

        from seafowl_spark.engine.deltalite import _footer_stats

        p = str(tmp_path / "agg.parquet")
        t1 = pa.table({"k": pa.array([5, 9]), "s": pa.array(["m", "z"])})
        t2 = pa.table({"k": pa.array([1, 7]), "s": pa.array(["a", "q", ])})
        stats = _footer_stats(self._write_two_row_groups(p, t1, t2))
        assert stats["k"] == {"min": 1, "max": 9, "nulls": 0}
        assert stats["s"] == {"min": "a", "max": "z", "nulls": 0}

    def test_stats_disabled_column_fully_suppressed(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from seafowl_spark.engine.deltalite import _footer_stats

        p = str(tmp_path / "nostats.parquet")
        t = pa.table({"k": pa.array([1, 2]), "v": pa.array([10, 20])})
        with pq.ParquetWriter(p, t.schema, write_statistics=["k"]) as w:
            w.write_table(t)
        stats = _footer_stats(pq.ParquetFile(p).metadata)
        assert "v" not in stats
        assert stats["k"]["min"] == 1

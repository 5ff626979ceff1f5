"""Object-store abstraction (sources/store.py).

The reference parameterizes its statement tests over object stores
(rstest ``#[values(InMemory, Local, S3)]``, e.g. tests/statements/mod.rs);
this matrix mirrors the locally-runnable slice: the byte-level store
contract and the deltalite transaction-log machinery (commits, OCC,
checkpoints, time travel) over both Local and InMemory backends, plus the
S3 backend's URL mapping and graceful no-driver error.
"""

from __future__ import annotations

import os

import pytest

from seafowl_spark.engine.deltalite import (
    AddFile,
    ConcurrentCommitError,
    DeltaLiteTable,
)
from seafowl_spark.sources.store import (
    AlreadyExists,
    LocalStore,
    MemoryStore,
    S3Store,
    StoreError,
    resolve_store,
)


@pytest.fixture(params=["local", "memory", "s3stub", "gsstub"])
def store_root(request, tmp_path):
    """(store, store-local root, root URL) per backend.

    s3stub/gsstub run the same byte-level contract and the full
    transaction-log matrix over S3Store/GcsStore with injected in-process
    clients (tests/fake_cloud.py) — the cloud OCC / pagination / not-found
    code paths execute without a bucket, and register_store_factory routes
    DeltaLiteTable's own resolve_store through the stub."""
    if request.param == "local":
        root = str(tmp_path / "tbl")
        yield LocalStore(), root, root
    elif request.param == "memory":
        MemoryStore.clear()
        url = f"memory://t-{request.node.callspec.id}/tbl"
        store, root = resolve_store(url)
        yield store, root, url
        MemoryStore.clear()
    elif request.param == "s3stub":
        from fake_cloud import FakeS3Client

        from seafowl_spark.sources.store import (
            register_store_factory,
            unregister_store_factory,
        )

        client = FakeS3Client()
        register_store_factory("s3", lambda: S3Store(client=client))
        store, root = resolve_store("s3://test-bucket/tbl")
        assert isinstance(store, S3Store)
        yield store, root, "s3://test-bucket/tbl"
        unregister_store_factory("s3")
    else:
        from fake_cloud import FAKE_GEXC, FakeGcsClient

        from seafowl_spark.sources.store import (
            GcsStore,
            register_store_factory,
            unregister_store_factory,
        )

        client = FakeGcsClient()
        register_store_factory(
            "gs", lambda: GcsStore(client=client, exceptions=FAKE_GEXC)
        )
        store, root = resolve_store("gs://test-bucket/tbl")
        assert isinstance(store, GcsStore)
        yield store, root, "gs://test-bucket/tbl"
        unregister_store_factory("gs")


class TestStoreContract:
    def test_put_get_roundtrip(self, store_root):
        store, root, _url = store_root
        p = f"{root}/a/b.json"
        store.put(p, b"hello")
        assert store.get(p) == b"hello"
        assert store.exists(p)
        assert store.size(p) == 5
        store.put(p, b"rewritten")  # create-or-replace
        assert store.get(p) == b"rewritten"

    def test_list_is_direct_children_only(self, store_root):
        store, root, _url = store_root
        store.put(f"{root}/x/1.json", b"1")
        store.put(f"{root}/x/2.json", b"2")
        store.put(f"{root}/x/sub/3.json", b"3")
        assert store.list(f"{root}/x") == ["1.json", "2.json", "sub"]
        assert store.list(f"{root}/missing") == []
        assert store.list_recursive(f"{root}/x") == [
            "1.json", "2.json", "sub/3.json",
        ]

    def test_put_if_absent_is_atomic_occ(self, store_root):
        store, root, _url = store_root
        p = f"{root}/_log/0000000000.json"
        store.put_if_absent(p, b"v0")
        with pytest.raises(AlreadyExists):
            store.put_if_absent(p, b"v0-duplicate")
        assert store.get(p) == b"v0"  # loser never clobbers the winner

    def test_delete_and_rename(self, store_root):
        store, root, _url = store_root
        store.put(f"{root}/src.bin", b"x")
        store.rename(f"{root}/src.bin", f"{root}/dst.bin")
        assert not store.exists(f"{root}/src.bin")
        assert store.get(f"{root}/dst.bin") == b"x"
        store.delete(f"{root}/dst.bin")
        assert not store.exists(f"{root}/dst.bin")
        store.delete(f"{root}/dst.bin")  # idempotent

    def test_delete_dir(self, store_root):
        store, root, _url = store_root
        store.put(f"{root}/d/a.bin", b"a")
        store.put(f"{root}/d/e/b.bin", b"b")
        store.delete_dir(f"{root}/d")
        assert store.list(f"{root}/d") == []

    def test_open_input_filelike(self, store_root):
        store, root, _url = store_root
        store.put(f"{root}/f.bin", b"stream-me")
        with store.open_input(f"{root}/f.bin") as f:
            assert f.read() == b"stream-me"

    def test_mtime_advances(self, store_root):
        store, root, _url = store_root
        store.put(f"{root}/t.bin", b"x")
        assert store.mtime(f"{root}/t.bin") > 0


class TestLogOverStores:
    """Transaction-log machinery runs unchanged over any metadata store."""

    def _table(self, spark, url) -> DeltaLiteTable:
        t = DeltaLiteTable(spark, url)
        t.store.makedirs(t.root)
        t._next_commit("CREATE TABLE", [], [], metadata={"schema_ddl": "k bigint"})
        return t

    def test_commit_replay_and_time_travel(self, spark, store_root):
        _store, _root, url = store_root
        t = self._table(spark, url)
        t._next_commit("INSERT", [AddFile("data/a.parquet", 10, 100, {})], [])
        t._next_commit(
            "OVERWRITE", [AddFile("data/b.parquet", 5, 50, {})], ["data/a.parquet"]
        )
        assert t.versions() == [0, 1, 2]
        assert [f.path for f in t.snapshot().files] == ["data/b.parquet"]
        assert [f.path for f in t.snapshot(version=1).files] == ["data/a.parquet"]
        assert t.snapshot(version=0).files == []

    def test_occ_conflict_detected(self, spark, store_root):
        _store, _root, url = store_root
        t = self._table(spark, url)
        t._next_commit("INSERT", [AddFile("data/a.parquet", 1, 10, {})], [])
        # two writers plan against version 1; the second put-if-absent loses
        t._next_commit("DELETE", [], ["data/a.parquet"], base_version=1)
        with pytest.raises(ConcurrentCommitError):
            t._next_commit("DELETE", [], ["data/a.parquet"], base_version=1)

    def test_checkpoint_roundtrip(self, spark, store_root):
        _store, _root, url = store_root
        t = self._table(spark, url)
        for i in range(t.CHECKPOINT_INTERVAL + 3):
            t._next_commit("INSERT", [AddFile(f"data/f{i}.parquet", 1, 10, {})], [])
        ck = t._load_checkpoint(t.latest_version())
        assert ck is not None and ck["version"] == t.CHECKPOINT_INTERVAL
        # replay from checkpoint matches full-log replay
        assert len(t.snapshot().files) == t.CHECKPOINT_INTERVAL + 3


class TestS3Backend:
    def test_resolve_gated_on_boto3(self):
        try:
            import boto3  # noqa: F401

            pytest.skip("boto3 present; gating not exercised")
        except ImportError:
            pass
        with pytest.raises(StoreError, match="boto3"):
            resolve_store("s3://bucket/prefix/tbl")

    def test_split_and_spark_url_mapping(self):
        # pure-path behavior, no client needed
        assert S3Store._split("bucket/a/b.json") == ("bucket", "a/b.json")
        dummy = object.__new__(S3Store)  # skip boto3-gated __init__
        assert dummy.spark_url("bucket/t/data/x.parquet") == (
            "s3a://bucket/t/data/x.parquet"
        )

    def test_unknown_scheme_rejected(self):
        with pytest.raises(StoreError, match="scheme"):
            resolve_store("gopher://hole/tbl")


class TestMemoryDataPlaneGuard:
    def test_spark_url_refuses(self):
        store, root = resolve_store("memory://ns/tbl")
        with pytest.raises(StoreError):
            store.spark_url(f"{root}/data/x.parquet")


class TestLocalResolution:
    def test_plain_path_and_file_url(self, tmp_path):
        s1, r1 = resolve_store(str(tmp_path))
        s2, r2 = resolve_store(f"file://{tmp_path}")
        assert isinstance(s1, LocalStore) and isinstance(s2, LocalStore)
        assert r1 == r2 == str(tmp_path)
        assert s1.spark_url(os.path.join(r1, "x")) == os.path.join(r1, "x")


class TestDataPlaneUrl:
    def test_mappings(self):
        from seafowl_spark.sources.store import data_plane_url

        assert data_plane_url("s3://b/t/x.parquet") == "s3a://b/t/x.parquet"
        assert data_plane_url("gs://b/t/x.parquet") == "gs://b/t/x.parquet"
        assert data_plane_url("file:///tmp/t") == "/tmp/t"
        assert data_plane_url("/tmp/t") == "/tmp/t"
        assert data_plane_url("https://h/x.parquet") == "https://h/x.parquet"


class TestGcsBackend:
    def test_gated_on_google_cloud_storage(self):
        try:
            from google.cloud import storage  # noqa: F401

            pytest.skip("google-cloud-storage present; gating not exercised")
        except ImportError:
            pass
        with pytest.raises(StoreError, match="google-cloud-storage"):
            resolve_store("gs://bucket/prefix/tbl")

    def test_spark_url_mapping(self):
        from seafowl_spark.sources.store import GcsStore

        dummy = object.__new__(GcsStore)
        assert dummy.spark_url("bucket/t/x.parquet") == "gs://bucket/t/x.parquet"

"""Cloud-backend behavior over stub clients (tests/fake_cloud.py).

The generic store contract + transaction-log matrix already runs over the
stub S3/GCS backends via test_store.py's store_root fixture; this file pins
the cloud-SPECIFIC semantics the r5 ADVICE flagged as never-executed:
not-found normalization (checkpoint fallback), conditional-put OCC status
mapping (412 / generation-0), multi-page listing, delete idempotence, and
mtime-driven vacuum safety for in-flight files. Reference analogue:
object_store_factory/src/{s3.rs,google.rs} + the rstest store matrix in
tests/statements/mod.rs.
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta, timezone

import pytest
from fake_cloud import (
    FAKE_GEXC,
    FakeClientError,
    FakeGcsClient,
    FakeS3Client,
)

from seafowl_spark.sources.store import (
    AlreadyExists,
    GcsStore,
    ObjectStore,
    S3Store,
    StoreError,
    register_store_factory,
    unregister_store_factory,
)


@pytest.fixture()
def s3():
    client = FakeS3Client()
    return S3Store(client=client), client


@pytest.fixture()
def gcs():
    client = FakeGcsClient()
    return GcsStore(client=client, exceptions=FAKE_GEXC), client


class TestS3Specific:
    def test_missing_get_normalizes_to_filenotfound(self, s3):
        """ADVICE r5: a leaked NoSuchKey broke _load_checkpoint's OSError
        fallback — the contract is FileNotFoundError on every backend."""
        store, _ = s3
        with pytest.raises(FileNotFoundError):
            store.get("b/absent.json")

    def test_put_if_absent_maps_412_to_alreadyexists(self, s3):
        store, _ = s3
        store.put_if_absent("b/_log/0000000000.json", b"v0")
        with pytest.raises(AlreadyExists):
            store.put_if_absent("b/_log/0000000000.json", b"v0-dup")
        assert store.get("b/_log/0000000000.json") == b"v0"

    def test_non_412_client_error_propagates(self, s3):
        """Only the OCC conflict maps to AlreadyExists; a throttle/5xx must
        surface so the commit retries instead of silently 'losing'."""
        store, client = s3

        def throttled(**kw):
            raise FakeClientError("SlowDown", 503)

        client.put_object = throttled
        with pytest.raises(FakeClientError):
            store.put_if_absent("b/x.json", b"x")

    def test_list_paginates(self, s3):
        store, client = s3
        for i in range(7):
            store.put(f"b/t/_log/{i:010d}.json", b"{}")
        store.put("b/t/_log/sub/DEEP.json", b"{}")
        names = store.list("b/t/_log")
        assert names == [f"{i:010d}.json" for i in range(7)] + ["sub"]
        # FakeS3Client pages at 2 keys: a single-page implementation would
        # have dropped 6 of the 9 entries
        assert client.pages_served > 1

    def test_delete_is_idempotent(self, s3):
        store, _ = s3
        store.put("b/x.bin", b"x")
        store.delete("b/x.bin")
        store.delete("b/x.bin")  # second delete: no error
        assert not store.exists("b/x.bin")

    def test_mtime_from_last_modified(self, s3):
        store, client = s3
        store.put("b/x.bin", b"x")
        lm = client.objects[("b", "x.bin")][1]
        assert store.mtime("b/x.bin") == lm.timestamp()

    def test_size_and_exists_via_head(self, s3):
        store, _ = s3
        store.put("b/x.bin", b"12345")
        assert store.size("b/x.bin") == 5
        assert store.exists("b/x.bin")
        assert not store.exists("b/missing.bin")


class TestGcsSpecific:
    def test_missing_get_normalizes_to_filenotfound(self, gcs):
        store, _ = gcs
        with pytest.raises(FileNotFoundError):
            store.get("b/absent.json")

    def test_put_if_absent_maps_precondition_to_alreadyexists(self, gcs):
        store, _ = gcs
        store.put_if_absent("b/_log/0000000000.json", b"v0")
        with pytest.raises(AlreadyExists):
            store.put_if_absent("b/_log/0000000000.json", b"v0-dup")
        assert store.get("b/_log/0000000000.json") == b"v0"

    def test_delete_is_idempotent(self, gcs):
        store, _ = gcs
        store.put("b/x.bin", b"x")
        store.delete("b/x.bin")
        store.delete("b/x.bin")  # NotFound swallowed
        assert not store.exists("b/x.bin")

    def test_mtime_from_blob_updated_and_unknown_reads_as_now(self, gcs):
        store, client = gcs
        store.put("b/x.bin", b"x")
        assert store.mtime("b/x.bin") == client.objects[("b", "x.bin")][1].timestamp()
        # ADVICE r5: unknown age must read as brand-new, never 0.0
        assert store.mtime("b/unknown.bin") >= time.time() - 5

    def test_list_with_delimiter(self, gcs):
        store, _ = gcs
        store.put("b/t/_log/0000000000.json", b"{}")
        store.put("b/t/_log/sub/DEEP.json", b"{}")
        assert store.list("b/t/_log") == ["0000000000.json", "sub"]

    def test_injected_client_requires_exceptions(self):
        with pytest.raises(StoreError, match="exceptions"):
            GcsStore(client=FakeGcsClient())


class TestBaseMtimeDefault:
    def test_unknown_mtime_is_conservative(self):
        """A backend without an mtime override must report 'now' so
        vacuum's orphan scan skips files of unknown age (ADVICE r5: the
        0.0 default made every retention window pass)."""

        class MinimalStore(ObjectStore):
            def get(self, path):  # pragma: no cover - unused
                raise FileNotFoundError(path)

            def list(self, prefix):
                return []

            def exists(self, path):
                return False

            def size(self, path):
                return 0

            def put(self, path, data):
                pass

            def put_if_absent(self, path, data):
                pass

            def delete(self, path):
                pass

        assert MinimalStore().mtime("anything") >= time.time() - 5


class TestDeltaLiteOverStubS3:
    """The ADVICE-flagged integration paths, end-to-end over stub S3."""

    @pytest.fixture()
    def table(self, spark):
        from seafowl_spark.engine.deltalite import DeltaLiteTable

        client = FakeS3Client()
        register_store_factory("s3", lambda: S3Store(client=client))
        t = DeltaLiteTable(spark, "s3://bkt/tbl")
        t._next_commit(
            "CREATE TABLE", [], [], metadata={"schema_ddl": "k bigint"}
        )
        yield t, client
        unregister_store_factory("s3")

    def test_snapshot_before_first_checkpoint(self, table):
        """ADVICE r5 crash: a table with fewer than CHECKPOINT_INTERVAL
        commits has no _last_checkpoint — snapshot() must fall back to
        full-log replay on S3, not die on a leaked NoSuchKey."""
        from seafowl_spark.engine.deltalite import AddFile

        t, _ = table
        t._next_commit("INSERT", [AddFile("data/a.parquet", 1, 10, {})], [])
        assert [f.path for f in t.snapshot().files] == ["data/a.parquet"]

    def test_vacuum_orphan_scan_respects_s3_mtime(self, table):
        """An aged orphan is collected; a just-written (in-flight) file
        survives the retention window — this is exactly the silent-loss
        scenario the mtime default fix closes."""
        t, client = table
        old = datetime.now(timezone.utc) - timedelta(hours=2)
        client.objects[("bkt", "tbl/data/orphan_old.parquet")] = (b"x", old)
        client.objects[("bkt", "tbl/data/inflight.parquet")] = (
            b"y",
            datetime.now(timezone.utc),
        )
        dead = t.vacuum(retention_ms=3600 * 1000)
        assert "data/orphan_old.parquet" in dead
        assert ("bkt", "tbl/data/inflight.parquet") in client.objects

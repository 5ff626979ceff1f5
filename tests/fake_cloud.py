"""In-process doubles for the boto3 S3 client and the google-cloud-storage
client — plain-Python, no network, shaped exactly like the call surface
S3Store/GcsStore uses (sources/store.py). They let the cloud OCC
(412 / generation-0 precondition), pagination, not-found normalization and
delete-idempotence branches execute in CI, the locally-runnable analogue of
the reference's rstest store matrix (tests/statements/mod.rs
``#[values(InMemory, Local, S3)]``; object_store_factory/src/{s3,google}.rs).
"""

from __future__ import annotations

import io
import types
from datetime import datetime, timezone

# ---------------------------------------------------------------------- S3


class FakeNoSuchKey(Exception):
    pass


class FakeClientError(Exception):
    """botocore.exceptions.ClientError shape: carries `.response`."""

    def __init__(self, code: str, http_status: int):
        super().__init__(f"{code} ({http_status})")
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": http_status},
        }


class FakeS3Client:
    """boto3-client double. Pages list_objects_v2 at PAGE_SIZE keys so the
    paginator loop in S3Store.list genuinely iterates multiple pages."""

    PAGE_SIZE = 2

    def __init__(self):
        # (bucket, key) -> (bytes, last_modified)
        self.objects: dict[tuple[str, str], tuple[bytes, datetime]] = {}
        self.pages_served = 0
        self.exceptions = types.SimpleNamespace(
            NoSuchKey=FakeNoSuchKey, ClientError=FakeClientError
        )

    # -- object ops
    def get_object(self, Bucket, Key):
        try:
            data, _ = self.objects[(Bucket, Key)]
        except KeyError:
            raise FakeNoSuchKey(Key) from None
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket, Key):
        try:
            data, lm = self.objects[(Bucket, Key)]
        except KeyError:
            raise FakeClientError("404", 404) from None
        return {"LastModified": lm, "ContentLength": len(data)}

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
            # S3 conditional-put conflict: 412 PreconditionFailed
            raise FakeClientError("PreconditionFailed", 412)
        data = Body if isinstance(Body, bytes) else Body.read()
        self.objects[(Bucket, Key)] = (bytes(data), datetime.now(timezone.utc))

    def delete_object(self, Bucket, Key):
        # S3 DeleteObject is idempotent: deleting a missing key succeeds
        self.objects.pop((Bucket, Key), None)

    # -- listing
    def get_paginator(self, op):
        assert op == "list_objects_v2"
        return _FakeS3Paginator(self)


class _FakeS3Paginator:
    def __init__(self, client: FakeS3Client):
        self._c = client

    def paginate(self, Bucket, Prefix, Delimiter=None):
        assert Delimiter in (None, "/")
        contents, prefixes = [], []
        seen_pfx = set()
        for (b, k), (data, _lm) in sorted(self._c.objects.items()):
            if b != Bucket or not k.startswith(Prefix):
                continue
            rest = k[len(Prefix):]
            if Delimiter and "/" in rest:
                p = Prefix + rest.split("/", 1)[0] + "/"
                if p not in seen_pfx:
                    seen_pfx.add(p)
                    prefixes.append({"Prefix": p})
            else:
                contents.append({"Key": k})
        entries = [("c", c) for c in contents] + [("p", p) for p in prefixes]
        if not entries:
            self._c.pages_served += 1
            yield {}
            return
        for i in range(0, len(entries), FakeS3Client.PAGE_SIZE):
            page: dict = {}
            for kind, e in entries[i : i + FakeS3Client.PAGE_SIZE]:
                page.setdefault("Contents" if kind == "c" else "CommonPrefixes", []).append(e)
            self._c.pages_served += 1
            yield page


# --------------------------------------------------------------------- GCS


class FakeNotFound(Exception):
    pass


class FakePreconditionFailed(Exception):
    pass


FAKE_GEXC = types.SimpleNamespace(
    NotFound=FakeNotFound, PreconditionFailed=FakePreconditionFailed
)


class _FakeBlob:
    def __init__(self, client: "FakeGcsClient", bucket: str, name: str):
        self._c, self._b, self.name = client, bucket, name

    def _entry(self):
        return self._c.objects.get((self._b, self.name))

    def download_as_bytes(self) -> bytes:
        e = self._entry()
        if e is None:
            raise FakeNotFound(self.name)
        return e[0]

    def upload_from_string(self, data, if_generation_match=None):
        if if_generation_match == 0 and self._entry() is not None:
            # generation-0 precondition: create-only
            raise FakePreconditionFailed(self.name)
        if isinstance(data, str):
            data = data.encode()
        self._c.objects[(self._b, self.name)] = (
            bytes(data),
            datetime.now(timezone.utc),
        )

    def exists(self) -> bool:
        return self._entry() is not None

    def delete(self):
        if self._entry() is None:
            raise FakeNotFound(self.name)
        del self._c.objects[(self._b, self.name)]

    @property
    def updated(self):
        e = self._entry()
        return None if e is None else e[1]

    @property
    def size(self):
        e = self._entry()
        return None if e is None else len(e[0])


class _FakeBucket:
    def __init__(self, client: "FakeGcsClient", name: str):
        self._c, self._name = client, name

    def blob(self, key: str) -> _FakeBlob:
        return _FakeBlob(self._c, self._name, key)

    def get_blob(self, key: str) -> _FakeBlob | None:
        b = _FakeBlob(self._c, self._name, key)
        return b if b.exists() else None


class _FakeBlobIterator:
    """google list_blobs iterator shape: iterable of blobs with a
    `.prefixes` set (populated by the delimiter)."""

    def __init__(self, blobs, prefixes):
        self._blobs, self.prefixes = blobs, prefixes

    def __iter__(self):
        return iter(self._blobs)


class FakeGcsClient:
    def __init__(self):
        self.objects: dict[tuple[str, str], tuple[bytes, datetime]] = {}

    def bucket(self, name: str) -> _FakeBucket:
        return _FakeBucket(self, name)

    def list_blobs(self, bucket, prefix="", delimiter=None):
        assert delimiter in (None, "/")
        blobs, prefixes = [], set()
        for (b, k), _v in sorted(self.objects.items()):
            if b != bucket or not k.startswith(prefix):
                continue
            rest = k[len(prefix):]
            if delimiter and "/" in rest:
                prefixes.add(prefix + rest.split("/", 1)[0] + "/")
            else:
                blobs.append(_FakeBlob(self, b, k))
        return _FakeBlobIterator(blobs, prefixes)

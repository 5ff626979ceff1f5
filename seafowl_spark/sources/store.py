"""Object-store abstraction for the metadata plane.

The reference engine registers one object store per bucket/scheme at plan
time (reference object_store_factory/src/{local.rs,memory.rs,s3.rs,google.rs},
wired in src/context/physical.rs:775-854) and routes every byte of I/O —
data and transaction log alike — through that store. On Spark the split is
different by design:

* the DATA plane (parquet scans and writes) already goes through Hadoop
  FileSystem URIs — pointing a table at ``s3a://bucket/...`` is cluster
  configuration, not engine code; Catalyst/Tungsten never see this module.
* the METADATA plane (deltalite transaction log, checkpoints, deletion
  vectors, vacuum listings) is driver-side byte I/O that the engine does
  itself — THAT is what this interface abstracts, so an S3 deployment is a
  backend drop-in rather than a rewrite of the log machinery.

Backends:

* :class:`LocalStore` — the default; plain filesystem, `put_if_absent` via
  ``O_EXCL`` (the OCC commit primitive, reference delta.rs:429-440 relies
  on the store's put-if-absent the same way).
* :class:`MemoryStore` — process-local dict, mirrors the reference's
  ``InMemory`` test store (rstest ``#[values(InMemory, Local, S3)]``);
  lets the log/OCC/checkpoint machinery be tested with zero disk.
* :class:`S3Store` — gated behind boto3 (absent in this sandbox); maps
  ``s3://bucket/key`` metadata ops to GetObject/PutObject (conditional put
  with ``IfNoneMatch='*'`` for OCC) and `spark_url` to ``s3a://`` for the
  data plane. Unit tests cover URL mapping and the graceful no-driver
  error; live-bucket behavior needs a real deployment.

All stores are picklable (executors may reconstruct one from its URL) and
cheap to construct; `resolve_store(url)` is the single entry point.
"""

from __future__ import annotations

import io
import os
import threading
import uuid
from abc import ABC, abstractmethod


class StoreError(Exception):
    pass


class AlreadyExists(StoreError):
    """put_if_absent target already present (OCC conflict)."""


class ObjectStore(ABC):
    """Byte-level store for small metadata objects (commits, checkpoints,
    deletion vectors). Paths are store-absolute strings using '/'.
    """

    scheme: str = ""

    # ------------------------------------------------------------- reads
    @abstractmethod
    def get(self, path: str) -> bytes:
        """Read an object's bytes.

        Contract: a missing object raises ``FileNotFoundError`` on EVERY
        backend — callers (e.g. DeltaLiteTable._load_checkpoint falling
        back to full-log replay when ``_last_checkpoint`` doesn't exist)
        catch OSError, so backends must normalize their native not-found
        errors (S3 NoSuchKey, GCS NotFound) rather than leak them."""

    def open_input(self, path: str):
        """File-like for libraries that stream (pyarrow footers)."""
        return io.BytesIO(self.get(path))

    @abstractmethod
    def list(self, prefix: str) -> list[str]:
        """Names (not full paths) of objects directly under prefix."""

    def list_recursive(self, prefix: str) -> list[str]:
        """Paths of all objects under prefix, relative to prefix."""
        out: list[str] = []
        for name in self.list(prefix):
            sub = f"{prefix.rstrip('/')}/{name}"
            children = self.list_recursive(sub)
            if children:
                out.extend(f"{name}/{c}" for c in children)
            else:
                out.append(name)
        return out

    def mtime(self, path: str) -> float:
        """Last-modified epoch seconds.

        When the store can't say, report *now*: vacuum's orphan scan
        treats age >= retention as deletable, so an unknown age must read
        as brand-new (skip) — a 0.0 default would make every retention
        window pass and delete a concurrent writer's in-flight,
        not-yet-committed files."""
        import time

        return time.time()

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def size(self, path: str) -> int: ...

    # ------------------------------------------------------------ writes
    @abstractmethod
    def put(self, path: str, data: bytes) -> None:
        """Atomic create-or-replace."""

    @abstractmethod
    def put_if_absent(self, path: str, data: bytes) -> None:
        """Atomic create; raises AlreadyExists if the object exists.
        This is the optimistic-concurrency commit primitive."""

    @abstractmethod
    def delete(self, path: str) -> None:
        """Remove an object (missing object is not an error)."""

    def delete_dir(self, path: str) -> None:
        """Remove everything under a prefix (and the prefix itself where
        directories are real)."""
        for rel in self.list_recursive(path):
            self.delete(f"{path.rstrip('/')}/{rel}")

    def makedirs(self, path: str) -> None:
        """Ensure a directory exists — no-op on flat-namespace stores."""

    def rename(self, src: str, dst: str) -> None:
        """Move an object. Default: copy + delete (object-store style)."""
        self.put(dst, self.get(src))
        self.delete(src)

    # -------------------------------------------------------- data plane
    def spark_url(self, path: str) -> str:
        """URI for this path as Spark/Hadoop should address it."""
        return path


class LocalStore(ObjectStore):
    scheme = "file"

    def get(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def open_input(self, path: str):
        return open(path, "rb")

    def list(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return sorted(os.listdir(prefix))

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def put(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        # os.link fails atomically when the target exists: two racing
        # writers can never both claim the same version file
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise AlreadyExists(path) from None
        finally:
            os.unlink(tmp)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def list_recursive(self, prefix: str) -> list[str]:
        out: list[str] = []
        for dirpath, _dirs, names in os.walk(prefix):
            for n in names:
                out.append(os.path.relpath(os.path.join(dirpath, n), prefix))
        return sorted(out)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


# one shared namespace per process so every MemoryStore handle sees the
# same objects (the reference's InMemory store is likewise shared within
# a test server instance)
_MEMORY_NS: dict[str, bytes] = {}
_MEMORY_MTIME: dict[str, float] = {}
_MEMORY_LOCK = threading.Lock()


class MemoryStore(ObjectStore):
    scheme = "memory"

    def _key(self, path: str) -> str:
        return path.rstrip("/")

    def get(self, path: str) -> bytes:
        try:
            return _MEMORY_NS[self._key(path)]
        except KeyError:
            raise FileNotFoundError(path) from None

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        names = set()
        for k in _MEMORY_NS:
            if k.startswith(p):
                names.add(k[len(p):].split("/", 1)[0])
        return sorted(names)

    def exists(self, path: str) -> bool:
        k = self._key(path)
        if k in _MEMORY_NS:
            return True
        # directory-existence: any object below it
        return any(o.startswith(k + "/") for o in _MEMORY_NS)

    def size(self, path: str) -> int:
        return len(self.get(path))

    def put(self, path: str, data: bytes) -> None:
        import time

        with _MEMORY_LOCK:
            _MEMORY_NS[self._key(path)] = bytes(data)
            _MEMORY_MTIME[self._key(path)] = time.time()

    def put_if_absent(self, path: str, data: bytes) -> None:
        import time

        with _MEMORY_LOCK:
            k = self._key(path)
            if k in _MEMORY_NS:
                raise AlreadyExists(path)
            _MEMORY_NS[k] = bytes(data)
            _MEMORY_MTIME[k] = time.time()

    def delete(self, path: str) -> None:
        with _MEMORY_LOCK:
            _MEMORY_NS.pop(self._key(path), None)
            _MEMORY_MTIME.pop(self._key(path), None)

    def mtime(self, path: str) -> float:
        return _MEMORY_MTIME.get(self._key(path), 0.0)

    def list_recursive(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        return sorted(k[len(p):] for k in _MEMORY_NS if k.startswith(p))

    def spark_url(self, path: str) -> str:
        raise StoreError(
            "memory:// holds metadata only; Spark data-plane reads need a "
            "filesystem-backed store"
        )

    @staticmethod
    def clear() -> None:
        with _MEMORY_LOCK:
            _MEMORY_NS.clear()
            _MEMORY_MTIME.clear()


class S3Store(ObjectStore):
    """S3 metadata plane via boto3 (import-gated; not installable here).

    Path convention: store paths are ``bucket/key...`` (the ``s3://``
    prefix is stripped by resolve_store). ``spark_url`` re-prefixes with
    ``s3a://`` so the Spark data plane addresses the same object through
    the Hadoop S3A connector — per-bucket credentials/endpoints are Spark
    conf (``spark.hadoop.fs.s3a.*``), matching how the reference's store
    factory carries per-bucket options (object_store_factory/src/s3.rs).
    """

    scheme = "s3"

    def __init__(self, client=None):
        """`client` injects a boto3-shaped S3 client (must expose the same
        call surface incl. an ``exceptions`` namespace) — how the stub-client
        tests drive the OCC/pagination/not-found paths without a bucket."""
        if client is not None:
            self._s3 = client
            return
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover - boto3 absent in CI
            raise StoreError(
                "s3:// tables need boto3 for the metadata plane "
                "(pip install boto3) and the Hadoop S3A connector for the "
                "data plane (spark.hadoop.fs.s3a.* conf)"
            ) from e
        import boto3

        self._s3 = boto3.client("s3")

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        bucket, _, key = path.partition("/")
        return bucket, key

    def get(self, path: str) -> bytes:
        b, k = self._split(path)
        try:
            return self._s3.get_object(Bucket=b, Key=k)["Body"].read()
        except self._s3.exceptions.NoSuchKey:
            # normalize to the ObjectStore.get contract so checkpoint /
            # log fallbacks (which catch OSError) work on S3
            raise FileNotFoundError(path) from None

    def mtime(self, path: str) -> float:
        b, k = self._split(path)
        try:
            return self._s3.head_object(Bucket=b, Key=k)[
                "LastModified"
            ].timestamp()
        except Exception:
            # object vanished between list and head (e.g. a racing vacuum):
            # unknown age reads as brand-new — skip, never abort the scan
            import time

            return time.time()

    def list(self, prefix: str) -> list[str]:
        b, k = self._split(prefix.rstrip("/") + "/")
        names = set()
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=b, Prefix=k, Delimiter="/"):
            for o in page.get("Contents", []):
                names.add(o["Key"][len(k):])
            for p in page.get("CommonPrefixes", []):
                names.add(p["Prefix"][len(k):].rstrip("/"))
        return sorted(n for n in names if n)

    def exists(self, path: str) -> bool:
        b, k = self._split(path)
        try:
            self._s3.head_object(Bucket=b, Key=k)
            return True
        except Exception:
            return False

    def size(self, path: str) -> int:
        b, k = self._split(path)
        return self._s3.head_object(Bucket=b, Key=k)["ContentLength"]

    def put(self, path: str, data: bytes) -> None:
        b, k = self._split(path)
        self._s3.put_object(Bucket=b, Key=k, Body=data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        b, k = self._split(path)
        try:
            # S3 conditional write (If-None-Match: *) — the same primitive
            # delta-rs uses for S3 OCC commits since conditional-put GA
            self._s3.put_object(Bucket=b, Key=k, Body=data, IfNoneMatch="*")
        except self._s3.exceptions.ClientError as e:
            code = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code == 412:
                raise AlreadyExists(path) from None
            raise

    def delete(self, path: str) -> None:
        b, k = self._split(path)
        self._s3.delete_object(Bucket=b, Key=k)

    def spark_url(self, path: str) -> str:
        return f"s3a://{path}"


class GcsStore(ObjectStore):
    """GCS metadata plane via google-cloud-storage (import-gated; not
    installable here). Path convention mirrors S3Store: ``bucket/key``.
    The data plane addresses the same objects through the Hadoop GCS
    connector's native ``gs://`` scheme (reference
    object_store_factory/src/google.rs carries per-bucket credentials the
    same way — Spark conf ``spark.hadoop.fs.gs.*`` here)."""

    scheme = "gs"

    def __init__(self, client=None, exceptions=None):
        """`client` injects a google-cloud-storage-shaped client;
        `exceptions` must then supply its error namespace (``NotFound``,
        ``PreconditionFailed``) — together they let the stub-client tests
        drive the OCC/not-found/listing paths without a bucket."""
        if client is not None:
            if exceptions is None:
                raise StoreError(
                    "an injected GCS client needs its exceptions namespace"
                )
            self._client, self._gexc = client, exceptions
            return
        try:
            from google.api_core import exceptions as gexc
            from google.cloud import storage  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent in CI
            raise StoreError(
                "gs:// tables need google-cloud-storage for the metadata "
                "plane (pip install google-cloud-storage) and the Hadoop "
                "GCS connector for the data plane"
            ) from e
        from google.cloud import storage

        self._client, self._gexc = storage.Client(), gexc

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        bucket, _, key = path.partition("/")
        return bucket, key

    def get(self, path: str) -> bytes:
        b, k = self._split(path)
        try:
            return self._client.bucket(b).blob(k).download_as_bytes()
        except self._gexc.NotFound:
            # normalize to the ObjectStore.get contract (FileNotFoundError)
            raise FileNotFoundError(path) from None

    def mtime(self, path: str) -> float:
        b, k = self._split(path)
        blob = self._client.bucket(b).get_blob(k)
        if blob is None or blob.updated is None:
            import time

            return time.time()  # unknown age reads as brand-new (see base)
        return blob.updated.timestamp()

    def list(self, prefix: str) -> list[str]:
        b, k = self._split(prefix.rstrip("/") + "/")
        names = set()
        it = self._client.list_blobs(b, prefix=k, delimiter="/")
        for blob in it:
            names.add(blob.name[len(k):])
        for p in it.prefixes:
            names.add(p[len(k):].rstrip("/"))
        return sorted(n for n in names if n)

    def exists(self, path: str) -> bool:
        b, k = self._split(path)
        return self._client.bucket(b).blob(k).exists()

    def size(self, path: str) -> int:
        b, k = self._split(path)
        blob = self._client.bucket(b).get_blob(k)
        if blob is None:
            raise FileNotFoundError(path)
        return blob.size

    def put(self, path: str, data: bytes) -> None:
        b, k = self._split(path)
        self._client.bucket(b).blob(k).upload_from_string(data)

    def put_if_absent(self, path: str, data: bytes) -> None:
        b, k = self._split(path)
        try:
            # generation 0 precondition == create-only (GCS native OCC)
            self._client.bucket(b).blob(k).upload_from_string(
                data, if_generation_match=0
            )
        except self._gexc.PreconditionFailed:
            raise AlreadyExists(path) from None

    def delete(self, path: str) -> None:
        b, k = self._split(path)
        try:
            self._client.bucket(b).blob(k).delete()
        except self._gexc.NotFound:
            pass

    def spark_url(self, path: str) -> str:
        return f"gs://{path}"


def data_plane_url(url: str) -> str:
    """Rewrite an object-store URL to the URI Spark/Hadoop should scan —
    WITHOUT constructing a store client (no credentials needed just to
    address data): ``s3://b/k`` -> ``s3a://b/k`` (Hadoop S3A), ``gs://``
    is native to the GCS connector, ``file://`` strips to a plain path.
    Anything else passes through untouched."""
    if url.startswith("s3://"):
        return "s3a://" + url[len("s3://"):]
    if url.startswith("file://"):
        return url[len("file://"):] or "/"
    return url


# test/deployment hook: scheme -> zero-arg store factory, consulted before
# the built-in mapping (the reference's store factory registers per-scheme
# builders the same way, object_store_factory/src/lib.rs) — lets a
# deployment wire a custom backend, and lets tests run the whole
# transaction-log machinery over a stub-client S3Store/GcsStore.
_FACTORIES: dict[str, callable] = {}


def register_store_factory(scheme: str, factory) -> None:
    """Route ``{scheme}://`` URLs through `factory()` in resolve_store."""
    _FACTORIES[scheme] = factory


def unregister_store_factory(scheme: str) -> None:
    _FACTORIES.pop(scheme, None)


def resolve_store(url: str) -> tuple[ObjectStore, str]:
    """Map a table root URL to (store, store-local root path).

    ``/abs/path`` and ``file:///abs/path`` -> LocalStore; ``memory://ns/...``
    -> MemoryStore; ``s3://bucket/prefix`` -> S3Store (boto3-gated);
    ``gs://bucket/prefix`` -> GcsStore (google-cloud-storage-gated).
    Registered factories (register_store_factory) take precedence for
    their scheme.
    """
    scheme, sep, rest = url.partition("://")
    if sep and scheme in _FACTORIES:
        return _FACTORIES[scheme](), rest.rstrip("/")
    if url.startswith("memory://"):
        return MemoryStore(), url[len("memory://"):].rstrip("/")
    if url.startswith("s3://"):
        return S3Store(), url[len("s3://"):].rstrip("/")
    if url.startswith("gs://"):
        return GcsStore(), url[len("gs://"):].rstrip("/")
    if url.startswith("file://"):
        return LocalStore(), url[len("file://"):].rstrip("/") or "/"
    if "://" in url:
        raise StoreError(f"unsupported object-store scheme in {url!r}")
    return LocalStore(), url.rstrip("/")

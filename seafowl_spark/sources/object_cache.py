"""Chunked byte-range object-store read cache (A7 adjunct; reference
src/object_store/cache.rs:33-470).

The reference wraps its HTTP object store in ``CachingObjectStore``: reads
are rounded out to ``min_fetch_size`` chunks (DEFAULT_MIN_FETCH_SIZE = 1
MiB, cache.rs:33), each chunk lands on disk as its own file, and an LRU
cache weighted by byte size (DEFAULT_CACHE_CAPACITY = 1 GiB, cache.rs:34)
with a TTL (DEFAULT_CACHE_ENTRY_TTL = 3 min, cache.rs:35) decides which
chunk files survive; eviction deletes the file (cache.rs:314-344
``on_evict``). Missing chunks that are adjacent coalesce into one upstream
range request (cache.rs:430-470 ``get_chunk_range`` batching).

This is the same design in Python over ``urllib`` Range requests. At
cluster scale each executor hosts its own cache directory, so hot parquet
footers and row groups are fetched from the origin once per executor, not
once per task — the reference's CDN story, which its ETag handling
complements.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time
import urllib.request
from collections import OrderedDict
from dataclasses import dataclass, field
from hashlib import sha256

DEFAULT_MIN_FETCH_SIZE = 1 << 20  # 1 MiB, cache.rs:33
DEFAULT_CACHE_CAPACITY = 1 << 30  # 1 GiB, cache.rs:34
DEFAULT_CACHE_ENTRY_TTL_S = 3 * 60.0  # cache.rs:35


@dataclass
class CacheMetrics:
    """Counters mirroring the reference's (cache.rs:144-157): outbound
    calls to the real store, bytes fetched on miss, bytes served from
    cache, bytes evicted."""

    outbound_requests: int = 0
    miss_bytes: int = 0
    hit_bytes: int = 0
    evicted_bytes: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


class _UrlFetcher:
    """Upstream reader over HTTP(S) Range requests."""

    def size(self, url: str) -> int:
        req = urllib.request.Request(url, method="HEAD")
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            length = resp.headers.get("Content-Length")
            if length is not None:
                return int(length)
        # no Content-Length on HEAD: probe with a 1-byte range and read
        # the total from Content-Range ("bytes 0-0/N")
        req = urllib.request.Request(url, headers={"Range": "bytes=0-0"})
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            cr = resp.headers.get("Content-Range", "")
            if "/" in cr and cr.rsplit("/", 1)[1].isdigit():
                return int(cr.rsplit("/", 1)[1])
            return len(resp.read())  # server sent the whole body

    def get_range(self, url: str, start: int, end: int) -> bytes:
        """Fetch half-open [start, end), like the reference's Range<usize>."""
        req = urllib.request.Request(
            url, headers={"Range": f"bytes={start}-{end - 1}"}
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            data = resp.read()
            if resp.status == 200 and len(data) > end - start:
                # server ignored the Range header and sent the full object
                return data[start:end]
            return data


class _FileFetcher:
    """Upstream reader over the local filesystem (tests, file:// URLs)."""

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def get_range(self, path: str, start: int, end: int) -> bytes:
        with open(path, "rb") as f:
            f.seek(start)
            return f.read(end - start)


class CachingObjectStore:
    """Byte-range cache in units of ``min_fetch_size`` chunks.

    ``get_range(url, start, end)`` rounds the request out to chunk
    boundaries, serves cached chunks from disk, coalesces runs of missing
    chunks into single upstream range requests, and stores each fetched
    chunk as its own file. An LRU ordered by last access and weighted by
    chunk size enforces ``capacity``; entries older than ``ttl_s`` expire.
    Evicted / expired entries delete their chunk file, as the reference's
    eviction listener does (cache.rs:314-344).
    """

    def __init__(
        self,
        cache_dir: str | None = None,
        min_fetch_size: int = DEFAULT_MIN_FETCH_SIZE,
        capacity: int = DEFAULT_CACHE_CAPACITY,
        ttl_s: float = DEFAULT_CACHE_ENTRY_TTL_S,
        fetcher=None,
    ):
        self.dir = cache_dir or tempfile.mkdtemp(prefix="sfs_chunk_cache_")
        os.makedirs(self.dir, exist_ok=True)
        self.min_fetch_size = int(min_fetch_size)
        self.capacity = int(capacity)
        self.ttl_s = float(ttl_s)
        self.fetcher = fetcher or _UrlFetcher()
        self.metrics = CacheMetrics()
        # key -> (path, size, expires_at); move_to_end on access = LRU
        self._entries: OrderedDict[tuple[str, int], tuple[str, int, float]] = (
            OrderedDict()
        )
        self._sizes: dict[str, int] = {}  # url -> object length
        self._usage = 0
        self._lock = threading.RLock()

    # ------------------------------------------------------------- upstream

    def _outbound(self, url: str, start: int, end: int) -> bytes:
        with self.metrics._lock:
            self.metrics.outbound_requests += 1
            self.metrics.miss_bytes += end - start
        return self.fetcher.get_range(url, start, end)

    def object_size(self, url: str) -> int:
        with self._lock:
            if url not in self._sizes:
                with self.metrics._lock:
                    self.metrics.outbound_requests += 1
                self._sizes[url] = self.fetcher.size(url)
            return self._sizes[url]

    # ------------------------------------------------------------- LRU core

    def _chunk_path(self, url: str, chunk: int) -> str:
        # <hex hash>-<start>-<end>, the reference's CacheKey::as_filename
        # (cache.rs:107-114)
        h = sha256(url.encode()).hexdigest()[:32]
        lo = chunk * self.min_fetch_size
        return os.path.join(self.dir, f"{h}-{lo}-{lo + self.min_fetch_size}")

    def _evict(self, key: tuple[str, int]) -> None:
        path, size, _ = self._entries.pop(key)
        self._usage -= size
        with self.metrics._lock:
            self.metrics.evicted_bytes += size
        try:
            os.remove(path)
        except OSError:
            pass  # best-effort, like the reference's deletion_errors counter

    def _insert(self, key: tuple[str, int], path: str, size: int) -> None:
        if key in self._entries:
            _, old_size, _ = self._entries.pop(key)
            self._usage -= old_size
        self._entries[key] = (path, size, time.monotonic() + self.ttl_s)
        self._usage += size
        while self._usage > self.capacity and len(self._entries) > 1:
            self._evict(next(iter(self._entries)))

    def _lookup(self, key: tuple[str, int]) -> bytes | None:
        entry = self._entries.get(key)
        if entry is None:
            return None
        path, size, expires_at = entry
        if time.monotonic() >= expires_at:
            self._evict(key)
            return None
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            # file vanished under us (reference cache_file_missing warning)
            self._entries.pop(key, None)
            self._usage -= size
            return None
        self._entries.move_to_end(key)
        with self.metrics._lock:
            self.metrics.hit_bytes += len(data)
        return data

    # ------------------------------------------------------------------ API

    def get_range(self, url: str, start: int, end: int) -> bytes:
        """Read [start, end) through the chunk cache."""
        if end <= start:
            return b""
        obj_size = self.object_size(url)
        end = min(end, obj_size)
        first = start // self.min_fetch_size
        last = (end - 1) // self.min_fetch_size
        with self._lock:
            chunks: dict[int, bytes] = {}
            pending: list[int] = []

            def flush_pending() -> None:
                # one coalesced upstream request for a run of misses
                # (cache.rs get_chunk_range batching)
                if not pending:
                    return
                lo = pending[0] * self.min_fetch_size
                hi = min((pending[-1] + 1) * self.min_fetch_size, obj_size)
                data = self._outbound(url, lo, hi)
                for c in pending:
                    off = (c - pending[0]) * self.min_fetch_size
                    piece = data[off : off + self.min_fetch_size]
                    path = self._chunk_path(url, c)
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(piece)
                    os.replace(tmp, path)
                    self._insert((url, c), path, len(piece))
                    chunks[c] = piece
                pending.clear()

            for c in range(first, last + 1):
                cached = self._lookup((url, c))
                if cached is None:
                    pending.append(c)
                else:
                    flush_pending()
                    chunks[c] = cached
            flush_pending()

        buf = b"".join(chunks[c] for c in range(first, last + 1))
        base = first * self.min_fetch_size
        return buf[start - base : end - base]

    def get(self, url: str) -> bytes:
        """Read the whole object through the chunk cache."""
        return self.get_range(url, 0, self.object_size(url))

    def fetch_to_file(self, url: str, dest: str) -> str:
        """Assemble the whole object into ``dest`` chunk by chunk."""
        size = self.object_size(url)
        tmp = dest + ".tmp"
        with open(tmp, "wb") as out:
            for lo in range(0, max(size, 1), self.min_fetch_size):
                out.write(self.get_range(url, lo, min(lo + self.min_fetch_size, size)))
        os.replace(tmp, dest)
        return dest

    def invalidate(self, url: str | None = None) -> None:
        with self._lock:
            keys = [k for k in self._entries if url is None or k[0] == url]
            for k in keys:
                self._evict(k)
            if url is None:
                self._sizes.clear()
            else:
                self._sizes.pop(url, None)

    @property
    def usage(self) -> int:
        return self._usage

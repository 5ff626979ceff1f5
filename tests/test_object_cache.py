"""Chunked object-store read cache (reference object_store/cache.rs tests,
cache.rs:472-727: chunk alignment, coalesced fetches, LRU + TTL eviction).
"""

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seafowl_spark.sources.object_cache import CachingObjectStore, _FileFetcher


class _RangeHandler(BaseHTTPRequestHandler):
    """Serves self.server.payload with Range support; counts requests."""

    def log_message(self, *a):  # quiet
        pass

    def do_HEAD(self):
        with self.server.lock:
            self.server.requests.append(("HEAD", None))
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.server.payload)))
        self.end_headers()

    def do_GET(self):
        payload = self.server.payload
        rng = self.headers.get("Range")
        with self.server.lock:
            self.server.requests.append(("GET", rng))
        if rng and rng.startswith("bytes="):
            lo, hi = rng[len("bytes=") :].split("-")
            lo, hi = int(lo), min(int(hi), len(payload) - 1)
            body = payload[lo : hi + 1]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {lo}-{hi}/{len(payload)}"
            )
        else:
            body = payload
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def http_object(tmp_path):
    payload = bytes(range(256)) * 40  # 10240 bytes
    server = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    server.payload = payload
    server.requests = []
    server.lock = threading.Lock()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_port}/obj.bin"
    yield url, payload, server
    server.shutdown()


def _store(tmp_path, **kw):
    kw.setdefault("min_fetch_size", 1024)
    kw.setdefault("capacity", 1 << 20)
    return CachingObjectStore(cache_dir=str(tmp_path / "cache"), **kw)


class TestChunkedCache:
    def test_range_reads_correct_and_cached(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path)
        assert store.get_range(url, 100, 300) == payload[100:300]
        n_after_first = len(server.requests)
        # same chunk again: served from cache, no new upstream request
        assert store.get_range(url, 0, 1024) == payload[:1024]
        assert len(server.requests) == n_after_first
        assert store.metrics.hit_bytes > 0

    def test_missing_chunks_coalesce_into_one_request(
        self, tmp_path, http_object
    ):
        url, payload, server = http_object
        store = _store(tmp_path)
        store.object_size(url)  # HEAD
        base = len(server.requests)
        # chunks 2..6 all missing -> exactly ONE coalesced GET
        # (reference get_chunk_range batching, cache.rs:430-470)
        assert store.get_range(url, 2048, 7000) == payload[2048:7000]
        gets = [r for r in server.requests[base:] if r[0] == "GET"]
        assert gets == [("GET", "bytes=2048-7167")]

    def test_cached_chunk_splits_the_batch(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path)
        store.get_range(url, 3072, 4096)  # warm chunk 3
        base = len(server.requests)
        # chunks 1..5 with 3 cached -> two coalesced fetches (1-2, 4-5)
        assert store.get_range(url, 1024, 6144) == payload[1024:6144]
        gets = [r for r in server.requests[base:] if r[0] == "GET"]
        assert gets == [
            ("GET", "bytes=1024-3071"),
            ("GET", "bytes=4096-6143"),
        ]

    def test_lru_eviction_deletes_chunk_files(self, tmp_path, http_object):
        url, payload, server = http_object
        # capacity of exactly 2 chunks
        store = _store(tmp_path, capacity=2048)
        store.get_range(url, 0, 1024)  # chunk 0
        store.get_range(url, 1024, 2048)  # chunk 1
        store.get_range(url, 0, 512)  # touch 0 -> 1 is now LRU
        store.get_range(url, 2048, 3072)  # chunk 2 -> evicts 1
        assert store.usage <= 2048
        assert store.metrics.evicted_bytes == 1024
        files = os.listdir(store.dir)
        assert len(files) == 2  # evicted chunk's file removed
        n = len(server.requests)
        store.get_range(url, 0, 512)  # chunk 0 still hot
        assert len(server.requests) == n
        store.get_range(url, 1024, 2048)  # chunk 1 refetches
        assert len(server.requests) == n + 1

    def test_ttl_expiry_refetches(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path, ttl_s=0.05)
        store.get_range(url, 0, 1024)
        n = len(server.requests)
        time.sleep(0.1)
        assert store.get_range(url, 0, 1024) == payload[:1024]
        assert len(server.requests) == n + 1

    def test_whole_object_get_and_tail(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path)
        assert store.get(url) == payload
        # final partial chunk has the right (short) size in the LRU
        assert store.usage == len(payload)

    def test_fetch_to_file(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path)
        dest = str(tmp_path / "out.bin")
        store.fetch_to_file(url, dest)
        with open(dest, "rb") as f:
            assert f.read() == payload

    def test_file_fetcher_no_http(self, tmp_path):
        src = tmp_path / "local.bin"
        src.write_bytes(b"x" * 5000)
        store = _store(tmp_path, fetcher=_FileFetcher())
        assert store.get_range(str(src), 4000, 5000) == b"x" * 1000

    def test_invalidate(self, tmp_path, http_object):
        url, payload, server = http_object
        store = _store(tmp_path)
        store.get_range(url, 0, 1024)
        store.invalidate(url)
        assert store.usage == 0
        n = len(server.requests)
        store.get_range(url, 0, 1024)
        assert len(server.requests) > n


class TestExternalTableThroughCache:
    def test_http_parquet_read_hits_cache_on_reread(
        self, ctx, tmp_path, monkeypatch
    ):
        """CREATE EXTERNAL TABLE over http: the second table creation
        reuses the assembled file; the chunk store fields the download."""
        import pandas as pd

        import seafowl_spark.sources.external as ext

        pq = tmp_path / "t.parquet"
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(pq)
        payload = pq.read_bytes()

        server = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
        server.payload = payload
        server.requests = []
        server.lock = threading.Lock()
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{server.server_port}/t.parquet"
            monkeypatch.setattr(ext, "_CACHE_DIR", str(tmp_path / "filecache"))
            monkeypatch.setattr(
                ext,
                "_CHUNK_CACHE",
                CachingObjectStore(
                    cache_dir=str(tmp_path / "filecache" / "chunks"),
                    min_fetch_size=1024,
                ),
            )
            ctx.execute(
                f"CREATE EXTERNAL TABLE ext_http STORED AS PARQUET LOCATION '{url}'"
            )
            out = ctx.execute(
                "SELECT count(*) AS n FROM staging.ext_http"
            ).collect()
            assert out[0]["n"] == 3
            n_requests = len(server.requests)
            ctx.execute(
                "CREATE EXTERNAL TABLE ext_http2 STORED AS PARQUET "
                f"LOCATION '{url}'"
            )
            out = ctx.execute(
                "SELECT count(*) AS n FROM staging.ext_http2"
            ).collect()
            assert out[0]["n"] == 3
            assert len(server.requests) == n_requests  # no new downloads
        finally:
            server.shutdown()

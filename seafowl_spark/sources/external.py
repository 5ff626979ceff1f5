"""CREATE EXTERNAL TABLE readers (A7; reference src/datafusion/
parser.rs:601-745, src/context/physical.rs:108-121, 952-988).

Formats: PARQUET, CSV, NDJSON/JSON, ARROW, DELTATABLE (deltalite dirs).
Locations: local paths and http(s) URLs. Schema is inferred when no column
list is given (reference infers via ListingOptions::infer_schema,
physical.rs:970-979).

HTTP: Spark has no https:// Hadoop filesystem by default, so remote files
are assembled through the chunked byte-range cache (object_cache.py,
mirroring the reference's CachingObjectStore, object_store/cache.rs) into
a local file Spark can scan. Chunks are fetched with Range requests, so
re-reading a table after remote appends only downloads new bytes.
"""

from __future__ import annotations

import os
import tempfile
from hashlib import sha256

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.types import columns_to_schema
from .object_cache import CachingObjectStore

_CACHE_DIR = os.path.join(tempfile.gettempdir(), "seafowl_spark_http_cache")

# one shared chunk cache per process, as the reference shares one between
# its HTTP and HTTPS stores (cache.rs:399-420 new_from_sibling)
_CHUNK_CACHE: CachingObjectStore | None = None


class ExternalTableError(Exception):
    pass


_CACHE_SETTINGS: dict = {}


def configure_chunk_cache(
    capacity: int | None = None,
    min_fetch_size: int | None = None,
    ttl: float | None = None,
) -> None:
    """Apply [misc.object_store_cache] settings (reference
    ObjectCacheProperties, config/schema.rs:311-327) to the process-wide
    chunk cache; takes effect for caches created after the call."""
    global _CHUNK_CACHE
    for k, v in (("capacity", capacity), ("min_fetch_size", min_fetch_size),
                 ("ttl_s", ttl)):
        if v is not None:
            _CACHE_SETTINGS[k] = v
    _CHUNK_CACHE = None  # rebuild with the new settings on next use


def _chunk_cache() -> CachingObjectStore:
    global _CHUNK_CACHE
    if _CHUNK_CACHE is None:
        _CHUNK_CACHE = CachingObjectStore(
            cache_dir=os.path.join(_CACHE_DIR, "chunks"), **_CACHE_SETTINGS
        )
    return _CHUNK_CACHE


def fetch_url(url: str) -> str:
    """Assemble the object into the local cache via chunked Range reads;
    returns the local path Spark reads."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    suffix = os.path.splitext(url.split("?")[0])[1] or ".bin"
    local = os.path.join(_CACHE_DIR, sha256(url.encode()).hexdigest() + suffix)
    if not os.path.exists(local):
        _chunk_cache().fetch_to_file(url, local)
    return local


def _ns_timestamp_columns(location: str) -> list[str]:
    """Column names declared TIMESTAMP(NANOS) in the parquet footer(s).

    One footer read (pyarrow) per external-table registration — the same
    metadata Spark itself fetches, so no extra data IO."""
    import pyarrow.dataset as ds
    import pyarrow.types as pat

    try:
        schema = ds.dataset(location, format="parquet").schema
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_external(
    spark: SparkSession,
    fmt: str,
    location: str,
    columns: list[tuple[str, str]] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    options = dict(options or {})
    if location.startswith(("http://", "https://")):
        location = fetch_url(location)
    else:
        # object-store locations: rewrite to the Spark/Hadoop data-plane
        # URI (s3:// -> s3a://, file:// -> plain path, gs:// native) so a
        # bucket-backed external table is connector configuration, not a
        # different code path (reference physical.rs:775-854 registers the
        # per-bucket store at plan time the same way)
        from .store import data_plane_url

        location = data_plane_url(location)

    schema = columns_to_schema(columns) if columns else None
    fmt = fmt.lower()

    if fmt == "parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        r = spark.read
        if schema:
            r = r.schema(schema)
        df = r.parquet(location)
        # TIMESTAMP(NANOS) columns surface as BIGINT under nanosAsLong;
        # coerce to microsecond timestamps (truncating) so the staging
        # schema shows a timestamp and CTAS persists us — the reference
        # coerces identically (ddl.rs test_create_table_as_from_ns_column:
        # ns in staging becomes Timestamp(Microsecond) on store)
        if schema is None:
            for name in _ns_timestamp_columns(location):
                if dict(df.dtypes).get(name) == "bigint":
                    df = df.withColumn(
                        name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
                    )
        return df

    # malformed-row contract for the text formats (a 100 TB crawl WILL
    # contain broken lines; the failure mode must be a declared choice,
    # not whatever the reader defaults to): on_error = 'permissive'
    # (default — malformed rows surface as NULLs, and with an explicit
    # schema a `_corrupt_record STRING` column captures the raw line),
    # 'skip' (drop malformed rows), or 'fail' (first bad row raises)
    _ON_ERROR_MODES = {
        "permissive": "PERMISSIVE",
        "skip": "DROPMALFORMED",
        "fail": "FAILFAST",
    }
    if fmt in ("csv", "ndjson", "json") and "on_error" in options:
        choice = options.pop("on_error").lower()
        if choice not in _ON_ERROR_MODES:
            raise ExternalTableError(
                f"on_error must be one of {sorted(_ON_ERROR_MODES)}, "
                f"got {choice!r}"
            )
        options["mode"] = _ON_ERROR_MODES[choice]

    if fmt == "csv":
        r = spark.read.option("header", options.pop("has_header", "true"))
        if "delimiter" in options:
            r = r.option("sep", options.pop("delimiter"))
        if schema:
            r = r.schema(schema)
        else:
            r = r.option("inferSchema", "true")
        return r.options(**options).csv(location)

    if fmt in ("ndjson", "json"):
        r = spark.read
        if schema:
            r = r.schema(schema)
        return r.options(**options).json(location)

    if fmt == "arrow":
        import pyarrow as pa
        import pyarrow.ipc

        with pa.memory_map(location) as source:
            try:
                tbl = pa.ipc.open_file(source).read_all()
            except pa.ArrowInvalid:
                tbl = pa.ipc.open_stream(source).read_all()
        return spark.createDataFrame(tbl.to_pandas())

    if fmt in ("deltatable", "delta"):
        # real Delta Lake layout (_delta_log, what the reference's delta-rs
        # writes) or an engine-native deltalite dir — sniffed by layout
        from .delta_log import read_any_delta

        return read_any_delta(spark, location)

    if fmt == "table":
        # remote table federation (reference datafusion_remote_tables/):
        # STORED AS TABLE OPTIONS('name' '<remote table>') LOCATION '<dsn>'
        from .remote import read_remote_table

        name = options.pop("name", None)
        if not name:
            raise ExternalTableError(
                "STORED AS TABLE requires OPTIONS ('name' '<remote table name>')"
            )
        return read_remote_table(spark, location, name, schema=schema, options=options)

    if fmt == "iceberg":
        # LOCATION points at the table's metadata.json (reference test
        # shape, tests/statements/query.rs:372-410); snapshot pinning via
        # OPTIONS ('snapshot-id' ...) / ('as-of-timestamp' <ms>)
        from .iceberg import read_iceberg

        return read_iceberg(spark, location, options)

    raise ExternalTableError(f"unsupported external table format: {fmt}")

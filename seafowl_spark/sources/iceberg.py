"""Iceberg table reader: ``CREATE EXTERNAL TABLE ... STORED AS ICEBERG
LOCATION '<metadata.json>'``.

Reference: src/context/iceberg.rs (iceberg-rust FileIO + TableMetadata;
read path exercised by tests/statements/query.rs:372-410 where LOCATION
points at the table's current ``metadata.json``).

Spark-first read path — resolve the snapshot's live data-file list from
metadata, then hand the concrete parquet paths to ``spark.read.parquet``
so Catalyst keeps its native pushdown/pruning/vectorized scan:

1. parse table-metadata JSON (format v1/v2): schemas, snapshots,
   snapshot-log;
2. pick the snapshot — current by default, or pinned via OPTIONS
   ``('snapshot-id' '...')`` / ``('as-of-timestamp' '<ms>')`` (Iceberg
   time travel, same resolution rule as the spec: latest snapshot whose
   timestamp-ms <= the bound);
3. walk the snapshot's manifest list (Avro) -> data manifests (Avro) ->
   live data-file entries (status != DELETED, content == data), via the
   schema-generic Avro decoder in .avro (works for both v1/v2 manifest
   layouts);
4. read the resulting parquet file list with Spark.

Row-level deletes (v2 merge-on-read) ARE applied — positional deletes via
``_metadata.file_path``/``row_index`` broadcast anti-join, equality
deletes sequence-number-scoped per the spec (see ``read_iceberg``); the
reference rejects such tables. Manifest-level scan pruning IS applied:
per-file column bounds (lower_bounds/upper_bounds/null_value_counts,
Iceberg single-value serialization) are decoded from the manifests and
evaluated against simple WHERE conjuncts (engine/pruning.py's conservative
evaluator) so a filtered query opens only candidate files — the decision
runs driver-side over manifest metadata (bytes ~ #files, not data), which
is what keeps a 100 TB scan plannable; finer row-group pruning then still
happens inside Spark's parquet reader."""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Any
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from .avro import read_avro

# manifest entry status (Iceberg spec): 0=EXISTING 1=ADDED 2=DELETED
_STATUS_DELETED = 2
# manifest content: 0=data, 1=deletes
_CONTENT_DELETES = 1


class IcebergError(Exception):
    pass


def _localize(path: str, table_location: str | None, metadata_dir: str) -> str:
    """Resolve a file URI from metadata into a local filesystem path.

    Absolute file:// URIs strip the scheme; paths under the table location
    are re-rooted relative to the metadata directory's parent so a table
    directory can be relocated (copied fixture, synced bucket) and still
    read — same role as the reference's FileIO abstraction.
    """
    u = urlparse(path)
    if u.scheme in ("", "file"):
        p = u.path if u.scheme == "file" else path
        if os.path.exists(p):
            return p
    if table_location:
        rel = path[len(table_location):].lstrip("/") if path.startswith(table_location) else None
        if rel:
            candidate = os.path.join(os.path.dirname(metadata_dir.rstrip("/")), rel)
            if os.path.exists(candidate):
                return candidate
    raise IcebergError(
        f"cannot resolve iceberg file {path!r} locally (object stores need "
        "credentials/connectors not present in this environment)"
    )


def _select_snapshot(meta: dict, options: dict[str, str]) -> dict:
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        raise IcebergError("iceberg table has no snapshots (empty table)")
    if options.get("snapshot-id"):
        sid = int(options["snapshot-id"])
        for s in snapshots:
            if s["snapshot-id"] == sid:
                return s
        raise IcebergError(f"snapshot-id {sid} not found")
    if options.get("as-of-timestamp"):
        bound = int(options["as-of-timestamp"])
        eligible = [s for s in snapshots if s["timestamp-ms"] <= bound]
        if not eligible:
            raise IcebergError(f"no snapshot at or before {bound}")
        return max(eligible, key=lambda s: s["timestamp-ms"])
    cur = meta.get("current-snapshot-id")
    for s in snapshots:
        if s["snapshot-id"] == cur:
            return s
    return max(snapshots, key=lambda s: s["timestamp-ms"])


@dataclass
class IcebergScan:
    """A resolved snapshot: local file paths plus the sequence numbers and
    equality columns needed to apply v2 merge-on-read deletes, and the
    per-file column stats decoded from the manifests (for scan pruning)."""

    data_files: list[tuple[str, int]]  # (local path, data sequence number)
    pos_delete_files: list[str]
    eq_delete_files: list[tuple[str, int, tuple[str, ...]]]  # (path, seq, cols)
    localize: Any  # original URI -> local path (for pos-delete file_path values)
    # local path -> ({col: {min, max, nulls}}, record_count)
    file_stats: dict[str, tuple[dict, int]] = None  # type: ignore[assignment]
    # local path -> {col: (iceberg type, n_buckets, file bucket value)}
    file_buckets: dict[str, dict] = None  # type: ignore[assignment]


# ------------------------------------------------------------ bound values
# Iceberg single-value binary serialization (spec Appendix D) for the
# lower_bounds/upper_bounds manifest maps.

def _decode_bound(type_str: str, raw: bytes):
    import datetime as _dt
    import struct as _struct

    if raw is None:
        return None
    try:
        if type_str == "int":
            return _struct.unpack("<i", raw)[0]
        if type_str == "long":
            return _struct.unpack("<q", raw)[0]
        if type_str == "float":
            return _struct.unpack("<f", raw)[0]
        if type_str == "double":
            return _struct.unpack("<d", raw)[0]
        if type_str == "string":
            return raw.decode("utf-8")
        if type_str == "boolean":
            return raw != b"\x00"
        if type_str == "date":
            days = _struct.unpack("<i", raw)[0]
            # isoformat string: the pruning evaluator compares temporal
            # stats lexically against DATE/TIMESTAMP literals
            return (_dt.date(1970, 1, 1) + _dt.timedelta(days=days)).isoformat()
        if type_str in ("timestamp", "timestamptz"):
            us = _struct.unpack("<q", raw)[0]
            return (
                _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
            ).isoformat(sep=" ")
    except _struct.error:
        return None
    return None  # unknown/complex type -> no pruning on this column


def _encode_bound(type_str: str, value):
    import struct as _struct

    if value is None:
        return None
    if type_str == "int":
        return _struct.pack("<i", int(value))
    if type_str == "long":
        return _struct.pack("<q", int(value))
    if type_str == "float":
        return _struct.pack("<f", float(value))
    if type_str == "double":
        return _struct.pack("<d", float(value))
    if type_str == "string":
        return str(value).encode("utf-8")
    if type_str == "boolean":
        return b"\x01" if value else b"\x00"
    if type_str == "date":
        import datetime as _dt

        return _struct.pack("<i", (value - _dt.date(1970, 1, 1)).days)
    if type_str in ("timestamp", "timestamptz"):
        import datetime as _dt

        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        us = int((value - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        return _struct.pack("<q", us)
    return None


def _bounds_map(obj) -> dict[int, bytes]:
    """Manifest bound maps arrive as avro maps (dict) or the spec's
    array-of-{key,value} records — normalize to {field_id: bytes}."""
    if not obj:
        return {}
    if isinstance(obj, dict):
        return {int(k): v for k, v in obj.items()}
    return {int(e["key"]): e["value"] for e in obj}


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit — the hash Iceberg's bucket[N] transform is
    defined over (spec Appendix B; test vectors pinned in tests). Returns
    a SIGNED 32-bit int, matching the reference implementations."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_value(type_str: str, value, n_buckets: int) -> int | None:
    """Iceberg bucket[N] of a literal: murmur3 of the spec's hash-byte
    serialization (ints/longs/dates/timestamps as 8-byte LE longs, strings
    as UTF-8), positive-mod N. None when the type is unsupported (caller
    keeps the file — conservative)."""
    import datetime as _dt
    import struct as _struct

    if type_str in ("int", "long"):
        try:
            raw = _struct.pack("<q", int(value))
        except (ValueError, TypeError, _struct.error):
            return None
    elif type_str == "string":
        raw = str(value).encode("utf-8")
    elif type_str == "date":
        try:
            d = _dt.date.fromisoformat(str(value))
        except ValueError:
            return None
        raw = _struct.pack("<q", (d - _dt.date(1970, 1, 1)).days)
    elif type_str in ("timestamp", "timestamptz"):
        try:
            dt = _dt.datetime.fromisoformat(str(value).replace("T", " "))
        except ValueError:
            return None
        us = int((dt - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        raw = _struct.pack("<q", us)
    else:
        return None
    return (murmur3_32(raw) & 0x7FFFFFFF) % n_buckets


def _partition_specs(meta: dict) -> dict[int, list[dict]]:
    """spec-id -> partition field list (v2 partition-specs / v1
    partition-spec)."""
    out: dict[int, list[dict]] = {}
    for spec in meta.get("partition-specs") or []:
        out[int(spec.get("spec-id", 0))] = spec.get("fields", [])
    if not out and meta.get("partition-spec"):
        out[0] = meta["partition-spec"]
    return out


def _convert_partition_value(type_str: str | None, v):
    """Iceberg stores date partition values as epoch days and timestamps
    as epoch micros; surface them the way bounds are surfaced (ISO
    strings) so the pruning evaluator compares them."""
    import datetime as _dt

    if v is None or type_str is None:
        return v if isinstance(v, (int, float, str, bool)) else None
    if type_str == "date" and isinstance(v, int):
        return (_dt.date(1970, 1, 1) + _dt.timedelta(days=v)).isoformat()
    if type_str in ("timestamp", "timestamptz") and isinstance(v, int):
        return (
            _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
        ).isoformat(sep=" ")
    return v if isinstance(v, (int, float, str, bool)) else None


def _current_schema(meta: dict) -> dict:
    schemas = meta.get("schemas")
    if schemas:
        cur = meta.get("current-schema-id")
        return next((s for s in schemas if s.get("schema-id") == cur), schemas[-1])
    return meta.get("schema", {})


def _field_names_by_id(meta: dict) -> dict[int, str]:
    return {f["id"]: f["name"] for f in _current_schema(meta).get("fields", [])}


def _field_types_by_id(meta: dict) -> dict[int, str]:
    """field id -> primitive type string (complex types excluded: their
    bounds are not prunable single values)."""
    return {
        f["id"]: f["type"]
        for f in _current_schema(meta).get("fields", [])
        if isinstance(f["type"], str)
    }


def scan_snapshot(
    metadata_path: str, options: dict[str, str] | None = None
) -> IcebergScan:
    """Walk the selected snapshot's manifests into data files, positional
    delete files, and equality delete files (with their data/delete
    sequence numbers, which scope which rows each delete applies to)."""
    options = options or {}
    with open(metadata_path) as f:
        meta = json.load(f)
    location = meta.get("location")
    mdir = os.path.dirname(os.path.abspath(metadata_path))
    by_id = _field_names_by_id(meta)
    snap = _select_snapshot(meta, options)

    def localize(p: str) -> str:
        return os.path.normpath(_localize(p, location, mdir))

    types_by_id = _field_types_by_id(meta)
    specs = _partition_specs(meta)
    default_spec = int(meta.get("default-spec-id", 0))
    manifest_list = _localize(snap["manifest-list"], location, mdir)
    _, manifests = read_avro(manifest_list)
    data_files: list[tuple[str, int]] = []
    pos_deletes: list[str] = []
    eq_deletes: list[tuple[str, int, tuple[str, ...]]] = []
    file_stats: dict[str, tuple[dict, int]] = {}
    file_buckets: dict[str, dict] = {}
    for m in manifests:
        is_delete_manifest = m.get("content", 0) == _CONTENT_DELETES
        mseq = m.get("sequence_number") or 0
        mpath = _localize(m["manifest_path"], location, mdir)
        _, entries = read_avro(mpath)
        for e in entries:
            if e.get("status") == _STATUS_DELETED:
                continue
            df = e["data_file"]
            content = df.get("content", 0)
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise IcebergError(f"unsupported iceberg data file format {fmt}")
            seq = e.get("sequence_number") or mseq
            path = localize(df["file_path"])
            if content == 0:
                if is_delete_manifest:
                    raise IcebergError("data file entry inside a delete manifest")
                data_files.append((path, seq))
                lo = _bounds_map(df.get("lower_bounds"))
                hi = _bounds_map(df.get("upper_bounds"))
                nulls = _bounds_map(df.get("null_value_counts"))
                stats: dict[str, dict] = {}
                for fid, name in by_id.items():
                    t = types_by_id.get(fid)
                    col: dict = {}
                    if t is not None and fid in lo:
                        col["min"] = _decode_bound(t, lo[fid])
                        col["max"] = _decode_bound(t, hi.get(fid))
                    if fid in nulls:
                        v = nulls[fid]
                        col["nulls"] = v if isinstance(v, int) else None
                    if col.get("min") is not None or col.get("nulls") is not None:
                        stats[name] = col
                # identity partition values are exact per-file constants:
                # min == max == value (the partition pruning every Iceberg
                # planner starts with; non-identity transforms are skipped)
                part = df.get("partition") or {}
                rows = int(df.get("record_count") or 0)
                for pf in specs.get(
                    int(m.get("partition_spec_id", default_spec)), []
                ):
                    bucket_m = re.match(r"bucket\[(\d+)\]", pf.get("transform") or "")
                    if bucket_m and pf.get("name") in part:
                        src_name = by_id.get(pf.get("source-id"))
                        raw = part.get(pf.get("name"))
                        t = types_by_id.get(pf.get("source-id"))
                        if src_name and t and isinstance(raw, int):
                            file_buckets.setdefault(path, {})[src_name] = (
                                t, int(bucket_m.group(1)), raw
                            )
                        continue
                    if pf.get("transform") != "identity":
                        continue
                    src_name = by_id.get(pf.get("source-id"))
                    if src_name is None or src_name in stats:
                        continue
                    if pf.get("name") not in part:
                        continue
                    raw = part.get(pf.get("name"))
                    if raw is None:
                        # null partition value: the column is null file-wide
                        stats[src_name] = {"nulls": rows}
                        continue
                    pv = _convert_partition_value(
                        types_by_id.get(pf.get("source-id")), raw
                    )
                    if pv is not None:  # unconvertible values add no stats
                        stats[src_name] = {"min": pv, "max": pv, "nulls": 0}
                file_stats[path] = (stats, rows)
            elif content == 1:  # position deletes
                pos_deletes.append(path)
            elif content == 2:  # equality deletes
                ids = df.get("equality_ids") or []
                names = tuple(by_id.get(i) for i in ids)
                if not names or any(n is None for n in names):
                    raise IcebergError(
                        f"equality delete file with unresolvable field ids {ids}"
                    )
                eq_deletes.append((path, seq, names))
            else:
                raise IcebergError(f"unknown iceberg file content {content}")
    return IcebergScan(
        data_files, pos_deletes, eq_deletes, localize, file_stats, file_buckets
    )


def _bucket_may_match(node, buckets: dict) -> bool:
    """True unless an equality conjunct's literal hashes to a different
    bucket than the file's bucket[N] partition value."""
    from ..engine.pruning import BoolOp, Cmp

    if isinstance(node, BoolOp):
        if node.op == "and":
            return all(_bucket_may_match(a, buckets) for a in node.args)
        return any(_bucket_may_match(a, buckets) for a in node.args)
    if isinstance(node, Cmp) and node.op == "=" and node.col in buckets:
        t, n, file_bucket = buckets[node.col]
        bv = bucket_value(t, node.value, n)
        return bv is None or bv == file_bucket
    return True  # Not/IsNull/ranges: buckets scatter ranges, keep the file


def prune_data_files(
    scan: IcebergScan, predicate_sql: str | None
) -> list[tuple[str, int]]:
    """Manifest-level scan pruning: drop data files whose column bounds
    prove no row can match the predicate (reference delegates the same job
    to DataFusion's PruningPredicate; Iceberg's own planners prune on these
    manifest stats before touching any data).

    Conservative via engine.pruning's evaluator: unknown columns, missing
    bounds, or unparseable predicates keep the file. Delete files are never
    pruned — they only remove rows.

    Scale: this is the difference between opening every parquet footer in
    a 100 TB table and opening only the files a filter can touch; the
    decision runs driver-side over manifest metadata (bytes ~ #files).
    """
    if not predicate_sql or not (scan.file_stats or scan.file_buckets):
        return scan.data_files
    from ..engine.pruning import parse_predicate, _may_match

    ast = parse_predicate(predicate_sql)
    if ast is None:
        return scan.data_files
    out = []
    for path, seq in scan.data_files:
        stats, rows = (scan.file_stats or {}).get(path, ({}, 0))
        if not _may_match(ast, stats, rows):
            continue
        buckets = (scan.file_buckets or {}).get(path)
        if buckets and not _bucket_may_match(ast, buckets):
            continue
        out.append((path, seq))
    return out


def resolve_snapshot_id(metadata_path: str, options: dict[str, str] | None = None) -> int:
    """The snapshot id the given options select right now — used to pin an
    external table's view of the table at CREATE time."""
    with open(metadata_path) as f:
        meta = json.load(f)
    return int(_select_snapshot(meta, options or {})["snapshot-id"])


def snapshot_data_files(metadata_path: str, options: dict[str, str] | None = None) -> list[str]:
    """The selected snapshot's live parquet data files (local paths)."""
    return [p for p, _ in scan_snapshot(metadata_path, options).data_files]


# Spark's file:///abs/path metadata URI -> the /abs/path form scan_snapshot
# produces (both sides are normpath'd local paths after this)
_FP_NORM = ("^file:/+", "/")


def read_iceberg(
    spark: SparkSession,
    metadata_path: str,
    options: dict[str, str] | None = None,
    predicate_sql: str | None = None,
) -> DataFrame:
    """Read the snapshot, applying v2 merge-on-read deletes when present.

    The reference rejects delete-bearing tables (iceberg-rust scan without
    MoR support); we apply them Spark-first, because real MoR tables (any
    Flink/Spark streaming writer) carry them constantly:

    * positional deletes: rows are identified by (data file path, row
      position) — matched against Spark's ``_metadata.file_path`` /
      ``_metadata.row_index`` columns with a broadcast LEFT ANTI join.
      Exact regardless of sequence numbers, since a rewritten data file
      gets a fresh path.
    * equality deletes: rows matching the delete file's equality columns
      are dropped — but only rows whose DATA sequence number is strictly
      below the delete's sequence number (the Iceberg spec's scoping rule,
      so a row re-inserted after the delete survives). Null-safe equality,
      broadcast anti joins, one per distinct equality-column set.

    Delete sets are small relative to data (they're deltas), so the anti
    joins broadcast and the fact scan never shuffles; the metadata columns
    are only requested when deletes exist.
    """
    scan = scan_snapshot(metadata_path, options)
    if not scan.data_files:
        raise IcebergError("selected snapshot has no live data files")
    files = prune_data_files(scan, predicate_sql)
    if not files:
        # every file pruned: empty frame with the snapshot's schema
        return spark.read.parquet(scan.data_files[0][0]).limit(0)
    data = spark.read.parquet(*[p for p, _ in files])
    if not scan.pos_delete_files and not scan.eq_delete_files:
        return data
    out_cols = data.columns
    return _apply_mor_deletes(spark, scan, data).select(*out_cols)


def _apply_mor_deletes(spark: SparkSession, scan: IcebergScan, data: DataFrame) -> DataFrame:
    """Filter a raw data-file scan through the snapshot's positional and
    equality deletes; the returned frame keeps the ``__sfs_fp`` /
    ``__sfs_pos`` identity columns (read_iceberg projects them away;
    iceberg_delete_where keeps them to address the surviving rows)."""
    from pyspark.sql import functions as F

    data = data.withColumn(
        "__sfs_fp", F.regexp_replace(F.col("_metadata.file_path"), *_FP_NORM)
    ).withColumn("__sfs_pos", F.col("_metadata.row_index"))

    if scan.pos_delete_files:
        dels = spark.read.parquet(*scan.pos_delete_files).select("file_path", "pos")
        # delete files store the writer's original URIs; localize them the
        # same way the data paths were (distinct set is bounded by #files)
        uris = [r[0] for r in dels.select("file_path").distinct().collect()]
        map_df = spark.createDataFrame(
            [(u, scan.localize(u)) for u in uris], "file_path string, __sfs_fp string"
        )
        dels = dels.join(F.broadcast(map_df), "file_path").select(
            "__sfs_fp", F.col("pos").cast("long").alias("__sfs_pos")
        )
        data = data.join(F.broadcast(dels), ["__sfs_fp", "__sfs_pos"], "left_anti")

    if scan.eq_delete_files:
        seq_df = spark.createDataFrame(
            scan.data_files, "__sfs_fp string, __sfs_seq long"
        )
        data = data.join(F.broadcast(seq_df), "__sfs_fp", "left")
        groups: dict[tuple[str, ...], list[tuple[str, int]]] = {}
        for path, seq, cols in scan.eq_delete_files:
            groups.setdefault(cols, []).append((path, seq))
        for cols, files in groups.items():
            dels = None
            for path, seq in files:
                d = (
                    spark.read.parquet(path)
                    .select(*cols)
                    .withColumn("__del_seq", F.lit(seq).cast("long"))
                )
                dels = d if dels is None else dels.unionByName(d)
            cond = F.col("d.__sfs_seq") < F.col("e.__del_seq")
            for c in cols:
                cond = cond & F.col(f"d.{c}").eqNullSafe(F.col(f"e.{c}"))
            data = data.alias("d").join(F.broadcast(dels.alias("e")), cond, "left_anti")

    return data


# --------------------------------------------------------------------------
# Write path (reference record_batches_to_iceberg, iceberg.rs:156-384:
# data files -> manifest -> manifest list -> new metadata version)
# --------------------------------------------------------------------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # column stats, the spec's array<record<key,value>> map
                    # encoding — these drive manifest-level scan pruning
                    {
                        "name": "null_value_counts",
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k_v_long",
                                "fields": [
                                    {"name": "key", "type": "int"},
                                    {"name": "value", "type": "long"},
                                ],
                            },
                        }],
                        "default": None,
                    },
                    {
                        "name": "lower_bounds",
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k_v_lo",
                                "fields": [
                                    {"name": "key", "type": "int"},
                                    {"name": "value", "type": "bytes"},
                                ],
                            },
                        }],
                        "default": None,
                    },
                    {
                        "name": "upper_bounds",
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k_v_hi",
                                "fields": [
                                    {"name": "key", "type": "int"},
                                    {"name": "value", "type": "bytes"},
                                ],
                            },
                        }],
                        "default": None,
                    },
                ],
            },
        },
    ],
}


def _parquet_column_stats(pf, schema_fields) -> tuple[list, list, list]:
    """(null_value_counts, lower_bounds, upper_bounds) manifest maps for one
    data file, aggregated over its row groups from the parquet footer —
    field ids follow the table schema's positional assignment."""
    md = pf.metadata
    names = [f.name for f in schema_fields]
    agg: dict[str, dict] = {n: {"min": None, "max": None, "nulls": 0} for n in names}
    # Columns with any stats-less (or min/max-less, or null-count-less)
    # chunk have unknowable file-wide bounds/null counts; a later row
    # group's stats must not resurrect them, or manifest pruning would
    # treat partial-coverage bounds as file-wide and skip matching rows.
    no_bounds: set = set()
    no_nulls: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            if name not in agg:
                continue
            a = agg[name]
            st = col.statistics
            if st is None:
                no_bounds.add(name)
                no_nulls.add(name)
                continue
            if st.null_count is None:
                no_nulls.add(name)
            else:
                a["nulls"] += st.null_count
            if not st.has_min_max:
                no_bounds.add(name)
                continue
            if a["min"] is None or st.min < a["min"]:
                a["min"] = st.min
            if a["max"] is None or st.max > a["max"]:
                a["max"] = st.max
    nulls, lo, hi = [], [], []
    for i, f in enumerate(schema_fields):
        fid = i + 1
        a = agg[f.name]
        if f.name not in no_nulls:
            nulls.append({"key": fid, "value": int(a["nulls"])})
        t = _iceberg_type(f.dataType)
        if a["min"] is not None and f.name not in no_bounds:
            blo, bhi = _encode_bound(t, a["min"]), _encode_bound(t, a["max"])
            if blo is not None and bhi is not None:
                lo.append({"key": fid, "value": blo})
                hi.append({"key": fid, "value": bhi})
    return nulls, lo, hi


def _iceberg_type(dt) -> str:
    from pyspark.sql import types as T

    m = {
        T.LongType(): "long",
        T.IntegerType(): "int",
        T.ShortType(): "int",
        T.DoubleType(): "double",
        T.FloatType(): "float",
        T.StringType(): "string",
        T.BooleanType(): "boolean",
        T.BinaryType(): "binary",
        T.DateType(): "date",
        T.TimestampType(): "timestamptz",
        T.TimestampNTZType(): "timestamp",
    }
    if dt in m:
        return m[dt]
    raise IcebergError(f"no iceberg mapping for spark type {dt.simpleString()}")


def write_iceberg_table(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    summary_extra: dict | None = None,
) -> str:
    """Create a new iceberg table (format v2) at ``table_dir`` from a
    DataFrame, or append a snapshot if metadata already exists. Returns
    the path of the new current metadata.json. ``summary_extra`` merges
    into the snapshot summary (e.g. streaming batch ids).

    The same commit sequence as the reference (iceberg.rs:156-384): write
    parquet data files, one ADDED-entry manifest, a manifest list naming
    it plus all prior live manifests, then a new ``v{N}.metadata.json``.
    """
    import glob
    import shutil
    import time
    import uuid

    from .avro import write_avro

    import pyarrow.parquet as pq

    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    prior = sorted(
        glob.glob(os.path.join(meta_dir, "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    if prior:
        with open(prior[-1]) as f:
            meta = json.load(f)
        version = int(os.path.basename(prior[-1])[1:].split(".")[0]) + 1
    else:
        meta = None
        version = 1

    # 1. data files (Spark writes, files are renamed under data/)
    stage = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    data_files = []
    for part in sorted(glob.glob(os.path.join(stage, "part-*.parquet"))):
        if pq.ParquetFile(part).metadata.num_rows == 0:
            continue  # empty input partitions produce no data files
        dest = os.path.join(data_dir, f"{uuid.uuid4().hex}.parquet")
        shutil.move(part, dest)
        pf = pq.ParquetFile(dest)
        stats = _parquet_column_stats(pf, df.schema.fields)
        data_files.append((dest, pf.metadata.num_rows, os.path.getsize(dest), stats))
    shutil.rmtree(stage, ignore_errors=True)

    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    seq = (meta.get("last-sequence-number", 0) + 1) if meta else 1
    now_ms = int(time.time() * 1000)

    # 2. manifest with ADDED entries
    manifest_path = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    write_avro(
        manifest_path,
        _MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": rows,
                    "file_size_in_bytes": size,
                    "null_value_counts": stats[0],
                    "lower_bounds": stats[1],
                    "upper_bounds": stats[2],
                },
            }
            for path, rows, size, stats in data_files
        ],
        meta={"schema": "{}", "content": "data"},
    )
    n_rows = sum(r for _, r, _, _ in data_files)
    manifest_entry = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": n_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }

    # carry forward the prior snapshot's manifests (append semantics)
    prior_manifests: list[dict] = []
    if meta:
        cur = next(
            (s for s in meta.get("snapshots", [])
             if s["snapshot-id"] == meta.get("current-snapshot-id")),
            None,
        )
        if cur:
            _, prior_manifests = read_avro(cur["manifest-list"])

    # 3. manifest list
    mlist_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro(mlist_path, _MANIFEST_FILE_SCHEMA, prior_manifests + [manifest_entry])

    # 4. new metadata version
    fields = [
        {"id": i + 1, "name": f.name, "required": False, "type": _iceberg_type(f.dataType)}
        for i, f in enumerate(df.schema.fields)
    ]
    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "sequence-number": seq,
        "manifest-list": mlist_path,
        "summary": {"operation": "append", **(summary_extra or {})},
        "schema-id": 0,
    }
    if meta is None:
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": table_dir,
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": len(fields),
            "schemas": [
                {"schema-id": 0, "type": "struct", "fields": fields}
            ],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "snapshots": [snapshot],
            "current-snapshot-id": snapshot_id,
            "snapshot-log": [
                {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
            ],
        }
    else:
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now_ms
        meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
        meta["current-snapshot-id"] = snapshot_id
        meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
        ]
    out = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(out, "w") as f:
        json.dump(meta, f)
    return out


# delete manifests carry equality_ids on each entry (null for positional)
_DELETE_ENTRY_SCHEMA = json.loads(json.dumps(_MANIFEST_ENTRY_SCHEMA))
_DELETE_ENTRY_SCHEMA["name"] = "delete_manifest_entry"
_DELETE_ENTRY_SCHEMA["fields"][-1]["type"]["name"] = "r2d"
_DELETE_ENTRY_SCHEMA["fields"][-1]["type"]["fields"].append(
    {
        "name": "equality_ids",
        "type": ["null", {"type": "array", "items": "int"}],
        "default": None,
    }
)


def append_iceberg_deletes(
    table_dir: str,
    pos_deletes: list[tuple[str, int]] | None = None,
    eq_deletes: tuple[list[dict], list[str]] | None = None,
) -> str:
    """Commit a merge-on-read DELETE snapshot to an existing v2 table:
    positional deletes as (data file path, row position) pairs and/or
    equality deletes as (rows, equality column names). Same commit
    sequence as ``write_iceberg_table`` but the new manifest has
    content=deletes; this is the writer half of the MoR support in
    ``read_iceberg`` (delete files are metadata-sized, written driver-side
    with pyarrow — data files never move).
    """
    import glob
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .avro import write_avro

    meta_dir = os.path.join(table_dir, "metadata")
    data_dir = os.path.join(table_dir, "data")
    prior = sorted(
        glob.glob(os.path.join(meta_dir, "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    if not prior:
        raise IcebergError("append_iceberg_deletes requires an existing table")
    with open(prior[-1]) as f:
        meta = json.load(f)
    version = int(os.path.basename(prior[-1])[1:].split(".")[0]) + 1
    name_to_id = {v: k for k, v in _field_names_by_id(meta).items()}

    snapshot_id = int(uuid.uuid4().int % (1 << 62))
    seq = meta.get("last-sequence-number", 0) + 1
    now_ms = int(time.time() * 1000)

    entries = []

    def _delete_file_entry(path: str, n_rows: int, content: int, eq_ids):
        return {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n_rows,
                "file_size_in_bytes": os.path.getsize(path),
                "equality_ids": eq_ids,
            },
        }

    if pos_deletes:
        path = os.path.join(data_dir, f"{uuid.uuid4().hex}-deletes.parquet")
        tbl = pa.table(
            {
                "file_path": pa.array([p for p, _ in pos_deletes], pa.string()),
                "pos": pa.array([i for _, i in pos_deletes], pa.int64()),
            }
        )
        pq.write_table(tbl, path)
        entries.append(_delete_file_entry(path, len(pos_deletes), 1, None))

    if eq_deletes:
        rows, cols = eq_deletes
        missing = [c for c in cols if c not in name_to_id]
        if missing:
            raise IcebergError(f"equality column(s) not in schema: {missing}")
        path = os.path.join(data_dir, f"{uuid.uuid4().hex}-eq-deletes.parquet")
        tbl = pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})
        pq.write_table(tbl, path)
        entries.append(
            _delete_file_entry(path, len(rows), 2, [name_to_id[c] for c in cols])
        )

    if not entries:
        raise IcebergError("no deletes given")

    manifest_path = os.path.join(meta_dir, f"{uuid.uuid4().hex}-d0.avro")
    write_avro(
        manifest_path,
        _DELETE_ENTRY_SCHEMA,
        entries,
        meta={"schema": "{}", "content": "deletes"},
    )
    manifest_entry = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": _CONTENT_DELETES,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 0,
        "existing_rows_count": 0,
        "deleted_rows_count": sum(e["data_file"]["record_count"] for e in entries),
    }

    cur = next(
        (s for s in meta.get("snapshots", [])
         if s["snapshot-id"] == meta.get("current-snapshot-id")),
        None,
    )
    prior_manifests = []
    if cur:
        _, prior_manifests = read_avro(cur["manifest-list"])
    mlist_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro(mlist_path, _MANIFEST_FILE_SCHEMA, prior_manifests + [manifest_entry])

    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": now_ms,
        "sequence-number": seq,
        "manifest-list": mlist_path,
        "summary": {"operation": "delete"},
        "schema-id": 0,
    }
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
    meta["current-snapshot-id"] = snapshot_id
    meta["snapshot-log"] = meta.get("snapshot-log", []) + [
        {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
    ]
    out = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(out, "w") as f:
        json.dump(meta, f)
    return out


def iceberg_delete_where(
    spark: SparkSession,
    metadata_path: str,
    predicate_sql: str,
    options: dict[str, str] | None = None,
) -> tuple[str | None, int]:
    """DELETE FROM an iceberg v2 table by predicate, merge-on-read: the
    engine-side write twin of read_iceberg's delete support (the SQL
    surface deltalite DELETE has, applied to an iceberg staging table).
    Selects the LIVE rows matching ``predicate_sql`` — existing
    positional/equality deletes applied first, so dead rows are never
    re-deleted — as (data file path, row position) pairs and commits ONE
    positional-delete file + delete manifest through
    ``append_iceberg_deletes`` (sequence-number scoped, data files never
    move). Returns (new metadata path, rows deleted); a predicate
    matching nothing commits nothing and returns (None, 0).

    Always resolves the table's LATEST metadata version (a DELETE must
    never fork from a pinned older snapshot).

    Scale: file pruning bounds the scan to files that can match; the
    matched (path, pos) pairs collect to the driver — bounded by the
    DELETE's selectivity, the same contract as the reference's
    delete-planning collect — and the delete file itself is
    metadata-sized next to the data.
    """
    import glob

    meta_dir = os.path.dirname(os.path.abspath(metadata_path))
    table_dir = os.path.dirname(meta_dir)
    latest = sorted(
        glob.glob(os.path.join(meta_dir, "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    if not latest:
        raise IcebergError(f"no iceberg metadata under {meta_dir}")
    current = latest[-1]
    opts = dict(options or {})
    opts.pop("snapshot-id", None)  # latest snapshot, never a pinned one
    opts.pop("as-of", None)
    scan = scan_snapshot(current, opts)
    if not scan.data_files:
        return None, 0
    files = prune_data_files(scan, predicate_sql)
    if not files:
        return None, 0
    data = spark.read.parquet(*[p for p, _ in files])
    hit = (
        _apply_mor_deletes(spark, scan, data)
        .where(predicate_sql)
        .select("__sfs_fp", "__sfs_pos")
        .collect()
    )
    pairs = sorted((r["__sfs_fp"], int(r["__sfs_pos"])) for r in hit)
    if not pairs:
        return None, 0
    new_meta = append_iceberg_deletes(table_dir, pos_deletes=pairs)
    return new_meta, len(pairs)

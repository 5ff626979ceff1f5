"""Real Delta Lake table reader (the reference's native storage format).

The reference persists every table through delta-rs (src/context/delta.rs),
so a seafowl data directory is a standard Delta table: a ``_delta_log/``
of JSON commits (one action per line: metaData / add / remove / commitInfo
/ protocol), optionally compacted into parquet checkpoints named by
``_last_checkpoint``. delta-spark isn't available in this environment, so
this module replays the log natively:

1. if ``_last_checkpoint`` exists, load the checkpoint parquet (pyarrow)
   and seed the live-file set from its ``add`` rows;
2. replay the JSON commits after the checkpoint (or from 0), applying
   add/remove actions in order;
3. hand the live parquet paths to ``spark.read.parquet`` — Catalyst keeps
   its vectorized scan, pushdown and pruning.

Version time travel replays the log only up to the requested version;
timestamp travel resolves the last commit whose file mtime (or
commitInfo.timestamp) is <= the bound, delta protocol rule.

Partitioned tables: Delta stores partition values in the add action, not
in the data files. Files are read with ``basePath`` so Spark re-derives
hive-style ``col=val`` partition columns from the paths delta-rs writes.

This is read-only interop; engine-native tables use deltalite (same
commit/snapshot concepts, simpler JSON log). ``read_any_delta`` sniffs
which of the two layouts a directory holds.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class DeltaLogError(Exception):
    pass


_LOG = "_delta_log"


def is_delta_table(path: str) -> bool:
    return os.path.isdir(os.path.join(path, _LOG))


def _commit_versions(log_dir: str) -> list[int]:
    out = []
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _map_fields_to_dicts(action: dict | None) -> dict | None:
    """Checkpoint parquet stores string-map fields (partitionValues,
    tags, configuration, format.options) as arrow MAP columns, which
    ``to_pylist`` hands back as LISTS of (k, v) tuples — every consumer
    expects dicts (the JSON-commit shape), so normalize here. A JSON
    replay never hits this; only checkpoint-sourced actions do."""
    if not action:
        return action
    out = dict(action)
    for k in ("partitionValues", "tags", "configuration"):
        v = out.get(k)
        if isinstance(v, list):
            out[k] = dict(v)
    fmt = out.get("format")
    if isinstance(fmt, dict) and isinstance(fmt.get("options"), list):
        out["format"] = dict(fmt, options=dict(fmt["options"]))
    return out


def _checkpoint_adds(log_dir: str, upto: int | None):
    """(seed live-file dict from the newest usable checkpoint, its version,
    the checkpoint's metaData action or {}) — ({}, -1, {}) when no
    checkpoint applies."""
    import pyarrow.parquet as pq

    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return {}, -1, {}
    with open(lc) as f:
        info = json.load(f)
    v = int(info["version"])
    if upto is not None and v > upto:
        # travel target predates the checkpoint: replay JSON from 0
        return {}, -1, {}
    parts = int(info.get("parts", 0) or 0)
    if parts:
        names = [
            f"{v:020d}.checkpoint.{i:010d}.{parts:010d}.parquet"
            for i in range(1, parts + 1)
        ]
    else:
        names = [f"{v:020d}.checkpoint.parquet"]
    live: dict[str, dict] = {}
    meta: dict = {}
    for n in names:
        p = os.path.join(log_dir, n)
        if not os.path.exists(p):
            raise DeltaLogError(f"_last_checkpoint names a missing file: {n}")
        pf = pq.ParquetFile(p)
        cols = [c for c in ("add", "metaData") if c in pf.schema_arrow.names]
        t = pq.read_table(p, columns=cols)
        for row in t.to_pylist():
            a = row.get("add")
            if a and a.get("path"):
                live[a["path"]] = _map_fields_to_dicts(a)
            m = row.get("metaData")
            if m and m.get("schemaString"):
                meta = _map_fields_to_dicts(m)
    return live, v, meta


def _resolve_version(
    log_dir: str, version: int | None, timestamp_ms: int | None
) -> int:
    versions = _commit_versions(log_dir)
    if not versions:
        raise DeltaLogError(f"no delta commits in {log_dir}")
    if version is not None:
        if version not in versions:
            # delta allows checkpoint-truncated logs; only replayable
            # versions are addressable here
            raise DeltaLogError(f"version {version} not present in the log")
        return version
    if timestamp_ms is not None:
        best = None
        for v in versions:
            ts = _commit_timestamp(log_dir, v)
            if ts is not None and ts <= timestamp_ms:
                best = v
        if best is None:
            raise DeltaLogError("timestamp predates the oldest commit")
        return best
    return versions[-1]


def _commit_timestamp(log_dir: str, version: int) -> int | None:
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            act = json.loads(line)
            ci = act.get("commitInfo")
            if ci and "timestamp" in ci:
                return int(ci["timestamp"])
    return int(os.path.getmtime(path) * 1000)


def delta_snapshot_files(
    table_dir: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> tuple[list[str], dict]:
    """(live data file paths, metaData action) at the requested version."""
    adds, meta = delta_snapshot_adds(table_dir, version, timestamp_ms)
    mapping = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    if mapping and mapping not in ("none", "name", "id"):
        raise DeltaLogError(
            f"delta column mapping mode {mapping!r} is not supported"
        )
    return sorted(adds), meta


def delta_snapshot_adds(
    table_dir: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> tuple[dict[str, dict], dict]:
    """(live add actions keyed by ABSOLUTE file path, metaData action) —
    the descriptor-preserving variant of ``delta_snapshot_files`` used when
    deletion vectors must be applied."""
    log_dir = os.path.join(table_dir, _LOG)
    if not os.path.isdir(log_dir):
        raise DeltaLogError(f"not a delta table (no {_LOG}): {table_dir}")
    target = _resolve_version(log_dir, version, timestamp_ms)
    live, ckpt_v, meta = _checkpoint_adds(log_dir, target)
    for v in _commit_versions(log_dir):
        if v <= ckpt_v or v > target:
            continue
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
                elif "add" in act:
                    live[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    # add.path is percent-encoded per the delta spec (a literal % in a
    # file name arrives as %25) — decode when resolving to the store;
    # add/remove matching above stays on the raw encoded strings
    from urllib.parse import unquote as _unq

    return {
        (
            p
            if os.path.isabs(p)
            else os.path.join(table_dir, _unq(p))
        ): a
        for p, a in live.items()
    }, meta


def _file_stats_json(parquet_path: str) -> dict:
    """Delta per-file stats JSON (numRecords/minValues/maxValues/nullCount)
    from the parquet footer — what delta-rs/delta-spark writers emit, and
    what ``prune_adds`` consumes on read."""
    import datetime as _dt

    import pyarrow.parquet as pq

    md = pq.ParquetFile(parquet_path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    # A column chunk without statistics makes that column's file-wide
    # bounds (and null count) unknowable — track such columns in a set so
    # a later row group that DOES carry stats cannot resurrect them
    # (emitting bounds that cover only some row groups would let
    # prune_adds drop a file whose stats-less row group holds matches).
    no_bounds: set = set()
    no_nulls: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            st = col.statistics
            if st is None:
                no_bounds.add(name)
                no_nulls.add(name)
                continue
            if st.null_count is None:
                no_nulls.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if not st.has_min_max:
                no_bounds.add(name)
                continue
            if isinstance(st.min, float) and (
                st.min != st.min or st.max != st.max
            ):
                # NaN bounds are unorderable — every comparison against
                # them is False, so emitting them would let prune_adds
                # wrongly drop the file (same suppression as deltalite's
                # _footer_stats)
                no_bounds.add(name)
                continue
            if name not in mins or st.min < mins[name]:
                mins[name] = st.min
            if name not in maxs or st.max > maxs[name]:
                maxs[name] = st.max
    for name in no_bounds:
        mins.pop(name, None)
        maxs.pop(name, None)
    for name in no_nulls:
        nulls.pop(name, None)

    def _j(v):
        if isinstance(v, _dt.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, bytes):
            return None
        return v

    return {
        "numRecords": md.num_rows,
        "minValues": {k: _j(v) for k, v in mins.items() if _j(v) is not None},
        "maxValues": {k: _j(v) for k, v in maxs.items() if _j(v) is not None},
        "nullCount": nulls,
    }


def prune_adds(adds: dict[str, dict], predicate_sql: str | None) -> dict[str, dict]:
    """Delta file skipping from per-add ``stats`` JSON — the same job
    delta-rs delegates to DataFusion's PruningPredicate when the reference
    plans UPDATE/DELETE/scan. Conservative: a file is dropped only when its
    [min, max]/nullCount prove the predicate matches no row; adds without
    stats, unknown columns, and unparseable predicates keep the file."""
    if not predicate_sql:
        return adds
    from ..engine.pruning import _may_match, parse_predicate

    ast = parse_predicate(predicate_sql)
    if ast is None:
        return adds
    out: dict[str, dict] = {}
    for path, add in adds.items():
        raw = add.get("stats")
        s: dict = {}
        if raw:
            try:
                s = json.loads(raw) if isinstance(raw, str) else raw
            except (TypeError, ValueError):
                s = {}
        mins = s.get("minValues") or {}
        maxs = s.get("maxValues") or {}
        nulls = s.get("nullCount") or {}
        stats = {
            c: {"min": mins.get(c), "max": maxs.get(c), "nulls": nulls.get(c)}
            for c in set(mins) | set(maxs) | set(nulls)
        }
        # partition columns never appear in data-file stats (the spec
        # keeps them out of the files) — their partitionValues are exact
        # point stats, so a partition-column predicate prunes whole
        # directories. Values are protocol strings; coerce numerics so
        # comparisons against numeric literals stay ordered correctly.
        n_rec = int(s.get("numRecords") or 0)
        for c, v in (add.get("partitionValues") or {}).items():
            if c in stats:
                continue
            if v is None:
                stats[c] = {"min": None, "max": None, "nulls": max(n_rec, 1)}
                continue
            tv: object = v
            try:
                tv = int(v)
            except ValueError:
                try:
                    tv = float(v)
                except ValueError:
                    pass
            stats[c] = {"min": tv, "max": tv, "nulls": 0}
        if not stats or _may_match(ast, stats, n_rec):
            out[path] = add
    return out


def read_delta(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    predicate_sql: str | None = None,
) -> DataFrame:
    adds, meta = delta_snapshot_adds(table_dir, version, timestamp_ms)
    if not adds:
        raise DeltaLogError(f"selected delta version has no live files: {table_dir}")
    all_adds = adds
    adds = prune_adds(adds, predicate_sql)
    if not adds:
        # every file pruned: empty frame with the table's schema — incl.
        # partition columns, which live in directory names, so the read
        # needs basePath or the empty frame's schema would be narrower
        # than the full view and valid queries on partition columns
        # would fail analysis
        first = sorted(all_adds)[0]
        r = spark.read
        if meta.get("partitionColumns"):
            r = r.option("basePath", table_dir)
        empty = r.parquet(first).limit(0)
        empty = _apply_deletion_vectors(spark, empty, table_dir, {})
        return _apply_column_mapping(empty, meta)
    reader = spark.read
    if meta.get("partitionColumns"):
        # partition values live in the directory names delta-rs writes;
        # basePath makes Spark re-derive them as columns
        reader = reader.option("basePath", table_dir)
    df = reader.parquet(*sorted(adds))
    df = _apply_deletion_vectors(spark, df, table_dir, adds)
    return _apply_column_mapping(df, meta)


def _apply_deletion_vectors(
    spark: SparkSession, df: DataFrame, table_dir: str, adds: dict[str, dict]
) -> DataFrame:
    """Merge-on-read: drop rows whose (file, row_index) is set in a file's
    deletion-vector bitmap (delta protocol "Deletion Vectors").

    Scale: DV bitmaps are deltas — tiny next to the data — so the decoded
    (file, row_index) set broadcasts and the fact scan stays shuffle-free,
    the same shape as the iceberg positional-delete path. Decoding happens
    once on the driver (bitmaps are KB-scale); at extreme DV cardinality
    the same anti-join accepts a distributed decode instead.
    """
    dv_adds = {p: a for p, a in adds.items() if a.get("deletionVector")}
    if not dv_adds:
        return df
    from pyspark.sql import functions as F

    from .delta_dv import read_dv

    pairs = []
    for path, add in dv_adds.items():
        for idx in read_dv(table_dir, add["deletionVector"]):
            pairs.append((os.path.abspath(path), idx))
    dels = spark.createDataFrame(pairs, "__sfs_fp string, __sfs_pos long")
    out_cols = df.columns
    return (
        df.withColumn(
            "__sfs_fp",
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
        )
        .withColumn("__sfs_pos", F.col("_metadata.row_index"))
        .join(F.broadcast(dels), ["__sfs_fp", "__sfs_pos"], "left_anti")
        .select(*out_cols)
    )


def _apply_column_mapping(df: DataFrame, meta: dict) -> DataFrame:
    """Rename physical parquet columns back to logical names when the table
    uses delta column mapping (mode ``name`` or ``id`` — both store
    ``delta.columnMapping.physicalName`` in the schemaString field
    metadata). Nested struct fields are renamed by casting to the logical
    struct type (layout-identical, so the cast is a rename)."""
    mapping = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    if not mapping or mapping == "none":
        return df
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType, _parse_datatype_json_value

    schema = json.loads(meta["schemaString"])

    def logical_type(field_json: dict):
        return _strip_physical(field_json["type"])

    def _strip_physical(t):
        if isinstance(t, dict) and t.get("type") == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "name": f["name"],
                        "type": _strip_physical(f["type"]),
                        "nullable": f.get("nullable", True),
                        "metadata": {},
                    }
                    for f in t["fields"]
                ],
            }
        if isinstance(t, dict) and t.get("type") == "array":
            return {**t, "elementType": _strip_physical(t["elementType"])}
        if isinstance(t, dict) and t.get("type") == "map":
            return {
                **t,
                "keyType": _strip_physical(t["keyType"]),
                "valueType": _strip_physical(t["valueType"]),
            }
        return t

    cols = []
    for f in schema["fields"]:
        phys = (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        if phys not in df.columns:
            raise DeltaLogError(
                f"column-mapped field {f['name']!r}: physical column "
                f"{phys!r} missing from data files"
            )
        col = F.col(phys)
        ltype = _parse_datatype_json_value(logical_type(f))
        if isinstance(ltype, (StructType, ArrayType, MapType)):
            col = col.cast(ltype)  # positional cast == nested rename
        cols.append(col.alias(f["name"]))
    return df.select(*cols)


def write_delta_table(
    spark: SparkSession,
    df,
    table_dir: str,
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` as one append to a REAL Delta Lake table at
    ``table_dir`` (creating it on first write); returns the committed
    version. Output is readable by delta-rs / delta-spark: parquet data
    files plus a ``_delta_log`` JSON commit with protocol / metaData /
    add / commitInfo actions (``schemaString`` is Spark's schema JSON —
    the same representation Delta uses). Writer-side interop twin of
    ``read_delta``.

    ``partition_by`` writes the protocol's partitioned layout: hive
    ``col=val`` directories, partition values in each add action's
    ``partitionValues`` (NOT in the data files — per spec the columns
    live only in metadata/paths), ``partitionColumns`` in metaData.
    Appends must keep the table's existing partitioning."""
    import glob
    import shutil
    import time
    import urllib.parse as _up
    import uuid as _uuid

    part_cols = list(partition_by or [])
    missing = [c for c in part_cols if c not in df.columns]
    if missing:
        raise DeltaLogError(f"partition columns not in data: {missing}")
    log_dir = os.path.join(table_dir, _LOG)
    os.makedirs(log_dir, exist_ok=True)
    versions = _commit_versions(log_dir)
    version = (versions[-1] + 1) if versions else 0
    if version > 0:
        _, meta = delta_snapshot_adds(table_dir)
        existing = (meta or {}).get("partitionColumns") or []
        if existing != part_cols:
            raise DeltaLogError(
                f"append partitioning {part_cols} != table's {existing}"
            )

    stage = os.path.join(table_dir, f"_stage_{_uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(stage)
    adds = []
    now_ms = int(time.time() * 1000)
    import pyarrow.parquet as _pq

    for part in sorted(
        glob.glob(os.path.join(stage, "**", "part-*.parquet"), recursive=True)
    ):
        if _pq.ParquetFile(part).metadata.num_rows == 0:
            continue  # delta-spark/delta-rs never commit empty data files
        rel_dir = os.path.relpath(os.path.dirname(part), stage)
        pvals: dict[str, str | None] = {}
        if rel_dir != ".":
            for seg in rel_dir.split(os.sep):
                k, _, v = seg.partition("=")
                pvals[k] = (
                    None
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else _up.unquote(v)
                )
        if set(pvals) != set(part_cols):
            raise DeltaLogError(
                f"staged layout {rel_dir!r} does not match partitioning "
                f"{part_cols}"
            )
        name = f"part-{_uuid.uuid4().hex}.snappy.parquet"
        rel = os.path.join(rel_dir, name) if rel_dir != "." else name
        dest = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.move(part, dest)
        adds.append(
            {
                "add": {
                    # add.path is percent-encoded per the delta spec;
                    # '=' and '/' stay literal (delta-rs convention),
                    # spaces/specials encode. The reader unquotes.
                    "path": _up.quote(rel, safe="/="),
                    "partitionValues": pvals,
                    "size": os.path.getsize(dest),
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": json.dumps(_file_stats_json(dest)),
                }
            }
        )
    shutil.rmtree(stage, ignore_errors=True)

    actions = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(_uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    actions += adds
    actions.append(
        {"commitInfo": {"timestamp": now_ms, "operation": "WRITE",
                        "operationParameters": {"mode": "Append"}}}
    )
    path = os.path.join(log_dir, f"{version:020d}.json")
    tmp = path + f".tmp.{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, path)  # same put-if-absent claim deltalite uses
    except FileExistsError:
        raise DeltaLogError(f"version {version} already committed") from None
    finally:
        os.unlink(tmp)
    if version > 0 and version % CHECKPOINT_EVERY == 0:
        _write_checkpoint(table_dir, version)
    return version


# checkpoint cadence for tables we write (delta protocol's default is 10)
CHECKPOINT_EVERY = 10


def _snapshot_protocol(log_dir: str, target: int) -> dict:
    """Latest protocol action at or before ``target`` (the checkpoint spec
    requires exactly one protocol row per checkpoint)."""
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    for v in _commit_versions(log_dir):
        if v > target:
            break
        try:
            with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
                for line in f:
                    if not line.strip():
                        continue
                    act = json.loads(line)
                    if "protocol" in act:
                        proto = act["protocol"]
        except OSError:
            continue  # log cleaned below a prior checkpoint
    return proto


# add-action fields the checkpoint schema can represent; an add carrying
# anything else (e.g. deletionVector) must veto the checkpoint — silently
# dropping such a field would resurrect deleted rows for external readers
_CKPT_ADD_FIELDS = {
    "path", "partitionValues", "size", "modificationTime", "dataChange",
    "stats", "tags",
}


def _write_checkpoint(table_dir: str, version: int) -> None:
    """Materialize the live snapshot as ``N.checkpoint.parquet`` +
    ``_last_checkpoint`` (delta protocol log-compaction shape), so readers
    of long logs replay O(tail) JSON commits instead of all of them —
    the write-side twin of ``_checkpoint_adds``. Best-effort: a failed
    checkpoint never fails the commit (the JSON log stays authoritative).

    Spec compliance for external (delta-spark/delta-rs) readers: exactly
    one protocol row, and required fields like add.partitionValues kept
    as EMPTY MAPS — an explicit arrow schema makes {} storable (pyarrow's
    inferred zero-field struct is what previously forced stripping them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field("protocol", pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
            ])),
            pa.field("metaData", pa.struct([
                ("id", pa.string()),
                ("name", pa.string()),
                ("description", pa.string()),
                ("format", pa.struct([
                    ("provider", pa.string()),
                    ("options", str_map),
                ])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", str_map),
                ("createdTime", pa.int64()),
            ])),
            pa.field("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", str_map),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
                ("tags", str_map),
            ])),
        ]
    )
    try:
        adds, meta = delta_snapshot_adds(table_dir, version=version)
        if any(set(a) - _CKPT_ADD_FIELDS for a in adds.values()):
            return
        log_dir = os.path.join(table_dir, _LOG)
        fmt = meta.get("format") or {}
        rows: list[dict] = [
            {"protocol": _snapshot_protocol(log_dir, version)},
            {
                "metaData": {
                    "id": meta.get("id"),
                    "name": meta.get("name"),
                    "description": meta.get("description"),
                    "format": {
                        "provider": fmt.get("provider", "parquet"),
                        "options": fmt.get("options") or {},
                    },
                    "schemaString": meta.get("schemaString"),
                    "partitionColumns": meta.get("partitionColumns") or [],
                    "configuration": meta.get("configuration") or {},
                    "createdTime": meta.get("createdTime"),
                }
            },
        ]
        for abs_path, a in sorted(adds.items()):
            rows.append({
                "add": {
                    "path": a["path"],
                    "partitionValues": a.get("partitionValues") or {},
                    "size": a.get("size"),
                    "modificationTime": a.get("modificationTime"),
                    "dataChange": a.get("dataChange", True),
                    "stats": a.get("stats"),
                    "tags": a.get("tags"),
                }
            })
        table = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        lc_tmp = os.path.join(log_dir, "_last_checkpoint.tmp")
        with open(lc_tmp, "w") as f:
            json.dump({"version": version, "size": len(adds) + 2}, f)
        os.replace(lc_tmp, os.path.join(log_dir, "_last_checkpoint"))
    except Exception:
        pass  # checkpointing is an optimization, never a correctness gate


def read_any_delta(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    timestamp: str | None = None,
    predicate_sql: str | None = None,
) -> DataFrame:
    """Dispatch on layout: a real Delta ``_delta_log`` or a deltalite
    ``_log`` directory (engine-native tables). ``predicate_sql`` enables
    stats-based file skipping on the real-delta path."""
    if is_delta_table(table_dir):
        ts_ms = None
        if timestamp is not None:
            import datetime as _dt

            dt = _dt.datetime.fromisoformat(timestamp.replace("Z", "+00:00"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dt.timezone.utc)
            ts_ms = int(dt.timestamp() * 1000)
        return read_delta(
            spark, table_dir, version=version, timestamp_ms=ts_ms,
            predicate_sql=predicate_sql,
        )
    from ..engine.deltalite import DeltaLiteTable

    return DeltaLiteTable(spark, table_dir).to_df(version=version, timestamp=timestamp)

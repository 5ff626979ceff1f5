"""Tombstones: delete-aware serving for persisted search indexes.

A persisted index (BM25 postings, LSH bands, IVF-PQ cells) is built
append-friendly: new documents land in new partition files without
touching old ones. DELETEs have no such locality — a deleted document's
postings are scattered across every term/band/cell partition it touched,
so removing them in place would rewrite the whole artifact (exactly the
full rebuild the incremental path exists to avoid).

Tombstones make deletes as cheap as appends: REFRESH writes the removed
ids under ``{index}/tombstones/`` (one small parquet per refresh) and
every lookup anti-joins its PRUNED candidate set against them BEFORE any
statistic derives. Because document frequency is computed at query time
from the (pruned, tombstone-filtered) candidates, and the BM25 corpus
stats merge a NEGATIVE fragment for the removed documents, a
tombstone-filtered lookup returns BIT-IDENTICAL scores to a from-scratch
rebuild — tested as strict equality, not approximately.

Scale shape: the tombstone set is broadcast (it is bounded by the
refresh-time cap — past ``TOMBSTONE_CAP_RATIO`` of the corpus the
engine downgrades to a full rebuild, which clears the set), so the
filter adds one broadcast-hash anti-join on the already-pruned
candidates, never a shuffle of the index.

The masking model is strictly additive between rebuilds: a tombstoned
id's OLD postings still exist in the artifact, so re-inserting that id
cannot be handled by scrubbing the tombstone (the unmasked old postings
would double-count). Epochs (r11) solve this without a rebuild: every
artifact row carries the EPOCH of the refresh that wrote it (0 at
build), and a tombstone is ``(id, epoch)`` — it masks that id's rows
with ``row.epoch <= tombstone.epoch`` only. An UPDATE tombstones the id
at the PRE-refresh epoch (masking everything written so far) and
appends the new content one epoch later; a re-insert of a tombstoned id
likewise lands at a later epoch than its mask. Dead old postings stay
masked forever (until OPTIMIZE folds them out); fresh postings are
never shadowed. The serving filter stays one broadcast anti-join — the
mask aggregates to at most one ``(id, max_epoch)`` row per id.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

TOMBSTONES = "tombstones"
# past this fraction of the indexed corpus the engine full-rebuilds
# instead of growing the mask (serving stays correct either way; this
# bounds the broadcast and reclaims the dead postings). The absolute
# floor keeps SMALL tables incremental — a sub-1024-id broadcast costs
# nothing, and without it a 5-row table's first delete would always
# trip the ratio
TOMBSTONE_CAP_RATIO = 0.2
TOMBSTONE_CAP_FLOOR = 1024


def tombstone_dir(index_path: str) -> str:
    return os.path.join(index_path, TOMBSTONES)


def has_tombstones(index_path: str) -> bool:
    return os.path.isdir(tombstone_dir(index_path))


def write_tombstones(
    ids: DataFrame, index_path: str, id_col: str, epoch: int = 0
) -> None:
    """Append one fragment of removed ids to the mask. Ids store as
    STRING: the index machinery supports string id columns (the LSH
    lookup's empty-frame path is explicit about it), and a long cast
    would turn those into NULLs — a mask that never matches anything,
    silently serving deleted documents. String round-trips every id
    type the engine stores losslessly.

    ``epoch`` is the mask's reach: it hides the id's artifact rows
    written at or before that refresh epoch, and nothing newer — so a
    later re-insert/update of the same id serves cleanly from its
    higher-epoch rows."""
    ids.select(
        F.col(id_col).cast("string").alias("id"),
        F.lit(int(epoch)).cast("long").alias("epoch"),
    ).write.mode("append").parquet(tombstone_dir(index_path))


def read_tombstones(spark, index_path: str) -> DataFrame | None:
    if not has_tombstones(index_path):
        return None
    # pre-epoch fragments read epoch as NULL -> coalesced to "mask every
    # epoch" in the filter (the conservative reading: those masks were
    # written when re-inserts forced rebuilds, so nothing newer exists)
    return spark.read.schema("id string, epoch long").parquet(
        tombstone_dir(index_path)
    )


def clear_tombstones(index_path: str) -> None:
    """Full rebuilds drop the mask (the artifact overwrite only replaces
    postings/stats — the tombstone dir would otherwise survive and mask
    re-inserted ids out of the FRESH artifact)."""
    shutil.rmtree(tombstone_dir(index_path), ignore_errors=True)


def filter_tombstones(
    spark, index_path: str, candidates: DataFrame, id_col: str
) -> DataFrame:
    """Anti-join the pruned candidate set against the mask (broadcast —
    the refresh-time cap bounds it). No-op when the index has none.

    Epoch-aware: a candidate row survives unless its id is masked at an
    epoch >= the row's own ``epoch`` column (rows without the column are
    build-time rows, epoch 0). The mask collapses to one (id, max_epoch)
    row per id before broadcasting."""
    ts = read_tombstones(spark, index_path)
    if ts is None:
        return candidates
    mask = ts.groupBy("id").agg(
        # NULL epoch = pre-epoch fragment: mask the id outright
        F.max(F.coalesce(F.col("epoch"), F.lit(2**62))).alias("__ts_epoch")
    )
    cand_epoch = (
        candidates["epoch"].cast("long")
        if "epoch" in candidates.columns
        else F.lit(0).cast("long")
    )
    return candidates.join(
        F.broadcast(mask),
        (candidates[id_col].cast("string") == mask["id"])
        & (cand_epoch <= mask["__ts_epoch"]),
        "left_anti",
    )


def tombstone_count(spark, index_path: str) -> int:
    ts = read_tombstones(spark, index_path)
    return 0 if ts is None else ts.count()


def compact_masked_dir(
    spark,
    index_path: str,
    subdir: str,
    part_col: str,
    id_col: str,
    ddl: str | None = None,
) -> None:
    """Rewrite one artifact directory with the tombstoned rows dropped
    (and per-partition fragments coalesced by the overwrite) — the
    IO-only half of OPTIMIZE SEARCH INDEX: no tokenizing, hashing, or
    encoding re-runs, just a partition-preserving read → filter →
    rewrite. Staged through a sibling ``.__compact`` dir and swapped, so
    the source is never read and overwritten in one job; the caller's
    crash marker covers the non-atomic swap window."""
    src = os.path.join(index_path, subdir)
    reader = spark.read
    if ddl:
        reader = reader.schema(ddl)
    df = filter_tombstones(
        spark, index_path, reader.parquet(src), id_col
    )
    tmp = src + ".__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
    shutil.rmtree(src)
    os.rename(tmp, src)

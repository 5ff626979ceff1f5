"""Persisted MinHash-LSH near-dup index: the DEDUP-AT-INGEST serving
shape — "is this new document a near-duplicate of anything already in
the corpus?" answered without rescanning the corpus.

The batch pair-finder (queries/similarity.s_minhash_lsh_pairs) and the
cross-corpus checker (operators/cross_contamination.py) both recompute
signatures for every involved corpus per run. At 100 TB the corpus side
must be computed ONCE and persisted — this module is the index-serving
twin, with the same layout contract as the BM25/IVF-PQ indexes
(operators/bm25.py / pq.py):

* :func:`write_lsh_index` — one corpus pass: minhash signatures (the
  exact graded pipeline: 3-token shingles, md5 hashes, 16 affine
  permutations), band keys, rows land under ``{path}/bands``
  partitioned by ``bucket = pmod(xxhash64(band, key), n_buckets)``.
  ``{path}/meta`` records bands/n_buckets.
* :func:`neardup_lookup` — probe a batch of NEW documents: their band
  keys hash to a bounded bucket list (<= new_docs x bands entries,
  driver-collected like the BM25 term buckets), the scan carries a
  ``bucket IN (...)`` partition filter (gate-tested via the explain's
  PartitionFilters — inputFiles ignores pruning), the band-key equi-join
  yields candidates, and signature agreement >= threshold verifies them.
  Probe cost scales with the NEW batch, never the corpus.
* :func:`append_lsh_index` — new documents' band rows append into the
  same hash partitions; append == full rebuild (gate-tested). Lookup
  then append = exactly-once ingest-with-dedup; composed for streams in
  tests/test_lsh_index.py via foreachBatch.

Per-bucket candidate rows cap deterministically (ORDER BY id) like every
bucketed join in this repo — a pathological boilerplate bucket degrades
to "not probed beyond the cap", never a blow-up.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cross_contamination import (
    BAND_KEY_SEP,
    N_PERM,
    SIG_SPLIT_MODE,
    _banded,
    minhash_signatures,
)
DEFAULT_BANDS = 4
DEFAULT_BUCKETS = 64
MAX_BUCKET_ROWS = 1000


def _band_rows(
    docs: DataFrame,
    bands: int,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    sigs = minhash_signatures(docs, text_col, id_col)
    return _banded(sigs, id_col, bands).select(
        F.col(id_col),
        "sigs",
        "band",
        "key",
        # INT bucket: keeps the sidecar DDL identical to what partition
        # inference gave readers before the DDL existed
        F.pmod(F.xxhash64("band", "key"), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )


def _probe_band_rows_local(spark: SparkSession, rows, meta: dict) -> DataFrame:
    """Driver-local twin of :func:`_band_rows` for a probe given as a
    bounded ``[(id, text)]`` list (r13, guide §4/§5): signatures via
    :func:`~..functions.vec.minhash_sigs_py` — the SAME Python the Arrow
    UDF maps over executor batches, so probe signatures are bit-identical
    to corpus signatures by construction — and band keys via the same
    decimal join ``concat_ws`` produces for longs. The rows bind through
    :func:`~..functions.local_df` (a LocalRelation), so a lookup's probe
    side costs ZERO cluster jobs; only the bucket expression stays a JVM
    projection, identical to :func:`_band_rows`'s."""
    from ..functions import local_df
    from ..functions.vec import minhash_sigs_py
    from ..queries.similarity import MINHASH_A, MINHASH_B, MINHASH_P

    sigs = minhash_sigs_py(
        [t for _i, t in rows], MINHASH_A, MINHASH_B, MINHASH_P,
        split=SIG_SPLIT_MODE,
    )
    bands = int(meta["bands"])
    rpb = N_PERM // bands
    id_t = "string" if any(isinstance(i, str) for i, _t in rows) else "bigint"
    data = []
    for (i, _t), s in zip(rows, sigs):
        if s is None:
            continue
        for b in range(bands):
            key = BAND_KEY_SEP.join(str(x) for x in s[b * rpb : (b + 1) * rpb])
            data.append((i, s, b, key))
    probe = local_df(
        spark, data, f"new_id {id_t}, sigs_n array<bigint>, band int, key string"
    )
    return probe.withColumn(
        "bucket",
        F.pmod(F.xxhash64("band", "key"), F.lit(meta["n_buckets"])).cast("int"),
    )


def write_lsh_index(
    docs: DataFrame,
    path: str,
    bands: int = DEFAULT_BANDS,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus's LSH band index under ``path``."""
    from .index_tombstones import clear_tombstones

    if N_PERM % bands != 0:
        raise ValueError(f"bands must divide {N_PERM}")
    clear_tombstones(path)  # a full build masks nothing
    rows = _band_rows(docs, bands, n_buckets, text_col, id_col).withColumn(
        # build rows are epoch 0; incremental appends land at later
        # epochs so (id, epoch) tombstones mask only OLD rows of an
        # updated / re-inserted document (operators/index_tombstones.py)
        "epoch", F.lit(0).cast("long")
    )
    rows.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/bands"
    )
    # the bands schema rides in the meta sidecar so a lookup can open an
    # EMPTY bands dir (index built over an empty/shingle-less corpus
    # writes no part files; inference would fail — r10 fuzz find)
    bands_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in rows.schema.fields
    )
    meta = json.dumps(
        {
            "bands": bands,
            "n_buckets": n_buckets,
            "id_col": id_col,
            "bands_ddl": bands_ddl,
        }
    )
    spark = docs.sparkSession
    spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")


def _read_meta(spark: SparkSession, path: str) -> dict:
    # r13: the meta sidecar is one coalesced row — read it driver-side
    # when locally visible (saves one Spark job per lookup); Spark path
    # stays the remote-store fallback
    from ..io import read_small_parquet

    rows = read_small_parquet(f"{path}/meta")
    if rows:
        return json.loads(rows[0]["meta"])
    return json.loads(spark.read.parquet(f"{path}/meta").first()["meta"])


def append_lsh_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch: int = 0,
) -> None:
    """Add documents incrementally: their band rows land in the same
    hash partitions (parquet append touches only those buckets), so
    append == full rebuild over the union corpus."""
    spark = docs.sparkSession
    meta = _read_meta(spark, path)
    rows = _band_rows(
        docs, meta["bands"], meta["n_buckets"], text_col, id_col
    ).withColumn("epoch", F.lit(int(epoch)).cast("long"))
    rows.write.mode("append").partitionBy("bucket").parquet(f"{path}/bands")


def delete_from_lsh_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    epoch: int = 0,
) -> None:
    """Incrementally REMOVE documents: their ids append to the tombstone
    mask; the band rows stay on disk and lookups filter them out before
    the bucket cap (operators/index_tombstones.py has the model — LSH
    has no corpus stats to adjust, so this is the whole operation)."""
    from .index_tombstones import write_tombstones

    write_tombstones(docs, path, id_col, epoch=epoch)


def neardup_lookup(
    spark: SparkSession,
    path: str,
    new_docs,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_rows: int = MAX_BUCKET_ROWS,
    exclude_self: bool = True,
) -> DataFrame:
    """(new_id, index_id, n_equal_sigs, est_jaccard) for every indexed
    document whose estimated Jaccard with a new document reaches
    ``threshold``. The index scan reads ONLY the partitions the new
    batch's band keys hash into.

    ``new_docs`` is a DataFrame, or — for driver-bounded probe batches
    like the SQL plane's per-query lookups — a ``[(id, text)]`` list,
    which skips the cluster entirely on the probe side
    (:func:`_probe_band_rows_local`): no tokenize stage, no checkpoint,
    no bucket-collect job.

    ``exclude_self=False`` disables the ``new_id != index_id`` guard —
    for IDENTITY-LESS probes (the SQL plane's text lookups, where the
    probe id is synthetic) no sentinel value can be safe: any id chosen
    could collide with a real corpus id and silently hide that row."""
    meta = _read_meta(spark, path)

    def _bands_reader():
        r = spark.read
        if meta.get("bands_ddl"):
            r = r.schema(meta["bands_ddl"])
        return r.parquet(f"{path}/bands")

    if isinstance(new_docs, list):
        probe = _probe_band_rows_local(spark, new_docs, meta)
    else:
        # materialize the probe band rows (batch x bands rows, bounded):
        # they feed the driver-side bucket collect AND the candidate
        # join, and an unpersisted subtree would re-tokenize/re-permute
        # the batch per reference (the repo's double-subtree trap)
        probe = _band_rows(
            new_docs, meta["bands"], meta["n_buckets"], text_col, id_col
        ).select(
            F.col(id_col).alias("new_id"),
            F.col("sigs").alias("sigs_n"),
            "band",
            "key",
            "bucket",
        ).localCheckpoint()
    # bounded driver state: <= new_docs x bands bucket ids (the same
    # contract as bm25_topk_indexed's query-term bucket list). The LIST
    # path dedups driver-side only (an Aggregate over a LocalRelation
    # would force a cluster job, while Project-over-LocalRelation folds
    # driver-side); the DataFrame path keeps distinct() so a large
    # ingest batch ships <= n_buckets ids to the driver, not batch x
    # bands rows (advisor find, r13).
    bucket_col = probe.select("bucket")
    if not isinstance(new_docs, list):
        bucket_col = bucket_col.distinct()
    buckets = sorted({r["bucket"] for r in bucket_col.collect()})
    if not buckets:
        # empty frame with the REAL id types (probe side for new_id, the
        # persisted index's schema for index_id) — a hardcoded long would
        # break string-id callers' joins/unions
        new_t = probe.schema["new_id"].dataType.simpleString()
        idx_t = (
            _bands_reader().schema[meta["id_col"]].dataType.simpleString()
        )
        from ..functions import local_df

        return local_df(
            spark,
            [],
            f"new_id {new_t}, index_id {idx_t}, "
            "n_equal_sigs int, est_jaccard double",
        )
    pruned = _bands_reader().where(F.col("bucket").isin(buckets))
    sel = [
        F.col(meta["id_col"]).alias("index_id"),
        F.col("sigs").alias("sigs_i"),
        "band",
        "key",
    ]
    if "epoch" in pruned.columns:
        # carried only into the tombstone filter (epoch-scoped masks);
        # pre-epoch artifacts simply lack the column
        sel.append("epoch")
    idx = pruned.select(*sel)
    # delete-aware serving: mask tombstoned documents BEFORE the bucket
    # cap, so the cap selects exactly the rows a from-scratch rebuild
    # would (operators/index_tombstones.py)
    from .index_tombstones import filter_tombstones

    idx = filter_tombstones(spark, path, idx, "index_id")
    w = Window.partitionBy("band", "key").orderBy("index_id")
    idx = idx.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= max_bucket_rows
    )
    cand = probe.join(idx, ["band", "key"])
    if exclude_self:
        cand = cand.where(F.col("new_id") != F.col("index_id"))
    cand = cand.select("new_id", "index_id", "sigs_n", "sigs_i").distinct()
    n_eq = F.size(
        F.filter(
            F.zip_with(F.col("sigs_n"), F.col("sigs_i"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        cand.withColumn("n_equal_sigs", n_eq)
        .withColumn(
            "est_jaccard", F.col("n_equal_sigs") / F.lit(float(N_PERM))
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("new_id", "index_id", "n_equal_sigs", "est_jaccard")
    )


def ingest_with_dedup(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The ingest gate: look up near-dups, append only the CLEAN
    documents to the index, return (accepted_docs, dup_pairs). Batch
    twin of the foreachBatch streaming stage in test_lsh_index.py.

    The gate checks BOTH directions: against the persisted index AND
    within the batch itself (band self-join, keep-lowest-id — the greedy
    min-id survivor rule every dedup family here uses), so two
    near-identical documents arriving in one micro-batch cannot both
    slip past an index that contains neither. Intra-batch pairs report
    with the surviving lower id as ``index_id`` (it IS entering the
    index): survivor selection is resolved AFTER subtracting index dups,
    so a batch-mate that the index itself rejects suppresses nobody —
    ids ascending, a doc is removed only by an ACCEPTED smaller
    near-dup, never by one that was itself rejected.

    new_docs is read several times (lookup + self-check + append) and
    dup ids drive an anti-join — persist new_docs upstream if it is
    expensive to recompute; batches are ingest-sized, not corpus-sized."""
    meta = _read_meta(spark, path)
    idx_dups = neardup_lookup(
        spark, path, new_docs, threshold, text_col, id_col
    )
    b = _band_rows(
        new_docs, meta["bands"], meta["n_buckets"], text_col, id_col
    )
    lo = b.select(
        F.col(id_col).alias("index_id"),
        F.col("sigs").alias("sigs_a"),
        "band",
        "key",
    )
    hi = b.select(
        F.col(id_col).alias("new_id"),
        F.col("sigs").alias("sigs_b"),
        "band",
        "key",
    )
    n_eq = F.size(
        F.filter(
            F.zip_with(F.col("sigs_a"), F.col("sigs_b"), lambda a, x: a == x),
            lambda x: x,
        )
    )
    intra = (
        lo.join(hi, ["band", "key"])
        .where(F.col("index_id") < F.col("new_id"))
        .select("new_id", "index_id", "sigs_a", "sigs_b")
        .distinct()
        .withColumn("n_equal_sigs", n_eq)
        .withColumn(
            "est_jaccard", F.col("n_equal_sigs") / F.lit(float(N_PERM))
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("new_id", "index_id", "n_equal_sigs", "est_jaccard")
    )
    idx_dups = idx_dups.localCheckpoint()
    # Greedy min-id survivor selection, index-aware. Both collects are
    # bounded by ONE ingest batch (near-dup pairs within it + its
    # index-rejected ids), the same driver-bounded discipline as the
    # probe bucket lists above — never corpus-sized.
    idx_rejected = {
        r["new_id"] for r in idx_dups.select("new_id").distinct().collect()
    }
    intra_rows = intra.collect()
    incoming: dict = {}
    for r in intra_rows:
        incoming.setdefault(r["new_id"], []).append(r)
    ids = sorted(
        {r["new_id"] for r in intra_rows}
        | {r["index_id"] for r in intra_rows}
    )
    ok: dict = {}
    kept_rows = []
    for i in ids:
        if i in idx_rejected:
            ok[i] = False  # rejected by the index: suppresses nobody
            continue
        blockers = [r for r in incoming.get(i, []) if ok.get(r["index_id"])]
        ok[i] = not blockers
        # report only pairs whose index_id actually enters the index
        kept_rows.extend(blockers)
    intra_kept = (
        spark.createDataFrame(kept_rows, intra.schema)
        if kept_rows
        else intra.limit(0)
    )
    dups = idx_dups.unionByName(intra_kept).localCheckpoint()
    dup_ids = dups.select(F.col("new_id").alias(id_col)).distinct()
    accepted = new_docs.join(dup_ids, id_col, "left_anti")
    append_lsh_index(accepted, path, text_col, id_col)
    return accepted, dups


def compact_lsh_index(spark: SparkSession, path: str) -> None:
    """Rewrite the bands directory to one file per bucket. Every
    :func:`append_lsh_index` batch adds a small file to each bucket it
    touches; at a high ingest rate the probe's per-partition file count
    (and open-file overhead) grows with batch COUNT, not data size —
    compaction restores one-file-per-bucket without changing a row.
    Run it on the same cadence as any small-file compaction (the
    deltalite OPTIMIZE discipline applied to the index)."""
    bands = f"{path}/bands"
    staged = spark.read.parquet(bands).repartition(1, "bucket")
    tmp = f"{path}/bands__compact"
    staged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    # rename-aside swap: the live dir is moved out FIRST and deleted
    # LAST, so a crash at any point leaves either the old or the new
    # bands dir in place — never neither (on an object store, write to a
    # versioned prefix and flip a pointer instead; the persisted indexes
    # here are path-addressed)
    import shutil

    old = f"{path}/bands__old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(bands, old)
    shutil.move(tmp, bands)
    shutil.rmtree(old)

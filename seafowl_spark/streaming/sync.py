"""CDC sync ingest (A19; reference src/sync/* ~3700 LoC, clade/proto/sync.proto).

Change batches arrive with column roles OLD_PK / NEW_PK / CHANGED / VALUE
(reference sync.proto ColumnRole): an insert has NULL old-PKs, a delete has
NULL new-PKs, a PK-preserving or PK-changing update has both; each CHANGED
boolean column gates whether its VALUE column actually changed (so partial
updates don't clobber unrelated columns).

Pipeline (mirrors SURVEY.md §2.E):

1. enqueue per target table; flush when row / byte / lag / batch-count
   thresholds trip (reference defaults: 3 GiB buffer, 600 s max lag,
   100 syncs/table, 100k rows per squashed sync — config/schema.rs:337-347,
   writer.rs:29),
2. squash the buffered batches into one net change per final PK, resolving
   PK chains in arrival order (reference planner.rs:130-421 builds
   UNION/FULL-JOIN plans for this; the buffer is bounded at squash size, so
   an O(buffer) driver-side pass is the same scale envelope as the
   reference's single-node DataFusion plans),
3. apply via deltalite MERGE: stats-prune target files by the change-set's
   PK range, FULL OUTER JOIN base<->changes on PK, rewrite only pruned
   files (planner.rs:449-548) — this step is distributed Spark,
4. record (origin, sequence) in the commit for exactly-once resume
   (reference SyncCommitInfo, sync/mod.rs:47-88): re-delivered sequences
   are skipped.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pandas as pd

from ..engine.deltalite import DeltaLiteTable

# reference defaults (config/schema.rs:337-347, writer.rs:29)
MAX_IN_MEMORY_BYTES = 3 * 1024**3
MAX_REPLICATION_LAG_S = 600
MAX_SYNCS_PER_TABLE = 100
MAX_ROWS_PER_SYNC = 100_000

ROLE_OLD_PK = "old_pk"
ROLE_NEW_PK = "new_pk"
ROLE_CHANGED = "changed"
ROLE_VALUE = "value"


class SyncError(Exception):
    pass


@dataclass(frozen=True)
class ColumnDescriptor:
    name: str  # column name in the arriving batch
    role: str  # old_pk | new_pk | changed | value
    target: str  # target table column this describes


@dataclass
class SyncSchema:
    """Validated change-batch schema (reference src/sync/schema/mod.rs:13-116)."""

    descriptors: list[ColumnDescriptor]

    def __post_init__(self):
        old_pk = {d.target for d in self.descriptors if d.role == ROLE_OLD_PK}
        new_pk = {d.target for d in self.descriptors if d.role == ROLE_NEW_PK}
        if not new_pk:
            raise SyncError("sync schema needs at least one new_pk column")
        if old_pk != new_pk:
            raise SyncError(
                f"old_pk and new_pk column sets must match: {old_pk} vs {new_pk}"
            )
        values = {d.target for d in self.descriptors if d.role == ROLE_VALUE}
        for d in self.descriptors:
            if d.role == ROLE_CHANGED and d.target not in values:
                raise SyncError(
                    f"changed column {d.name} must point at a value column, got {d.target}"
                )

    @property
    def pk_targets(self) -> list[str]:
        return [d.target for d in self.descriptors if d.role == ROLE_NEW_PK]

    def cols(self, role: str) -> list[ColumnDescriptor]:
        return [d for d in self.descriptors if d.role == role]


@dataclass
class _Buffer:
    batches: list[tuple[SyncSchema, pd.DataFrame]] = field(default_factory=list)
    bytes: int = 0
    first_ts: float = field(default_factory=time.time)
    last_sequence: int | None = None
    origin: str | None = None


# buffers at or above this many rows squash as a Spark job instead of a
# driver-side pandas pass (the pandas path stays for small flushes, where
# job-scheduling overhead would dominate)
SPARK_SQUASH_MIN_ROWS = 100_000


class SyncWriter:
    """Buffers change batches per table URL and merges on flush."""

    def __init__(
        self,
        spark,
        max_bytes: int = MAX_IN_MEMORY_BYTES,
        max_lag_s: float = MAX_REPLICATION_LAG_S,
        max_syncs: int = MAX_SYNCS_PER_TABLE,
        max_rows: int = MAX_ROWS_PER_SYNC,
        spark_squash_min_rows: int = SPARK_SQUASH_MIN_ROWS,
    ):
        self.spark = spark
        self.max_bytes = max_bytes
        self.max_lag_s = max_lag_s
        self.max_syncs = max_syncs
        self.max_rows = max_rows
        self.spark_squash_min_rows = spark_squash_min_rows
        self._buffers: dict[str, _Buffer] = {}

    # --------------------------------------------------------------- ingest

    def enqueue(
        self,
        table_root: str,
        schema: SyncSchema,
        batch: pd.DataFrame,
        origin: str,
        sequence: int,
    ) -> bool:
        """Add a change batch; returns True if the table was flushed."""
        t = DeltaLiteTable(self.spark, table_root)
        last = t.last_app_txn_version(origin)
        if last is not None and sequence <= last:
            return False  # duplicate delivery: exactly-once skip

        buf = self._buffers.setdefault(table_root, _Buffer())
        if buf.origin not in (None, origin):
            # one origin per buffered table window keeps sequence tracking sane
            self.flush(table_root)
            buf = self._buffers.setdefault(table_root, _Buffer())
        buf.origin = origin
        buf.last_sequence = sequence
        buf.batches.append((schema, batch))
        buf.bytes += int(batch.memory_usage(deep=True).sum())

        if (
            buf.bytes >= self.max_bytes
            or len(buf.batches) >= self.max_syncs
            or sum(len(b) for _, b in buf.batches) >= self.max_rows
            or time.time() - buf.first_ts >= self.max_lag_s
        ):
            self.flush(table_root)
            return True
        return False

    # --------------------------------------------------------------- squash

    @staticmethod
    def _squash(batches: list[tuple[SyncSchema, pd.DataFrame]]):
        """Net effect of the buffered changes, in arrival order.

        Returns (upserts: {pk_tuple: {col: value}}, deletes: set[pk_tuple],
        pk_cols, value_cols). PK chains (A->B renames) collapse; the
        reference does this with UNION / FULL OUTER JOIN plans
        (planner.rs:130-286) plus insert/update/delete classification
        (planner.rs:291-421) — semantics identical here.
        """
        state: dict[tuple, dict] = {}
        deletes: set[tuple] = set()
        pk_cols: list[str] = []
        value_cols: list[str] = []

        for schema, pdf in batches:
            pk_cols = schema.pk_targets
            old_cols = {d.target: d.name for d in schema.cols(ROLE_OLD_PK)}
            new_cols = {d.target: d.name for d in schema.cols(ROLE_NEW_PK)}
            val_cols = {d.target: d.name for d in schema.cols(ROLE_VALUE)}
            chg_cols = {d.target: d.name for d in schema.cols(ROLE_CHANGED)}
            for c in val_cols:
                if c not in value_cols:
                    value_cols.append(c)

            for row in pdf.itertuples(index=False):
                r = row._asdict() if hasattr(row, "_asdict") else dict(zip(pdf.columns, row))
                old_pk = tuple(r[old_cols[c]] for c in pk_cols)
                new_pk = tuple(r[new_cols[c]] for c in pk_cols)
                has_old = not any(pd.isna(v) for v in old_pk)
                has_new = not any(pd.isna(v) for v in new_pk)

                if has_old and not has_new:  # delete
                    state.pop(old_pk, None)
                    deletes.add(old_pk)
                    continue
                if not has_new:
                    continue  # malformed row: neither insert nor delete

                # collect changed values for this row
                vals = {}
                for tgt, src in val_cols.items():
                    flag_col = chg_cols.get(tgt)
                    if flag_col is not None and not bool(r[flag_col]):
                        continue  # unchanged: don't clobber
                    vals[tgt] = r[src]

                if has_old and old_pk != new_pk:  # pk-changing update
                    prior = state.pop(old_pk, {})
                    deletes.add(old_pk)
                    prior.update(vals)
                    vals = prior
                elif has_old:
                    prior = state.get(old_pk, {})
                    prior.update(vals)
                    vals = prior
                deletes.discard(new_pk)
                state[new_pk] = vals
        return state, deletes, pk_cols, value_cols

    # ------------------------------------------------------- spark squash

    @staticmethod
    def _has_pk_chains(batches: list[tuple[SyncSchema, pd.DataFrame]]) -> bool:
        """True if any row renames its PK (old != new, both present) —
        chain resolution is inherently sequential, so those buffers take
        the arrival-order pandas path (same envelope as the reference's
        single-node squash plans)."""
        for schema, pdf in batches:
            old_cols = {d.target: d.name for d in schema.cols(ROLE_OLD_PK)}
            new_cols = {d.target: d.name for d in schema.cols(ROLE_NEW_PK)}
            for tgt in schema.pk_targets:
                o, n = pdf[old_cols[tgt]], pdf[new_cols[tgt]]
                if bool((o.notna() & n.notna() & (o != n)).any()):
                    return True
        return False

    def _flush_spark(self, table_root: str, buf: _Buffer) -> None:
        """Distributed last-change-per-PK squash (SURVEY Phase 7 / VERDICT
        r1 flag: the pandas squash is a driver pass; above the row
        threshold this expresses the same semantics as one Spark window +
        aggregate job, then merges).

        Semantics identical to ``_squash`` for chain-free buffers: per
        final PK, the last operation decides delete-vs-upsert, and each
        CHANGED value column takes its most recent post-delete assignment.
        """
        import numpy as np
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from pyspark.sql.window import Window

        t = DeltaLiteTable(self.spark, table_root)
        target_schema = t.schema()
        pk_cols = buf.batches[0][0].pk_targets
        value_cols: list[str] = []
        for schema, _ in buf.batches:
            for d in schema.cols(ROLE_VALUE):
                if d.target not in value_cols and d.target in target_schema.names:
                    value_cols.append(d.target)

        # normalize every batch to one canonical frame driver-side (cheap
        # column relabeling; the data already lives here) with a global
        # arrival sequence — the heavy squash runs in Spark
        frames = []
        seq0 = 0
        for schema, pdf in buf.batches:
            old_cols = {d.target: d.name for d in schema.cols(ROLE_OLD_PK)}
            new_cols = {d.target: d.name for d in schema.cols(ROLE_NEW_PK)}
            val_cols = {d.target: d.name for d in schema.cols(ROLE_VALUE)}
            chg_cols = {d.target: d.name for d in schema.cols(ROLE_CHANGED)}
            out = pd.DataFrame()
            out["__seq"] = np.arange(seq0, seq0 + len(pdf), dtype="int64")
            seq0 += len(pdf)
            # positional (.to_numpy) extraction: batch slices may carry a
            # non-zero-based index and pandas column assignment aligns on it
            for c in pk_cols:
                out[f"__old_{c}"] = pdf[old_cols[c]].to_numpy(dtype=object)
                out[f"__new_{c}"] = pdf[new_cols[c]].to_numpy(dtype=object)
            for c in value_cols:
                if c in val_cols:
                    out[f"__val_{c}"] = pdf[val_cols[c]].to_numpy(dtype=object)
                    flag = chg_cols.get(c)
                    out[f"__set_{c}"] = (
                        pdf[flag].astype(bool).to_numpy() if flag is not None else True
                    )
                else:
                    out[f"__val_{c}"] = None
                    out[f"__set_{c}"] = False
            frames.append(out)
        pdf_all = pd.concat(frames, ignore_index=True)

        fields = [T.StructField("__seq", T.LongType(), False)]
        for c in pk_cols:
            dt = target_schema[c].dataType
            fields += [T.StructField(f"__old_{c}", dt), T.StructField(f"__new_{c}", dt)]
        for c in value_cols:
            fields += [
                T.StructField(f"__val_{c}", target_schema[c].dataType),
                T.StructField(f"__set_{c}", T.BooleanType(), False),
            ]
        df = self.spark.createDataFrame(
            pdf_all.where(pdf_all.notna(), None), T.StructType(fields)
        )

        has_old = None
        has_new = None
        for c in pk_cols:
            o, n = F.col(f"__old_{c}").isNotNull(), F.col(f"__new_{c}").isNotNull()
            has_old = o if has_old is None else (has_old & o)
            has_new = n if has_new is None else (has_new & n)
        df = df.where(has_new | has_old)  # drop malformed rows (neither)
        df = df.select(
            "__seq",
            (has_old & ~has_new).alias("__is_del"),
            *[
                F.coalesce(F.col(f"__new_{c}"), F.col(f"__old_{c}")).alias(c)
                for c in pk_cols
            ],
            *[F.col(f"__val_{c}") for c in value_cols],
            *[F.col(f"__set_{c}") for c in value_cols],
        )
        # one shuffle on the PK; the window and the aggregate reuse it
        w = Window.partitionBy(*pk_cols)
        df = df.withColumn(
            "__last_del",
            F.coalesce(
                F.max(F.when(F.col("__is_del"), F.col("__seq"))).over(w), F.lit(-1)
            ),
        )

        def _post_del(c: str):
            return F.col(f"__set_{c}") & (F.col("__seq") > F.col("__last_del"))

        agg = df.groupBy(*pk_cols).agg(
            F.max_by("__is_del", "__seq").alias("__delete__"),
            *[
                F.max_by(
                    F.col(f"__val_{c}"), F.when(_post_del(c), F.col("__seq"))
                ).alias(c)
                for c in value_cols
            ],
            *[
                F.coalesce(F.max(F.when(_post_del(c), F.lit(True))), F.lit(False)).alias(
                    f"__set_{c}"
                )
                for c in value_cols
            ],
        )
        t.merge(
            agg,
            pk_cols,
            delete_col="__delete__",
            app_txn=(
                {"app_id": buf.origin, "version": buf.last_sequence}
                if buf.origin is not None
                else None
            ),
        )

    # --------------------------------------------------------------- flush

    def flush(self, table_root: str) -> None:
        buf = self._buffers.pop(table_root, None)
        if buf is None or not buf.batches:
            return
        total_rows = sum(len(b) for _, b in buf.batches)
        if total_rows >= self.spark_squash_min_rows and not self._has_pk_chains(
            buf.batches
        ):
            self._flush_spark(table_root, buf)
            return
        upserts, deletes, pk_cols, value_cols = self._squash(buf.batches)

        t = DeltaLiteTable(self.spark, table_root)
        target_schema = t.schema()
        rows = []
        for pk, vals in upserts.items():
            row = dict(zip(pk_cols, pk))
            row.update({c: vals.get(c) for c in value_cols})
            # per-column set masks so partial updates never clobber
            row.update({f"__set_{c}": c in vals for c in value_cols})
            row["__delete__"] = False
            rows.append(row)
        for pk in deletes:
            if pk in upserts:
                continue
            row = dict(zip(pk_cols, pk))
            row.update({c: None for c in value_cols})
            row.update({f"__set_{c}": False for c in value_cols})
            row["__delete__"] = True
            rows.append(row)
        if not rows:
            return

        import pyspark.sql.types as T

        vcols = [c for c in value_cols if c in target_schema.names]
        fields = [target_schema[c] for c in pk_cols + vcols]
        change_schema = T.StructType(
            list(fields)
            + [T.StructField(f"__set_{c}", T.BooleanType(), False) for c in vcols]
            + [T.StructField("__delete__", T.BooleanType(), False)]
        )
        changes = self.spark.createDataFrame(
            pd.DataFrame(rows), schema=change_schema
        )
        t.merge(
            changes,
            pk_cols,
            delete_col="__delete__",
            app_txn=(
                {"app_id": buf.origin, "version": buf.last_sequence}
                if buf.origin is not None
                else None
            ),
        )

    def flush_all(self) -> None:
        for root in list(self._buffers):
            self.flush(root)


# --------------------------------------------------------------------------
# Structured Streaming bridge
# --------------------------------------------------------------------------

def foreach_batch_merge(
    table_root: str,
    pk_cols: list[str],
    delete_col: str | None = None,
    order_col: str | None = None,
):
    """`writeStream.foreachBatch` sink merging each micro-batch into a
    deltalite table — the Structured Streaming face of the sync path
    (micro-batch buffering is what the reference's enqueue/flush loop does
    by hand). batch_id doubles as the idempotence txn version.

    The batch is squashed to one row per PK before merging (last-wins by
    ``order_col`` — e.g. a Kafka offset / CDC LSN — or an arbitrary row via
    dropDuplicates when no order column exists): a micro-batch carrying two
    changes for the same PK would otherwise fan out the merge's FULL OUTER
    JOIN and write duplicate rows.
    """

    def apply(batch_df, batch_id: int):
        t = DeltaLiteTable(batch_df.sparkSession, table_root)
        last = t.last_app_txn_version("stream")
        if last is not None and batch_id <= last:
            return
        if order_col is not None:
            from pyspark.sql import functions as F
            from pyspark.sql.window import Window

            w = Window.partitionBy(*pk_cols).orderBy(F.col(order_col).desc())
            batch_df = (
                batch_df.withColumn("__sfs_rn", F.row_number().over(w))
                .where(F.col("__sfs_rn") == 1)
                .drop("__sfs_rn")
            )
        else:
            batch_df = batch_df.dropDuplicates(pk_cols)
        # materialize the squashed batch once (r14, guide §5): merge()
        # runs two actions over its change set (the combined bounds/
        # null-PK aggregate, then the full-outer join + write), and each
        # would re-execute this dedup window — including its shuffle —
        # from the source. Micro-batches are bounded by construction, so
        # the localCheckpoint is batch-sized, never corpus-sized.
        batch_df = batch_df.localCheckpoint()
        t.merge(
            batch_df,
            pk_cols,
            delete_col=delete_col,
            app_txn={"app_id": "stream", "version": batch_id},
        )

    return apply

"""Structured Streaming sinks beyond the deltalite merge bridge
(streaming/sync.py foreach_batch_merge)."""

from __future__ import annotations

import glob
import json
import os


def foreach_batch_iceberg(table_dir: str):
    """``writeStream.foreachBatch`` sink committing each micro-batch as one
    Iceberg v2 append snapshot.

    Exactly-once across checkpoint recovery: the batch id is recorded in
    the snapshot summary (``stream-batch-id``), and a replayed micro-batch
    with an id at or below the table's high-water mark is skipped — the
    same idempotence contract foreach_batch_merge keeps via deltalite's
    app_txn versions. At scale each micro-batch is one metadata commit;
    the data files are written by Spark's parallel writers.
    """

    def apply(batch_df, batch_id: int):
        from ..sources.iceberg import write_iceberg_table

        metas = sorted(
            glob.glob(os.path.join(table_dir, "metadata", "v*.metadata.json")),
            key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
        )
        if metas:
            with open(metas[-1]) as f:
                meta = json.load(f)
            last = max(
                (
                    int(s.get("summary", {}).get("stream-batch-id", -1))
                    for s in meta.get("snapshots", [])
                ),
                default=-1,
            )
            if batch_id <= last:
                return
        write_iceberg_table(
            batch_df.sparkSession,
            batch_df,
            table_dir,
            summary_extra={"stream-batch-id": str(batch_id)},
        )

    return apply

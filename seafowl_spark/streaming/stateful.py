"""Custom stateful streaming operators via applyInPandasWithState.

The batch engine sessionizes with windows (queries/relational.q_sessionize);
for unbounded streams the state (open session per user) must live across
micro-batches — this is Spark's arbitrary-stateful-processing API, the
Structured Streaming analogue of the reference's in-memory sync buffers.

Scale: state is keyed by user and stored in the state store (RocksDB-ready
via spark.sql.streaming.stateStore.providerClass); each micro-batch
shuffles only that batch's events to their key's partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "start_sec double, last_sec double"
)
_STATE_SCHEMA = "session_id bigint, n_events bigint, start_sec double, last_sec double"


def sessionize_stream(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Gap-based sessionization over a stream of (user_id, ts_sec).

    Emits, per user per micro-batch, the state of their current session
    (update mode). Session ids are per-user 1-based counters that survive
    micro-batch boundaries via the state store.
    """

    def update_fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            sid, n, start, last = state.get
        else:
            sid, n, start, last = 0, 0, None, None
        for pdf in pdfs:
            for ts in sorted(float(t) for t in pdf["ts_sec"]):
                if last is None or ts - last > gap_seconds:
                    sid += 1
                    n = 0
                    start = ts
                n += 1
                last = ts
        state.update((sid, n, start, last))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_id": sid,
                    "n_events": n,
                    "start_sec": start,
                    "last_sec": last,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_fn,
        SESSION_OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

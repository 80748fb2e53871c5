"""Structured Streaming event-time operators (engine-side surface beyond the
batch-only reference — SURVEY.md §2.7 streaming row).

windowed_event_counts   watermark + tumbling event-time window aggregation:
                        the late-data-correct streaming twin of the batch
                        events_grid_agg/pivot queries
sessionize_stream       custom stateful sessionization with
                        applyInPandasWithState (timeout-closed sessions,
                        1800 s gap — the same semantics as the batch
                        events_sessionization query, so the batch result is
                        the oracle for the availableNow run in tests)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800


def windowed_event_counts(events_stream: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time windows with a watermark: counts + value sum per
    (window, event_type). Late rows beyond the watermark are dropped, state
    for closed windows is evicted — bounded state at unbounded input."""
    # event-time columns must be TIMESTAMP (the testdata parquet stores NTZ)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_sec", T.LongType()),
    ]
)


def _session_fn(key, pdfs, state: GroupState):
    """Per-user running sessionization: a new session starts when the gap to
    the previous event exceeds SESSION_GAP_S (same rule as the batch
    events_sessionization query / DuckDB oracle)."""
    (user_id,) = key
    if state.exists:
        n_sessions, n_events, last_sec = state.get
    else:
        n_sessions, n_events, last_sec = 0, 0, None
    secs: list[int] = []
    for pdf in pdfs:
        secs.extend(int(v) for v in pdf["sec"])
    secs.sort()
    for s in secs:
        if last_sec is None or s - last_sec > SESSION_GAP_S:
            n_sessions += 1
        n_events += 1
        last_sec = s
    state.update((n_sessions, n_events, last_sec))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cumulative
    (n_sessions, n_events) per user in update mode. With an availableNow
    trigger over a bounded source the final per-user rows equal the batch
    sessionization query (asserted in tests/test_streaming.py)."""
    prepared = events_stream.select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_key_counts(
    events_stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(window, key) event counts with a watermark — stage 1 of the
    streaming trending-top-k pattern. Works identically on batch frames
    (tumbling windows are plain expressions there), which is both the test
    oracle and the DuckDB-hash-checked driver path.

    Output key is ``window_start`` as epoch seconds (long): tumbling
    windows align to the 1970 epoch, so `FLOOR(epoch(ts)/W)*W` reproduces
    it exactly in any engine."""
    s = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if s.isStreaming:
        s = s.withWatermark(ts_col, watermark)
    return (
        s.groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("window_start"),
            F.col(key_col).alias("key"),
            "cnt",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Stage 2: rank keys inside each closed window (count desc, key asc).
    Streaming append mode cannot rank an open window (rows would need
    retraction), so the production shape is: stage 1 runs as the streaming
    query, stage 2 runs over the materialized counts table per trigger
    (foreachBatch) or downstream — the same split as the tombstone
    consumer contract. Batch-equality is pinned in tests."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )

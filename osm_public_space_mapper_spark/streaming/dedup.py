"""Streaming deduplication of image rows (engine-side extra surface; the
reference is batch-only, SURVEY.md §2.7 — but a 10^12-image ingest IS a
stream, and duplicate uploads are the norm at that scale).

Two built-in-operator paths, no custom state:

exact_stream_dedup      watermarked dropDuplicates on a content key
                        (phash + dimensions) — Spark keeps one state row per
                        key seen within the watermark horizon; late
                        duplicates beyond the horizon age out of state,
                        bounding memory at 100 TB/day ingest rates
windowed_unique_counts  per-window distinct-image counts via two-level agg
                        (approx_count_distinct per window — mergeable sketch,
                        map-side partial)

State sizing: the watermark bounds state to (rows/sec x horizon) keys, and
the key is 8 B phash + 8 B dims — a 1-hour horizon at 1 M rows/s is ~58 GB
across the cluster, shuffle-partitioned by key; per-executor share scales
down with cluster size (the two-cluster-size criterion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_stream_dedup(
    images_stream: DataFrame,
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate images by content key within the watermark horizon.

    Uses dropDuplicatesWithinWatermark when available (Spark ≥ 3.5: state
    for a key is dropped once the watermark passes its FIRST sighting —
    the right semantics for dedup, where only proximity matters), falling
    back to watermarked dropDuplicates."""
    keyed = images_stream.withColumn(
        "content_key",
        F.xxhash64(F.col("phash"), F.col("w"), F.col("h"), F.col("fmt")),
    ).withWatermark(event_time_col, watermark)
    if hasattr(keyed, "dropDuplicatesWithinWatermark"):
        return keyed.dropDuplicatesWithinWatermark(["content_key"])
    return keyed.dropDuplicates(["content_key", event_time_col])


def windowed_unique_counts(
    images_stream: DataFrame,
    event_time_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window, n_rows, n_unique) per event-time window — duplicate-rate
    monitoring for the ingest pipeline. approx_count_distinct is a mergeable
    HLL sketch: partial per shuffle partition, exact-memory-bounded."""
    keyed = images_stream.withColumn(
        "content_key",
        F.xxhash64(F.col("phash"), F.col("w"), F.col("h"), F.col("fmt")),
    ).withWatermark(event_time_col, watermark)
    return (
        keyed.groupBy(F.window(F.col(event_time_col), window).alias("win"))
        .agg(
            F.count("*").alias("n_rows"),
            F.approx_count_distinct("content_key").alias("n_unique_approx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_rows",
            "n_unique_approx",
        )
    )

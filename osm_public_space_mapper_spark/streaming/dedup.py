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
    the right semantics for dedup, where only proximity matters). On older
    Spark it falls back to watermarked dropDuplicates on the content key
    alone — still a within-horizon dedup (state ages out with the
    watermark), but a duplicate arriving after its key's state expired is
    kept; the semantic difference is logged loudly rather than silently
    downgraded."""
    keyed = images_stream.withColumn(
        "content_key",
        F.xxhash64(F.col("phash"), F.col("w"), F.col("h"), F.col("fmt")),
    ).withWatermark(event_time_col, watermark)
    if hasattr(keyed, "dropDuplicatesWithinWatermark"):
        return keyed.dropDuplicatesWithinWatermark(["content_key"])
    import warnings

    warnings.warn(
        "Spark < 3.5: dropDuplicatesWithinWatermark unavailable — falling "
        "back to watermarked dropDuplicates(content_key). Duplicates whose "
        "key state already aged out of the watermark horizon will NOT be "
        "dropped.",
        RuntimeWarning,
        stacklevel=2,
    )
    return keyed.dropDuplicates(["content_key"])


def _popcount64(x):
    """Vectorized 64-bit popcount (SWAR) — numpy<2 has no bitwise_count."""
    import numpy as np

    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_stream_tombstones(
    docs_stream: DataFrame,
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    bits: int = 64,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket_state: int = 5000,
) -> DataFrame:
    """Streaming NEAR-duplicate detection: emit a tombstone row
    (doc_id, dup_of, hamming, band) for every document whose SimHash is
    within `max_hamming` of an EARLIER document inside the watermark
    horizon — the hamming-tolerant streaming twin of the batch
    `simhash_hamming_pairs` (operators/dedup.py), sharing its fingerprint
    and band-key expressions, so the batch query is the oracle for an
    availableNow run (tests/test_streaming.py).

    Design (exact, not band-approximate): fingerprints explode to
    `n_bands` 16-bit band keys; one applyInPandasWithState operator keyed
    by (band, key) holds the bucket's recent (doc_id, simhash, sec) and
    VERIFIES hamming against each arrival before tombstoning — a plain
    dropDuplicatesWithinWatermark on band keys would over-drop band
    collisions, which at 10^9-rows-per-horizon rates is every document.
    Pigeonhole (max_hamming < n_bands) guarantees a true near-dup pair
    shares ≥1 band, so no pair is missed; a pair matching in several bands
    emits duplicate tombstones — consumers take `.dropDuplicates(["doc_id"])`
    and anti-join the ingest (the tombstone stream is the scalable contract:
    survivors = ingest ∖ tombstones, exactly how a training pipeline
    consumes it).

    State bound: per (band, key) bucket, entries younger than the watermark
    horizon, hard-capped at `max_bucket_state` (oldest evicted first — a
    cap eviction can only MISS a dup whose twin was pushed out by
    max_bucket_state newer docs in the same 16-bit bucket, and is logged in
    the emitted rows' `band` multiplicity). Uniform fingerprints give
    horizon_rows / 65536 expected entries per bucket per band; docs are
    dropped from state, never from the data path."""
    if max_hamming >= n_bands:
        raise ValueError("exactness requires max_hamming < n_bands (pigeonhole)")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import simhash_band_keys_col, simhash_frame

    sh = (
        simhash_frame(docs_stream, bits, keep=["doc_id", event_time_col])
        .withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
        .withWatermark(event_time_col, watermark)
    )
    bands = sh.select(
        "doc_id",
        "simhash",
        F.col(event_time_col),
        F.unix_timestamp(F.col(event_time_col)).alias("sec"),
        F.explode(simhash_band_keys_col(bits, n_bands)).alias("bk"),
    ).select(
        "doc_id", "simhash", F.col(event_time_col), "sec",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("hamming", T.IntegerType()),
            T.StructField("band", T.IntegerType()),
        ]
    )
    # state as packed int64 little-endian blobs: Arrow-friendly, no
    # array-of-struct state encoding edge cases
    state_schema = T.StructType(
        [
            T.StructField("ids", T.BinaryType()),
            T.StructField("sims", T.BinaryType()),
            T.StructField("secs", T.BinaryType()),
        ]
    )
    horizon_s = _duration_to_seconds(watermark)
    mh = int(max_hamming)
    cap = int(max_bucket_state)

    def _fn(key, pdfs, state: GroupState):
        band_id = int(key[0])
        if state.exists:
            ids_b, sims_b, secs_b = state.get
            st_ids = np.frombuffer(ids_b, dtype=np.int64).copy()
            st_sims = np.frombuffer(sims_b, dtype=np.int64).copy()
            st_secs = np.frombuffer(secs_b, dtype=np.int64).copy()
        else:
            st_ids = np.empty(0, dtype=np.int64)
            st_sims = np.empty(0, dtype=np.int64)
            st_secs = np.empty(0, dtype=np.int64)
        rows = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        out_doc, out_dup, out_ham = [], [], []
        if len(rows):
            rows = rows.sort_values(["sec", "doc_id"], kind="mergesort")
            for doc_id, sim, sec in zip(
                rows["doc_id"].astype(np.int64),
                rows["simhash"].astype(np.int64),
                rows["sec"].astype(np.int64),
            ):
                live = st_secs >= sec - horizon_s
                if live.any():
                    h = _popcount64(np.bitwise_xor(st_sims[live], np.int64(sim)))
                    hit = h <= mh
                    if hit.any():
                        # earliest surviving near-dup is the canonical twin
                        cand_ids = st_ids[live][hit]
                        cand_h = h[hit]
                        j = int(np.argmin(st_secs[live][hit]))
                        out_doc.append(int(doc_id))
                        out_dup.append(int(cand_ids[j]))
                        out_ham.append(int(cand_h[j]))
                st_ids = np.append(st_ids, np.int64(doc_id))
                st_sims = np.append(st_sims, np.int64(sim))
                st_secs = np.append(st_secs, np.int64(sec))
        # evict: watermark horizon first, then the hard cap (oldest out)
        wm_s = state.getCurrentWatermarkMs() // 1000
        keep = st_secs >= wm_s - horizon_s
        st_ids, st_sims, st_secs = st_ids[keep], st_sims[keep], st_secs[keep]
        if len(st_ids) > cap:
            order = np.argsort(st_secs, kind="mergesort")[-cap:]
            st_ids, st_sims, st_secs = st_ids[order], st_sims[order], st_secs[order]
        state.update((st_ids.tobytes(), st_sims.tobytes(), st_secs.tobytes()))
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "dup_of": out_dup,
                    "hamming": out_ham,
                    "band": [band_id] * len(out_doc),
                }
            )

    return bands.groupBy("band", "key").applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _duration_to_seconds(s: str) -> int:
    """'10 minutes' / '30 seconds' / '2 hours' → seconds (the subset of
    Spark's CalendarInterval grammar the streaming ops here use)."""
    n, unit = s.strip().split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit.lower()]
    return int(float(n) * mult)


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

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
hamming_stream_tombstones  generic NEAR-dup tombstones over any 64-bit
                        fingerprint column: band-keyed verified state
                        (r04); fronts `simhash_stream_tombstones` (text)
                        and `phash_stream_tombstones` (image DCT pHash)

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
    Spark it falls back to dropDuplicates on (content_key, horizon-sized
    tumbling window of the event time): Spark only evicts streaming-dedup
    state when the key subset carries an event-time column — dedup on the
    content key alone would grow state forever — so the window both bounds
    state (evicted as the watermark passes each window) and bounds the
    semantics (duplicates are only dropped within the same tumbling window;
    a duplicate landing just across a window edge is kept). The semantic
    difference from the ≥3.5 path is logged loudly rather than silently
    downgraded."""
    keyed = images_stream.withColumn(
        "content_key",
        F.xxhash64(F.col("phash"), F.col("w"), F.col("h"), F.col("fmt")),
    )
    if hasattr(keyed, "dropDuplicatesWithinWatermark"):
        return keyed.withWatermark(
            event_time_col, watermark
        ).dropDuplicatesWithinWatermark(["content_key"])
    import warnings

    warnings.warn(
        "Spark < 3.5: dropDuplicatesWithinWatermark unavailable — falling "
        "back to dropDuplicates on (content_key, tumbling event-time "
        "window). Dedup is within-window only: a duplicate arriving in a "
        "later window than its twin is NOT dropped. State is evicted as "
        "the watermark passes each window.",
        RuntimeWarning,
        stacklevel=2,
    )
    # the watermark rides the WINDOW column (a stream allows only one
    # event-time column, and it must be in the dedup subset for Spark to
    # evict state); the raw event-time column passes through untouched
    return (
        keyed.withColumn("dedup_win", F.window(F.col(event_time_col), watermark))
        .withWatermark("dedup_win", watermark)
        .dropDuplicates(["content_key", "dedup_win"])
        .drop("dedup_win")
    )


def _popcount64(x):
    """Vectorized 64-bit popcount (SWAR) — numpy<2 has no bitwise_count."""
    import numpy as np

    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming_stream_tombstones(
    fingerprinted: DataFrame,
    id_col: str,
    fp_col: str,
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket_state: int = 5000,
) -> DataFrame:
    """Generic streaming NEAR-duplicate tombstones over ANY 64-bit
    fingerprint column (text SimHash, image DCT pHash, ...): emit
    (id, dup_of, hamming, band) for every row whose fingerprint is within
    `max_hamming` of an EARLIER row inside the watermark horizon.

    Design (exact, not band-approximate): fingerprints explode to `n_bands`
    16-bit band keys; ONE applyInPandasWithState operator keyed by
    (band, key) holds the bucket's recent (id, fingerprint, sec) and
    VERIFIES hamming against each arrival before tombstoning — a plain
    dropDuplicatesWithinWatermark on band keys would over-drop band
    collisions, which at 10^9-rows-per-horizon rates is every row.
    Pigeonhole (max_hamming < n_bands) guarantees a true near-dup pair
    shares ≥1 band, so no pair is missed; a pair matching in several bands
    emits duplicate tombstones — consumers take `.dropDuplicates([id])`
    and anti-join the ingest (the tombstone stream is the scalable
    contract: survivors = ingest ∖ tombstones).

    State bound: per (band, key) bucket, entries younger than the watermark
    horizon, hard-capped at `max_bucket_state` (oldest evicted first — a
    cap eviction can only MISS a dup whose twin was pushed out by
    max_bucket_state newer rows in the same 16-bit bucket). Uniform
    fingerprints give horizon_rows / 65536 expected entries per bucket per
    band; rows are dropped from state, never from the data path.
    Fingerprints/times are packed int64 blobs (vectorized SWAR hamming);
    ids (long or string) are stored as a pickled list, touched only on a
    verified hit.

    Out-of-order arrival: rows are processed in event-time order WITHIN a
    micro-batch, but a row arriving in a later batch than a younger-event-
    time row checks against everything already in state — the liveness test
    is one-sided (state younger than `sec − horizon`), so a LATE-arriving
    original can be tombstoned as a duplicate of its later-event-time twin
    that arrived first. The survivor set (ingest ∖ tombstones) is still
    exactly one row per near-dup cluster; which end survives under late
    arrival is arrival-order-first, not event-time-first."""
    if max_hamming >= n_bands:
        raise ValueError("exactness requires max_hamming < n_bands (pigeonhole)")
    import pickle

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import simhash_band_keys_col

    id_type = fingerprinted.schema[id_col].dataType
    wm = (
        fingerprinted.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
        .withWatermark(event_time_col, watermark)
    )
    bands = wm.select(
        F.col(id_col).alias("rid"),
        F.col(fp_col).alias("fp"),
        F.col(event_time_col),
        F.unix_timestamp(F.col(event_time_col)).alias("sec"),
        F.explode(simhash_band_keys_col(64, n_bands, fp_col)).alias("bk"),
    ).select(
        "rid", "fp", F.col(event_time_col), "sec",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("dup_of", id_type),
            T.StructField("hamming", T.IntegerType()),
            T.StructField("band", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.BinaryType()),
            T.StructField("fps", T.BinaryType()),
            T.StructField("secs", T.BinaryType()),
        ]
    )
    horizon_s = _duration_to_seconds(watermark)
    mh = int(max_hamming)
    cap = int(max_bucket_state)

    def _fn(key, pdfs, state: GroupState):
        band_id = int(key[0])
        if state.exists:
            ids_b, fps_b, secs_b = state.get
            st_ids = pickle.loads(ids_b)
            st_fps0 = np.frombuffer(fps_b, dtype=np.int64)
            st_secs0 = np.frombuffer(secs_b, dtype=np.int64)
        else:
            st_ids = []
            st_fps0 = np.empty(0, dtype=np.int64)
            st_secs0 = np.empty(0, dtype=np.int64)
        batches = list(pdfs)  # materialize: the iterator object is always truthy
        rows = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
        # one growth buffer per micro-batch (the r04 per-row np.append was
        # O(k²) copying per batch); new rows fill in place behind `filled`
        n0, nb = len(st_fps0), len(rows)
        st_fps = np.empty(n0 + nb, dtype=np.int64)
        st_secs = np.empty(n0 + nb, dtype=np.int64)
        st_fps[:n0] = st_fps0
        st_secs[:n0] = st_secs0
        filled = n0
        out_id, out_dup, out_ham = [], [], []
        if nb:
            rows = rows.sort_values(["sec", "rid"], kind="mergesort")
            for rid, fp, sec in zip(
                rows["rid"], rows["fp"].astype(np.int64), rows["sec"].astype(np.int64)
            ):
                cur_fps, cur_secs = st_fps[:filled], st_secs[:filled]
                live = cur_secs >= sec - horizon_s
                if live.any():
                    h = _popcount64(np.bitwise_xor(cur_fps[live], np.int64(fp)))
                    hit = h <= mh
                    if hit.any():
                        # earliest surviving near-dup is the canonical twin
                        live_idx = np.nonzero(live)[0][hit]
                        j = int(np.argmin(cur_secs[live][hit]))
                        out_id.append(rid)
                        out_dup.append(st_ids[int(live_idx[j])])
                        out_ham.append(int(h[hit][j]))
                st_ids.append(rid)
                st_fps[filled] = fp
                st_secs[filled] = sec
                filled += 1
        st_fps, st_secs = st_fps[:filled], st_secs[:filled]
        # evict: watermark horizon first, then the hard cap (oldest out)
        wm_s = state.getCurrentWatermarkMs() // 1000
        keep = st_secs >= wm_s - horizon_s
        if not keep.all():
            st_ids = [i for i, k in zip(st_ids, keep) if k]
            st_fps, st_secs = st_fps[keep], st_secs[keep]
        if len(st_ids) > cap:
            order = np.argsort(st_secs, kind="mergesort")[-cap:]
            st_ids = [st_ids[int(i)] for i in order]
            st_fps, st_secs = st_fps[order], st_secs[order]
        state.update((pickle.dumps(st_ids), st_fps.tobytes(), st_secs.tobytes()))
        if out_id:
            yield pd.DataFrame(
                {
                    id_col: out_id,
                    "dup_of": out_dup,
                    "hamming": out_ham,
                    "band": [band_id] * len(out_id),
                }
            )

    return bands.groupBy("band", "key").applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def simhash_stream_tombstones(
    docs_stream: DataFrame,
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    bits: int = 64,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket_state: int = 5000,
) -> DataFrame:
    """Text front of `hamming_stream_tombstones`: SimHash fingerprints
    computed in-stream with the same expressions as the batch
    `simhash_hamming_pairs`, so the batch query is the oracle for an
    availableNow run (tests/test_streaming.py)."""
    from ..operators.dedup import simhash_frame

    sh = simhash_frame(docs_stream, bits, keep=["doc_id", event_time_col])
    return hamming_stream_tombstones(
        sh, "doc_id", "simhash", event_time_col, watermark,
        n_bands=n_bands, max_hamming=max_hamming, max_bucket_state=max_bucket_state,
    )


def phash_stream_tombstones(
    images_stream: DataFrame,
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket_state: int = 5000,
) -> DataFrame:
    """Image front of `hamming_stream_tombstones`: decode → DCT pHash in
    one Arrow pass on the stream (operators/imageops.image_phash64), then
    the same band-keyed verified state. This is the 10^12-image ingest
    near-dup story end to end: perceptually-duplicate uploads tombstoned
    within the watermark horizon; batch `image_phash_dups` is the oracle."""
    from ..operators.imageops import image_phash64

    ph = image_phash64(images_stream, keep=[event_time_col])
    return hamming_stream_tombstones(
        ph, "image_id", "phash64", event_time_col, watermark,
        n_bands=n_bands, max_hamming=max_hamming, max_bucket_state=max_bucket_state,
    )


def _duration_to_seconds(s: str) -> int:
    """Watermark duration string → seconds, accepting the forms Spark's own
    interval parser does for the units the streaming ops use: full names,
    short names ('1 min', '30 secs', '2 hrs'), compound values
    ('1 hour 30 minutes'), and an optional 'interval' prefix. Called at
    operator-construction time, so an unsupported string fails the plan
    up front with a clear message, not inside a running task."""
    units = {
        "s": 1, "sec": 1, "second": 1,
        "m": 60, "min": 60, "minute": 60,
        "h": 3600, "hr": 3600, "hour": 3600,
        "d": 86400, "day": 86400,
        "w": 604800, "week": 604800,
    }
    toks = s.strip().lower().split()
    if toks and toks[0] == "interval":
        toks = toks[1:]
    if not toks or len(toks) % 2:
        raise ValueError(f"cannot parse duration {s!r}: expected '<n> <unit>' pairs")
    total = 0.0
    for num, unit in zip(toks[::2], toks[1::2]):
        base = unit.rstrip("s") or unit  # 'mins'→'min', 's'→'s'
        if base not in units:
            raise ValueError(f"unsupported duration unit {unit!r} in {s!r}")
        try:
            total += float(num) * units[base]
        except ValueError:
            raise ValueError(f"cannot parse duration value {num!r} in {s!r}") from None
    return int(total)


def stream_survivors(ingest: DataFrame, tombstones: DataFrame, id_col: str) -> DataFrame:
    """survivors = ingest ∖ tombstones — the documented consumer contract of
    `hamming_stream_tombstones` as one call: a pair matching in several
    bands emits several tombstones, so tombstones first dedup to one row
    per id, then anti-join the ingest on `id_col`.

    Works on batch frames (a replayed/availableNow tombstone run, or the
    materialized tombstone table a long-running job maintains — the
    scalable pattern: anti-join the tombstone TABLE inside foreachBatch or
    a downstream batch job, so no stream-stream join state is needed).
    tests/test_streaming.py pins batch equality against the composed
    dedup_survivors contract."""
    return ingest.join(
        tombstones.select(id_col).dropDuplicates([id_col]), id_col, "left_anti"
    )


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

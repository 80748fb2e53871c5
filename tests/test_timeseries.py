"""asof_join / concat_chunk_offsets on handcrafted inputs: inclusive-tie
and tolerance semantics vs pandas merge_asof, and prefix-sum correctness +
partitioning-invariance for the chunk packer."""

import datetime as dt
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_public_space_mapper_spark.operators.timeseries import (
    asof_join,
    concat_chunk_offsets,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_matches_pandas_merge_asof(spark):
    left_rows = [
        (1, 10, _ts("2026-01-01T10:00:00")),
        (2, 10, _ts("2026-01-01T10:05:00")),
        (3, 10, _ts("2026-01-01T09:00:00")),  # before any right row → NULL
        (4, 20, _ts("2026-01-01T12:00:00")),  # key with no right rows at all
        (5, 30, _ts("2026-01-01T10:03:00")),  # exact tie with right ts → inclusive
    ]
    right_rows = [
        (10, _ts("2026-01-01T09:30:00"), 1.5),
        (10, _ts("2026-01-01T10:02:00"), 2.5),
        (30, _ts("2026-01-01T10:03:00"), 9.0),
    ]
    left = spark.createDataFrame(left_rows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(right_rows, "user_id long, ts timestamp, value double")

    got = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof_join(left, right, by="user_id", ts="ts").collect()
    }
    assert len(got) == 5  # every left row survives

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["user_id", "ts", "value"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    for _, row in want.iterrows():
        g_val, _ = got[row.event_id]
        if pd.isna(row.value):
            assert g_val is None, row.event_id
        else:
            assert g_val == row.value, row.event_id

    # inclusive tie: event 5 sees the right row at its own timestamp
    assert got[5] == (9.0, _ts("2026-01-01T10:03:00"))


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T10:00:00")), (2, 10, _ts("2026-01-01T11:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2026-01-01T09:59:00"), 7.0)], "user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(
            left, right, by="user_id", ts="ts", tolerance_seconds=300
        ).collect()
    }
    assert got[1] == 7.0      # 60 s stale — within tolerance
    assert got[2] is None     # 61 min stale — nulled


def test_concat_chunk_offsets_prefix_sum(spark):
    docs = [
        (1, "a b c"),          # 3 tokens  [0, 3)
        (2, ""),               # 0 tokens  [3, 3)
        (3, "d e f g"),        # 4 tokens  [3, 7)
        (4, "h"),              # 1 token   [7, 8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.tok_start, r.tok_end, r.chunk_first, r.chunk_last)
        for r in concat_chunk_offsets(df, chunk_len=4, num_partitions=3).collect()
    }
    assert got[1] == (3, 0, 3, 0, 0)
    assert got[2] == (0, 3, 3, 0, 0)
    assert got[3] == (4, 3, 7, 0, 1)  # straddles the chunk boundary at 4
    assert got[4] == (1, 7, 8, 1, 1)


def test_concat_chunk_offsets_partitioning_invariant(spark):
    rows = [(i, "w " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in concat_chunk_offsets(df, 128, num_partitions=1).collect())
    b = sorted(tuple(r) for r in concat_chunk_offsets(df.repartition(13), 128, num_partitions=8).collect())
    assert a == b
    # contiguity: intervals tile [0, total) in doc order with no gaps
    ordered = sorted(a, key=lambda t: t[0])
    pos = 0
    for _, n, s, e, _, _ in ordered:
        assert s == pos and e == s + n
        pos = e


# ---------------------------------------------------------------------------
# range_join / interval_overlap_join / time_bucket_rollup
# ---------------------------------------------------------------------------

import numpy as np

from osm_public_space_mapper_spark.operators.timeseries import (
    interval_overlap_join,
    range_join,
    time_bucket_rollup,
)

_BASE = dt.datetime(2026, 1, 1)


def _rand_points(rng, n, n_keys, span_s):
    return [
        (int(i), int(rng.integers(n_keys)), _BASE + dt.timedelta(seconds=int(rng.integers(span_s))))
        for i in range(n)
    ]


def _rand_intervals(rng, n, n_keys, span_s, max_len_s):
    out = []
    for i in range(n):
        s = int(rng.integers(span_s))
        ln = int(rng.integers(max_len_s))  # 0-length intervals allowed (dropped)
        out.append(
            (
                1000 + int(i),
                int(rng.integers(n_keys)),
                _BASE + dt.timedelta(seconds=s),
                _BASE + dt.timedelta(seconds=s + ln),
            )
        )
    return out


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    pts = _rand_points(rng, 120, 5, 86_400)
    ivs = _rand_intervals(rng, 60, 5, 86_400, 7_200)
    # boundary semantics: ts == start included, ts == end excluded
    pts += [(900, 9, _ts("2026-01-02T00:00:00")), (901, 9, _ts("2026-01-02T01:00:00"))]
    ivs += [(1900, 9, _ts("2026-01-02T00:00:00"), _ts("2026-01-02T01:00:00"))]

    points = spark.createDataFrame(pts, "event_id long, user_id long, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "iv_id long, user_id long, start timestamp, end timestamp"
    )
    got = sorted(
        (r.event_id, r.iv_id)
        for r in range_join(
            points, intervals, by=("user_id",), bucket_seconds=600
        ).collect()
    )
    want = sorted(
        (pe, ie)
        for (pe, pk, pt) in pts
        for (ie, ik, s, e) in ivs
        if pk == ik and s <= pt < e
    )
    assert got == want  # exact pair multiset: no misses, no duplicates
    assert (900, 1900) in got and (901, 1900) not in got


def test_range_join_left_keeps_misses(spark):
    points = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01T10:00:00")),  # inside
            (2, 10, _ts("2026-01-01T12:00:00")),  # same key, outside window
            (3, 20, _ts("2026-01-01T10:00:00")),  # key with no intervals
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, 10, _ts("2026-01-01T09:30:00"), _ts("2026-01-01T10:30:00"))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    rows = {
        r.event_id: r.iv_id
        for r in range_join(
            points, intervals, by=("user_id",), bucket_seconds=600, how="left"
        ).collect()
    }
    assert rows == {1: 100, 2: None, 3: None}


def test_range_join_plan_is_equi_join(spark):
    """The whole point: the plan must be a shuffled/broadcast HASH equi-join,
    never BroadcastNestedLoopJoin / CartesianProduct."""
    points = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(100, 10, _ts("2026-01-01T09:30:00"), _ts("2026-01-01T10:30:00"))],
        "iv_id long, user_id long, start timestamp, end timestamp",
    )
    for how in ("inner", "left"):
        plan = range_join(
            points, intervals, by=("user_id",), bucket_seconds=600, how=how
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_interval_overlap_join_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    a_rows = _rand_intervals(rng, 50, 4, 86_400, 10_800)
    b_rows = [
        (2000 + i - 1000, k, s, e) for (i, k, s, e) in _rand_intervals(rng, 50, 4, 86_400, 10_800)
    ]
    # touching intervals do NOT overlap (half-open)
    a_rows += [(1990, 8, _ts("2026-01-02T00:00:00"), _ts("2026-01-02T01:00:00"))]
    b_rows += [(2990, 8, _ts("2026-01-02T01:00:00"), _ts("2026-01-02T02:00:00"))]
    a = spark.createDataFrame(a_rows, "a_id long, user_id long, start timestamp, end timestamp")
    b = spark.createDataFrame(b_rows, "b_id long, user_id long, start timestamp, end timestamp")

    out = interval_overlap_join(a, b, by=("user_id",), bucket_seconds=1800)
    got = sorted((r.a_id_a, r.b_id_b) for r in out.collect())
    want = sorted(
        (ai, bi)
        for (ai, ak, as_, ae) in a_rows
        for (bi, bk, bs, be) in b_rows
        if ak == bk and ae > as_ and be > bs and as_ < be and bs < ae
    )
    assert got == want  # exact pair set, each pair exactly once
    assert ("_b" not in out.columns) and ("start_a" in out.columns)
    assert (1990, 2990) not in got


def test_time_bucket_rollup_gapfill_locf(spark):
    rows = [
        ("a", _ts("2026-01-01T00:10:00"), 1.0),
        ("a", _ts("2026-01-01T00:50:00"), 5.0),
        # hour 1 and 2 empty for key a
        ("a", _ts("2026-01-01T03:10:00"), 2.0),
        ("b", _ts("2026-01-01T02:05:00"), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    from pyspark.sql import functions as F

    out = time_bucket_rollup(
        df,
        3600,
        by=("k",),
        aggs={"n_rows": F.count(F.lit(1)), "max_value": F.max("value")},
        gapfill=True,
        locf=("max_value",),
        fill_zero=("n_rows",),
    )
    got = {(r.k, r.bucket_start): (r.n_rows, r.max_value) for r in out.collect()}
    h0 = int(_ts("2026-01-01T00:00:00").timestamp())
    assert got[("a", h0)] == (2, 5.0)
    assert got[("a", h0 + 3600)] == (0, 5.0)   # gap row: zero-filled count, LOCF max
    assert got[("a", h0 + 7200)] == (0, 5.0)
    assert got[("a", h0 + 3 * 3600)] == (1, 2.0)
    assert got[("b", h0 + 7200)] == (1, 9.0)
    assert len(got) == 5  # a: 4 buckets, b: 1 bucket — no cross-key gapfill


def test_asof_join_tolerance_subsecond(spark):
    # r06 (ADVICE r05 low): tolerance compares at microsecond precision —
    # a match 1.5 s stale must be nulled by tolerance_seconds=1 (the old
    # unix_timestamp comparison truncated 1.5 s to 1 s and let it pass),
    # and a fractional tolerance must not round to zero
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T10:00:01.500")), (2, 10, _ts("2026-01-01T10:00:00.400"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2026-01-01T10:00:00"), 7.0)], "user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, by="user_id", ts="ts", tolerance_seconds=1).collect()
    }
    assert got[1] is None     # 1.5 s stale > 1 s tolerance
    assert got[2] == 7.0      # 0.4 s stale
    got_frac = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, by="user_id", ts="ts", tolerance_seconds=0.3).collect()
    }
    assert got_frac[2] is None  # 0.4 s stale > 0.3 s tolerance

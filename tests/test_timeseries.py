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

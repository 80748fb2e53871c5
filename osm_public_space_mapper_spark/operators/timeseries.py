"""Time-series / ordering operators Spark lacks as built-ins, re-expressed
Spark-first: an as-of join (union + running-window formulation — never a
range-explosion theta join), a bucketed range join and interval-overlap
join (equi-join on time buckets + residual predicate — Catalyst plans the
naive ``t BETWEEN start AND end`` condition as BroadcastNestedLoopJoin,
which is O(|L|*|R|) whenever the interval side outgrows a broadcast), a
time-bucket rollup with gap-fill + LOCF (the hypertable rollup shape), and
a distributed prefix sum that turns a document corpus into GPT-style
concat-then-chunk token offsets without a single-task global window.

Reference scope note: the reference engine has no temporal surface; these
belong to the training-data-pipeline family the brief adds alongside
SURVEY.md §2 (as-of join and range join are the brief's own examples of
operators Spark lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: float | None = None,
    suffix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every left row picks up the value columns of the
    most recent right row with the same ``by`` key and ``right.ts <=
    left.ts`` (inclusive, like pandas ``merge_asof`` and DuckDB ``ASOF
    JOIN``); unmatched left rows keep NULLs.  ``tolerance_seconds`` nulls
    out matches staler than the horizon.

    HOW, Spark-first: the naive formulation is a range theta join
    (``l.by = r.by AND r.ts <= l.ts`` + max-per-row) — O(|L|·|R|) pairs per
    key before the aggregate, a scale-killer.  Instead both sides union
    into one frame tagged ``_side`` (right = 1), and ONE running window per
    key — ``last(value, ignorenulls) OVER (PARTITION BY by ORDER BY ts,
    _side DESC ROWS UNBOUNDED PRECEDING..CURRENT)`` — carries the latest
    right values forward onto each left row.  ``_side DESC`` makes a right
    row at the exact left timestamp visible (inclusive semantics).  Linear
    work, one shuffle on ``by``, no state bigger than the window frame's
    running values.

    Skew: a mega-hot key serializes into one task — the inherent cost of a
    per-key ordered scan; pre-split hot keys by time range (process each
    range with its own asof_join seeded by the previous range's last
    values) when a key's history exceeds a task.

    Ties: several right rows at the same (by, ts) resolve to whichever the
    window order visits last — pre-aggregate the right side to one row per
    (by, ts) for deterministic output (the driver query does).

    Output: the left columns + ``{suffix}{col}`` for each value column +
    ``{suffix}ts`` (the matched right timestamp)."""
    left_cols = left.columns
    lhs = left.select(
        *left_cols,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_rts"),
    )
    rhs = right.select(
        *[
            F.col(ts).alias(c) if c == ts else F.col(c) if c == by else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(ts).alias("_rts"),
    )
    u = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left_cols,
        "_side",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{suffix}{c}") for c in value_cols],
        F.last("_rts", ignorenulls=True).over(w).alias(f"{suffix}ts"),
    ).where(F.col("_side") == 0)
    if tolerance_seconds is not None:
        # microsecond precision (ADVICE r05): unix_timestamp truncates to
        # whole seconds, letting matches up to ~1 s staler than the horizon
        # pass and flooring fractional tolerances
        fresh = (
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{suffix}ts"))
            <= F.lit(float(tolerance_seconds) * 1_000_000.0)
        )
        carried = carried.select(
            *left_cols,
            *[
                F.when(fresh, F.col(f"{suffix}{c}")).alias(f"{suffix}{c}")
                for c in value_cols
            ],
            F.when(fresh, F.col(f"{suffix}ts")).alias(f"{suffix}ts"),
        )
    else:
        carried = carried.drop("_side")
    return carried


def concat_chunk_offsets(
    documents: DataFrame,
    chunk_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-then-chunk token offsets: documents are laid out in
    ``id_col`` order as one virtual token stream and cut into fixed
    ``chunk_len`` windows; each doc learns its global token interval and
    which chunks it spans — the bookkeeping a training-data pipeline needs
    to emit packed sequences (and to resume packing incrementally).

    Returns ``(doc_id, n_tokens, tok_start, tok_end, chunk_first,
    chunk_last)`` with ``tok_end = tok_start + n_tokens`` (exclusive) and
    the chunk span over ``[tok_start, tok_end)`` (empty docs pin both to
    the chunk at ``tok_start``).

    HOW, Spark-first — a distributed prefix sum, NOT a global window (a
    single ``ORDER BY doc_id`` window funnels the corpus through ONE
    task): rows range-repartition + sort by ``id_col``; an Arrow
    ``mapInPandas`` computes each partition's LOCAL running sum with a
    carry across batches (zero extra shuffle — the scan order inside a
    partition is the sorted order); per-partition totals (a frame of
    n_partitions rows) get their own cumsum on the tiny side and broadcast
    back as offsets.  The ranged Exchange is shared by both consumers
    (ReusedExchange), so the corpus shuffles exactly once and nothing ever
    serializes through one task or the driver."""
    from pyspark import TaskContext

    from ..functions.text import ws_token_count

    n_tok = ws_token_count(F.col(text_col)).cast("long")
    base = documents.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"))
    p = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    ranged = base.repartitionByRange(p, "doc_id").sortWithinPartitions("doc_id")

    def _local_scan(batches):
        import pandas as pd

        pid = TaskContext.get().partitionId()
        carry = 0
        for pdf in batches:
            local = pdf["n_tokens"].cumsum() - pdf["n_tokens"] + carry
            carry += int(pdf["n_tokens"].sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["n_tokens"],
                    "pid": pid,
                    "local_before": local.astype("int64"),
                }
            )

    scanned = ranged.mapInPandas(
        _local_scan, "doc_id long, n_tokens long, pid int, local_before long"
    )
    totals = (
        ranged.withColumn(
            "pid",
            F.expr("spark_partition_id()"),
        )
        .groupBy("pid")
        .agg(F.sum("n_tokens").alias("ptotal"))
    )
    wp = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptotal").over(wp), F.lit(0)).alias("poffset")
    )
    out = scanned.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        (F.col("poffset") + F.col("local_before")).alias("tok_start"),
        (F.col("poffset") + F.col("local_before") + F.col("n_tokens")).alias("tok_end"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "tok_start",
        "tok_end",
        F.floor(F.col("tok_start") / chunk_len).cast("long").alias("chunk_first"),
        F.floor(
            F.greatest(F.col("tok_end") - 1, F.col("tok_start")) / chunk_len
        ).cast("long").alias("chunk_last"),
    )


def _bucket_of(ts_col, bucket_us):
    """Time-bucket ordinal of a timestamp column (microsecond floor).
    Casts through TIMESTAMP so TIMESTAMP_NTZ inputs (parquet default)
    work; the cast applies uniformly to both join sides, so bucket
    alignment is consistent regardless of session timezone."""
    return F.floor(F.unix_micros(ts_col.cast("timestamp")) / F.lit(bucket_us)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    by: tuple[str, ...] = (),
    bucket_seconds: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Range (point-in-interval) join: every point row pairs with every
    interval row sharing its ``by`` key whose half-open window
    ``[start, end)`` contains ``ts``.  The canonical temporal join Spark
    lacks as a built-in (its range-join machinery is Databricks-only).

    HOW, Spark-first: a naive ``p.ts >= i.start AND p.ts < i.end``
    condition (with or without the key equality, once the interval side
    outgrows a broadcast) degenerates to a nested-loop/cartesian plan.
    Instead both sides are *banded*: each interval explodes into the
    time-bucket ordinals its window spans (``sequence(floor(start/B),
    floor((end-1us)/B))``), each point maps to exactly ONE bucket, and the
    pair set is recovered by a plain shuffled hash equi-join on
    ``(by..., bucket)`` plus the residual containment predicate.  Because
    a point owns a single bucket, no pair can be produced twice — no
    dedup pass.  Cost is one shuffle per side; the interval side grows by
    ``ceil(window_len / bucket_seconds)`` rows, so choose
    ``bucket_seconds`` near the typical window length (explode factor
    ~1-2).  A mega-hot (key, bucket) cell is inherent output-size skew;
    AQE's skew-join split handles the task sizing.

    ``how='left'`` additionally keeps unmatched points with NULL interval
    columns (via a key-bucket anti-join — no extra scan of the pair set).
    The miss branch groups by the full point row, so byte-identical
    duplicate point rows collapse to one miss row — give points a unique
    id column when exact multiplicity of unmatched rows matters.

    Column contract: point and interval column names must be disjoint
    except the ``by`` keys (interval columns pass through under their own
    names)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    bucket_us = int(bucket_seconds * 1_000_000)
    ivs = intervals.where(F.col(end) > F.col(start))
    iv_cols = [c for c in intervals.columns if c not in by]
    banded = ivs.select(
        *by,
        *iv_cols,
        F.explode(
            F.sequence(
                _bucket_of(F.col(start), bucket_us),
                _bucket_of(F.col(end).cast("timestamp") - F.expr("INTERVAL 1 MICROSECOND"), bucket_us),
            )
        ).alias("_b"),
    )
    pts = points.withColumn("_b", _bucket_of(F.col(ts), bucket_us))
    keys = [*by, "_b"]
    contained = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    inner = pts.join(banded, keys, "inner").where(contained).drop("_b")
    if how == "inner":
        return inner
    # left: points whose (key, bucket) cell matched no *containing* interval.
    # Re-checking containment inside the anti-join condition would need a
    # theta anti-join; instead left-join on the cell and aggregate "any
    # containing" per point — still one equi-shuffle, no nested loop.
    flagged = pts.join(banded, keys, "left").withColumn(
        "_hit", contained & F.col(start).isNotNull()
    )
    pt_cols = [c for c in points.columns]
    misses = (
        flagged.groupBy(*pt_cols)
        .agg(F.max(F.col("_hit").cast("int")).alias("_any"))
        .where((F.col("_any").isNull()) | (F.col("_any") == 0))
        .drop("_any")
        .select(*pt_cols, *[F.lit(None).cast(banded.schema[c].dataType).alias(c) for c in iv_cols])
    )
    return inner.select(*pt_cols, *iv_cols).unionByName(misses)


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    by: tuple[str, ...] = (),
    start: str = "start",
    end: str = "end",
    bucket_seconds: float = 3600.0,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Interval x interval overlap join: pairs ``(a, b)`` sharing a ``by``
    key whose half-open windows intersect (``a.start < b.end AND b.start <
    a.end``).

    HOW, Spark-first: both sides band into bucket ordinals (as in
    :func:`range_join`) and equi-join on ``(by..., bucket)``.  An
    overlapping pair co-occurs in every bucket their windows share, so the
    join would emit duplicates; they are eliminated *declaratively* — a
    pair is kept only in the bucket containing the LATER of the two starts
    (``bucket == greatest(bucket(a.start), bucket(b.start))``), which is
    provably within both bands whenever the windows overlap — no
    ``dropDuplicates`` shuffle.  Non-key columns are renamed with
    ``suffixes``."""
    bucket_us = int(bucket_seconds * 1_000_000)
    sa, sb = suffixes

    def _band(df: DataFrame, suffix: str) -> DataFrame:
        df = df.where(F.col(end) > F.col(start))
        renamed = df.select(
            *by,
            *[F.col(c).alias(f"{c}{suffix}") for c in df.columns if c not in by],
        )
        s, e = f"{start}{suffix}", f"{end}{suffix}"
        return renamed.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    _bucket_of(F.col(s), bucket_us),
                    _bucket_of(
                        F.col(e).cast("timestamp") - F.expr("INTERVAL 1 MICROSECOND"),
                        bucket_us,
                    ),
                )
            ),
        )

    la, lb = _band(a, sa), _band(b, sb)
    overlap = (F.col(f"{start}{sa}") < F.col(f"{end}{sb}")) & (
        F.col(f"{start}{sb}") < F.col(f"{end}{sa}")
    )
    owner = F.col("_b") == F.greatest(
        _bucket_of(F.col(f"{start}{sa}"), bucket_us),
        _bucket_of(F.col(f"{start}{sb}"), bucket_us),
    )
    return la.join(lb, [*by, "_b"], "inner").where(overlap & owner).drop("_b")


def time_bucket_rollup(
    df: DataFrame,
    bucket_seconds: int,
    by: tuple[str, ...] = (),
    ts: str = "ts",
    aggs: dict | None = None,
    gapfill: bool = False,
    locf: tuple[str, ...] = (),
    fill_zero: tuple[str, ...] = (),
) -> DataFrame:
    """Hypertable-style time-bucket rollup: group rows into fixed
    ``bucket_seconds`` windows per ``by`` key and aggregate; optionally
    *gap-fill* the per-key bucket range (every key emits one row per
    bucket between its first and last observation) with last-observation-
    carried-forward (``locf``) and/or zero-fill (``fill_zero``) on named
    output columns — the TimescaleDB ``time_bucket_gapfill`` shape.

    Output key is ``bucket_start`` (epoch seconds, long) — a plain long so
    downstream joins and the DuckDB oracle agree bit-for-bit.

    HOW, Spark-first: the rollup is ONE partial-aggregated groupBy (the
    raw table never shuffles un-aggregated rows: map-side combine runs per
    bucket).  Gap-fill never touches the raw table again — the per-key
    (min, max) bucket span is a second tiny aggregate OVER THE ROLLED-UP
    frame, exploded into a skeleton via ``sequence`` and left-joined back;
    LOCF is a running ``last(ignorenulls)`` window per key.  All
    post-rollup work is proportional to keys x buckets, not input rows."""
    aggs = aggs or {"n_rows": F.count(F.lit(1))}
    b = int(bucket_seconds)
    bucket = (F.floor(F.unix_timestamp(F.col(ts)) / b) * b).cast("long").alias("bucket_start")
    rolled = df.groupBy(*by, bucket).agg(*[v.alias(k) for k, v in aggs.items()])
    if not gapfill:
        return rolled
    spans = rolled.groupBy(*by).agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    skeleton = spans.select(
        *by,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(b).cast("long"))).alias(
            "bucket_start"
        ),
    )
    out = skeleton.join(rolled, [*by, "bucket_start"], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in locf:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast(out.schema[c].dataType)))
    return out

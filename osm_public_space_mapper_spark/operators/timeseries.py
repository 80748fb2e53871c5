"""Time-series / ordering operators Spark lacks as built-ins, re-expressed
Spark-first: an as-of join (union + running-window formulation — never a
range-explosion theta join) and a distributed prefix sum that turns a
document corpus into GPT-style concat-then-chunk token offsets without a
single-task global window.

Reference scope note: the reference engine has no temporal surface; these
belong to the training-data-pipeline family the brief adds alongside
SURVEY.md §2 (as-of join is the brief's own example of an operator Spark
lacks).
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
        fresh = (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col(f"{suffix}ts"))
            <= F.lit(float(tolerance_seconds))
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

"""Data-layout operators: Z-order (Morton) clustering for multi-dimension
locality — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` shape, from scratch.

Why it matters at 100 TB: range-partitioning by ONE column makes queries
on that column prune files, but queries on any other column scan
everything. Interleaving the bits of k columns into one Morton key and
range-partitioning by IT gives every participating column partial
locality: a box predicate on any subset of the columns touches
O(fraction^(1/k)) of the files instead of all of them. Parquet min/max
row-group stats then prune automatically — no index structure needed,
just a better sort key at write time.

The Morton key is a PURE Catalyst expression (a chain of shiftright/
bitwiseAND/shiftleft terms — whole-stage codegen, engine-portable, and
reproduced bit-for-bit by the DuckDB oracle), so clustering is ONE
repartitionByRange + sortWithinPartitions over the key: exactly one
shuffle, no sampling job beyond the range partitioner's own.

Reference scope note: the reference engine has no storage-layout surface;
this belongs to the training-data/lakehouse family the brief adds
alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Column → integer rank in [0, 2^bits): fixed caller-supplied bounds
    (table-stats-derived in practice) keep the expression pure and
    deterministic — no extra pass over the data. Values outside [lo, hi]
    clamp to the edge cells. floor on doubles is engine-portable."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    n = 1 << bits
    q = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(float(n))
    ).cast("long")
    return F.greatest(F.least(q, F.lit(n - 1)), F.lit(0))


def zorder_expr(quantized: list[Column], bits: int) -> Column:
    """Interleave k quantized columns' bits into one Morton key
    (column j contributes bit i at output position i*k + j)."""
    k = len(quantized)
    z = F.lit(0).cast("long")
    for j, q in enumerate(quantized):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("long")
    return z


def zorder_key(specs: list[tuple[Column, float, float]], bits: int = 16) -> Column:
    """(column, lo, hi) specs → Morton key column."""
    return zorder_expr([quantize_expr(c, lo, hi, bits) for c, lo, hi in specs], bits)


def cluster_by_zorder(
    df: DataFrame,
    specs: list[tuple[Column, float, float]],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout df for multi-dimension locality: range-partition + sort by
    the Morton key (one shuffle), key dropped from the output. Write the
    result with any sink — parquet row-group min/max stats on the original
    columns then prune box queries on either dimension."""
    z = zorder_key(specs, bits).alias("_z")
    out = df.select("*", z)
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(p, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_duckdb_expr(
    cols: list[tuple[str, float, float]], bits: int = 16
) -> str:
    """DuckDB SQL reproducing :func:`zorder_key` bit-for-bit, for the
    hash-checked driver oracle."""
    k = len(cols)
    terms = []
    for j, (name, lo, hi) in enumerate(cols):
        n = 1 << bits
        q = (
            f"GREATEST(LEAST(CAST(FLOOR((CAST({name} AS DOUBLE) - {float(lo)!r}) "
            f"/ {float(hi - lo)!r} * {float(n)!r}) AS BIGINT), {n - 1}), 0)"
        )
        for i in range(bits):
            terms.append(f"((({q} >> {i}) & 1) << {i * k + j})")
    return "(" + " + ".join(terms) + ")"

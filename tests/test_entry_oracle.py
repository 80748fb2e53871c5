"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and compare row count + sorted-column value multiset
against oracle_sql() through DuckDB (SURVEY.md §5.2 layer 4)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6g}"
    return str(val)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_normalize(r[i]) for i in order) for r in rows)


_ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_duckdb(spark, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.sql(entrymod.oracle_sql()[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)} rows"
    ms = _multiset(spark_rows, [c.lower() for c in spark_cols])
    md = _multiset(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [(a, b) for a, b in zip(ms, md) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_rows_only_queries_run(spark):
    for name, q in entrymod.queries().items():
        if name in _ORACLED or name in ("pip_assign_counts", "knn_walkable", "tile_masks"):
            continue  # oracled ones covered above; heavy spatial ones in test_image_joins
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"space_category", "access", "n_images"}
    assert sum(r.n_images for r in rows) > 0

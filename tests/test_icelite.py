"""Icelite table format: atomic commit, lineage, partition pruning, resume
(SURVEY.md §5.2 layer 6)."""

import pytest
from pyspark.sql import functions as F

from osm_public_space_mapper_spark.tables.icelite import IceliteTable


@pytest.fixture()
def table(tmp_path):
    return IceliteTable(str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("part", (F.col("id") % 4).cast("string")).withColumn(
        "v", F.col("id") * 2
    )


def test_commit_and_lineage(spark, table):
    snap = table.commit(_df(spark, 0, 100), "part", stage="s1")
    assert len(snap["manifests"]) == 4
    assert sum(m["row_count"] for m in snap["manifests"]) == 100
    back = table.read(spark)
    assert back.count() == 100
    # partition pruning
    only0 = table.read(spark, partitions=["0"])
    assert only0.count() == 25
    # hive-style partition value is type-inferred on read (int here)
    assert str(only0.select("part").distinct().collect()[0][0]) == "0"


def test_resume_skips_completed(spark, table):
    table.commit(_df(spark, 0, 40), "part", stage="s1")
    done_before = table.completed_partitions("s1")
    assert done_before == {"0", "1", "2", "3"}
    # resumable commit of the same stage: everything skipped, no new rows
    snap = table.commit_resumable(_df(spark, 0, 40), "part", stage="s1")
    assert table.read(spark).count() == 40
    # new stage with disjoint partition values appends
    df2 = spark.range(100, 120).withColumn("part", F.lit("9")).withColumn("v", F.col("id"))
    table.commit_resumable(df2, "part", stage="s2")
    assert table.read(spark).count() == 60
    assert "9" in table.completed_partitions("s2")


def test_lineage_hash_is_content_addressed(spark, table):
    table.commit(_df(spark, 0, 40), "part", stage="a")
    h1 = {m["partition"]: m["content_hash"] for m in table.lineage()}
    t2 = IceliteTable(table.path + "_b")
    # same content, different partitioning order → same hashes
    t2.commit(_df(spark, 0, 40).repartition(7), "part", stage="a")
    h2 = {m["partition"]: m["content_hash"] for m in t2.lineage()}
    assert h1 == h2


def test_atomic_metadata(spark, table):
    import json, os

    table.commit(_df(spark, 0, 8), "part", stage="s1")
    meta = table.current_metadata()
    assert meta["snapshot"] == "snap-000001.json"
    table.commit(_df(spark, 8, 16), "part", stage="s1")
    meta2 = table.current_metadata()
    assert meta2["snapshot"] == "snap-000002.json"
    assert meta2["history"] == ["snap-000001.json", "snap-000002.json"]
    # old snapshot still readable (time travel)
    with open(os.path.join(table.meta_dir, "snap-000001.json")) as f:
        old = json.load(f)
    assert sum(m["row_count"] for m in old["manifests"]) == 8

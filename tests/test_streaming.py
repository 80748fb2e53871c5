"""Structured Streaming ingest → Icelite append (engine-side extra surface;
the reference itself is batch-only, SURVEY.md §2.7)."""

import os

from pyspark.sql import types as T

from osm_public_space_mapper_spark.fixtures.images import generate_images
from osm_public_space_mapper_spark.streaming.ingest import stream_to_icelite
from osm_public_space_mapper_spark.tables.icelite import IceliteTable

_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def test_stream_ingest_to_icelite(spark, tmp_path):
    # stage parquet files as the stream source (two "arrivals")
    src = tmp_path / "incoming"
    os.makedirs(src)
    pdf = generate_images(600, seed=13, with_pixels=False).drop(columns=["bytes"])
    spark.createDataFrame(pdf.iloc[:300], _SCHEMA).write.parquet(str(src / "a"))
    spark.createDataFrame(pdf.iloc[300:], _SCHEMA).write.parquet(str(src / "b"))

    stream = spark.readStream.schema(_SCHEMA).option("recursiveFileLookup", "true").parquet(str(src))
    q = stream_to_icelite(stream, str(tmp_path / "tbl"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    table = IceliteTable(str(tmp_path / "tbl"))
    back = table.read(spark)
    assert back.count() == 600
    assert set(back.columns) >= {"image_id", "lon", "lat", "cell7"}
    # lineage recorded per cell7 partition, rows conserved
    lineage = table.lineage()
    assert sum(m["row_count"] for m in lineage) == 600
    assert all(m["stage"].startswith("stream-batch-") for m in lineage)
    # restart with same checkpoint: no new data → no new rows (exactly-once)
    stream2 = spark.readStream.schema(_SCHEMA).option("recursiveFileLookup", "true").parquet(str(src))
    q2 = stream_to_icelite(stream2, str(tmp_path / "tbl"), str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert table.read(spark).count() == 600

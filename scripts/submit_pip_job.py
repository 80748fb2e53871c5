"""spark-submit entry point for the flagship PIP-assignment job.

The north rule requires the job to run "via spark-submit --py-files on a
multi-executor cluster at two cluster sizes". This script is that job: it
imports the engine ONLY from the --py-files zip (no repo-path assumption),
synthesizes the image table distributedly, builds the polygon layer + tile
masks, runs the salted cell-bucketed PIP join, and prints one JSON line with
row counts, an order-insensitive output hash, and throughput.

Usage (tests/test_spark_submit.py runs exactly this at two parallelism
levels and asserts identical output hashes):

  spark-submit --master local[N] \
      --py-files /path/to/osm_public_space_mapper_spark.zip \
      scripts/submit_pip_job.py --images 2000000
"""

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2_000_000)
    ap.add_argument("--salt", type=int, default=8)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pip-assignment").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # engine modules resolve from the --py-files zip on driver AND executors
    from osm_public_space_mapper_spark.fixtures.elements import BBOX_4326, elements_to_spark
    from osm_public_space_mapper_spark.fixtures.images import synth_images_spark
    from osm_public_space_mapper_spark.operators import joins, tiling
    from osm_public_space_mapper_spark.operators.overlay_core import OverlayConfig
    from osm_public_space_mapper_spark.plans.pipeline import projected_bbox_ring, run_pipeline

    ring = projected_bbox_ring(BBOX_4326["left"], BBOX_4326["bottom"], BBOX_4326["right"], BBOX_4326["top"])
    env = (float(ring[:, 0].min()), float(ring[:, 1].min()), float(ring[:, 0].max()), float(ring[:, 1].max()))
    cfg = OverlayConfig(px=0.25, margin=64.0, bbox=env, bbox_ring=ring)
    layer = run_pipeline(elements_to_spark(spark), cfg, overlay_res=8).cache()
    layer.count()
    tiles = tiling.rasterize_tiles(layer, tile_res=10, px=0.25).cache()
    tiles.count()

    images = synth_images_spark(spark, args.images)
    images = joins.with_cells(joins.project_points(joins.with_geotag(images))).cache()
    images.count()

    t0 = time.time()
    assigned = joins.pip_join_raster(images, tiles, salt=args.salt)
    n = assigned.count()
    sec = time.time() - t0
    out_hash = assigned.agg(
        F.expr("bit_xor(xxhash64(image_id, space_category, access))").alias("h")
    ).collect()[0]["h"]
    print(
        json.dumps(
            {
                "n_images": args.images,
                "n_assigned": n,
                "pip_sec": round(sec, 3),
                "images_per_sec": round(args.images / sec, 1),
                "output_hash": int(out_hash),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

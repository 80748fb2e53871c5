"""osm_public_space_mapper_spark — a from-scratch PySpark-native spatial-join +
tiling engine re-creating the query/data-processing capabilities of
ester-t-s/osm-public-space-mapper (classify → polygonize → overlay → tile),
lifted to web scale: H3-style cell index, cell-bucketed point-in-polygon joins,
kNN assignment, raster↔vector tiling, skew-salted aggregation, Iceberg-layout
tables with per-partition lineage + checkpoint resume.

All geometry / projection / image kernels are written from scratch in numpy
(no shapely/pyproj/PIL in this environment) and run Arrow-vectorized inside
pandas UDFs — no per-row Python on the Spark side.
"""

__version__ = "0.1.0"

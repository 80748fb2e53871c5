"""Golden-output parity: run the engine on the reference's OWN committed
input (example_application/Rabenhof.osm.pbf, read by the from-scratch PBF
source) and compare the layer against the reference's committed output
(example_application/Rabenhof_public_space.geojson) — the strongest
correctness artifact the reference ships (SURVEY.md §5; full_data_analysis.py
end-to-end with the README bbox).

Asserts:
  - the (space_category, access) inventory is EXACTLY the golden 10 pairs
  - per-pair area ≤ 1% on ALL 10 pairs (r05: the courtyard residual closed
    by matching the golden artifact's J7 semantics — roads do not crop
    enclosed areas; see overlay_core.py J7)
  - per-pair spatial IoU ≥ 0.92 on an off-lattice 0.5 m grid
  - total covered area equals the golden total (bbox completeness)
"""

import json
import tempfile
from collections import defaultdict

import numpy as np
import pytest

from osm_public_space_mapper_spark.geo.arrowgeom import np_parts
from osm_public_space_mapper_spark.geo.kernels import ring_signed_area
from osm_public_space_mapper_spark.geo.laea import laea_forward
from osm_public_space_mapper_spark.geo.raster import Grid, rasterize_polygon
from osm_public_space_mapper_spark.operators.overlay_core import OverlayConfig
from osm_public_space_mapper_spark.plans.pipeline import projected_bbox_ring, run_pipeline
from osm_public_space_mapper_spark.sources import pbf

PBF_PATH = "/root/reference/example_application/Rabenhof.osm.pbf"
GOLD_PATH = "/root/reference/example_application/Rabenhof_public_space.geojson"
# full_data_analysis.py:16 (the README's osmosis bbox)
BBOX = dict(left=16.39885944803246, right=16.405590927719924,
            top=48.198866317671815, bottom=48.19436970139387)


@pytest.fixture(scope="module")
def layer_rows(spark):
    # other suites legitimately hold process-lifetime caches in the shared
    # session (__spark_entry__'s layer/tiles), so assert the LOADER's cache
    # is released as a delta against the pre-load baseline, not global-zero
    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    elems = pbf.load_elements(spark, PBF_PATH)
    # bronze-table cut: persist the assembled elements once so the pipeline's
    # role branches don't re-run the PBF decode + assembly joins
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/rabenhof_elements.parquet"
        elems.write.mode("overwrite").parquet(path)
        pbf.release_loader_cache(elems)  # bronze cut materialized
        assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == baseline
        elems = spark.read.parquet(path)
        ring = projected_bbox_ring(BBOX["left"], BBOX["bottom"], BBOX["right"], BBOX["top"])
        env = (float(ring[:, 0].min()), float(ring[:, 1].min()),
               float(ring[:, 0].max()), float(ring[:, 1].max()))
        cfg = OverlayConfig(px=0.25, margin=64.0, bbox=env, bbox_ring=ring)
        rows = run_pipeline(elems, cfg, overlay_res=8).collect()
    return rows, env


def _golden_features():
    g = json.load(open(GOLD_PATH))
    for f in g["features"]:
        p = f["properties"]
        polys = f["geometry"]["coordinates"]
        if f["geometry"]["type"] == "Polygon":
            polys = [polys]
        rings = []
        for poly in polys:
            for i, rr in enumerate(poly):
                arr = np.asarray(rr)
                x, y = laea_forward(arr[:, 0], arr[:, 1])
                ring = np.stack([x, y], axis=1)
                sa = ring_signed_area(ring)
                if (i == 0) != (sa > 0):  # exterior CCW, holes CW
                    ring = ring[::-1]
                rings.append((i == 0, ring))
        yield (p["space_category"], p["access"]), rings


def test_pbf_source_decodes_reference_extract(spark):
    frames = pbf.blob_frames(PBF_PATH)
    assert [t for t, _, _ in frames][0] == "OSMHeader"
    counts = {r["otype"]: r["count"] for r in
              pbf.entities(spark, PBF_PATH).groupBy("otype").count().collect()}
    assert counts == {"node": 7127, "way": 999, "relation": 56}
    elems = pbf.load_elements(spark, PBF_PATH)
    kinds = {r["geom_kind"]: r["count"] for r in
             elems.groupBy("geom_kind").count().collect()}
    pbf.release_loader_cache(elems)
    assert kinds["point"] == 7127
    assert kinds["polygon"] + kinds["linestring"] == 999
    assert kinds["multipolygon"] > 0  # assembled relations
    assert kinds[None] > 0  # invalid rows kept for drop_invalid_geometries


def test_golden_inventory_exact(layer_rows):
    rows, _ = layer_rows
    eng = {(r.space_category, r.access) for r in rows}
    gold = {k for k, _ in _golden_features()}
    assert eng == gold, f"missing: {gold - eng}; extra: {eng - gold}"


def test_golden_area_parity(layer_rows):
    rows, _ = layer_rows
    eng = defaultdict(float)
    for r in rows:
        eng[(r.space_category, r.access)] += r.area
    gold = defaultdict(float)
    for k, rings in _golden_features():
        gold[k] += sum((1 if is_ext else -1) * abs(ring_signed_area(rg)) for is_ext, rg in rings)
    for k, ga in gold.items():
        ratio = eng[k] / ga
        # r05: ALL 10 pairs ≤ 1%. The long-standing −1.25% on
        # ('undefined space','no') was the Rabenhof parking courtyard —
        # closed by matching the golden artifact's J7 semantics: road/rail
        # polygons do not crop enclosed areas (overlay_core.py J7 comment),
        # so J9's enclosed-clips-road pass hands the buffered parking-aisle
        # strip to the enclosed area exactly as the committed geojson does.
        assert abs(ratio - 1) < 0.01, (k, eng[k], ga, ratio)
    total_e, total_g = sum(eng.values()), sum(gold.values())
    assert abs(total_e - total_g) / total_g < 0.001


def test_golden_spatial_iou(layer_rows):
    rows, env = layer_rows
    px = 0.5
    # OFF-LATTICE comparison grid: the engine's output rings lie on the
    # pipeline's 0.25 m pixel lattice, so a grid whose pixel centers also sit
    # on that lattice hits the inclusive boundary rule on every engine edge —
    # a systematic one-sided "fat film" (measured ~0.03-0.09 IoU penalty)
    # that the golden shapely rings (arbitrary coordinates) never pay. A
    # 0.13 m origin shift keeps centers off both engines' special points,
    # making the IoU estimator unbiased; tolerance is TIGHTENED 0.85 → 0.92.
    shift = 0.13
    grid = Grid.from_bbox(np.floor(env[0] / px) * px + shift, np.floor(env[1] / px) * px + shift,
                          np.ceil(env[2] / px) * px + shift, np.ceil(env[3] / px) * px + shift, px)
    eng_m: dict = {}
    for r in rows:
        m = eng_m.setdefault((r.space_category, r.access), grid.empty())
        m |= rasterize_polygon(grid, np_parts(r.geom))
    gold_m: dict = {}
    for k, rings in _golden_features():
        m = gold_m.setdefault(k, grid.empty())
        m |= rasterize_polygon(grid, [rg for _, rg in rings])
    for k in gold_m:
        inter = (eng_m[k] & gold_m[k]).sum()
        union = (eng_m[k] | gold_m[k]).sum()
        iou = inter / union
        assert iou >= 0.92, (k, iou)

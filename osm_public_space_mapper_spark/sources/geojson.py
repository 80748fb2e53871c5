"""GeoJSON sink (reference export_data.py:20-46).

The reference re-projects EPSG:3035 → 4326 and writes one FeatureCollection
with (geometry, access, space_category) per feature. The engine mirrors that
for fixture-sized layers: the merged layer (operators/skew.merged_layer) is
collected and written driver-side; ring coordinates are inverse-projected with
the same LAEA kernel. Polygon rings are grouped exterior-first by signed area
(even-odd encoding → GeoJSON MultiPolygon nesting by containment).

At scale the real sink is the Icelite parquet table (tables/icelite.py);
GeoJSON is a small-export convenience exactly like the reference's.
"""

from __future__ import annotations

import json

import numpy as np

from ..geo.arrowgeom import np_parts
from ..geo.kernels import points_in_polygon, ring_signed_area
from ..geo.laea import laea_inverse


def _rings_to_multipolygon(rings: list[np.ndarray]) -> list:
    """Even-odd flat ring list → GeoJSON MultiPolygon coordinates."""
    signed = [(r, ring_signed_area(r)) for r in rings if len(r) >= 3]
    exts = [r for r, s in signed if s > 0]
    holes = [r for r, s in signed if s <= 0]
    exts_sorted = sorted(range(len(exts)), key=lambda i: abs(ring_signed_area(exts[i])))
    polys: list[list[np.ndarray]] = [[e] for e in exts]
    for h in holes:
        v = h[0]
        for i in exts_sorted:  # smallest containing exterior
            if points_in_polygon(np.array([v[0]]), np.array([v[1]]), [exts[i]])[0]:
                polys[i].append(h)
                break
    out = []
    for poly in polys:
        coords = []
        for ring in poly:
            lon, lat = laea_inverse(ring[:, 0], ring[:, 1])
            pts = [[round(float(a), 9), round(float(b), 9)] for a, b in zip(lon, lat)]
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            coords.append(pts)
        out.append(coords)
    return out


def save_geojson(merged_layer_rows, fname: str) -> dict:
    """Rows of (space_category, access, geom) → GeoJSON FeatureCollection.

    Matches the reference's output record shape (export_data.py:32-43)."""
    features = []
    for r in sorted(merged_layer_rows, key=lambda r: (r.space_category, r.access)):
        rings = np_parts(r.geom)
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "MultiPolygon", "coordinates": _rings_to_multipolygon(rings)},
                "properties": {"space_category": r.space_category, "access": r.access},
            }
        )
    fc = {"type": "FeatureCollection", "features": features}
    with open(fname, "w") as f:
        json.dump(fc, f)
    return fc


def write_geojsonl(layer: DataFrame, out_dir: str) -> None:  # noqa: F821
    """Distributed newline-delimited GeoJSON sink (RFC 8142-style GeoJSONL):
    one Feature per line, built and written entirely executor-side via an
    Arrow kernel + df.write.text — no driver collect, so it scales with the
    table (the FeatureCollection writer above stays for fixture-sized
    exports, exactly like the reference's one-shot export)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _to_lines(batches):
        for pdf in batches:
            lines = []
            for _, row in pdf.iterrows():
                rings = np_parts(row["geom"])
                feature = {
                    "type": "Feature",
                    "geometry": {
                        "type": "MultiPolygon",
                        "coordinates": _rings_to_multipolygon(rings),
                    },
                    "properties": {
                        "space_category": row["space_category"],
                        "access": row["access"],
                    },
                }
                lines.append(json.dumps(feature, separators=(",", ":")))
            yield pd.DataFrame({"value": lines})

    (
        layer.select("space_category", "access", "geom")
        .mapInPandas(_to_lines, "value string")
        .write.mode("overwrite")
        .text(out_dir)
    )

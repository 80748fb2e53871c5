"""Independent per-row transliteration of the reference rule tables.

Used ONLY as a test oracle: dict-in, labels-out, mirroring
/root/reference/osm_public_space_mapper/{utils/osm_element.py,
data_analysis/{analyse_access.py,analyse_space_type.py,
analyse_traffic_area.py,clean_data.py}} semantics exactly (including the
first-writer-wins attribute discipline). The engine implements the same rules
as Catalyst expressions; tests assert engine == oracle for every fixture row.
"""

from __future__ import annotations

POLY = ("polygon", "multipolygon")


def is_building(kind, tags):
    if kind not in POLY:
        return False
    if not any(k in tags for k in ("building", "building:part", "building:levels")):
        return False
    return tags.get("building") != "roof" and tags.get("building") != "no"


def is_crossing(tags):
    if tags.get("crossing", "no") != "no":
        return True
    return any(tags.get(k) == "crossing" for k in ("highway", "footway", "railway"))


def is_pedestrian_way(tags):
    return tags.get("highway") in ("footway", "steps", "path", "pedestrian", "living_street", "track") and not is_crossing(tags)


def is_shared_cycleway_footway(tags):
    return tags.get("highway") in ("cycleway", "footway") and tags.get("segregated") == "no"


def is_platform_polygon(kind, tags):
    if kind not in POLY:
        return False
    rules = {"public_transport": "platform", "railway": "platform", "highway": "platform", "shelter_type": "public_transport"}
    return any(tags.get(k) == v for k, v in rules.items())


def is_parking_polygon(kind, tags):
    if kind not in POLY:
        return False
    return (
        tags.get("amenity") in ("parking", "parking_space")
        or "parking" in tags
        or "motorcycle_parking" in tags
        or "parking_space" in tags
    )


def is_rail(tags):
    return tags.get("railway") in ("tram", "rail") or tags.get("landuse") == "railway"


def is_construction(tags):
    return (
        "construction" in tags
        or "construction:highway" in tags
        or tags.get("landuse") == "construction"
        or tags.get("highway") == "construction"
        or tags.get("railway") == "construction"
    )


def is_entrance(kind, tags):
    if "highway" in tags and tags.get("highway") != "motorway" and kind == "linestring":
        return True
    if is_crossing(tags):
        return True
    return tags.get("barrier") == "gate"


def is_barrier(kind, tags):
    if "barrier" in tags and kind == "linestring":
        return True
    if tags.get("highway") == "motorway" and kind == "linestring":
        return True
    if tags.get("railway") == "rail" and kind == "linestring" and tags.get("embedded") != "yes":
        return True
    return tags.get("landuse") == "railway" and kind in POLY


def is_non_groundlevel(tags):
    if "level" in tags:
        try:
            levels = list(map(float, str(tags["level"]).split(";")))
        except ValueError:
            return False
        return 0 not in levels
    for k, v in (("tunnel", "yes"), ("parking", "underground"), ("location", "underground")):
        if tags.get(k) == v:
            return True
    return False


def interpret_tags_access(tags):
    yes_v = ["yes", "permissive", "public"]
    no_v = ["private", "no", "permit", "key", "military", "residents"]
    restr_v = ["children", "customers"]
    restr_keys = ["fee", "opening_hours", "max_age", "min_age", "female", "male", "charge", "seasonal"]

    def restricted():
        for key in restr_keys:
            if key in tags and tags.get(key) != "no":
                if (key == "opening_hours" and tags.get(key) != "24/7") or key != "opening_hours":
                    return True
        return False

    if "access" in tags or "foot" in tags:
        if tags.get("access") in no_v or tags.get("foot") in no_v:
            return "no"
        if tags.get("access") in yes_v or tags.get("foot") in yes_v:
            return "restricted" if restricted() else "yes"
        if tags.get("access") in restr_v or tags.get("foot") in restr_v:
            return "restricted"
        return "restricted" if restricted() else None
    return "restricted" if restricted() else None


def traffic_space_type(kind, tags):
    """Returns (space_type|None, access_overwrite|None)."""
    if is_pedestrian_way(tags) or is_shared_cycleway_footway(tags):
        return "walking area", None
    if is_platform_polygon(kind, tags):
        return "public transport stop", None
    if is_parking_polygon(kind, tags):
        return "parking", "no"
    if is_rail(tags) and kind != "point":
        return "rail", None
    if "highway" in tags and kind != "point":
        return "road", None
    return None, None


def missing_space_type(tags):
    if is_construction(tags):
        return "construction"
    for key in ("leisure", "amenity", "natural", "place", "landuse", "man_made"):
        if key in tags:
            return tags[key]
    return None


SPACE_YES = ["public transport stop", "park", "playground", "dog_park", "fitness_station",
             "square", "track", "brownfield", "bus_station", "forest", "sand", "garden", "heath",
             "recreation_ground", "scree", "greenfield", "walking area", "grassland",
             "village_green", "wood", "cemetery", "grass", "pitch", "beach", "bridge",
             "common", "island", "marina", "pier", "water_park", "religious", "shelter"]
SPACE_RESTR = ["outdoor_seating", "sports_centre", "swimming_pool", "biergarten",
               "miniature_golf", "stadium", "horse_riding"]
SPACE_NO = ["allotments", "construction", "landfill", "military", "flowerbed", "fountain",
            "water", "wetland", "storage", "farmland", "orchard", "plant_nursery", "planter",
            "vineyard", "harbour", "resort", "garages", "stage", "reservoir", "scrub", "shrubbery",
            "greenhouse_horticulture", "meadow", "nature_reserve"]


def assumed_access(space_type):
    if space_type in SPACE_YES:
        return "yes"
    if space_type in SPACE_RESTR:
        return "restricted"
    if space_type in SPACE_NO:
        return "no"
    return "unknown"


CATEGORIES = {
    "greenspace": ["dog_park", "flowerbed", "grass", "park", "sand", "village_green", "garden", "planter",
                   "grassland", "scrub", "meadow", "wood", "allotments", "beach", "recreation_ground",
                   "islet", "forest", "heath", "nature_reserve", "greenfield", "shrubbery"],
    "play and sports": ["playground", "pitch", "fitness_station", "track", "miniature_golf", "horse_riding"],
    "water": ["fountain", "water", "wetland", "swimming_pool"],
    "road": ["road", "parking"],
    "rail": ["rail"],
    "open space": ["public transport stop", "square", "scree", "bridge", "pier", "marina", "outdoor_seating", "biergarten"],
    "building": ["building"],
    "inaccessible enclosed area": ["inaccessible enclosed area"],
    "walking area": ["walking area"],
    "construction": ["construction"],
}


def space_category(space_type):
    for cat, types in CATEGORIES.items():
        if space_type in types:
            return cat
    return space_type


HIGHWAY_WIDTHS = {
    "service": (4.5, 3.6), "residential": (4.5, 3.6), "tertiary": (5.25, 3.8),
    "primary": (6.5, 3.8), "cycleway": (2, 1), "secondary": (6.5, 3.8),
    "motorway_link": (6.5, 3.8), "platform": (1.5, 1), "motorway": (6.5, 3.8),
    "unclassified": (5.25, 3.8), "primary_link": (6.5, 3.8), "secondary_link": (6.5, 3.8),
    "construction": (5.25, 3.8), "everything else": (5.25, 3.6),
}
CYCLEWAY_WIDTHS = {
    "cycleway": {"lane": 1.5, "opposite": 0.5, "track": 1.5, "opposite_lane": 1, "opposite_track": 1.5},
    "cycleway:right": {"lane": 1.5, "track": 1.5},
    "cycleway:both": {"lane": 3.0, "track": 3.0},
    "cycleway:left": {"lane": 1.5, "track": 1.5},
}
PARKING_HIGHWAYS = ["residential", "tertiary", "secondary", "primary"]


def road_width(tags):
    if "width:carriageway" in tags:
        return float(tags["width:carriageway"])
    if "width" in tags:
        return float(tags["width"])
    i = 1 if "oneway" in tags else 0
    hw = tags.get("highway")
    width = HIGHWAY_WIDTHS.get(hw, HIGHWAY_WIDTHS["everything else"])[i]
    normal = 1 if "oneway" in tags else 2
    if "lanes" in tags and float(tags["lanes"]) != normal:
        width = width * float(tags["lanes"]) / normal
    if hw not in CYCLEWAY_WIDTHS:
        for key, vals in CYCLEWAY_WIDTHS.items():
            if key in tags and tags[key] in vals:
                width += vals[tags[key]]
    if hw in PARKING_HIGHWAYS:
        width += 6.5
    return width
